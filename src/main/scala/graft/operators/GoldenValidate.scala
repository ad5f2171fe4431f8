package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** vg01/vg02: golden-dataset schema validation — reference
  * recap-worker/scripts/validate_golden_dataset.py `validate_dataset`
  * (:42), the VALIDATION battery next to ml07's statistics:
  *
  *  - per item (vg01): missing required fields (one ERROR per field;
  *    processing continues with the get() defaults — a missing
  *    difficulty is an error AND counts as baseline), the
  *    no-content error (none of content_ja/content_en/content is
  *    non-blank after strip), difficulty/language_pairing whitelist
  *    errors evaluated on the DEFAULTED value, the warning battery
  *    (unexpected primary/expected genres against the 30-genre list,
  *    empty expected_genres, style/terminology_density whitelists
  *    where None is valid, boundary items needing a 2-element
  *    boundary_pair, hard items needing secondary_genres), and the
  *    duplicate-id membership;
  *  - dataset report (vg02): totals, distinct primary genres
  *    (defaulted '' included), genres under the 100 minimum (errors)
  *    and under the 120 target (warnings) across the EXPECTED list,
  *    difficulty/parallel shares with their below-target flags
  *    evaluated EXACTLY (cnt·100 < target·total — never on the
  *    rounded display value), error/warning totals (duplicates are
  *    ONE error string regardless of count, :73) and
  *    is_valid = zero errors.
  *
  * NULL columns model absent keys (the JSON file's items are dicts);
  * VALID_STYLES/"densities" include None, so only a present
  * off-whitelist value warns.
  *
  * Scale: vg01 is a scan projection plus one id-keyed window for the
  * duplicate flag; vg02 re-aggregates vg01's flags map-side with a
  * broadcast 30-row genre frame — bounded keys everywhere.
  */
object GoldenValidate {

  val RequiredFields: Seq[String] =
    Seq("id", "expected_genres", "primary_genre", "difficulty",
      "language_pairing", "source")
  val ValidDifficulties: Seq[String] = Seq("baseline", "boundary", "hard")
  val ValidPairings: Seq[String] =
    Seq("ja_only", "en_only", "parallel", "none", "same_story")
  val ValidStyles: Seq[String] = Seq("headline", "lead", "long_form")
  val ValidDensities: Seq[String] = Seq("low", "medium", "high")

  /** The 30-genre EXPECTED_GENRES list, verbatim (:30). */
  val ExpectedGenres: Seq[String] = Seq(
    "ai_data", "software_dev", "cybersecurity", "consumer_tech",
    "internet_platforms", "space_astronomy", "climate_environment",
    "energy_transition", "health_medicine", "life_science",
    "economics_macro", "markets_finance", "startups_innovation",
    "industry_logistics", "politics_government", "diplomacy_security",
    "law_crime", "education", "labor_workplace", "society_demographics",
    "culture_arts", "film_tv", "music_audio", "sports", "food_cuisine",
    "travel_places", "home_living", "games_esports", "mobility_automotive",
    "consumer_products")

  /** Composed golden items with every rule path on its own residue. */
  def composeItems(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val g = typedLit(ExpectedGenres)
    def eg(off: Int): Column = element_at(g, ((col("doc_id") + off) % 30).cast("int") + 1)
    d.select(
      when(col("doc_id") % 97 === 0, "dup_item")
        .otherwise(concat(lit("item_"), col("doc_id").cast("string"))).as("id"),
      when(col("doc_id") % 43 === 0, array().cast("array<string>"))
        .when(col("doc_id") % 41 === 0, array(lit("weird_genre")))
        .otherwise(array(eg(0), eg(1))).as("expected_genres"),
      when(col("doc_id") % 53 === 0, lit(null).cast("string"))
        .when(col("doc_id") % 37 === 0, "mystery")
        .otherwise(eg(0)).as("primary_genre"),
      when(col("doc_id") % 59 === 0, "impossible")
        .when(col("doc_id") % 20 < 12, "baseline")
        .when(col("doc_id") % 20 < 17, "boundary")
        .otherwise("hard").as("difficulty"),
      when(col("doc_id") % 61 === 0, "both")
        .otherwise(element_at(
          typedLit(Seq("ja_only", "en_only", "parallel", "none")),
          (col("doc_id") % 4).cast("int") + 1)).as("language_pairing"),
      when(col("doc_id") % 67 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("src"), (col("doc_id") % 5).cast("string"))).as("source"),
      when(col("doc_id") % 71 === 0, "   ")
        .when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(lit(null).cast("string")).as("content_ja"),
      when(col("doc_id") % 71 === 0, lit(null).cast("string"))
        .when(col("doc_id") % 3 === 1, col("text"))
        .otherwise(lit(null).cast("string")).as("content_en"),
      when(col("doc_id") % 71 === 0, lit(null).cast("string"))
        .when(col("doc_id") % 3 === 2, col("text"))
        .otherwise(lit(null).cast("string")).as("content"),
      when(col("doc_id") % 73 === 0, "fancy")
        .when(col("doc_id") % 13 === 0, "headline")
        .otherwise(lit(null).cast("string")).as("style"),
      when(col("doc_id") % 79 === 0, "ultra")
        .when(col("doc_id") % 11 === 0, "low")
        .otherwise(lit(null).cast("string")).as("terminology_density"),
      when(col("doc_id") % 17 === 0, array(lit("only_one")))
        .otherwise(array(eg(0), eg(1))).as("boundary_pair"),
      when(col("doc_id") % 19 === 0, array().cast("array<string>"))
        .otherwise(array(eg(2))).as("secondary_genres"))
  }

  /** vg01: per-item validation flags. */
  def itemChecksOn(items: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def blank(c: Column): Column = c.isNull || trim(c) === ""
    val diff = coalesce(col("difficulty"), lit("baseline"))
    val pair = coalesce(col("language_pairing"), lit("none"))
    val prim = coalesce(col("primary_genre"), lit(""))
    val missing = Seq(
      col("id").isNull,
      col("expected_genres").isNull,
      col("primary_genre").isNull,
      col("difficulty").isNull,
      col("language_pairing").isNull,
      col("source").isNull)
      .map(c => when(c, 1).otherwise(0)).reduce(_ + _)
    val eg = typedLit(ExpectedGenres)
    items
      .withColumn("dup_id",
        count(lit(1)).over(Window.partitionBy("id")) > 1)
      .select(
        coalesce(col("id"), lit("item_?")).as("item_id"),
        missing.as("n_missing_required"),
        (blank(col("content_ja")) && blank(col("content_en")) &&
          blank(col("content"))).as("no_content"),
        (!diff.isin(ValidDifficulties: _*)).as("invalid_difficulty"),
        (!pair.isin(ValidPairings: _*)).as("invalid_pairing"),
        (prim =!= "" && !array_contains(eg, prim)).as("unexpected_primary"),
        (size(coalesce(col("expected_genres"),
          array().cast("array<string>"))) === 0).as("empty_expected"),
        size(filter(coalesce(col("expected_genres"), array().cast("array<string>")),
          x => !array_contains(eg, x))).as("n_unexpected_expected"),
        (col("style").isNotNull && !col("style").isin(ValidStyles: _*))
          .as("invalid_style"),
        (col("terminology_density").isNotNull &&
          !col("terminology_density").isin(ValidDensities: _*))
          .as("invalid_density"),
        (diff === "boundary" && (col("boundary_pair").isNull ||
          size(col("boundary_pair")) =!= 2)).as("bad_boundary_pair"),
        (diff === "hard" && (col("secondary_genres").isNull ||
          size(col("secondary_genres")) === 0)).as("missing_secondary"),
        col("dup_id"),
        diff.as("difficulty_eff"), pair.as("pairing_eff"), prim.as("primary_eff"))
  }

  /** vg02: the one-row dataset report. */
  def reportOn(items: DataFrame): DataFrame = {
    val s = items.sparkSession
    import s.implicits._
    val f = itemChecksOn(items).cache()
    def b2i(c: Column): Column = when(c, 1L).otherwise(0L)
    val per = f.agg(
      count(lit(1)).as("total"),
      countDistinct("primary_eff").as("unique_genres"),
      sum(col("n_missing_required").cast("long")).as("e_missing"),
      sum(b2i(col("no_content"))).as("e_content"),
      sum(b2i(col("invalid_difficulty"))).as("e_diff"),
      sum(b2i(col("invalid_pairing"))).as("e_pair"),
      (sum(b2i(col("unexpected_primary"))) + sum(b2i(col("empty_expected"))) +
        sum(col("n_unexpected_expected").cast("long")) +
        sum(b2i(col("invalid_style"))) + sum(b2i(col("invalid_density"))) +
        sum(b2i(col("bad_boundary_pair"))) +
        sum(b2i(col("missing_secondary")))).as("w_items"),
      (countDistinct(when(col("dup_id"), col("item_id"))) > 0).as("has_dups"),
      sum(b2i(col("difficulty_eff") === "baseline")).as("n_baseline"),
      sum(b2i(col("difficulty_eff") === "boundary")).as("n_boundary"),
      sum(b2i(col("difficulty_eff") === "hard")).as("n_hard"),
      sum(b2i(col("pairing_eff") === "parallel")).as("n_parallel"))
    val genreCounts = ExpectedGenres.toDF("genre")
      .join(f.groupBy(col("primary_eff").as("genre"))
        .agg(count(lit(1)).as("cnt")), Seq("genre"), "left")
      .agg(
        sum(when(coalesce(col("cnt"), lit(0L)) < 100, 1L).otherwise(0L))
          .as("genres_below_min"),
        sum(when(coalesce(col("cnt"), lit(0L)) >= 100 &&
          coalesce(col("cnt"), lit(0L)) < 120, 1L).otherwise(0L))
          .as("genres_below_target"))
    per.crossJoin(broadcast(genreCounts)).select(
      col("total"), col("unique_genres"),
      col("genres_below_min"), col("genres_below_target"),
      microRatio(col("n_baseline") * 100, col("total"), 1).as("baseline_pct"),
      microRatio(col("n_boundary") * 100, col("total"), 1).as("boundary_pct"),
      microRatio(col("n_hard") * 100, col("total"), 1).as("hard_pct"),
      microRatio(col("n_parallel") * 100, col("total"), 1).as("parallel_pct"),
      (col("n_baseline") * 100 < col("total") * 55).as("baseline_below_target"),
      (col("n_boundary") * 100 < col("total") * 20).as("boundary_below_target"),
      (col("n_hard") * 100 < col("total") * 10).as("hard_below_target"),
      (col("n_parallel") * 100 < col("total") * 25).as("parallel_below_target"),
      col("has_dups").as("duplicate_ids"),
      (col("e_missing") + col("e_content") + col("e_diff") + col("e_pair") +
        col("genres_below_min") +
        when(col("has_dups"), 1L).otherwise(0L)).as("error_count"),
      (col("w_items") + col("genres_below_target") +
        b2i(col("n_baseline") * 100 < col("total") * 55) +
        b2i(col("n_boundary") * 100 < col("total") * 20) +
        b2i(col("n_hard") * 100 < col("total") * 10) +
        b2i(col("n_parallel") * 100 < col("total") * 25)).as("warning_count"))
      .withColumn("is_valid", col("error_count") === 0)
  }

  def vg01(s: SparkSession, dir: String): DataFrame =
    itemChecksOn(composeItems(s, dir))

  def vg02(s: SparkSession, dir: String): DataFrame =
    reportOn(composeItems(s, dir))
}
