package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** td01: the 30-class training-set builder — reference
  * recap-subworker/scripts/build_30class_training_csv.py:
  *
  *  - golden pairs (:39): per item, content_ja and content_en each
  *    become a (content, genre) row when the primary genre is truthy
  *    and the content (None → "") reaches min_content_chars(=80);
  *  - silver pairs (:52): label falls back to genre, content falls
  *    back to text, same gates;
  *  - union → EXACT (content, genre) dedup (:121) → per-genre
  *    counts, with canonical genres never observed surfacing as the
  *    missing-genre warning set (:129 — emitted here as count-0
  *    rows with the canonical flag).
  *
  * The golden side reuses vg01's composed items — the validation
  * battery and the training builder read the same dataset in the
  * reference too. Scale: two scans explode to ≤2 rows each, one
  * distinct on (content, genre) — the tx06 exact-dedup shape — and
  * a bounded genre aggregation with a broadcast 30-row canonical
  * frame.
  */
object TrainingCsv {

  val MinContentChars = 80

  /** Composed silver-teacher rows with every fallback path planted. */
  def composeSilver(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val g = typedLit(GoldenValidate.ExpectedGenres)
    val genre = element_at(g, ((col("doc_id") + 3) % 30).cast("int") + 1)
    d.select(
      when(col("doc_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(genre).as("label"),
      when(col("doc_id") % 5 === 0, genre)
        .otherwise(lit(null).cast("string")).as("genre"),
      when(col("doc_id") % 13 === 0, lit("duplicate silver body " * 5))
        .when(col("doc_id") % 7 === 0, lit(null).cast("string"))
        .otherwise(rpad(col("text"), 120, "x")).as("content"),
      when(col("doc_id") % 11 === 0, substring(col("text"), 1, 40)) // under the gate
        .otherwise(rpad(col("text"), 90, "y")).as("text"))
  }

  /** The builder over (golden items, silver rows). */
  def buildOn(golden: DataFrame, silver: DataFrame): DataFrame = {
    val s = golden.sparkSession
    import s.implicits._
    val gp = golden
      .filter(col("primary_genre").isNotNull && col("primary_genre") =!= "")
      .select(col("primary_genre").as("genre"),
        explode(array(coalesce(col("content_ja"), lit("")),
          coalesce(col("content_en"), lit("")))).as("content"))
      .filter(length(col("content")) >= MinContentChars)
    val sp = silver
      .select(coalesce(col("label"), col("genre")).as("genre"),
        coalesce(col("content"), col("text"), lit("")).as("content"))
      .filter(col("genre").isNotNull && col("genre") =!= "" &&
        length(col("content")) >= MinContentChars)
    val deduped = gp.select("content", "genre")
      .union(sp.select("content", "genre")).distinct()
    val counts = deduped.groupBy("genre").agg(count(lit(1)).as("count"))
    val canonical = GoldenValidate.ExpectedGenres.toDF("genre")
      .withColumn("canonical", lit(true))
    counts.join(canonical, Seq("genre"), "full_outer")
      .select(col("genre"),
        coalesce(col("count"), lit(0L)).as("count"),
        coalesce(col("canonical"), lit(false)).as("canonical"))
  }

  def td01(s: SparkSession, dir: String): DataFrame =
    buildOn(GoldenValidate.composeItems(s, dir), composeSilver(s, dir))
}
