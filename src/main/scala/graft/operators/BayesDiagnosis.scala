package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRound

/** bd01/bd02: the graph-boost optimization DIAGNOSIS — reference
  * scripts/diagnose_bayes_optimization.py: "why is the Bayesian
  * tuner not moving" answered with deterministic match-rate math
  * between the tag_label_graph and recent articles' tag profiles:
  *
  *  - graph statistics (:34): edge count, distinct genres/tags,
  *    avg/min/max weight (6 dp);
  *  - tag match rate (:90): every OCCURRENCE of a stripped-lowered
  *    article tag label counts, matched when the label is in the
  *    graph's tag set; list elements that are not objects are
  *    SKIPPED (a string tag never counts — pinned), empty labels
  *    skipped;
  *  - genre-tag pair match rate (:128): occurrences again, genre =
  *    stripped-lowered final_genre, falsy genres skip the row's
  *    pairs (but not its tags);
  *  - unmatched SET sizes (:199) and the conclusion ladder (:221):
  *    tag rate < 50 → low_tag_match, elif pair rate < 50 →
  *    low_pair_match, else healthy;
  *  - the top-10 article-tag counter (:214) as bd02, with the
  *    deterministic (count desc, tag asc) re-expression of
  *    Counter.most_common's arbitrary tie order.
  *
  * The reference's `LIMIT 100` article sample is an UNORDERED read
  * (no ORDER BY — any subset is conformant); re-expressed as the
  * full 7-day window, which is the same plan with an honest cohort.
  * Heterogeneous top_tags shapes parse with the object-list gate
  * (`[{` prefix) on both engines — string lists and non-list values
  * contribute nothing, exactly the reference's isinstance skips.
  *
  * Scale: labels explode from the scan (≤|top_tags| per row), ONE
  * aggregation computes every occurrence/set count against the
  * broadcast literal graph (membership via literal sets — the graph
  * is model-sized), and the one-row stats frames cross-join.
  */
object BayesDiagnosis {

  /** Composed tag_label_graph ('7d' window): 6 genres × 6 tags kept
    * when (g + t) % 2 = 0; weights are sixteenths — exact binary
    * doubles, so the mean is engine-exact regardless of sum order.
    */
  val graphEdges: Seq[(String, String, Double)] =
    for {
      g <- 0 until 6
      t <- 0 until 6
      if (g + t) % 2 == 0
    } yield (s"g$g", s"tag$t", (g * 6 + t) / 16.0)

  /** Composed recent articles: (created_at, tag_profile,
    * refine_decision) with every skip path on its own residue.
    */
  def composeArticles(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val tagN = concat(lit("tag"), (col("event_id") % 14).cast("string"))
    val genre =
      when(col("event_id") % 23 === 0, "{\"final_genre\": \"\"}") // falsy → pairs skip
        .when(col("event_id") % 4 === 0,
          concat(lit("{\"final_genre\": \" G"), (col("event_id") % 6).cast("string"),
            lit(" \"}")))                                          // case+pad → strip/lower
        .otherwise(concat(lit("{\"final_genre\": \"g"),
          (col("event_id") % 6).cast("string"), lit("\"}")))
    val tags =
      when(col("event_id") % 29 === 0, lit(null).cast("string"))
        .when(col("event_id") % 29 === 1, "{\"top_tags\": [\"plain_string_tag\"]}")
        .when(col("event_id") % 29 === 2,
          "{\"top_tags\": [{\"label\": \" Tag3 \"}, {\"label\": \"\"}]}")
        .when(col("event_id") % 29 === 3, "{\"top_tags\": {\"not\": \"a list\"}}")
        .otherwise(concat(lit("{\"top_tags\": [{\"label\": \""), tagN,
          lit("\"}, {\"label\": \"zzz_unmatched\"}]}")))
    e.select(col("ts").as("created_at"), tags.as("tag_profile"),
      genre.as("refine_decision"))
  }

  /** (genre, label) occurrence rows of the 7-day window. */
  private def labelRows(articles: DataFrame): DataFrame = {
    val windowed = articles
      .crossJoin(broadcast(articles.agg(max("created_at").as("as_of"))))
      .filter(col("created_at") > col("as_of") - expr("INTERVAL 7 DAYS") &&
        col("tag_profile").isNotNull && col("refine_decision").isNotNull)
    val tt = get_json_object(col("tag_profile"), "$.top_tags")
    val objLabels = when(tt.startsWith("[{"),
      transform(
        from_json(tt, org.apache.spark.sql.types.DataType
          .fromDDL("array<struct<label:string>>")),
        x => trim(lower(x.getField("label")))))
      .otherwise(array().cast("array<string>"))
    windowed
      .select(
        trim(lower(get_json_object(col("refine_decision"), "$.final_genre")))
          .as("genre"),
        explode(objLabels).as("label"))
      .filter(col("label").isNotNull && col("label") =!= "")
  }

  /** bd01: the one-row diagnosis. */
  def diagnosisOn(articles: DataFrame): DataFrame = {
    val s = articles.sparkSession
    import s.implicits._
    val graphTags = graphEdges.map(_._2).distinct.sorted
    val graphPairs = graphEdges.map(e => s"${e._1}|${e._2}").sorted
    val gstats = graphEdges.toDF("genre", "tag", "weight").agg(
      count(lit(1)).as("total_edges"),
      countDistinct("genre").as("unique_genres"),
      countDistinct("tag").as("unique_tags"),
      microRound(avg("weight"), 6).as("avg_weight"),
      microRound(min("weight"), 6).as("min_weight"),
      microRound(max("weight"), 6).as("max_weight"))
    val rows = labelRows(articles)
    val tagMatch = array_contains(typedLit(graphTags), col("label"))
    val hasGenre = col("genre").isNotNull && col("genre") =!= ""
    val pairMatch = hasGenre &&
      array_contains(typedLit(graphPairs), concat(col("genre"), lit("|"), col("label")))
    val counts = rows.agg(
      count(lit(1)).as("total_tags"),
      sum(when(tagMatch, 1L).otherwise(0L)).as("matched_tags"),
      countDistinct(when(!tagMatch, col("label"))).as("unmatched_tag_count"),
      sum(when(hasGenre, 1L).otherwise(0L)).as("total_pairs"),
      sum(when(pairMatch, 1L).otherwise(0L)).as("matched_pairs"),
      countDistinct(when(hasGenre && !pairMatch,
        concat(col("genre"), lit("|"), col("label")))).as("unmatched_pair_count"))
    def rate(m: Column, t: Column): Column =
      when(t > 0, round(lit(100.0) * m * 100 / t, 0).cast("long") / 1e2).otherwise(0.0)
    gstats.crossJoin(broadcast(counts))
      .withColumn("tag_match_rate_pct", rate(col("matched_tags"), col("total_tags")))
      .withColumn("pair_match_rate_pct", rate(col("matched_pairs"), col("total_pairs")))
      .withColumn("verdict",
        when(col("tag_match_rate_pct") < 50, "low_tag_match")
          .when(col("pair_match_rate_pct") < 50, "low_pair_match")
          .otherwise("healthy"))
  }

  /** bd02: top-10 article tags, (count desc, tag asc). */
  def topTagsOn(articles: DataFrame): DataFrame =
    labelRows(articles)
      .groupBy(col("label").as("tag"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("tag"))
      .limit(10)

  def bd01(s: SparkSession, dir: String): DataFrame =
    diagnosisOn(composeArticles(s, dir))

  def bd02(s: SparkSession, dir: String): DataFrame =
    topTagsOn(composeArticles(s, dir))
}
