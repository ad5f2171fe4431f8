package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.functions.Numeric.{microUnits, units}

/** tg01: tag–genre label graph construction — the reference's
  * tag_label_graph_builder (recap-subworker/recap_subworker/services/
  * tag_label_graph_builder.py:124 `_aggregate_edges`): classified
  * articles carry a JSON list of ML-extracted tags with confidences,
  * and the builder aggregates them into weighted (genre, tag) edges —
  * the graph Tag Verse renders and genre_learning trains against.
  *
  * Semantics mirrored exactly: per article, the first `maxTags` tags
  * are considered (slice BEFORE the confidence gate, as the reference
  * iterates `tags_raw[:max_tags]`), labels lower-trimmed with empties
  * dropped, confidences below `minConfidence` dropped; per (genre,
  * label) edge: sample_size + average confidence; edges below
  * `minSupport` dropped; IDF weighting over the whole batch
  * (idf = ln(N/(freq+1) + 1) normalized by ln(N+1)) blended 70/30
  * with the average confidence, clamped to [0,1].
  *
  * Cross-engine determinism: confidences are snapped to exact 1e-6
  * units on entry, the average and the blend factor are rounded at
  * scale 0 in micro-units, and the final weight is an integer product
  * rounded once — the tx21/tx25 discipline, so the DuckDB oracle
  * agrees bit-for-bit.
  *
  * Scale: the JSON parse is a stateless projection; the explode
  * fan-out is ≤ maxTags per article; the ONE corpus-scale shuffle is
  * the (genre, label) aggregation (map-side combined). Tag
  * frequencies re-aggregate the edge frame (bounded by |genres| ×
  * |labels|), and the article total broadcasts as a scalar.
  */
object TagGraph {

  /** Deterministic classified-articles stand-in composed from
    * `documents` (the qe01 precedent): genre = lang, tags_json = REAL
    * JSON of the doc's first 5 tokens with confidence
    * ((doc_id + 7·i) % 101) / 100.
    */
  def composeTagged(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("genre"), tokens(col("text")).as("toks"))
    val tags = transform(sequence(lit(0), least(size(col("toks")) - 1, lit(4))), i =>
      struct(
        element_at(col("toks"), i + 1).as("label"),
        (pmod(col("doc_id") + i * 7, lit(101)).cast("double") / 100.0).as("confidence")))
    d.select(col("doc_id"), col("genre"), to_json(tags).as("tags_json"))
  }

  /** The edge aggregation over any (genre, tags_json) frame. Defaults
    * mirror the reference's tag_label_graph_builder (max_tags=6,
    * min_confidence=0.3, min_support=3); the composed view only emits
    * 5 tags per article, so the slice gate is exercised by callers
    * passing a tighter maxTags, not by tg01 itself.
    */
  def tagGenreGraphOn(articles: DataFrame, minConfidence: Double = 0.3,
                      minSupport: Int = 3, maxTags: Int = 6): DataFrame = {
    val tagSchema = org.apache.spark.sql.types.DataType.fromDDL(
      "ARRAY<STRUCT<label: STRING, confidence: DOUBLE>>")
    val total = articles.agg(count(lit(1)).as("n_articles"))
    val exploded = articles
      .select(explode(slice(from_json(col("tags_json"), tagSchema), 1, maxTags)).as("tag"),
        col("genre"))
      .select(lower(trim(col("genre"))).as("genre"),
        lower(trim(col("tag.label"))).as("label"),
        units(col("tag.confidence"), 6).as("conf_u"))
      .filter(col("label") =!= "" && col("conf_u") >= math.round(minConfidence * 1e6))
    val edges = exploded.groupBy("genre", "label")
      .agg(count(lit(1)).as("sample_size"), sum("conf_u").as("conf_sum_u"))
    val freq = edges.groupBy("label").agg(sum("sample_size").as("tag_freq"))
    edges.filter(col("sample_size") >= minSupport)
      .join(broadcast(freq), "label")
      .crossJoin(broadcast(total))
      .withColumn("avg_u", microUnits(col("conf_sum_u"), col("sample_size"), 0))
      .withColumn("factor_u",
        units(lit(0.7) + lit(0.3) *
          log(col("n_articles") / (col("tag_freq") + 1) + 1) / log(col("n_articles") + 1), 6))
      .select(col("genre"), col("label").as("tag"),
        (least(lit(1000000L), greatest(lit(0L),
          microUnits(col("avg_u") * col("factor_u"), lit(1e6), 0))) / 1e6).as("weight"),
        col("sample_size"))
  }

  /** tg01 adapter over the composed view. */
  def tg01(s: SparkSession, dir: String): DataFrame =
    tagGenreGraphOn(composeTagged(s, dir))
}
