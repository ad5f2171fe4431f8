package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** tg02: per-sample tag-extraction quality vs a golden tag set —
    * the reference's evaluation framework
    * (scripts/evaluate_tag_quality.py):
    *
    *  - precision@k (:99): |distinct-lowercased top-k ∩ expected| over
    *    min(|predicted|, k) — the DENOMINATOR counts raw predictions
    *    (duplicates included), the numerator distinct matches; empty
    *    predictions score 0.
    *  - recall@k (:113): the same matches over |distinct expected|;
    *    empty expected scores 0.
    *  - diversity (:133): uniqueness (distinct share) minus a 0.1
    *    penalty per unordered pair where one tag is a substring of the
    *    other, capped at 0.5, floored at 0.
    *
    * Case-insensitive throughout (the golden set here is upper-cased
    * precisely so the normalization path is exercised). Every score is
    * exact micro-unit arithmetic over set sizes.
    *
    * Composition: predicted = the doc's first 8 tokens (duplicates
    * kept — they exercise the raw-count denominator and the
    * uniqueness share), empty on doc_id % 31 (the empty-tag path);
    * golden = the doc's first 4 distinct tokens of length ≥ 4,
    * upper-cased.
    *
    * Scale: a pure stateless HOF projection of the scan — set
    * intersections and the ≤C(8,2) substring pair check run per row;
    * no shuffle at all.
    */
  def tagQuality(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("pred",
        when(col("doc_id") % 31 === 0, array().cast("array<string>"))
          .otherwise(slice(col("toks"), 1, 8)))
      // slice BEFORE distinct (the rag06 kws pattern): a
      // distinct-then-slice would be order-sensitive, and DuckDB's
      // list_distinct does not guarantee first-occurrence order
      .withColumn("expected",
        transform(slice(filter(col("toks"), t => length(t) >= 4), 1, 4),
          t => upper(t)))
      .drop("toks")
    tagQualityOn(d)
  }

  /** The per-sample metrics over any (doc_id, pred, expected) frame. */
  def tagQualityOn(samples: DataFrame): DataFrame = {
    val d = samples
      .withColumn("norm", transform(col("pred"), t => lower(t)))
      .withColumn("exp_n", array_distinct(transform(col("expected"), t => lower(t))))
    def prAtK(k: Int): (Column, Column) = {
      val matches = size(array_intersect(array_distinct(slice(col("norm"), 1, k)), col("exp_n")))
      val p = when(size(col("pred")) === 0, 0.0)
        .otherwise(microUnits(matches, least(size(col("pred")), lit(k)), 6) / 1e6)
      val r = when(size(col("exp_n")) === 0, 0.0)
        .otherwise(microUnits(matches, size(col("exp_n")), 6) / 1e6)
      (p, r)
    }
    val (p5, r5) = prAtK(5)
    val (p10, r10) = prAtK(10)
    val uniqU = when(size(col("norm")) > 0,
      microUnits(size(array_distinct(col("norm"))), size(col("norm")), 6)).otherwise(0L)
    val overlapCnt = when(size(col("norm")) >= 2, expr(
      """size(filter(flatten(transform(sequence(1, size(norm) - 1), i ->
           transform(sequence(i + 1, size(norm)), j ->
             struct(element_at(norm, i) AS a, element_at(norm, j) AS b)))),
         p -> contains(p.a, p.b) OR contains(p.b, p.a)))""")).otherwise(lit(0))
    val penU = least(lit(500000L), (overlapCnt * 100000L).cast("long"))
    d.select(col("doc_id"),
      size(col("pred")).as("n_pred"),
      p5.as("precision_at_5"), p10.as("precision_at_10"),
      r5.as("recall_at_5"), r10.as("recall_at_10"),
      when(size(col("norm")) > 0, greatest(lit(0L), uniqU - penU) / 1e6)
        .otherwise(0.0).as("diversity"))
  }

  /** tg03: the aggregate EvaluationMetrics row over tg02 — means of
    * each per-sample metric over exact 1e-6 units, F1 computed FROM
    * THE MEAN precision/recall (evaluate_extractor:227 — not a mean
    * of per-sample F1s), average tag count, and the empty-tag rate.
    */
  def tagQualityReport(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Numeric.{microRatio, microRound}
    val per = tagQuality(s, dir)
    val meanU = (c: String) =>
      microUnits(sum(units(col(c), 6)), count(lit(1)), 0) / 1e6
    val f1 = (p: Column, r: Column) =>
      when(p + r === 0, 0.0).otherwise(microRound(lit(2.0) * p * r / (p + r), 6))
    per.agg(
      count(lit(1)).as("total_samples"),
      meanU("precision_at_5").as("precision_at_5"),
      meanU("precision_at_10").as("precision_at_10"),
      meanU("recall_at_5").as("recall_at_5"),
      meanU("recall_at_10").as("recall_at_10"),
      meanU("diversity").as("diversity_score"),
      microRatio(sum("n_pred"), count(lit(1)), 4).as("avg_tag_count"),
      microRatio(count(when(col("n_pred") === 0, 1)), count(lit(1)), 4).as("empty_tag_rate"))
      .withColumn("f1_at_5", f1(col("precision_at_5"), col("recall_at_5")))
      .withColumn("f1_at_10", f1(col("precision_at_10"), col("recall_at_10")))
  }
}
