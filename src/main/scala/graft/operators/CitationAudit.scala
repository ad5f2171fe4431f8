package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.microRatio

/** qe03: report citation audit — the acolyte orchestrator's
  * deterministic report-quality metrics
  * (acolyte-orchestrator/evaluation/metrics.py):
  *
  *  - `extract_short_ids` (:21): `[Sn]` markers in first-occurrence
  *    order, deduplicated — a marker cited twice counts once.
  *  - `_resolved_source_ids` (:35): markers resolve through the
  *    report's source map; unmapped markers and entries with an empty
  *    source_id are SKIPPED, not zero-scored.
  *  - `citation_precision` (:47): fraction of resolved source_ids in
  *    the topic's gold set; None (NULL here) when nothing resolves —
  *    no denominator, exercised in the spec.
  *  - `lang_mix_ratio` (:57): per-language share of the resolved
  *    citations, article language looked up by source_id with missing
  *    language reported as "und".
  *
  * The LLM-judged `faithfulness` (:77) delegates to a model runtime
  * this container doesn't have — env-blocked like recap-evaluator's
  * NLI metrics.
  *
  * Report composition (deterministic, the qe01/ev31 precedent — the
  * driver tables carry no acolyte reports): one report per document
  * source; its body cites the source's first five docs as
  * `snippet [S1..S5]`, then appends ` again [S1] see [S9] empty [S6]`
  * — a duplicate marker (first-occurrence dedup), an unmapped marker
  * (S9 — the map holds S1..S6), and a marker mapped to an empty
  * source_id (S6), so every skip rule in `_resolved_source_ids` is
  * exercised on real data. The gold set is the source's even-numbered
  * doc_ids; language is the doc's lang with doc_id % 7 == 0 standing
  * in for a missing language ("und").
  *
  * Scale: the report-assembly window partitions by source (one report
  * per source — the per-key top-5 pattern); everything after the
  * ≤5-row-per-report explode is joins and aggregations on the
  * |sources|·5 citation frame. The marker parse is a stateless
  * regexp projection of the report scan.
  */
object CitationAudit {

  /** Composed (source, body) reports + their (source, short_id,
    * source_id, doc_id) source maps.
    */
  def composeReports(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    // persist the |sources|·5 frame: bodies, the source map, and both
    // audit rollups all derive from it — without this the per-source
    // window (and the corpus scan under it) replays once per consumer
    val top5 = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("text"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bodies = top5.groupBy("source")
      .agg(concat(
        array_join(transform(array_sort(collect_list(struct(col("rn"),
          concat(substring(col("text"), 1, 20), lit(" [S"), col("rn"), lit("]")).as("sent")))),
          p => p.getField("sent")), " "),
        lit(" again [S1] see [S9] empty [S6]")).as("body"))
    val sourceMap = top5
      .select(col("source"), concat(lit("S"), col("rn")).as("short_id"),
        concat(lit("doc-"), col("doc_id")).as("source_id"), col("doc_id"))
      .union(top5.select(col("source")).distinct()
        .select(col("source"), lit("S6").as("short_id"), lit("").as("source_id"),
          lit(null).cast("long").as("doc_id")))
    (bodies, sourceMap)
  }

  /** The audit over any (source, body) reports frame + source map +
    * articles: per (source, lang) citation counts and shares, with the
    * per-report resolved totals and citation precision alongside.
    * `articles` must carry (doc_id, lang_c) with missing languages
    * already normalized to "und".
    */
  def citationAuditOn(bodies: DataFrame, sourceMap: DataFrame,
                      articles: DataFrame, gold: DataFrame): DataFrame = {
    val marks = bodies
      .select(col("source"),
        explode(array_distinct(
          regexp_extract_all(col("body"), lit("\\[S([0-9]+)\\]"), lit(1)))).as("num"))
      .select(col("source"), concat(lit("S"), col("num")).as("short_id"))
    val resolved = marks
      .join(sourceMap, Seq("source", "short_id"))
      .filter(col("source_id") =!= "")
      .join(articles.select(col("doc_id"), col("lang_c")), Seq("doc_id"), "left")
      .join(gold.select(col("source_id"), lit(1).as("hit")), Seq("source_id"), "left")
    // every report keeps a row even when NOTHING resolves: precision
    // NULL (metrics.py returns None on an empty denominator, not 0)
    // and an empty language mix (NULL lang row) — one LEFT join from
    // the per-report frame, so the zero-resolved branch costs no extra
    // plan. The composed qe03 data always resolves ≥1 marker; the
    // branch is spec-covered.
    val perReport = bodies.select("source").distinct()
      .join(resolved.groupBy("source")
          .agg(count(lit(1)).as("n_resolved"), count(col("hit")).as("n_gold_hits")),
        Seq("source"), "left")
      .na.fill(0L, Seq("n_resolved", "n_gold_hits"))
      .withColumn("citation_precision",
        when(col("n_resolved") > 0,
          microRatio(col("n_gold_hits"), col("n_resolved"), 4)))
    perReport
      .join(resolved.groupBy("source", "lang_c").agg(count(lit(1)).as("n_cited")),
        Seq("source"), "left")
      .select(col("source"), col("lang_c").as("lang"),
        coalesce(col("n_cited"), lit(0L)).as("n_cited"),
        when(col("n_resolved") > 0,
          microRatio(coalesce(col("n_cited"), lit(0L)), col("n_resolved"), 4))
          .as("lang_share"),
        col("n_resolved"), col("n_gold_hits"), col("citation_precision"))
  }

  /** qe03 adapter over the composed reports. */
  def qe03(s: SparkSession, dir: String): DataFrame = {
    val (bodies, sourceMap) = composeReports(s, dir)
    val articles = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, "und").otherwise(col("lang")).as("lang_c"))
    val gold = Tables.documents(s, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(concat(lit("doc-"), col("doc_id")).as("source_id"))
    citationAuditOn(bodies, sourceMap, articles, gold)
  }
}
