package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** gv01-gv06: the genre-verification REPORT's aggregation battery —
  * reference scripts/generate_genre_verification_report_docker.py,
  * whose eight SQL fetchers are the compute behind the markdown
  * (the tt01 lesson: count-style SQL drivers hide real surfaces):
  *
  *  - fetch_strategy_breakdown (:139): per-refine-strategy count,
  *    2-dp percentage of the window's non-null-refine rows, mean
  *    confidence;
  *  - fetch_tag_coverage (:183) + fetch_total_records (:422): the
  *    one-row report header (merged here — both are single-row
  *    summaries feeding section 2.1/2.2);
  *  - fetch_hourly_analysis (:218) / fetch_daily_analysis (:300):
  *    per-hour (last 24, newest first) / per-day (last 7) records,
  *    tagged records, 2-dp tag coverage, graph-boost count + share;
  *  - fetch_graph_boost_analysis (:264) + fetch_overall_confidence
  *    (:388): avg/median/p95/p99 (+ min/max/count on the graph-boost
  *    scope) confidence profiles — PERCENTILE_CONT re-expressed over
  *    exact milli-unit longs with a scale-0 round (the ev03
  *    discipline);
  *  - fetch_genre_distribution (:345): COALESCE(final_genre, genre)
  *    counts, 2-dp percentage, top 20 — the reference's bare
  *    `ORDER BY count DESC LIMIT 20` is tie-ambiguous; re-expressed
  *    with the deterministic (count desc, genre asc) total order.
  *
  * JSONB access (refine_decision->>'…', tag_profile->'top_tags')
  * re-expresses as real JSON parsing on both engines
  * (get_json_object / json_extract_string), with the reference's
  * NULL semantics: a NULL profile, a missing top_tags key, and an
  * empty array all fail the coverage test; rows with refine NULL
  * count in coverage/totals but never in strategy/genre/confidence;
  * confidence-less refines drop from the mean's denominator and the
  * overall profile. The reference's `hours=1` window parameter
  * composes as 24 h here so every shape has a real cohort at test SF
  * — the plans are window-size-independent.
  *
  * Scale: every fetcher is ONE map-side-combined aggregation over
  * the scan (bounded keys: strategies, hours, days, genres), plus a
  * broadcast one-row as-of/total frame — no corpus joins, no
  * windows over corpus rows; exactly the shape that reports over
  * 100 TB of learning results.
  */
object GenreVerification {

  val strategies: Seq[String] = Seq("graph_boost", "weighted_score", "coarse_only")

  /** Composed learning results: (job_id, article_id, created_at,
    * refine_decision, tag_profile) with every NULL/missing-key path
    * on its own residue.
    */
  def composeLearning(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val conf = ((col("event_id") * 37) % 1000 / lit(1000.0)).cast("string")
    val strat = when(col("event_id") % 10 <= 6, "graph_boost")
      .when(col("event_id") % 10 <= 8, "weighted_score")
      .otherwise("coarse_only")
    val genre = concat(lit("g"), (col("event_id") % 26).cast("string"))
    val refine =
      when(col("event_id") % 19 === 0, lit(null).cast("string"))
        .when(col("event_id") % 31 === 0,
          concat(lit("{\"strategy\": \""), strat,
            lit("\", \"genre\": \""), genre, lit("\"}")))      // no confidence key
        .when(col("event_id") % 23 === 0,
          concat(lit("{\"strategy\": \""), strat,
            lit("\", \"confidence\": \""), conf,
            lit("\", \"genre\": \""), genre, lit("\"}")))      // final_genre absent → fallback
        .otherwise(concat(lit("{\"strategy\": \""), strat,
          lit("\", \"confidence\": \""), conf,
          lit("\", \"final_genre\": \""), genre,
          lit("\", \"genre\": \"stale_"), genre, lit("\"}")))
    val tags =
      when(col("event_id") % 29 === 0, lit(null).cast("string"))
        .when(col("event_id") % 29 === 1, "{\"top_tags\": []}")
        .when(col("event_id") % 29 === 2, "{\"other\": 1}")
        .otherwise("{\"top_tags\": [\"t1\", \"t2\"]}")
    e.select(
      (col("event_id") % 37).as("job_id"),
      (col("event_id") % 7919).as("article_id"),
      col("ts").as("created_at"),
      refine.as("refine_decision"),
      tags.as("tag_profile"))
  }

  private def withAsOf(lr: DataFrame): DataFrame =
    lr.crossJoin(broadcast(lr.agg(max("created_at").as("as_of"))))

  private val confMilli: Column =
    round(get_json_object(col("refine_decision"), "$.confidence")
      .cast("double") * 1000, 0).cast("long")

  private val hasTags: Column =
    get_json_object(col("tag_profile"), "$.top_tags").isNotNull &&
      json_array_length(get_json_object(col("tag_profile"), "$.top_tags")) > 0

  private val strategyCol: Column =
    get_json_object(col("refine_decision"), "$.strategy")

  private def pct2(num: Column, den: Column): Column =
    microRatio(lit(100.0) * num, den, 2)

  /** gv01: per-strategy breakdown in the recent window. */
  def strategyBreakdownOn(lr: DataFrame): DataFrame = {
    val w = withAsOf(lr)
      .filter(col("refine_decision").isNotNull &&
        col("created_at") > col("as_of") - expr("INTERVAL 24 HOURS"))
    val total = w.agg(count(lit(1)).as("win_total"))
    w.groupBy(strategyCol.as("strategy"))
      .agg(count(lit(1)).as("count"),
        sum(confMilli).as("cs"), count(confMilli).as("cn"))
      .crossJoin(broadcast(total))
      .select(col("strategy"), col("count"),
        pct2(col("count"), col("win_total")).as("percentage"),
        (round(col("cs") * 1000 / col("cn"), 0).cast("long") / 1e6).as("avg_confidence"))
  }

  /** gv02 / gv06: per-hour (last 24, window-filtered) / per-day
    * (last 7, unwindowed) coverage rollups.
    */
  private def coverageBy(lr: DataFrame, grain: String, limitN: Int,
                         windowed: Boolean): DataFrame = {
    val base = if (windowed)
      withAsOf(lr).filter(col("created_at") > col("as_of") - expr("INTERVAL 24 HOURS"))
    else lr
    base.groupBy(date_trunc(grain, col("created_at")).as("bucket"))
      .agg(count(lit(1)).as("records"),
        sum(when(hasTags, 1L).otherwise(0L)).as("records_with_tags"),
        sum(when(strategyCol === "graph_boost", 1L).otherwise(0L)).as("graph_boost_count"))
      .select(col("bucket"), col("records"), col("records_with_tags"),
        pct2(col("records_with_tags"), col("records")).as("tag_coverage_pct"),
        col("graph_boost_count"),
        pct2(col("graph_boost_count"), col("records")).as("graph_boost_pct"))
      .orderBy(col("bucket").desc).limit(limitN)
  }

  def gv01(s: SparkSession, dir: String): DataFrame =
    strategyBreakdownOn(composeLearning(s, dir))

  def gv02(s: SparkSession, dir: String): DataFrame =
    coverageBy(composeLearning(s, dir), "hour", 24, windowed = true)

  def hourlyCoverageOn(lr: DataFrame): DataFrame =
    coverageBy(lr, "hour", 24, windowed = true)

  def gv06(s: SparkSession, dir: String): DataFrame =
    coverageBy(composeLearning(s, dir), "day", 7, windowed = false)

  /** gv03: confidence profiles — the graph-boost scope and the
    * overall scope, percentile_cont over exact milli-units.
    *
    * Scope filters differ ON PURPOSE, as in the reference: the
    * graph-boost fetcher (:264) filters on strategy ONLY, so its
    * COUNT(*) includes confidence-less rows while AVG/percentiles
    * skip them (SQL null semantics); the overall fetcher (:388)
    * explicitly requires a non-null confidence, so its n counts the
    * confident rows only.
    */
  def confidenceProfileOn(lr: DataFrame): DataFrame = {
    val w = withAsOf(lr)
      .filter(col("created_at") > col("as_of") - expr("INTERVAL 24 HOURS"))
      .select(strategyCol.as("strategy"), confMilli.as("cm"))
    def profile(scoped: DataFrame, scope: String): DataFrame =
      scoped.agg(
        count(lit(1)).as("n"),
        (round(sum("cm") * 1000 / count("cm"), 0).cast("long") / 1e6).as("avg_confidence"),
        (round(expr("percentile(cm, 0.5)"), 0).cast("long") / 1e3).as("median_confidence"),
        (round(expr("percentile(cm, 0.95)"), 0).cast("long") / 1e3).as("p95_confidence"),
        (round(expr("percentile(cm, 0.99)"), 0).cast("long") / 1e3).as("p99_confidence"),
        (min("cm") / 1e3).as("min_confidence"),
        (max("cm") / 1e3).as("max_confidence"))
        .select(lit(scope).as("scope"), col("n"), col("avg_confidence"),
          col("median_confidence"), col("p95_confidence"),
          col("p99_confidence"), col("min_confidence"), col("max_confidence"))
    profile(w.filter(col("strategy") === "graph_boost"), "graph_boost")
      .union(profile(w.filter(col("strategy").isNotNull && col("cm").isNotNull),
        "overall"))
  }

  /** gv04: top-20 genre distribution with the deterministic
    * (count desc, genre asc) cut.
    */
  def gv03(s: SparkSession, dir: String): DataFrame =
    confidenceProfileOn(composeLearning(s, dir))

  def genreDistributionOn(lr: DataFrame): DataFrame = {
    val w = withAsOf(lr)
      .filter(col("refine_decision").isNotNull &&
        col("created_at") > col("as_of") - expr("INTERVAL 24 HOURS"))
    val total = w.agg(count(lit(1)).as("win_total"))
    w.groupBy(coalesce(
        get_json_object(col("refine_decision"), "$.final_genre"),
        get_json_object(col("refine_decision"), "$.genre")).as("genre"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("genre"))
      .limit(20)
      .crossJoin(broadcast(total))
      .select(col("genre"), col("count"),
        pct2(col("count"), col("win_total")).as("percentage"))
  }

  /** gv05: the one-row report header — cumulative totals merged with
    * the recent-window tag coverage.
    */
  def gv04(s: SparkSession, dir: String): DataFrame =
    genreDistributionOn(composeLearning(s, dir))

  def learningTotalsOn(lr: DataFrame): DataFrame = {
    val totals = lr.agg(
      count(lit(1)).as("total_records"),
      countDistinct("job_id").as("total_jobs"),
      countDistinct("article_id").as("total_articles"),
      min("created_at").as("first_record"),
      max("created_at").as("last_record"))
    val cov = withAsOf(lr)
      .filter(col("created_at") > col("as_of") - expr("INTERVAL 24 HOURS"))
      .agg(count(lit(1)).as("window_total"),
        sum(when(hasTags, 1L).otherwise(0L)).as("has_tags"))
      .select(col("window_total"), col("has_tags"),
        pct2(col("has_tags"), col("window_total")).as("tag_coverage_pct"))
    totals.crossJoin(broadcast(cov))
  }

  /** gv07: the learning-results strategy/confidence rollup
    * (recap-evaluator evaluator/genre_evaluator.py
    * analyze_learning_results :88) — the deterministic residue of the
    * otherwise API-parsing evaluator:
    *
    *  - a row with NO refine_decision counts coarse_only and SKIPS
    *    the confidence buckets entirely (:104-106's `continue` — it
    *    still counts in `total`, so the confidence bucket counts do
    *    NOT sum to total, pinned);
    *  - strategy ∈ {coarse_high_confidence, coarse_only} → coarse,
    *    anything ELSE — including the `.get("strategy", "")` empty
    *    default — counts refined (:111-114, pinned);
    *  - confidence ≥ 0.7 splits high/low, with the `.get(…, 0.0)`
    *    default landing missing confidences in LOW (:116-119);
    *  - rates divide by total with the 0-guards (:124-130; no
    *    low_confidence_rate in the output dict — only high's, kept).
    *
    * One map-side-combined agg over a stateless projection — one
    * bounded shuffle at any corpus size.
    */
  def gv07On(lr: DataFrame): DataFrame = {
    val coarse = !col("has_decision") ||
      col("strategy").isin("coarse_high_confidence", "coarse_only")
    val total = count(lit(1))
    lr.agg(
      total.as("total_articles"),
      count(when(coarse, 1)).as("coarse_only_count"),
      count(when(!coarse, 1)).as("refined_count"),
      microRatio(count(when(coarse, 1)), total, 6).as("coarse_only_rate"),
      microRatio(count(when(!coarse, 1)), total, 6).as("refined_rate"),
      count(when(col("has_decision") && col("confidence") >= 0.7, 1))
        .as("high_confidence_count"),
      count(when(col("has_decision") && col("confidence") < 0.7, 1))
        .as("low_confidence_count"),
      microRatio(count(when(col("has_decision") && col("confidence") >= 0.7, 1)),
        total, 6).as("high_confidence_rate"))
  }

  /** Composed learning results: residue 2 rows arrive with NO
    * refine_decision; residue-11 rows carry the empty-string strategy
    * default; residue-13 rows the 0.0 confidence default.
    */
  def composeLearningResults(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val strategies = array(lit("coarse_high_confidence"), lit("coarse_only"),
      lit("llm_refine"), lit("graph_boost"))
    Tables.documents(s, dir).select(d.as("article_id"),
      (pmod(d, lit(7)) =!= 2).as("has_decision"),
      when(pmod(d, lit(11)) === 0, "")
        .otherwise(element_at(strategies, (pmod(d, lit(4)) + 1).cast("int")))
        .as("strategy"),
      when(pmod(d, lit(13)) === 0, 0.0)
        .otherwise(pmod(d * 13, lit(100)).cast("double") / 100).as("confidence"))
  }

  def gv07(s: SparkSession, dir: String): DataFrame =
    gv07On(composeLearningResults(s, dir))

  def gv05(s: SparkSession, dir: String): DataFrame =
    learningTotalsOn(composeLearning(s, dir))
}
