package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.{cents, microRatio}

/** The composite service-health analysis battery — the reference's
  * ClickHouse performance analyzer (scripts/
  * analyze_clickhouse_performance.py), the read that FUSES the
  * per-signal collectors (ev35/ev36/ot05-style frames) into one
  * scored verdict per service:
  *
  *  - hs01: collect_service_stats (:187) + the per-service health
  *    score (:135 calculate_health_score — additive penalty ladders
  *    over error-rate %, p95 latency ms and the minutes-since-last-
  *    log gap, floored at 0) and its status label (:170 — Healthy ≥
  *    90 > Warning ≥ 70 > Degraded ≥ 50 > Critical). The gates read
  *    the ROUNDED collector outputs, exactly as analyze_health (:597)
  *    feeds the rounded SQL results into the scorer.
  *  - hs02: analyze_health's report rollup — the overall score is the
  *    FLOOR-divided mean of service scores (:622 `sum // len`),
  *    critical issues are score < 50 services (:628), elevated-error
  *    services are error_rate > 1 (:635), stale services are
  *    gap > 5 min (:666).
  *  - slo01: collect_slo_violations (:564) — per (service, 5-minute
  *    bucket) error rate above the 1% threshold, rate as a rounded
  *    2-dp percent, newest-first top-50.
  *
  * Scale: hs01 is two map-side-combined aggregations of one log scan
  * (severity profile + the http-latency percentile on the gated
  * subset) joined on the tiny per-service frame; the scorer itself is
  * a stateless projection of that frame. slo01 shuffles once on
  * (service, bucket) with the HAVING evaluated on exact integers
  * (100·severe > total) — the threshold can never flip on a double.
  * "now" is the corpus max timestamp (the es08 batch convention).
  */
object HealthScore {

  /** calculate_health_score's penalty ladders over the rounded
    * signals; score floored at 0.
    */
  def healthScore(errorRatePct: Column, p95Ms: Column, gapMinutes: Column): Column = {
    val errPenalty = when(errorRatePct > 10, 40).when(errorRatePct > 5, 25)
      .when(errorRatePct > 1, 10).when(errorRatePct > 0.5, 5).otherwise(0)
    val latPenalty = when(p95Ms > 10000, 30).when(p95Ms > 5000, 20)
      .when(p95Ms > 1000, 10).when(p95Ms > 500, 5).otherwise(0)
    val gapPenalty = when(gapMinutes > 10, 30).when(gapMinutes > 5, 15).otherwise(0)
    greatest(lit(0), lit(100) - errPenalty - latPenalty - gapPenalty)
  }

  def healthStatus(score: Column): Column =
    when(score >= 90, "Healthy").when(score >= 70, "Warning")
      .when(score >= 50, "Degraded").otherwise("Critical")

  /** hs01: the per-service scorecard over the composed OTel log view.
    *
    * ONE scan, ONE shuffle: the severity profile and the http-gated
    * p95 come out of the same grouped aggregation (the p95 input is
    * null on non-http rows and `percentile` ignores nulls — services
    * with no http rows read 0, analyze_health's `.get(name, 0)`
    * default), and "now" re-aggregates the tiny per-service frame
    * instead of re-scanning the log. The first cut ran the heavy
    * attribute-map composition twice (stats scan + latency scan) and
    * probed 2.8 s warm at sf0.1; this shape halves that.
    */
  def serviceHealthOn(logs: DataFrame): DataFrame = {
    val severe = col("severity_text").isin("ERROR", "FATAL")
    val a = (k: String) => element_at(col("attrs"), k)
    val isHttp = a("http.method").isNotNull && a("http.method") =!= ""
    val pre = logs.select(col("service_name"), col("severity_text"), col("ts"),
      when(isHttp,
        cents(coalesce(a("http.request.duration").try_cast("double"), lit(0.0))))
        .as("dur_c"))
    val stats = pre.groupBy("service_name").agg(
      count(lit(1)).as("total_logs"),
      count(when(severe, 1)).as("error_count"),
      count(when(col("severity_text") === "WARNING", 1)).as("warn_count"),
      max("ts").as("last_seen"),
      (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_raw"))
    val now = stats.agg(max("last_seen").as("now_ts"))
    stats.crossJoin(broadcast(now))
      .select(col("service_name"), col("total_logs"), col("error_count"),
        col("warn_count"),
        microRatio(col("error_count") * 100, col("total_logs"), 3).as("error_rate"),
        col("last_seen"),
        floor((unix_timestamp(col("now_ts")) - unix_timestamp(col("last_seen"))) / 60)
          .as("minutes_since_last_log"),
        coalesce(col("p95_raw"), lit(0.0)).as("p95_ms"))
      .withColumn("health_score",
        healthScore(col("error_rate"), col("p95_ms"), col("minutes_since_last_log")))
      .withColumn("health_status", healthStatus(col("health_score")))
  }

  def hs01(s: SparkSession, dir: String): DataFrame =
    serviceHealthOn(OtelLogs.composeOtelLogs(s, dir))

  /** hs02: the analyzer's one-row report rollup over the hs01 frame. */
  def healthReportOn(health: DataFrame): DataFrame =
    health.agg(
      count(lit(1)).as("n_services"),
      floor(sum("health_score") / count(lit(1))).as("overall_health_score"),
      count(when(col("health_score") >= 90, 1)).as("n_healthy"),
      count(when(col("health_score") >= 70 && col("health_score") < 90, 1)).as("n_warning"),
      count(when(col("health_score") >= 50 && col("health_score") < 70, 1)).as("n_degraded"),
      count(when(col("health_score") < 50, 1)).as("n_critical"),
      count(when(col("error_rate") > 1, 1)).as("n_elevated_error"),
      count(when(col("minutes_since_last_log") > 5, 1)).as("n_stale"))

  def hs02(s: SparkSession, dir: String): DataFrame =
    healthReportOn(hs01(s, dir))

  /** slo01: error-rate SLO violations per (service, 5-minute bucket) —
    * the 1% threshold evaluated on exact integers, newest first,
    * top-50 with deterministic ties.
    */
  def sloViolationsOn(logs: DataFrame, limit: Int = 50): DataFrame = {
    val severe = col("severity_text").isin("ERROR", "FATAL")
    logs.select(col("service_name"),
      timestamp_seconds(floor(unix_timestamp(col("ts")) / 300).cast("long") * 300)
        .as("time_bucket"),
      severe.cast("int").as("is_err"))
      .groupBy("service_name", "time_bucket")
      .agg(count(lit(1)).as("sample_count"), sum("is_err").as("n_err"))
      .filter(col("n_err") * 100 > col("sample_count"))
      .select(col("service_name"), col("time_bucket"),
        microRatio(col("n_err") * 100, col("sample_count"), 2).as("error_rate_pct"),
        col("sample_count"))
      .orderBy(col("time_bucket").desc, col("error_rate_pct").desc,
        col("service_name").asc)
      .limit(limit)
  }

  def slo01(s: SparkSession, dir: String): DataFrame =
    sloViolationsOn(OtelLogs.composeOtelLogs(s, dir))
}
