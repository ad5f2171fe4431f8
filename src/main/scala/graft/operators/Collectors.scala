package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.{cents, microRatio, microUnits}

/** The remaining alt_metrics collectors — the reads of the metrics
  * service (metrics/src/alt_metrics/collectors) that had no graft
  * row yet. Together with ev35/ev36 (logs.py:36/:114), ot05/ot06
  * (traces.py:37/:83), ot02 (traces.py:193), ev30/slo01 (sli.py
  * sources), ev33 (http MV) these complete the collector battery the
  * reference's `alt-metrics analyze` CLI composes into one
  * AnalysisResult.
  *
  *  - mt01: collect_http_endpoint_stats (http.py:16) — per (service,
  *    route) volume, avg/p95 duration, avg response size, ≥400 error
  *    rate, 2xx/4xx/5xx counts; top-30 by volume.
  *  - mt02: collect_http_status_distribution (http.py:62) — per
  *    service status-class counts + 5xx rate.
  *  - mt03: collect_recent_errors (logs.py:60) — newest 25 severe
  *    rows, 200-char body clip, '' exception type → '-'.
  *  - mt04: collect_log_volume_trends (logs.py:141) — per (hour,
  *    service) volume + severe rate, newest/busiest first.
  *  - mt05: collect_span_type_stats (traces.py:111) — per (service,
  *    SpanKind) volume, avg/p95 latency, error count.
  *  - mt06: collect_sli_trends (sli.py:16) — 5-minute averages of the
  *    per-minute error_rate / log_throughput SLI series per service,
  *    newest 500.
  *  - sat01: collect_resource_utilization (saturation.py:17) — the
  *    dual-section union (trace_duration_sec stats + per-hour
  *    throughput) per service, sample floor 10.
  *  - sat02: collect_queue_saturation (saturation.py:80) — wait-time
  *    stats for queue/worker/process-shaped spans only, top-20 by
  *    mean wait.
  *
  * Scale: every collector is ONE map-side-combined aggregation shuffle
  * over the composed fact (mt06 adds the bounded 5-min re-bucket of
  * the per-minute frame; sat01 stacks both sections out of ONE agg so
  * the scan isn't paid twice), followed by a TakeOrdered for the
  * LIMIT reads. All ratio/latency arithmetic is the repo's scale-0
  * integer-unit discipline, so no oracle boundary can flip on a
  * double. The reference's nondeterministic LIMIT ties get the
  * established deterministic tie-breaks (group key ascending).
  */
object Collectors {

  /** Exact 2-dp percent of num/den (the collectors' round(x/y*100, 2)). */
  private def pct2(num: Column, den: Column): Column = microRatio(num * 100, den, 2)

  /** mt01: per-(service, route) HTTP endpoint battery over the 006-MV
    * http fact (route '' guarded like the reference; the composed view
    * always routes, the gate is the semantics).
    */
  def httpEndpointStats(s: SparkSession, dir: String, limit: Int = 30): DataFrame =
    httpEndpointStatsOn(OtelLogs.httpRequests(OtelLogs.composeOtelLogs(s, dir)), limit)

  /** mt01 over any http-request-shaped frame. */
  def httpEndpointStatsOn(http: DataFrame, limit: Int = 30): DataFrame =
    http
      .filter(col("http_route") =!= "")
      .withColumn("dur_c", cents(col("request_duration")))
      .groupBy(col("service_name").as("service"), col("http_route").as("route"))
      .agg(
        count(lit(1)).as("request_count"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_duration_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_duration_ms"),
        microUnits(sum("response_size"), count(lit(1)), 0).as("avg_response_size"),
        pct2(count(when(col("http_status_code") >= 400, 1)), count(lit(1))).as("error_rate"),
        count(when(col("http_status_code") >= 200 && col("http_status_code") < 300, 1)).as("status_2xx"),
        count(when(col("http_status_code") >= 400 && col("http_status_code") < 500, 1)).as("status_4xx"),
        count(when(col("http_status_code") >= 500, 1)).as("status_5xx"))
      .orderBy(col("request_count").desc, col("service").asc, col("route").asc)
      .limit(limit)

  /** mt02: per-service HTTP status-class distribution (includes the
    * unparseable-status rows as 0 — the OrZero cast's visible effect:
    * they count in the total but in no 2xx..5xx class).
    */
  def httpStatusDistribution(s: SparkSession, dir: String): DataFrame =
    httpStatusDistributionOn(OtelLogs.httpRequests(OtelLogs.composeOtelLogs(s, dir)))

  /** mt02 over any http-request-shaped frame. */
  def httpStatusDistributionOn(http: DataFrame): DataFrame =
    http
      .groupBy(col("service_name").as("service"))
      .agg(
        count(lit(1)).as("total_requests"),
        count(when(col("http_status_code") >= 200 && col("http_status_code") < 300, 1)).as("status_2xx"),
        count(when(col("http_status_code") >= 300 && col("http_status_code") < 400, 1)).as("status_3xx"),
        count(when(col("http_status_code") >= 400 && col("http_status_code") < 500, 1)).as("status_4xx"),
        count(when(col("http_status_code") >= 500, 1)).as("status_5xx"),
        pct2(count(when(col("http_status_code") >= 500, 1)), count(lit(1))).as("error_5xx_rate"))
      .orderBy(col("total_requests").desc, col("service").asc)

  /** mt03: the newest-25 severe-log read. The reference orders by
    * Timestamp alone (ties nondeterministic at the cut); every output
    * column joins the sort so equal-second rows cut deterministically
    * and identical rows are interchangeable.
    */
  def recentErrors(s: SparkSession, dir: String, limit: Int = 25): DataFrame =
    recentErrorsOn(OtelLogs.errorLogs(OtelLogs.composeOtelLogs(s, dir)), limit)

  /** mt03 over any error-log-shaped frame. */
  def recentErrorsOn(errors: DataFrame, limit: Int = 25): DataFrame =
    errors
      .select(
        col("service_name").as("service"),
        col("severity_text").as("level"),
        substring(col("body"), 1, 200).as("message"),
        when(col("exception_type") === "", "-").otherwise(col("exception_type")).as("error_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("event_time"))
      .orderBy(col("event_time").desc, col("service").asc, col("level").asc,
        col("message").asc, col("error_type").asc)
      .limit(limit)

  /** mt04: per-(hour, service) log volume + severe-error trend —
    * the frame analysis.py's volume-spike warning reads (recent hour
    * vs the one before).
    */
  def logVolumeTrends(s: SparkSession, dir: String): DataFrame =
    logVolumeTrendsOn(OtelLogs.composeOtelLogs(s, dir))

  /** mt04 over any otel-log-shaped frame. */
  def logVolumeTrendsOn(logs: DataFrame): DataFrame =
    logs
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("service_name").as("service"))
      .agg(
        count(lit(1)).as("log_count"),
        count(when(col("severity_number") >= 17, 1)).as("error_count"),
        pct2(count(when(col("severity_number") >= 17, 1)), count(lit(1))).as("error_rate"))
      .orderBy(col("hour").desc, col("log_count").desc, col("service").asc)

  /** mt05: per-(service, span kind) volume/latency/error profile. */
  def spanTypeStats(s: SparkSession, dir: String): DataFrame =
    spanTypeStatsOn(OtelLogs.composeOtelTraces(s, dir))

  /** mt05 over any otel-trace-shaped frame. */
  def spanTypeStatsOn(traces: DataFrame): DataFrame =
    traces
      .withColumn("dur_c", cents(col("duration_ms")))
      .groupBy(col("service_name").as("service"), col("span_kind"))
      .agg(
        count(lit(1)).as("span_count"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_duration_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_duration_ms"),
        count(when(col("status_code") === "ERROR", 1)).as("error_count"))
      .orderBy(col("span_count").desc, col("service").asc, col("span_kind").asc)

  /** mt06: the SLI trend read — 5-minute averages of the per-minute
    * per-service error_rate / log_throughput series (the sli_metrics
    * MV ev30 materializes, here with the ServiceName dimension the
    * CH table carries), newest 500. Both averages stay in exact
    * integer units through BOTH aggregations: the per-minute
    * error-rate is an exact 1e-4-unit long, the 5-minute mean rounds
    * those longs once at scale 0.
    */
  def sliTrends(s: SparkSession, dir: String, limit: Int = 500): DataFrame =
    sliTrendsOn(OtelLogs.composeOtelLogs(s, dir), limit)

  /** mt06 over any otel-log-shaped frame. */
  def sliTrendsOn(logs: DataFrame, limit: Int = 500): DataFrame = {
    val perMinute = logs
      .groupBy(date_trunc("minute", col("ts")).as("minute"),
        col("service_name").as("service"))
      .agg(count(lit(1)).as("n"),
        count(when(col("severity_number") >= 17, 1)).as("n_err"))
      .withColumn("er_u", microUnits(col("n_err") * lit(10000), col("n"), 0))
    perMinute
      .groupBy(timestamp_seconds(floor(unix_timestamp(col("minute")) / 300).cast("long") * 300)
        .as("time_bucket"), col("service"))
      .agg(
        (microUnits(sum("er_u"), count(lit(1)), 0) / 1e4).as("error_rate"),
        (microUnits(sum("n") * lit(10000), count(lit(1)), 0) / 1e4).as("log_throughput"))
      .select(col("time_bucket"), col("service"), expr(
        """stack(2,
             'error_rate', error_rate,
             'log_throughput', log_throughput
           ) AS (metric, value)"""))
      .orderBy(col("time_bucket").desc, col("service").asc, col("metric").asc)
      .limit(limit)
  }

  /** sat01: per-service resource-utilization proxy — BOTH union
    * sections (trace-duration seconds, per-hour throughput) computed
    * in ONE grouped aggregation and stacked, so the trace scan is
    * paid once. The analysis window (the reference's `hours` CLI
    * parameter) is the corpus span in whole hours — the es08 batch
    * convention for "now"-anchored windows.
    */
  def resourceUtilization(s: SparkSession, dir: String, minCount: Int = 10): DataFrame =
    resourceUtilizationOn(OtelLogs.composeOtelTraces(s, dir), minCount)

  /** sat01 over any otel-trace-shaped frame. */
  def resourceUtilizationOn(traces: DataFrame, minCount: Int = 10): DataFrame = {
    // min/max ts fold into the SAME per-service aggregation and the
    // corpus span re-aggregates the |services| frame — one scan of the
    // composed fact, not a second full pass just for hours_analyzed
    // (the serviceHealthOn "now" pattern)
    val perService = traces
      .withColumn("dur_c", cents(col("duration_ms")))
      .groupBy(col("service_name").as("service"))
      .agg(count(lit(1)).as("sample_count"),
        sum("dur_c").as("sum_c"), max("dur_c").as("max_c"),
        round(expr("percentile(dur_c, 0.95)"), 0).cast("long").as("p95_c"),
        min("ts").as("min_ts"), max("ts").as("max_ts"))
    val hours = broadcast(perService.agg(
      (floor((unix_timestamp(max("max_ts")) - unix_timestamp(min("min_ts"))) / 3600) + 1)
        .cast("long").as("hours_analyzed")))
    perService
      .filter(col("sample_count") >= minCount)
      .crossJoin(hours)
      .select(col("service"), expr(
        """stack(2,
             'trace_duration_sec',
               CAST(ROUND(sum_c / (1000.0 * sample_count)) AS BIGINT) / 1e2,
               CAST(ROUND(max_c / 1000.0) AS BIGINT) / 1e2,
               CAST(ROUND(p95_c / 1000.0) AS BIGINT) / 1e2,
             'throughput',
               CAST(ROUND(sample_count * 1e2 / hours_analyzed) AS BIGINT) / 1e2,
               CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
           ) AS (resource_type, avg_utilization, max_utilization, p95_utilization)"""),
        col("sample_count"))
      .orderBy(col("service").asc, col("resource_type").asc)
  }

  /** The queue/worker/process span-label view sat02 LIKE-filters: the
    * composed opN span names mapped onto the operation vocabulary the
    * reference's filter was written against (three of five match, so
    * the filter is load-bearing).
    */
  def spanOpLabel(spanName: Column): Column =
    when(spanName === "op0", "db-query")
      .when(spanName === "op1", "article-queue-pop")
      .when(spanName === "op2", "worker-dispatch")
      .when(spanName === "op3", "process-batch")
      .otherwise("http-get")

  /** mt07: collect_error_trends (base.py:58) — per-(hour, service)
    * severe-error trend over the legacy logs view, worst-errors-first
    * within each hour (the mt04 sibling with the error-count ranking
    * and the Error/Fatal level source).
    */
  def errorTrends(s: SparkSession, dir: String): DataFrame =
    errorTrendsOn(OtelLogs.composeOtelLogs(s, dir))

  /** mt07 over any otel-log-shaped frame. */
  def errorTrendsOn(logs: DataFrame): DataFrame =
    logs
      .groupBy(date_trunc("hour", col("ts")).as("hour"),
        col("service_name").as("service"))
      .agg(
        count(when(col("severity_text").isin("ERROR", "FATAL"), 1)).as("error_count"),
        count(lit(1)).as("total_count"),
        pct2(count(when(col("severity_text").isin("ERROR", "FATAL"), 1)),
          count(lit(1))).as("error_rate"))
      .filter(col("total_count") > 0)
      .orderBy(col("hour").desc, col("error_count").desc, col("service").asc)

  /** mt08: collect_error_spans (traces.py:151) — per (service, span,
    * status message) error volume with mean latency and the last
    * occurrence, top-20 by count. The frame analysis.py's trace-error
    * warning reads its [0] from.
    */
  def errorSpans(s: SparkSession, dir: String, limit: Int = 20): DataFrame =
    errorSpansOn(OtelLogs.composeOtelTraces(s, dir), limit)

  /** mt08 over any otel-trace-shaped frame. */
  def errorSpansOn(traces: DataFrame, limit: Int = 20): DataFrame =
    traces
      .filter(col("status_code") === "ERROR")
      .withColumn("dur_c", cents(col("duration_ms")))
      .groupBy(col("service_name").as("service"), col("span_name").as("operation"),
        col("status_message").as("error_message"))
      .agg(
        count(lit(1)).as("error_count"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_duration_ms"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_occurrence"))
      .orderBy(col("error_count").desc, col("service").asc,
        col("operation").asc, col("error_message").asc)
      .limit(limit)

  /** mt09: collect_service_dependencies (traces.py:193) — caller →
    * callee call edges walked through the ParentSpanId chain
    * (s1.SpanId = s2.ParentSpanId within one trace, cross-service
    * edges only), with the CALLER span's latency stats and error
    * count, top-20 by call volume.
    *
    * Scale: a self-equi-join on (trace_id, span key) — both sides
    * shuffle once on the same key, no window, no broadcast of a
    * corpus-scale side; the aggregation frame is |services|² bounded.
    */
  def serviceDependencies(s: SparkSession, dir: String, limit: Int = 20): DataFrame =
    serviceDependenciesOn(OtelLogs.composeOtelTraces(s, dir), limit)

  /** mt09 over any otel-trace-shaped frame. */
  def serviceDependenciesOn(traces: DataFrame, limit: Int = 20): DataFrame = {
    val parents = traces.select(col("trace_id"), col("span_id"),
      col("service_name").as("caller"), cents(col("duration_ms")).as("dur_c"),
      when(col("status_code") === "ERROR", 1L).otherwise(0L).as("is_err"))
    val children = traces.filter(col("parent_span_id").isNotNull)
      .select(col("trace_id"), col("parent_span_id").as("span_id"),
        col("service_name").as("callee"))
    parents.join(children, Seq("trace_id", "span_id"))
      .filter(col("caller") =!= col("callee"))
      .groupBy("caller", "callee")
      .agg(
        count(lit(1)).as("call_count"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_duration_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_duration_ms"),
        sum("is_err").as("error_count"))
      .orderBy(col("call_count").desc, col("caller").asc, col("callee").asc)
      .limit(limit)
  }

  /** sat02: queue-saturation proxy — wait-time stats for the spans
    * whose name says queue/worker/process, occurrence floor 5, top-20
    * by mean wait. Max wait truncates toward zero (CH toInt64), not
    * rounds. The LIKE battery is pushed into the scan side of the one
    * aggregation shuffle.
    */
  def queueSaturation(s: SparkSession, dir: String,
                      minCount: Int = 5, limit: Int = 20): DataFrame =
    queueSaturationOn(OtelLogs.composeOtelTraces(s, dir), minCount, limit)

  /** sat02 over any otel-trace-shaped frame. */
  def queueSaturationOn(traces: DataFrame,
                        minCount: Int = 5, limit: Int = 20): DataFrame =
    traces
      .withColumn("queue_name", spanOpLabel(col("span_name")))
      .filter(col("queue_name").like("%queue%") ||
        col("queue_name").like("%worker%") || col("queue_name").like("%process%"))
      .withColumn("dur_c", cents(col("duration_ms")))
      .groupBy(col("service_name").as("service"), col("queue_name"))
      .agg(
        count(lit(1)).as("n"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_wait_time_ms"),
        floor(max("duration_ms")).cast("long").as("max_wait_time_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_wait_time_ms"))
      .filter(col("n") >= minCount)
      .drop("n")
      .orderBy(col("avg_wait_time_ms").desc, col("service").asc, col("queue_name").asc)
      .limit(limit)
}
