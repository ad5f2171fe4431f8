package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{cents, microRatio, microUnits}

/** OTel log-attribute extraction facts — the reference's ClickHouse
  * materialized views over `otel_logs.LogAttributes`:
  *
  *  - ev33: clickhouse/migrations/006_create_otel_http_mv.sql — the
  *    `http.*` attribute extraction into an `otel_http_requests` fact
  *    (gated on `LogAttributes['http.method'] != ''`, with
  *    toUInt16OrZero/toUInt64OrZero/toFloat64OrZero semantics for the
  *    numeric attributes) plus its `otel_error_logs` sibling
  *    (SeverityNumber >= 17, `exception.*` attributes), rolled up into
  *    the per-(ServiceName, HttpRoute) request analytics the table's
  *    ORDER BY (ServiceName, HttpRoute, Timestamp) exists for.
  *  - ev34: clickhouse/migrations/008_add_business_context_columns.sql
  *    — the `alt.*` business-context MATERIALIZED columns (feed /
  *    article / job / processing-stage / AI-pipeline / request ids)
  *    and the drilldown those columns exist for: latency percentiles +
  *    error rate per (AIPipeline, ProcessingStage), with each group's
  *    top feed by error count.
  *
  * Both extractions are stateless map-projection scans — exactly what
  * a CH materialized view computes per insert — so they fuse into
  * whatever reads them; the analytics are single map-side-combined
  * shuffles on the extracted keys. ev31 covers the nginx/plecto edge
  * shapes of migration 003; these are the OTel-attribute siblings.
  */
object OtelLogs {

  /** Deterministic otel_logs stand-in composed from the events table
    * (the ev31/lt01 composition precedent): service from the user
    * bucket, severity 17/21 on error events (FATAL past value 300),
    * and a LogAttributes map carrying `http.*` keys on non-click rows
    * (click rows OMIT them — the rows the `!= ''` gate exists for),
    * `alt.*` business context on every row, `exception.*` on
    * severe rows, and a deliberately non-numeric status
    * (`k % 10 == 0` → "NA") to exercise the OrZero casts.
    */
  def composeOtelLogs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val uid = coalesce(col("user_id"), lit(0L))
    val v = coalesce(col("value"), lit(0.0))
    val k = coalesce(
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0))
    val svc = when(pmod(uid, lit(4)) === 0, "alt-backend")
      .when(pmod(uid, lit(4)) === 1, "auth-hub")
      .when(pmod(uid, lit(4)) === 2, "tag-generator")
      .otherwise("news-creator")
    val sev = when(col("event_type") === "error" && v > 300, 21)
      .when(col("event_type") === "error", 17).otherwise(9)
    // a slice of INFO-numbered rows carries WARNING text (text and
    // number disagree — the dual-evidence case ev36's text-first
    // bucketing exists for)
    val sevText = when(sev === 21, "FATAL").when(sev === 17, "ERROR")
      .when(pmod(k, lit(17)) === 0, "WARNING").otherwise("INFO")
    val httpPairs: Seq[Column] = Seq(
      lit("http.method"),
      when(col("event_type") === "purchase", "POST")
        .when(col("event_type") === "signup", "PUT").otherwise("GET"),
      lit("http.route"), concat(lit("/api/"), col("event_type")),
      lit("http.status_code"),
      when(pmod(k, lit(10)) === 0, "NA")
        .when(col("event_type") === "error", "500").otherwise("200"),
      lit("http.response.body.size"), round(v * 10, 0).cast("long").cast("string"),
      lit("http.request.duration"), v.cast("string"),
      lit("user.id"), concat(lit("u"), uid),
      lit("http.client_ip"), concat(lit("10.0.0."), pmod(uid, lit(250))),
      lit("http.user_agent"), concat(lit("agent-"), pmod(uid, lit(5))))
    val bizPairs: Seq[Column] = Seq(
      lit("alt.feed.id"), concat(lit("feed-"), pmod(uid, lit(50))),
      lit("alt.article.id"), concat(lit("art-"), pmod(col("event_id"), lit(1000))),
      lit("alt.job.id"), concat(lit("job-"), pmod(col("event_id"), lit(97))),
      lit("alt.processing.stage"),
      when(pmod(k, lit(4)) === 0, "fetch").when(pmod(k, lit(4)) === 1, "summarize")
        .when(pmod(k, lit(4)) === 2, "embed").otherwise("index"),
      lit("alt.ai.pipeline"),
      when(pmod(uid, lit(3)) === 0, "recap").when(pmod(uid, lit(3)) === 1, "rag")
        .otherwise("tagging"),
      lit("alt.request.id"), concat(lit("req-"), col("event_id")))
    // a slice of severe rows reports an EMPTY exception type (the CH
    // map default for an unset attribute) — ev35 maps those to
    // 'Unknown' like the reference collector
    val excPairs: Seq[Column] = Seq(
      lit("exception.type"),
      when(pmod(k, lit(13)) === 0, "").otherwise(concat(lit("E"), pmod(k, lit(3)))),
      lit("exception.message"), concat(lit("boom "), col("event_type")))
    val attrs = when(col("event_type") === "click", map(bizPairs: _*))
      .when(sev >= 17, map(httpPairs ++ bizPairs ++ excPairs: _*))
      .otherwise(map(httpPairs ++ bizPairs: _*))
    e.select(col("ts"),
      concat(lit("t"), pmod(col("event_id"), lit(1000))).as("trace_id"),
      concat(lit("s"), col("event_id")).as("span_id"),
      svc.as("service_name"), sev.as("severity_number"), sevText.as("severity_text"),
      concat(col("event_type"), lit(" event")).as("body"),
      attrs.as("attrs"))
  }

  /** 006's otel_http_requests_mv SELECT: `http.*` keys out of the
    * attribute map, gated on a present, non-empty http.method; the
    * OrZero casts map unparseable numerics to 0 instead of dropping
    * the row.
    *
    * Plan note: the gate + extraction build as ONE when-gated struct
    * behind an explode barrier (the ev33 shape). A plain
    * `.filter(a(...)).select(a(...), …)` lets predicate pushdown
    * substitute the full attrs-map construction into the Filter
    * condition — the 20-entry map (with its regexp payload parse) gets
    * built three times per row instead of once, and mt02 measured
    * 5.0 s vs 1.1 s at sf0.1 for exactly that reason. The Generate
    * node stops the substitution; within the single Project,
    * codegen's subexpression elimination builds the map once.
    */
  def httpRequests(logs: DataFrame): DataFrame = {
    val a = (k: String) => element_at(col("attrs"), k)
    val gated = when(a("http.method").isNotNull && a("http.method") =!= "",
      struct(
        a("http.method").as("http_method"),
        a("http.route").as("http_route"),
        coalesce(a("http.status_code").try_cast("int"), lit(0)).as("http_status_code"),
        coalesce(a("http.response.body.size").try_cast("long"), lit(0L)).as("response_size"),
        coalesce(a("http.request.duration").try_cast("double"), lit(0.0)).as("request_duration"),
        coalesce(a("user.id"), lit("")).as("user_id"),
        coalesce(a("http.client_ip"), lit("")).as("client_ip"),
        coalesce(a("http.user_agent"), lit("")).as("user_agent")))
    logs.select(col("ts"), col("trace_id"), col("span_id"), col("service_name"),
        explode(array(gated)).as("h"))
      .filter(col("h").isNotNull)
      .select(col("ts"), col("trace_id"), col("span_id"), col("service_name"),
        col("h.*"))
  }

  /** 006's otel_error_logs_mv SELECT: severe rows (SeverityNumber >=
    * 17 — ERROR and up) with their exception attributes.
    */
  def errorLogs(logs: DataFrame): DataFrame = {
    val a = (k: String) => element_at(col("attrs"), k)
    logs.filter(col("severity_number") >= 17)
      .select(col("ts"), col("trace_id"), col("span_id"), col("service_name"),
        col("severity_text"), col("body"),
        coalesce(a("exception.type"), lit("")).as("exception_type"),
        coalesce(a("exception.message"), lit("")).as("exception_message"))
  }

  /** ev33: per-(ServiceName, HttpRoute) request analytics over the
    * extracted HTTP fact, unioned with the per-(ServiceName,
    * ExceptionType) rollup of the error-log sibling (`fact`
    * discriminates the two sections; the error rows carry NULL HTTP
    * measures). Latency p95 in exact centi-ms units (ev31's
    * discipline), the error rate an exact micro-unit ratio.
    */
  def ev33(s: SparkSession, dir: String): DataFrame = {
    // ONE pass computes both sections — a log row fans out into the
    // MV sections whose gates it satisfies (a severe http row feeds
    // both), exactly how CH evaluates every MV per insert. A
    // union-of-two-branches plan would re-evaluate the whole
    // composition per branch and duplicate the map expression into
    // each branch's gate filter; this shape scans once, shuffles once.
    val a = (k: String) => element_at(col("attrs"), k)
    val httpSec = when(a("http.method").isNotNull && a("http.method") =!= "",
      struct(lit("http_route").as("fact"), a("http.route").as("dim"),
        coalesce(a("http.status_code").try_cast("int"), lit(0)).as("status"),
        coalesce(a("http.response.body.size").try_cast("long"), lit(0L)).as("size"),
        cents(coalesce(a("http.request.duration").try_cast("double"), lit(0.0))).as("dur_c")))
    val errSec = when(col("severity_number") >= 17,
      struct(lit("exception").as("fact"), coalesce(a("exception.type"), lit("")).as("dim"),
        lit(null).cast("int").as("status"), lit(null).cast("long").as("size"),
        lit(null).cast("long").as("dur_c")))
    composeOtelLogs(s, dir)
      .select(col("service_name"), explode(array(httpSec, errSec)).as("sec"))
      .filter(col("sec").isNotNull)
      .select(col("service_name"), col("sec.*"))
      .groupBy("service_name", "fact", "dim")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("status") >= 500, 1)).as("n_5xx_raw"),
        microRatio(count(when(col("status") >= 500, 1)), count(lit(1)), 4)
          .as("error_rate_raw"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_raw"),
        sum("size").as("total_bytes_raw"))
      .select(col("service_name"), col("fact"), col("dim"), col("n"),
        when(col("fact") === "http_route", col("n_5xx_raw")).as("n_5xx"),
        when(col("fact") === "http_route", col("error_rate_raw")).as("error_rate"),
        when(col("fact") === "http_route", col("p95_raw")).as("p95_duration_ms"),
        when(col("fact") === "http_route", col("total_bytes_raw")).as("total_bytes"))
  }

  /** ev35: error-type leaderboard over the extracted error-log fact —
    * the metrics service's error-pattern collector
    * (metrics/src/alt_metrics/collectors/logs.py:36): per (service,
    * exception type) error counts with empty types reported as
    * 'Unknown' and a sample message per type, top-20 by count. The
    * reference samples via `any()` (nondeterministic); the exemplar
    * here is min(body) — the ot03 deterministic-exemplar convention.
    * One map-side-combined shuffle + TakeOrdered.
    */
  def errorTypes(s: SparkSession, dir: String, limit: Int = 20): DataFrame =
    errorTypesOn(composeOtelLogs(s, dir), limit)

  /** ev35 over any otel-log-shaped frame. */
  def errorTypesOn(logs: DataFrame, limit: Int = 20): DataFrame =
    errorLogs(logs)
      .groupBy(col("service_name"),
        when(col("exception_type") === "", "Unknown")
          .otherwise(col("exception_type")).as("error_type"))
      .agg(count(lit(1)).as("error_count"), min(col("body")).as("sample_message"))
      .orderBy(col("error_count").desc, col("service_name").asc, col("error_type").asc)
      .limit(limit)

  /** ev36: per-service severity distribution — the metrics service's
    * log-level collector (collectors/logs.py:114): each OTel level
    * bucketed by TEXT OR NUMBER (a producer may set either; the
    * composed view plants WARNING-text rows whose number says INFO —
    * the text-first rule catches them), plus the severe-error rate as
    * an exact percent (2 dp). One conditional-aggregate scan, the
    * dq01 single-pass-profile shape.
    */
  def severityProfile(s: SparkSession, dir: String): DataFrame = {
    val t = col("severity_text")
    val n = col("severity_number")
    composeOtelLogs(s, dir)
      .groupBy("service_name")
      .agg(
        count(lit(1)).as("total_logs"),
        count(when(t === "DEBUG" || n <= 4, 1)).as("debug_count"),
        count(when(t === "INFO" || (n > 4 && n <= 8), 1)).as("info_count"),
        count(when(t.isin("WARN", "WARNING") || (n > 8 && n <= 12), 1)).as("warn_count"),
        count(when(t === "ERROR" || (n > 12 && n <= 16), 1)).as("error_count"),
        count(when(t.isin("FATAL", "CRITICAL") || n > 20, 1)).as("fatal_count"),
        (microUnits(count(when(n >= 17, 1)), count(lit(1)), 4) / 1e2).as("error_rate"))
  }

  /** Deterministic otel_traces stand-in (the composeOtelLogs sibling):
    * service from the user bucket, span name from the payload key,
    * duration = value, ERROR status on a fixed residue independent of
    * the service so error spans spread across the grid. Traces group
    * eight consecutive spans; each non-head span points at its
    * predecessor (the ParentSpanId chain mt09's dependency join walks
    * — adjacent events usually belong to different user buckets, so
    * cross-service edges exist). Error spans carry one of two status
    * messages so (service, span, message) groups are non-trivial.
    */
  def composeOtelTraces(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val uid = coalesce(col("user_id"), lit(0L))
    val v = coalesce(col("value"), lit(0.0))
    val k = coalesce(
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0))
    val svc = when(pmod(uid, lit(4)) === 0, "alt-backend")
      .when(pmod(uid, lit(4)) === 1, "auth-hub")
      .when(pmod(uid, lit(4)) === 2, "tag-generator")
      .otherwise("news-creator")
    val isErr = pmod(k, lit(11)) === 0
    e.select(col("ts"),
      concat(lit("t"), floor(col("event_id") / 8).cast("long")).as("trace_id"),
      concat(lit("s"), col("event_id")).as("span_id"),
      when(pmod(col("event_id"), lit(8)) =!= 0,
        concat(lit("s"), col("event_id") - 1)).as("parent_span_id"),
      svc.as("service_name"),
      concat(lit("op"), pmod(k, lit(5))).as("span_name"),
      when(pmod(k, lit(3)) === 0, "SERVER").when(pmod(k, lit(3)) === 1, "CLIENT")
        .otherwise("INTERNAL").as("span_kind"),
      v.as("duration_ms"),
      when(isErr, "ERROR").otherwise("OK").as("status_code"),
      when(isErr, concat(lit("boom-"), pmod(k, lit(2)))).otherwise("").as("status_message"))
  }

  /** ot05: per-endpoint API performance — the metrics service's
    * api-performance collector (collectors/traces.py:37): per
    * (service, span): volume, mean and p50/p95/p99/max latency, error
    * spans; endpoints below the volume floor dropped (HAVING ≥ 5),
    * ranked by p95 with the top-30 kept. All latency arithmetic in
    * exact centi-ms units; ties broken on the group key so the cut is
    * deterministic. One map-side-combined shuffle + TakeOrdered over
    * the |services|·|ops| frame.
    */
  def apiPerformance(s: SparkSession, dir: String,
                     minCount: Int = 5, limit: Int = 30): DataFrame =
    apiPerformanceOn(composeOtelTraces(s, dir), minCount, limit)

  /** ot05 over any otel-trace-shaped frame. */
  def apiPerformanceOn(traces: DataFrame,
                       minCount: Int = 5, limit: Int = 30): DataFrame =
    traces
      .withColumn("dur_c", cents(col("duration_ms")))
      .groupBy("service_name", "span_name")
      .agg(
        count(lit(1)).as("request_count"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_ms"),
        (round(expr("percentile(dur_c, 0.50)"), 0).cast("long") / 1e2).as("p50_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_ms"),
        (round(expr("percentile(dur_c, 0.99)"), 0).cast("long") / 1e2).as("p99_ms"),
        (max("dur_c") / 1e2).as("max_ms"),
        count(when(col("status_code") === "ERROR", 1)).as("error_spans"))
      .filter(col("request_count") >= minCount)
      .orderBy(col("p95_ms").desc, col("service_name").asc, col("span_name").asc)
      .limit(limit)

  /** ot06: slow-span bottleneck ranking — the metrics service's
    * bottleneck collector (collectors/traces.py:83): spans past the
    * slow threshold, per (service, span): occurrences, mean and p95
    * latency, and TOTAL time consumed (the ranking key — a moderately
    * slow op that runs constantly outranks a rare very-slow one);
    * HAVING ≥ 3, top-15 by total time. The reference's 1000 ms gate
    * rescales to the composed duration distribution (its p99 is
    * ~224 ms) — the threshold is a calibration parameter, the shape is
    * the semantics. Filter is pushed into the scan side of the one
    * aggregation shuffle.
    */
  def spanBottlenecks(s: SparkSession, dir: String, slowMs: Double = 200,
                      minCount: Int = 3, limit: Int = 15): DataFrame =
    spanBottlenecksOn(composeOtelTraces(s, dir), slowMs, minCount, limit)

  /** ot06 over any otel-trace-shaped frame. */
  def spanBottlenecksOn(traces: DataFrame, slowMs: Double = 200,
                        minCount: Int = 3, limit: Int = 15): DataFrame =
    traces
      .withColumn("dur_c", cents(col("duration_ms")))
      .filter(col("duration_ms") > slowMs)
      .groupBy("service_name", "span_name")
      .agg(
        count(lit(1)).as("occurrences"),
        (microUnits(sum("dur_c"), count(lit(1)), 0) / 1e2).as("avg_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_ms"),
        (microUnits(sum("dur_c"), lit(1e3), 0) / 1e2).as("total_time_sec"))
      .filter(col("occurrences") >= minCount)
      .orderBy(col("total_time_sec").desc, col("service_name").asc, col("span_name").asc)
      .limit(limit)

  /** 008's materialized business-context columns: the six `alt.*`
    * attributes projected out of the map (absent keys read as '' like
    * a CH map default, so the columns are always populated).
    */
  def businessContext(logs: DataFrame): DataFrame = {
    val a = (k: String) => coalesce(element_at(col("attrs"), k), lit(""))
    // ev33 explode barrier (httpRequests' documented shape): the seven
    // extractions below otherwise each re-inline composeOtelLogs'
    // CASE-of-maps attrs construction per reference per row
    // (SimplifyExtractValueOps cannot collapse element_at over a CASE
    // of maps) — ONE struct behind a Generate builds it once
    logs.select(col("ts"), col("service_name"), col("severity_number"),
      explode(array(struct(
        a("alt.feed.id").as("feed_id"),
        a("alt.article.id").as("article_id"),
        a("alt.job.id").as("job_id"),
        a("alt.processing.stage").as("processing_stage"),
        a("alt.ai.pipeline").as("ai_pipeline"),
        a("alt.request.id").as("request_id"),
        coalesce(element_at(col("attrs"), "http.request.duration").try_cast("double"), lit(0.0))
          .as("duration_ms")))).as("x"))
      .select(col("ts"), col("service_name"), col("severity_number"),
        col("x.feed_id").as("feed_id"), col("x.article_id").as("article_id"),
        col("x.job_id").as("job_id"),
        col("x.processing_stage").as("processing_stage"),
        col("x.ai_pipeline").as("ai_pipeline"),
        col("x.request_id").as("request_id"),
        col("x.duration_ms").as("duration_ms"))
  }

  /** ev34: the drilldown the 008 columns exist for — per (AIPipeline,
    * ProcessingStage): volume, severe-error rate, p50/p95 latency in
    * exact centi-ms units, and the group's top feed by error count
    * (ties to the lexically-first feed). The per-feed error rollup is
    * bounded by |pipelines|·|stages|·|feeds|, so the argmax window
    * never sees corpus-scale rows.
    */
  def ev34(s: SparkSession, dir: String): DataFrame = {
    val ctx = businessContext(composeOtelLogs(s, dir))
      .withColumn("dur_c", cents(col("duration_ms")))
      .withColumn("is_err", when(col("severity_number") >= 17, 1L).otherwise(0L))
    val perGroup = ctx.groupBy("ai_pipeline", "processing_stage")
      .agg(
        count(lit(1)).as("n_logs"),
        sum("is_err").as("n_errors"),
        microRatio(sum("is_err"), count(lit(1)), 4).as("error_rate"),
        (round(expr("percentile(dur_c, 0.5)"), 0).cast("long") / 1e2).as("p50_ms"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_ms"))
    val perFeed = ctx.groupBy("ai_pipeline", "processing_stage", "feed_id")
      .agg(sum("is_err").as("feed_errors"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ai_pipeline", "processing_stage")
      .orderBy(col("feed_errors").desc, col("feed_id").asc)
    val topFeed = perFeed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("ai_pipeline"), col("processing_stage"),
        col("feed_id").as("top_feed"), col("feed_errors").as("top_feed_errors"))
    perGroup.join(topFeed, Seq("ai_pipeline", "processing_stage"))
  }
}
