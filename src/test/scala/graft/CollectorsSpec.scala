package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Rule-per-case specs for the alt_metrics collector completion batch
  * (mt01-mt06, sat01, sat02) — planted frames exercising each gate,
  * cast and rounding rule, plus sf0.001 composition invariants.
  */
class CollectorsSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("mt01: empty route dropped, status classes partition parsed rows, NA-status in total only") {
    val http = Seq(
      // svc a, route /x: 4 ok + 1 500 + 1 unparseable(0)
      ("a", "/x", 200, 100L, 10.0), ("a", "/x", 200, 100L, 20.0),
      ("a", "/x", 204, 100L, 30.0), ("a", "/x", 299, 100L, 40.0),
      ("a", "/x", 500, 100L, 50.0), ("a", "/x", 0, 100L, 60.0),
      // svc a, empty route — must vanish
      ("a", "", 200, 1L, 1.0),
      ("b", "/y", 404, 10L, 5.0))
      .toDF("service_name", "http_route", "http_status_code", "response_size", "request_duration")
    val out = Collectors.httpEndpointStatsOn(http).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(6),
        r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    // a/x: 6 rows, error_rate = round(1*100*100/6)/100 = 16.67, 4 2xx, 0 4xx, 1 5xx
    assert(out == Seq(
      ("a", "/x", 6L, 16.67, 4L, 0L, 1L),
      ("b", "/y", 1L, 100.0, 0L, 1L, 0L)))
  }

  test("mt02: unparseable status lands in the total but no 2xx..5xx class") {
    val http = Seq(
      ("a", "/x", 0, 0L, 0.0), ("a", "/x", 200, 0L, 0.0),
      ("a", "/x", 301, 0L, 0.0), ("a", "/x", 404, 0L, 0.0),
      ("a", "/x", 503, 0L, 0.0))
      .toDF("service_name", "http_route", "http_status_code", "response_size", "request_duration")
    val r = Collectors.httpStatusDistributionOn(http).head()
    assert(r.getAs[Long]("total_requests") == 5L)
    assert(Seq("status_2xx", "status_3xx", "status_4xx", "status_5xx")
      .map(r.getAs[Long]) == Seq(1L, 1L, 1L, 1L))
    assert(r.getAs[Double]("error_5xx_rate") == 20.0)
  }

  test("mt03: 200-char body clip, '' exception type maps to '-', newest-first cut") {
    val errors = Seq(
      ("a", "ERROR", "x" * 250, "", t(2)),
      ("b", "FATAL", "boom", "E1", t(1)),
      ("c", "ERROR", "older", "E2", t(0)))
      .toDF("service_name", "severity_text", "body", "exception_type", "ts")
    val out = Collectors.recentErrorsOn(errors, limit = 2).collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("service") == "a")
    assert(out(0).getAs[String]("message").length == 200)
    assert(out(0).getAs[String]("error_type") == "-")
    assert(out(1).getAs[String]("service") == "b") // t(0) row cut by the limit
    assert(out(0).getAs[String]("event_time") > out(1).getAs[String]("event_time"))
  }

  test("mt04: hourly buckets carry severe rate; busiest-first within an hour") {
    val logs = Seq(
      ("a", 9, t(0)), ("a", 17, t(1)), ("a", 21, t(2)),        // hour 0: 3 rows, 2 severe
      ("b", 9, t(5)), ("b", 9, t(6)), ("b", 9, t(7)), ("b", 9, t(8)), // hour 0: 4 rows, 0 severe
      ("a", 9, t(61)))                                          // hour 1
      .toDF("service_name", "severity_number", "ts")
    val out = Collectors.logVolumeTrendsOn(logs).collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("service") == "a" && out(0).getAs[Long]("log_count") == 1L) // newest hour first
    assert(out(1).getAs[String]("service") == "b" && out(1).getAs[Long]("log_count") == 4L) // busiest first
    assert(out(2).getAs[Double]("error_rate") == 66.67) // round(2*100*100/3)/100
  }

  test("mt05: per-(service, kind) stats; ERROR status counted, OK not") {
    val traces = Seq(
      ("a", "SERVER", 10.0, "ERROR"), ("a", "SERVER", 30.0, "OK"),
      ("a", "CLIENT", 5.0, "OK"))
      .toDF("service_name", "span_kind", "duration_ms", "status_code")
    val out = Collectors.spanTypeStatsOn(traces).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(5))).toSeq
    assert(out == Seq(("a", "SERVER", 2L, 20.0, 1L), ("a", "CLIENT", 1L, 5.0, 0L)))
  }

  test("mt06: the 5-minute mean averages per-minute integer units, not re-rounded doubles") {
    // two minutes in one 5-min bucket: rates 1/3 and 2/3 → units 3333+6667,
    // mean = round(10000/2)/1e4 = 0.5 EXACTLY; throughput = (3+3)/2 = 3.0
    val logs = Seq(
      ("a", 17, t(0)), ("a", 9, t(0)), ("a", 9, t(0)),
      ("a", 17, t(1)), ("a", 17, t(1)), ("a", 9, t(1)))
      .toDF("service_name", "severity_number", "ts")
    val out = Collectors.sliTrendsOn(logs).collect()
      .map(r => (r.getString(1), r.getString(2), r.getDouble(3))).toSeq
    assert(out == Seq(("a", "error_rate", 0.5), ("a", "log_throughput", 3.0)))
  }

  test("sat01: both sections from one service frame; sample floor drops thin services") {
    val traces = ((1 to 12).map(i => ("big", "op0", "SERVER", 1000.0 * i, "OK", t(i))) :+
      ("thin", "op0", "SERVER", 5.0, "OK", t(1)))
      .toDF("service_name", "span_name", "span_kind", "duration_ms", "status_code", "ts")
    val out = Collectors.resourceUtilizationOn(traces).collect()
    assert(out.map(_.getString(0)).distinct.toSeq == Seq("big")) // thin < 10 samples
    val byType = out.map(r => r.getString(1) -> r).toMap
    // avg seconds = round(sum(dur_c)/(1000*12))/100 = mean(1..12)=6.5 s
    assert(byType("trace_duration_sec").getAs[Double]("avg_utilization") == 6.5)
    assert(byType("trace_duration_sec").getAs[Double]("max_utilization") == 12.0)
    // span = 11 min → hours_analyzed = 1; throughput = 12/1
    assert(byType("throughput").getAs[Double]("avg_utilization") == 12.0)
    assert(byType("throughput").getAs[Double]("max_utilization") == 0.0)
  }

  test("sat02: LIKE battery keeps queue/worker/process labels only; max truncates toward zero") {
    val traces = (
      (1 to 6).map(i => ("a", "op1", 10.9, t(i))) ++  // article-queue-pop — kept
      (1 to 6).map(i => ("a", "op0", 99.0, t(i))) ++  // db-query — dropped by LIKE
      (1 to 4).map(i => ("a", "op2", 5.0, t(i))))     // worker-dispatch — dropped by floor(4<5)
      .toDF("service_name", "span_name", "duration_ms", "ts")
    val out = Collectors.queueSaturationOn(traces).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("queue_name") == "article-queue-pop")
    assert(r.getAs[Long]("max_wait_time_ms") == 10L) // floor(10.9), CH toInt64 semantics
    assert(r.getAs[Double]("avg_wait_time_ms") == 10.9)
  }

  test("mt07: worst-errors-first within an hour (the mt04 sibling's distinct ranking)") {
    val logs = Seq(
      ("a", "ERROR", t(0)), ("a", "INFO", t(1)),                  // 1 err of 2
      ("b", "INFO", t(2)), ("b", "INFO", t(3)), ("b", "FATAL", t(4)), ("b", "FATAL", t(5)))
      .toDF("service_name", "severity_text", "ts")
    val out = Collectors.errorTrendsOn(logs).collect()
    assert(out.map(_.getAs[String]("service")).toSeq == Seq("b", "a")) // 2 errors before 1
    assert(out(0).getAs[Double]("error_rate") == 50.0)
  }

  test("mt08: only ERROR spans group; caller message splits groups; last occurrence is the max") {
    val traces = Seq(
      ("a", "op1", "ERROR", "boom-0", 10.0, t(0)),
      ("a", "op1", "ERROR", "boom-0", 30.0, t(7)),
      ("a", "op1", "ERROR", "boom-1", 50.0, t(3)),
      ("a", "op1", "OK", "", 99.0, t(9)))
      .toDF("service_name", "span_name", "status_code", "status_message", "duration_ms", "ts")
    val out = Collectors.errorSpansOn(traces).collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("error_message") == "boom-0")
    assert(out(0).getAs[Long]("error_count") == 2L)
    assert(out(0).getAs[Double]("avg_duration_ms") == 20.0)
    assert(out(0).getAs[String]("last_occurrence") == "2023-11-14 22:20:20") // t(7), the max

  }

  test("mt09: parent-chain edges only, caller latency aggregated, same-service and cross-trace pairs dropped") {
    val traces = Seq(
      // trace T: s1 (svc a) ← s2 (svc b): one cross-service edge, caller dur 100
      ("T", "s1", null, "a", 100.0, "ERROR"),
      ("T", "s2", "s1", "b", 7.0, "OK"),
      // same-service edge: dropped
      ("T", "s3", "s2", "b", 1.0, "OK"),
      // dangling parent in ANOTHER trace: no edge (join needs same trace)
      ("U", "s9", "s1", "c", 1.0, "OK"))
      .toDF("trace_id", "span_id", "parent_span_id", "service_name", "duration_ms", "status_code")
    val out = Collectors.serviceDependenciesOn(traces).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[String]("caller"), r.getAs[String]("callee")) == ("a", "b"))
    assert(r.getAs[Long]("call_count") == 1L)
    assert(r.getAs[Double]("avg_duration_ms") == 100.0) // the CALLER span's duration
    assert(r.getAs[Long]("error_count") == 1L)          // the caller's status
  }

  test("composition invariants at sf0.001: totals conserved across the collector family") {
    val logs = OtelLogs.composeOtelLogs(spark, sfDir)
    val nAll = logs.count()
    val nHttp = OtelLogs.httpRequests(logs).count()
    val nErr = OtelLogs.errorLogs(logs).count()
    // mt02 totals = the http fact row count (clicks excluded, NA kept)
    val mt02 = Collectors.httpStatusDistribution(spark, sfDir).collect()
    assert(mt02.map(_.getAs[Long]("total_requests")).sum == nHttp)
    // mt04 volume sums to the full log fact
    val mt04 = Collectors.logVolumeTrends(spark, sfDir).collect()
    assert(mt04.map(_.getAs[Long]("log_count")).sum == nAll)
    assert(mt04.map(_.getAs[Long]("error_count")).sum == nErr)
    // mt05 span counts sum to the trace fact
    val mt05 = Collectors.spanTypeStats(spark, sfDir).collect()
    assert(mt05.map(_.getAs[Long]("span_count")).sum == nAll)
    assert(mt05.map(_.getString(1)).toSet == Set("SERVER", "CLIENT", "INTERNAL"))
    // sat01 trace_duration sample counts cover every service (all ≥ 10 here)
    val sat01 = Collectors.resourceUtilization(spark, sfDir).collect()
    assert(sat01.filter(_.getString(1) == "trace_duration_sec")
      .map(_.getAs[Long]("sample_count")).sum == nAll)
    // sat02 keeps only the three queue-ish labels
    val sat02 = Collectors.queueSaturation(spark, sfDir).collect()
    assert(sat02.map(_.getAs[String]("queue_name")).toSet
      .subsetOf(Set("article-queue-pop", "worker-dispatch", "process-batch")))
  }
}
