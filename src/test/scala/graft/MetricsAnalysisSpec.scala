package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the analysis.py layer: eb01's error-budget ladder (every
  * status branch + the zero-budget guard) and hw01's eleven-rule
  * battery over a planted two-service incident scenario.
  */
class MetricsAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def logsFrame(rows: Seq[(String, String, Int, Timestamp, Map[String, String])]) =
    rows.toDF("service_name", "severity_text", "severity_number", "ts", "attrs")
      .withColumn("trace_id", lit("t0")).withColumn("span_id", lit("s0"))
      .withColumn("body", concat(col("service_name"), lit(" event")))

  test("eb01: status ladder — exceeded, critical, warning, healthy on exact integer boundaries") {
    def budget(total: Int, errors: Int, slo: Double = 99.9) = {
      val rows = (1 to total).map(i =>
        (if (i <= errors) "ERROR" else "INFO", t(0)))
      MetricsAnalysis.errorBudgetOn(rows.toDF("severity_text", "ts"), slo).head()
    }
    // 20 errors of 100 → consumed 20% ≫ 0.1% budget → exceeded, remaining floored at 0
    val ex = budget(100, 20)
    assert(ex.getAs[String]("status") == "exceeded" && ex.getAs[Boolean]("is_exceeded"))
    assert(ex.getAs[Double]("budget_remaining") == 0.0)
    assert(ex.getAs[Double]("budget_consumed") == 20.0)
    // 9 errors of 10000 → 90 milli-% of the 100 milli-% budget → 90% critical
    val cr = budget(10000, 9)
    assert(cr.getAs[String]("status") == "critical" && !cr.getAs[Boolean]("is_exceeded"))
    assert(cr.getAs[Double]("consumption_pct") == 90.0)
    assert(cr.getAs[Double]("budget_remaining") == 0.01)
    // 6 errors of 10000 → 60% consumption → warning
    assert(budget(10000, 6).getAs[String]("status") == "warning")
    // 1 error of 10000 → 10% → healthy
    assert(budget(10000, 1).getAs[String]("status") == "healthy")
    // the :129 zero-budget guard: slo 100 → any error is exceeded at 100%
    val zb = budget(100, 1, slo = 100.0)
    assert(zb.getAs[String]("status") == "exceeded")
    assert(zb.getAs[Double]("consumption_pct") == 100.0)
    assert(budget(100, 0, slo = 100.0).getAs[String]("status") == "healthy")
  }

  test("hw01: every rule fires once on the planted two-service incident") {
    val now = 200 // minutes; "fine" stays fresh, "sick" goes stale
    val httpSick = Map("http.method" -> "GET", "http.route" -> "/api/x",
      "http.status_code" -> "500", "http.request.duration" -> "20000.0",
      "http.response.body.size" -> "1")
    val httpFine = Map("http.method" -> "GET", "http.route" -> "/api/y",
      "http.status_code" -> "200", "http.request.duration" -> "10.0",
      "http.response.body.size" -> "1")
    val exca = Map.empty[String, String]
    // sick: 20 rows in ONE 5-min bucket at t(0..4), 15 severe (75% error
    // rate, SLO violation, health 0, stale vs now=t(200))
    val sickRows = (1 to 20).map(i =>
      ("sick", if (i <= 15) "ERROR" else "INFO", if (i <= 15) 17 else 9,
        t(i % 5), if (i <= 15) exca else httpSick))
    // fine: hour 2 has 2 rows, hour 3 (its most recent) has 5 → spike ×2.5
    val fineRows = (1 to 2).map(i => ("fine", "INFO", 9, t(120 + i), httpFine)) ++
      (1 to 4).map(i => ("fine", "INFO", 9, t(180 + i), httpFine)) :+
      ("fine", "INFO", 9, t(now), httpFine)
    val logs = logsFrame(sickRows ++ fineRows)

    // traces: a slow hot span (bottleneck + slow api), an error span,
    // and a 12-call dependency edge with 2 caller errors (16.7% > 5%)
    val depParents = (1 to 12).map(i =>
      ("T" + i, "p" + i, null, "alt-backend", "op-slow", 2000.0,
        if (i <= 2) "ERROR" else "OK", if (i <= 2) "boom-dep" else "", t(i)))
    val depChildren = (1 to 12).map(i =>
      ("T" + i, "c" + i, "p" + i, "auth-hub", "op-child", 1.0, "OK", "", t(i)))
    val traces = (depParents ++ depChildren)
      .toDF("trace_id", "span_id", "parent_span_id", "service_name",
        "span_name", "duration_ms", "status_code", "status_message", "ts")

    val out = MetricsAnalysis.healthWarningsOn(logs, traces).collect()
    val byRule = out.groupBy(_.getAs[String]("rule"))
    assert(byRule.keySet == Set("service_critical", "slo_violations",
      "high_error_services", "bottleneck", "http_5xx", "error_span",
      "dependency_errors", "volume_spike", "slow_apis", "top_error_type",
      "stale_services"))

    val c1 = byRule("service_critical").head
    assert(c1.getAs[String]("subject") == "sick" && c1.getAs[Double]("value_1") == 75.0)
    val c2 = byRule("slo_violations").head
    // t(0..4) straddles a 5-min bucket boundary (the base anchor is
    // 22:13:20) → two violating buckets, one affected service
    assert(c2.getAs[Double]("value_1") == 2.0 && c2.getAs[Double]("value_2") == 1.0)
    assert(byRule("high_error_services").head.getAs[String]("subject") == "sick")
    val w2 = byRule("bottleneck").head
    assert(w2.getAs[String]("subject") == "alt-backend/op-slow")
    assert(w2.getAs[Double]("value_1") == 2000.0) // p95 of the hot span
    val w3 = byRule("http_5xx").head
    assert(w3.getAs[String]("subject") == "sick" && w3.getAs[Double]("value_1") == 100.0)
    val w4 = byRule("error_span").head
    assert(w4.getAs[String]("subject") == "alt-backend/op-slow" && w4.getAs[Double]("value_1") == 2.0)
    val w5 = byRule("dependency_errors").head
    assert(w5.getAs[String]("subject") == "alt-backend -> auth-hub")
    assert(w5.getAs[Double]("value_1") == 16.7) // round(2*1000/12)/10
    assert(w5.getAs[Double]("value_2") == 12.0)
    val w6 = byRule("volume_spike").head
    assert(w6.getAs[String]("subject") == "fine")
    assert(w6.getAs[Double]("value_2") == 2.5) // recent 5 vs previous 2
    assert(byRule("slow_apis").head.getAs[Double]("value_1") == 1.0) // only op-slow clears 1000ms at n>=5
    assert(byRule("stale_services").head.getAs[String]("subject") == "sick")
  }

  test("hw01: a healthy quiet corpus emits no critical rows and no spike") {
    val logs = logsFrame((1 to 30).map(i =>
      ("calm", "INFO", 9, t(i), Map("http.method" -> "GET", "http.route" -> "/api/z",
        "http.status_code" -> "200", "http.request.duration" -> "5.0",
        "http.response.body.size" -> "1"))))
    val traces = (1 to 6).map(i =>
      ("T", "s" + i, null, "calm", "op-fast", 10.0, "OK", "", t(i)))
      .toDF("trace_id", "span_id", "parent_span_id", "service_name",
        "span_name", "duration_ms", "status_code", "status_message", "ts")
    val out = MetricsAnalysis.healthWarningsOn(logs, traces).collect()
    assert(!out.exists(_.getAs[String]("section") == "critical"))
    assert(!out.exists(_.getAs[String]("rule") == "volume_spike"))
    assert(!out.exists(_.getAs[String]("rule") == "slow_apis"))
  }

  test("eb01/hw01 compose at sf0.001: ranks contiguous per rule, budget fields consistent") {
    val eb = MetricsAnalysis.errorBudget(spark, sfDir).head()
    assert(eb.getAs[Double]("budget_total") == 0.1)
    val consumed = eb.getAs[Double]("budget_consumed")
    val remaining = eb.getAs[Double]("budget_remaining")
    assert(remaining == math.max(0.0, 0.1 - consumed) || remaining == 0.0)
    assert(eb.getAs[Boolean]("is_exceeded") == (consumed > 0.1))
    val hw = MetricsAnalysis.healthWarnings(spark, sfDir).collect()
    hw.groupBy(_.getAs[String]("rule")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }
}
