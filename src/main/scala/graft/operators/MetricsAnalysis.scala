package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Numeric.{microRatio, microUnits}

/** The metrics service's analysis layer (metrics/src/alt_metrics/
  * analysis.py) — the pure functions `alt-metrics analyze` runs over
  * the collector frames AFTER collection. hs01/hs02 map the sibling
  * ClickHouse-script scorer; this file maps analysis.py's two
  * remaining outputs:
  *
  *  - eb01: calculate_error_budget (:104) + the analyze_health overall
  *    rollup (:203) — the Google-SRE error budget over the corpus-wide
  *    error rate: budget = 100 − SLO target, consumption percent,
  *    exceeded/critical(≥80%)/warning(≥50%)/healthy ladder, with the
  *    zero-budget division guard (:129).
  *  - hw01: analyze_health's critical-issue / warning / recommendation
  *    battery (:222, _collect_warnings :261, _collect_recommendations
  *    :334) — eleven deterministic rules over the bounded collector
  *    frames, emitted as structured rows (section, rule, rank,
  *    subject, value_1, value_2) instead of the reference's rendered
  *    Japanese strings: the selection logic, ordering, thresholds and
  *    numbers are the semantics; string templating is presentation.
  *
  * Scale: eb01 is ONE map-side-combined aggregation of the log fact.
  * hw01 composes each underlying view ONCE (the otel log and trace
  * facts are each persisted and every rule's collector runs over the
  * cached fact), and every rule then operates on a collector output
  * bounded by |services|, |services|², or a LIMIT — the unions are
  * driver-cheap frames, never corpus-scale. All threshold gates sit on
  * exact integer units (milli-percent budget, 1e-1 consumption units)
  * so no status ladder can flip on a double.
  */
object MetricsAnalysis {

  /** eb01: the error-budget row. slo_target defaults to the reference's
    * HealthThresholds.slo_availability_target (config.py:44 — 99.9).
    */
  def errorBudget(s: SparkSession, dir: String, sloTarget: Double = 99.9): DataFrame =
    errorBudgetOn(OtelLogs.composeOtelLogs(s, dir), sloTarget)

  /** eb01 over any otel-log-shaped frame. */
  def errorBudgetOn(logs: DataFrame, sloTarget: Double = 99.9): DataFrame = {
    // budget in exact milli-percent units: 100 − 99.9 computed as
    // integers (the double subtraction is 0.09999999999999858)
    val budgetM = math.round((100.0 - sloTarget) * 1000)
    val severe = col("severity_text").isin("ERROR", "FATAL")
    val agg = logs.agg(
      count(lit(1)).as("n"),
      count(when(severe, 1)).as("n_err"),
      (floor((unix_timestamp(max("ts")) - unix_timestamp(min("ts"))) / 3600) + 1)
        .cast("long").as("hours_analyzed"))
    val consumedM = microUnits(col("n_err") * lit(100000L), col("n"), 0)
    // consumption in tenths of a percent of the budget; the :129
    // zero-budget guard maps to the constant branches
    val pct10 =
      if (budgetM > 0) microUnits(consumedM * lit(1000L), lit(budgetM), 0)
      else when(consumedM > 0, lit(1000L)).otherwise(lit(0L))
    agg.select(
      lit(sloTarget).as("slo_target"),
      (lit(budgetM) / 1e3).as("budget_total"),
      (consumedM / 1e3).as("budget_consumed"),
      (greatest(lit(0L), lit(budgetM) - consumedM) / 1e3).as("budget_remaining"),
      (pct10 / 1e1).as("consumption_pct"),
      (consumedM > budgetM).as("is_exceeded"),
      when(consumedM > budgetM, "exceeded")
        .when(pct10 >= 800, "critical")
        .when(pct10 >= 500, "warning")
        .otherwise("healthy").as("status"),
      col("hours_analyzed"))
  }

  private def row(section: String, rule: String, rank: Column, subject: Column,
                  v1: Column, v2: Column): Column =
    struct(lit(section).as("section"), lit(rule).as("rule"),
      rank.cast("long").as("rank"), subject.cast("string").as("subject"),
      v1.cast("double").as("value_1"), v2.cast("double").as("value_2"))

  /** The first-N names of a bounded frame joined ', ' in a given
    * order — the reference's `", ".join(s.name for s in xs[:n])`.
    */
  private def joinedTopNames(df: DataFrame, name: Column, order: Seq[Column],
                             n: Int): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.select(name.as("nm"), row_number().over(w).as("rn"))
      .filter(col("rn") <= n)
      .agg(array_join(transform(array_sort(collect_list(struct(col("rn"), col("nm")))),
        x => x.getField("nm")), ", ").as("names"),
        count(lit(1)).as("n_top"))
  }

  /** hw01: the issue/warning/recommendation battery as structured
    * rows, ordered (section, rule, rank).
    */
  def healthWarnings(s: SparkSession, dir: String): DataFrame =
    healthWarningsOn(OtelLogs.composeOtelLogs(s, dir),
      OtelLogs.composeOtelTraces(s, dir))

  /** hw01 over pre-composed log + trace facts. The log fact caches in
    * its EXTRACTED form — the attribute map is parsed once into plain
    * columns before the persist, and the rules' shared views rebuild a
    * ten-key map from those cached columns (cheap: no payload regexp,
    * no 20-entry construction) so the existing collector bodies run
    * unchanged. Every rule frame below is bounded by |services|,
    * |services|² or a LIMIT.
    */
  def healthWarningsOn(logsRaw: DataFrame, tracesRaw: DataFrame): DataFrame = {
    // every key the collector bodies can read comes along — a future
    // rule reusing a user/client-consuming collector must not silently
    // see '' where the raw fact had values
    val a = (k: String) => element_at(col("attrs"), k)
    // ev33's explode barrier, applied locally (the ev34 lesson: a
    // source-level barrier regresses attrs-free consumers): the narrow
    // extraction below reads `attrs` through ELEVEN element_at
    // references, and composeOtelLogs builds attrs as a CASE of maps —
    // without the barrier CollapseProject re-inlines the ~20-entry map
    // construction into every reference, rebuilding it 11× per row
    val logsB = logsRaw.select(explode(array(struct(
        col("service_name"), col("severity_text"), col("severity_number"),
        col("ts"), col("body"), col("trace_id"), col("span_id"),
        col("attrs")))).as("x"))
      .select(col("x.service_name").as("service_name"),
        col("x.severity_text").as("severity_text"),
        col("x.severity_number").as("severity_number"),
        col("x.ts").as("ts"), col("x.body").as("body"),
        col("x.trace_id").as("trace_id"), col("x.span_id").as("span_id"),
        col("x.attrs").as("attrs"))
    val narrow = logsB.select(col("service_name"), col("severity_text"),
      col("severity_number"), col("ts"), col("body"),
      col("trace_id"), col("span_id"),
      a("http.method").as("m_"), a("http.route").as("r_"),
      a("http.status_code").as("s_"), a("http.request.duration").as("d_"),
      a("http.response.body.size").as("b_"),
      a("user.id").as("u_"), a("http.client_ip").as("ip_"),
      a("http.user_agent").as("ua_"),
      a("exception.type").as("et_"), a("exception.message").as("em_")).persist()
    val logs = narrow.withColumn("attrs", map(
      lit("http.method"), col("m_"), lit("http.route"), col("r_"),
      lit("http.status_code"), col("s_"), lit("http.request.duration"), col("d_"),
      lit("http.response.body.size"), col("b_"),
      lit("user.id"), col("u_"), lit("http.client_ip"), col("ip_"),
      lit("http.user_agent"), col("ua_"),
      lit("exception.type"), col("et_"), lit("exception.message"), col("em_")))
    val traces = tracesRaw.persist()

    // service_stats order (base.py:41): error_rate DESC, total_logs
    // DESC — the order every [:n] take below slices
    val statsOrder = Seq(col("error_rate").desc, col("total_logs").desc,
      col("service_name").asc)
    val sh = HealthScore.serviceHealthOn(logs)
      .withColumn("stats_rn", row_number().over(Window.orderBy(statsOrder: _*)))
      .persist()

    // C1 (:222): every service with score < 50, in service_stats order
    val c1 = sh.filter(col("health_score") < 50)
      .select(row("critical", "service_critical",
        row_number().over(Window.orderBy(col("stats_rn"))),
        col("service_name"), col("error_rate"), col("p95_ms")).as("r"))

    // C2 (:294): SLO-violation rollup — count of violating periods
    // (the collector's top-50 frame, as the reference len()s it) and
    // distinct affected services
    val c2 = HealthScore.sloViolationsOn(logs)
      .agg(count(lit(1)).as("n_viol"), countDistinct("service_name").as("n_svc"))
      .filter(col("n_viol") > 0)
      .select(row("critical", "slo_violations", lit(1), lit(""),
        col("n_viol"), col("n_svc")).as("r"))

    // W1 (:275): services with error_rate > warning threshold — ONE
    // row naming the first three
    val highErr = sh.filter(col("error_rate") > 1.0)
    val w1 = joinedTopNames(highErr, col("service_name"),
      Seq(col("stats_rn").asc), 3)
      .filter(col("n_top") > 0)
      .select(row("warning", "high_error_services", lit(1), col("names"),
        col("n_top"), lit(1.0)).as("r"))

    // W2 (:280): the TOP bottleneck only
    val w2 = OtelLogs.spanBottlenecksOn(traces).limit(1)
      .select(row("warning", "bottleneck", lit(1),
        concat(col("service_name"), lit("/"), col("span_name")),
        col("p95_ms"), col("total_time_sec")).as("r"))

    // W3 (:287): per-service 5xx rate > 1%, first three in the
    // distribution's volume order, ONE ROW EACH
    val w3 = Collectors.httpStatusDistributionOn(OtelLogs.httpRequests(logs))
      .filter(col("error_5xx_rate") > 1)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("total_requests").desc, col("service").asc)))
      .filter(col("rn") <= 3)
      .select(row("warning", "http_5xx", col("rn"),
        col("service"), col("error_5xx_rate"), col("total_requests")).as("r"))

    // W4 (:302): the TOP error span only
    val w4 = Collectors.errorSpansOn(traces).limit(1)
      .select(row("warning", "error_span", lit(1),
        concat(col("service"), lit("/"), col("operation")),
        col("error_count"), col("avg_duration_ms")).as("r"))

    // W5 (:308): dependencies with >10 calls and >5% errors, first two
    // in the collector's volume order, error percent at 1 dp
    val w5 = Collectors.serviceDependenciesOn(traces)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("call_count").desc, col("caller").asc, col("callee").asc)))
      .filter(col("call_count") > 10 && col("error_count") * 20 > col("call_count"))
      .withColumn("pick", row_number().over(Window.orderBy(col("rn"))))
      .filter(col("pick") <= 2)
      .select(row("warning", "dependency_errors", col("pick"),
        concat(col("caller"), lit(" -> "), col("callee")),
        microRatio(col("error_count") * 100, col("call_count"), 1),
        col("call_count")).as("r"))

    // W6 (:317): per-service volume spike — the two most recent hours
    // of the volume-trend frame, flagged when recent > 2 × previous
    val vt = Collectors.logVolumeTrendsOn(logs)
      .withColumn("rn", row_number().over(
        Window.partitionBy("service").orderBy(col("hour").desc)))
      .filter(col("rn") <= 2)
      .groupBy("service")
      .agg(max(when(col("rn") === 1, col("log_count"))).as("recent"),
        max(when(col("rn") === 2, col("log_count"))).as("previous"))
    val w6 = vt.filter(col("previous") > 0 && col("recent") > col("previous") * 2)
      .select(row("warning", "volume_spike",
        row_number().over(Window.orderBy(col("service"))),
        col("service"), col("recent"),
        microRatio(col("recent"), col("previous"), 1)).as("r"))

    // R1 (:343): count of endpoints past the latency warning threshold
    val r1 = OtelLogs.apiPerformanceOn(traces)
      .agg(count(when(col("p95_ms") > 1000, 1)).as("n_slow"))
      .filter(col("n_slow") > 0)
      .select(row("recommendation", "slow_apis", lit(1), lit(""),
        col("n_slow"), lit(1000.0)).as("r"))

    // R2 (:350): the TOP error type only
    val r2 = OtelLogs.errorTypesOn(logs).limit(1)
      .select(row("recommendation", "top_error_type", lit(1),
        concat(col("service_name"), lit("/"), col("error_type")),
        col("error_count"), lit(0.0)).as("r"))

    // R3 (:356): stale services (gap > 5 min) — ONE row naming the
    // first three in service_stats order
    val stale = sh.filter(col("minutes_since_last_log") > 5)
    val r3 = joinedTopNames(stale, col("service_name"), Seq(col("stats_rn").asc), 3)
      .filter(col("n_top") > 0)
      .select(row("recommendation", "stale_services", lit(1), col("names"),
        col("n_top"), lit(5.0)).as("r"))

    val out = Seq(c1, c2, w1, w2, w3, w4, w5, w6, r1, r2, r3)
      .map(_.select(col("r.section"), col("r.rule"), col("r.rank"),
        col("r.subject"), col("r.value_1"), col("r.value_2")))
      .reduce(_ unionAll _)
      .orderBy(col("section").asc, col("rule").asc, col("rank").asc)
    // ≤ ~15 rows — materialize so the caches can release eagerly;
    // release on FAILURE too (a thrown collect must not pin three
    // corpus-scale caches for the session; unpersist is idempotent)
    def release(): Unit = {
      sh.unpersist(); narrow.unpersist(); traces.unpersist()
    }
    try Dedup.materialized(out) { release() }
    catch { case t: Throwable => release(); throw t }
  }
}
