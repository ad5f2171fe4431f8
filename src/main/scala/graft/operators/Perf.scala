package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{cents, microRatio, microRound}

/** alt-perf's measurement-analysis batteries as batch plans — the
  * reference's performance-measurement CLI computes all of its
  * statistics in-process over collected runs; these re-express the
  * same semantics over measurement facts at rest:
  *
  *  - pf01: alt-perf/src/measurement/statistics.ts `calculateStatistics`
  *    — count/mean/median/min/max + SAMPLE stdDev/variance (Welford's
  *    n−1 form re-expressed as exact decimal sums), interpolated
  *    p75/p90/p95/p99 (index = p·(n−1), linear between neighbors —
  *    Spark `percentile` / DuckDB `quantile_cont` both implement
  *    exactly this), the t-distribution 95% confidence interval with
  *    the table's closest-df-at-or-below lookup (statistics.ts:52
  *    T_CRITICAL_VALUES / :76 getTCriticalValue), IQR·1.5 outlier
  *    count (:263 detectOutliers, defined only for n ≥ 4), and the
  *    CV < 0.15 stability verdict (:300 isStable, mean==0 → stable
  *    iff stdDev==0).
  *  - pf02: alt-perf/src/commands/load.ts `runLoadTest` (:33) — the
  *    per-route load-test result: total/successful/failed requests,
  *    error rate, response-time min/max/mean/median/p95/p99 over the
  *    SUCCESSFUL requests only (load.ts pushes only `response.ok`
  *    timings into `results`), throughput = total/duration, the
  *    status-0 network-error bucket (:86), and the route pass verdict
  *    `errorRate < 0.01` (:219) with the report's overall score
  *    `round(passed/total·100)` (:223) emitted per route.
  *  - pf03: alt-perf/src/measurement/vitals.ts — threshold rating per
  *    Core-Web-Vitals metric (`getRating`:123 — null/0 → not-measured
  *    except CLS where 0 is a valid perfect score), the weighted
  *    overall score (`calculateScore`:250 — good=100 / needs-
  *    improvement=50 / poor=0, not-measured EXCLUDED from both sides
  *    of the weighted mean, weights lcp 25 / inp 25 / cls 15 / fcp 15
  *    / ttfb 20, thresholds from config/schema.ts:278), and the
  *    bottleneck count (`identifyBottlenecks`:286 — one per poor
  *    metric).
  *  - pf04: alt-perf/src/measurement/multi-run-collector.ts
  *    `calculateVitalStatistics` (:233) — per metric across runs:
  *    discard IQR outliers first (only when n ≥ 4, the collector's
  *    `discardOutliers` gate), then summarize the inliers
  *    (count/mean/median/min/max/stdDev/p95 + the CV stability
  *    verdict).
  *
  * Scale: every battery is one map-side-combined shuffle keyed by its
  * group (pf01 adds a second bounded pass for the outlier count: the
  * per-group IQR bounds frame is |groups| rows, broadcast back onto
  * the scan — never a self-join on values). All ratio/round sites use
  * the exact micro-unit discipline (values enter as centi-unit longs,
  * sums accumulate in decimal(38,0), one round at scale 0 at the
  * end), so results are order- and engine-independent. The quartile
  * bounds used for outlier gating interpolate at fractions k/4 —
  * exact dyadic rationals over integer cents, so the bound doubles
  * are EXACT on both engines and the boundary comparison cannot flip.
  */
object Perf {

  /** The t-distribution 95% critical value for df degrees of freedom,
    * per statistics.ts:52's table and :76's closest-df-at-or-below
    * rule (df beyond the last key keeps the last key's value).
    */
  def tCritical95(df: Column): Column =
    when(df >= 1000, 1.962).when(df >= 100, 1.984)
      .when(df >= 50, 2.009).when(df >= 40, 2.021)
      .when(df >= 30, 2.042).when(df >= 25, 2.060)
      .when(df >= 20, 2.086).when(df >= 15, 2.131)
      .when(df >= 10, 2.228).when(df >= 9, 2.262)
      .when(df >= 8, 2.306).when(df >= 7, 2.365)
      .when(df >= 6, 2.447).when(df >= 5, 2.571)
      .when(df >= 4, 2.776).when(df >= 3, 3.182)
      .when(df >= 2, 4.303).otherwise(12.706)

  /** SQL twin of [[tCritical95]] for the oracles. */
  def tCritical95Sql(df: String): String =
    s"""CASE WHEN ($df) >= 1000 THEN 1.962 WHEN ($df) >= 100 THEN 1.984
       WHEN ($df) >= 50 THEN 2.009 WHEN ($df) >= 40 THEN 2.021
       WHEN ($df) >= 30 THEN 2.042 WHEN ($df) >= 25 THEN 2.060
       WHEN ($df) >= 20 THEN 2.086 WHEN ($df) >= 15 THEN 2.131
       WHEN ($df) >= 10 THEN 2.228 WHEN ($df) >= 9 THEN 2.262
       WHEN ($df) >= 8 THEN 2.306 WHEN ($df) >= 7 THEN 2.365
       WHEN ($df) >= 6 THEN 2.447 WHEN ($df) >= 5 THEN 2.571
       WHEN ($df) >= 4 THEN 2.776 WHEN ($df) >= 3 THEN 3.182
       WHEN ($df) >= 2 THEN 4.303 ELSE 12.706 END"""

  /** pf01 core: the full calculateStatistics battery per group over a
    * centi-unit long measurement column `c`. Output values are in the
    * ORIGINAL unit (cents/100): mean/stdDev/variance/CI at 4 dp,
    * percentiles at 2 dp (the ev31 percentile discipline).
    */
  def runStatsOn(values: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val agg = values.groupBy(g: _*).agg(
      count(lit(1)).as("n"),
      sum(col("c").cast("decimal(38,0)")).as("d1"),
      sum((col("c") * col("c")).cast("decimal(38,0)")).as("d2"),
      min("c").as("min_c"), max("c").as("max_c"),
      expr("percentile(c, 0.5)").as("med_c"),
      expr("percentile(c, 0.75)").as("p75_c"),
      expr("percentile(c, 0.90)").as("p90_c"),
      expr("percentile(c, 0.95)").as("p95_c"),
      expr("percentile(c, 0.99)").as("p99_c"),
      expr("percentile(c, 0.25)").as("q1_c"),
      expr("percentile(c, 0.75)").as("q3_c"))
    // variance numerator n·Σx² − (Σx)² stays exact in decimal(38,0);
    // one conversion to double for the final ratio (the km05 MI
    // discipline). Sample variance needs n ≥ 2 — n = 1 pins the
    // reference's explicit zero-spread single-run shape.
    val varC2 = when(col("n") === 1, lit(0.0))
      .otherwise((col("n") * col("d2") - col("d1") * col("d1")).cast("double") /
        (col("n") * (col("n") - 1)))
    val meanU = col("d1").cast("double") / 100 / col("n")
    val sdU = sqrt(varC2) / 100
    val tVal = tCritical95(col("n") - 1)
    val margin = tVal * sdU / sqrt(col("n"))
    val pct2 = (c: Column) => round(c, 0).cast("long") / 1e2
    val stats = agg.select(
      g ++ Seq(
        col("n"),
        microRatio(col("d1").cast("double"), col("n") * 100, 4).as("mean"),
        pct2(col("med_c")).as("median"),
        (col("min_c") / 1e2).as("min"),
        (col("max_c") / 1e2).as("max"),
        microRound(sdU, 4).as("std_dev"),
        microRound(varC2 / 1e4, 4).as("variance"),
        pct2(col("p75_c")).as("p75"),
        pct2(col("p90_c")).as("p90"),
        pct2(col("p95_c")).as("p95"),
        pct2(col("p99_c")).as("p99"),
        microRound(when(col("n") === 1, meanU).otherwise(meanU - margin), 4).as("ci_lower"),
        microRound(when(col("n") === 1, meanU).otherwise(meanU + margin), 4).as("ci_upper"),
        when(col("n") === 1, lit(true))
          .when(meanU === 0, sdU === 0)
          .otherwise(sdU / abs(meanU) < 0.15).as("is_stable"),
        // exact dyadic IQR bounds (quartile fractions are k/4 over
        // integer cents) for the second-pass outlier count
        (col("q1_c") - lit(1.5) * (col("q3_c") - col("q1_c"))).as("lb"),
        (col("q3_c") + lit(1.5) * (col("q3_c") - col("q1_c"))).as("ub")): _*)
    // outlier count: |groups| bounds rows broadcast back onto the scan
    val bounds = stats.select(g ++ Seq(col("n"), col("lb"), col("ub")): _*)
    val outliers = values.join(broadcast(bounds), groupCols)
      .filter(col("n") >= 4 && (col("c") < col("lb") || col("c") > col("ub")))
      .groupBy(g: _*).agg(count(lit(1)).as("n_outliers"))
    stats.join(outliers, groupCols, "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .drop("lb", "ub")
  }

  /** pf01 adapter: the battery per (event_type, day) over the events
    * table's value column — the shape alt-perf produces per
    * (route, device) measurement session.
    */
  def pf01(s: SparkSession, dir: String): DataFrame =
    runStatsOn(
      Tables.events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          cents(col("value")).as("c")),
      Seq("event_type", "day"))

  /** The deterministic load-test log composed from the events table
    * (the ev31/ev33 composition precedent): one row per request,
    * status 0 = the network-error bucket load.ts keys under 0, 500 on
    * error events, 200 otherwise; response time = the value column.
    */
  def loadLogFromEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val k = coalesce(
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0))
    e.select(
      concat(lit("/api/"), col("event_type")).as("url"),
      when(pmod(k, lit(10)) === 0, 0)
        .when(col("event_type") === "error", 500).otherwise(200).as("status"),
      cents(coalesce(col("value"), lit(0.0))).as("rt_c"),
      col("ts"))
  }

  /** pf02: the per-route LoadTestResult. Response-time stats run over
    * successful (status 200) requests only; throughput divides total
    * requests by the route's observed wall span in seconds (the batch
    * analog of load.ts's totalDuration); `passed` is the report's
    * 1%-error-rate gate, evaluated on exact integers
    * (100·failed < total ⇔ failed/total < 1/100).
    */
  def loadReportOn(log: DataFrame): DataFrame = {
    val ok = col("status") === 200
    val pct2 = (c: Column) => round(c, 0).cast("long") / 1e2
    log.groupBy("url").agg(
      count(lit(1)).as("total_requests"),
      count(when(ok, 1)).as("successful_requests"),
      count(when(!ok, 1)).as("failed_requests"),
      count(when(col("status") === 0, 1)).as("n_network_errors"),
      count(when(col("status") >= 500, 1)).as("n_5xx"),
      min(when(ok, col("rt_c"))).as("min_c"),
      max(when(ok, col("rt_c"))).as("max_c"),
      sum(when(ok, col("rt_c")).cast("decimal(38,0)")).as("d1"),
      expr("percentile(if(status = 200, rt_c, null), 0.5)").as("med_c"),
      expr("percentile(if(status = 200, rt_c, null), 0.95)").as("p95_c"),
      expr("percentile(if(status = 200, rt_c, null), 0.99)").as("p99_c"),
      (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("span_s"))
    .select(
      col("url"), col("total_requests"), col("successful_requests"),
      col("failed_requests"),
      microRatio(col("failed_requests"), col("total_requests"), 4).as("error_rate"),
      // load.ts returns 0 (not null) for every response-time stat when
      // no request succeeded — the sorted array is empty and
      // calculateMean/calculatePercentile return 0 on []
      coalesce(col("min_c") / 1e2, lit(0.0)).as("min_ms"),
      coalesce(col("max_c") / 1e2, lit(0.0)).as("max_ms"),
      coalesce(microRatio(col("d1").cast("double"), col("successful_requests") * 100, 4),
        lit(0.0)).as("mean_ms"),
      coalesce(pct2(col("med_c")), lit(0.0)).as("median_ms"),
      coalesce(pct2(col("p95_c")), lit(0.0)).as("p95_ms"),
      coalesce(pct2(col("p99_c")), lit(0.0)).as("p99_ms"),
      when(col("span_s") > 0,
        microRatio(col("total_requests"), col("span_s"), 2)).as("throughput_rps"),
      col("n_network_errors"), col("n_5xx"),
      (col("failed_requests") * 100 < col("total_requests")).as("passed"))
  }

  def pf02(s: SparkSession, dir: String): DataFrame =
    loadReportOn(loadLogFromEvents(s, dir)).orderBy("url")

  // Core-Web-Vitals thresholds (config/schema.ts:278), in the exact
  // integer units each metric's value carries (centi-ms for the ms
  // metrics, 1e-4 units for CLS).
  private val VitalsThresholds: Map[String, (Long, Long)] = Map(
    "lcp" -> (250000L, 400000L), "inp" -> (20000L, 50000L),
    "cls" -> (1000L, 2500L), "fcp" -> (180000L, 300000L),
    "ttfb" -> (80000L, 180000L))
  private val VitalsWeights: Map[String, Int] =
    Map("lcp" -> 25, "inp" -> 25, "cls" -> 15, "fcp" -> 15, "ttfb" -> 20)

  /** Per-run vitals composed from the events table: one run per
    * (device, day); each metric derives from a different event-type
    * slice so sparse slices produce genuine not-measured runs. Values
    * are exact integer units: centi-ms for lcp/inp/fcp/ttfb, 1e-4
    * units for cls (the session's layout-shift share).
    */
  def vitalsRunsFromEvents(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val v = cents(coalesce(col("value"), lit(0.0)))
    val runs = e.select(
      when(pmod(coalesce(col("user_id"), lit(0L)), lit(2)) === 0, "desktop")
        .otherwise("mobile").as("device"),
      date_trunc("day", col("ts")).as("day"),
      col("event_type"), v.as("c"))
    runs.groupBy("device", "day").agg(
      // avg in exact units, one scale-0 round: round(20·Σc / n)
      round(lit(20) * sum(when(col("event_type") === "view", col("c"))) /
        count(when(col("event_type") === "view", 1)), 0).cast("long").as("lcp_c"),
      (max(when(col("event_type") === "click", col("c"))) * 2).as("inp_c"),
      round(lit(15) * sum(when(col("event_type") === "signup", col("c"))) /
        count(when(col("event_type") === "signup", 1)), 0).cast("long").as("fcp_c"),
      round(lit(5) * sum(when(col("event_type") === "error", col("c"))) /
        count(when(col("event_type") === "error", 1)), 0).cast("long").as("ttfb_c"),
      round(count(when(col("event_type") === "purchase", 1)) * lit(1e4) /
        count(lit(1)), 0).cast("long").as("cls_u"))
  }

  /** getRating over an exact integer metric value: null/0 →
    * not-measured (unless zeroIsValid — CLS), ≤ good → good, ≤ poor →
    * needs-improvement, else poor.
    */
  def rating(value: Column, metric: String, zeroIsValid: Boolean = false): Column = {
    val (good, poor) = VitalsThresholds(metric)
    val base = when(value <= good, "good")
      .when(value <= poor, "needs-improvement").otherwise("poor")
    if (zeroIsValid) when(value.isNull, "not-measured").otherwise(base)
    else when(value.isNull || value === 0, "not-measured").otherwise(base)
  }

  /** pf03: per-run vitals values (original units), ratings, the
    * weighted 0-100 score with not-measured excluded from both sides
    * of the mean, and the bottleneck count.
    */
  def vitalsScoreOn(runs: DataFrame): DataFrame = {
    val rated = runs.select(
      col("device"), col("day"),
      (col("lcp_c") / 1e2).as("lcp_ms"), (col("inp_c") / 1e2).as("inp_ms"),
      (col("cls_u") / 1e4).as("cls"), (col("fcp_c") / 1e2).as("fcp_ms"),
      (col("ttfb_c") / 1e2).as("ttfb_ms"),
      rating(col("lcp_c"), "lcp").as("lcp_rating"),
      rating(col("inp_c"), "inp").as("inp_rating"),
      rating(col("cls_u"), "cls", zeroIsValid = true).as("cls_rating"),
      rating(col("fcp_c"), "fcp").as("fcp_rating"),
      rating(col("ttfb_c"), "ttfb").as("ttfb_rating"))
    val ratingScore = (r: Column) =>
      when(r === "good", 100).when(r === "needs-improvement", 50)
        .when(r === "poor", 0) // not-measured → null
    val terms = VitalsWeights.toSeq.sortBy(_._1).map { case (m, w) =>
      val sc = ratingScore(col(s"${m}_rating"))
      (sc * w, when(sc.isNotNull, w).otherwise(0))
    }
    val num = terms.map(_._1).map(c => coalesce(c, lit(0))).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    val nPoor = VitalsWeights.keys.toSeq.sorted
      .map(m => when(col(s"${m}_rating") === "poor", 1).otherwise(0)).reduce(_ + _)
    rated
      .withColumn("score",
        when(den === 0, 0L)
          .otherwise(round(num.cast("double") / den, 0).cast("long")))
      .withColumn("n_bottlenecks", nPoor)
  }

  def pf03(s: SparkSession, dir: String): DataFrame =
    vitalsScoreOn(vitalsRunsFromEvents(s, dir))

  /** pf04: the multi-run collector's per-metric statistics — unpivot
    * the runs to (device, metric, value), discard IQR outliers when
    * the device has ≥ 4 runs, then summarize the inliers. Per-metric
    * value units divide out at the end (centi-ms vs CLS 1e-4).
    */
  def multiRunVitalsOn(runs: DataFrame): DataFrame = {
    val long = runs.select(col("device"), col("day"),
      expr("stack(5, 'lcp', lcp_c, 'inp', inp_c, 'cls', cls_u, 'fcp', fcp_c, 'ttfb', ttfb_c) AS (metric, c)"))
      .filter(col("c").isNotNull)
    val bounds = long.groupBy("device", "metric").agg(
      count(lit(1)).as("n_runs"),
      expr("percentile(c, 0.25)").as("q1"),
      expr("percentile(c, 0.75)").as("q3"))
      .select(col("device"), col("metric"), col("n_runs"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lb"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("ub"))
    val inliers = long.join(broadcast(bounds), Seq("device", "metric"))
      .filter(col("n_runs") < 4 || (col("c") >= col("lb") && col("c") <= col("ub")))
    val unit = when(col("metric") === "cls", 1e4).otherwise(1e2)
    val varC2 = when(col("n") === 1, lit(0.0))
      .otherwise((col("n") * col("d2") - col("d1") * col("d1")).cast("double") /
        (col("n") * (col("n") - 1)))
    val meanU = col("d1").cast("double") / unit / col("n")
    val sdU = sqrt(varC2) / unit
    inliers.groupBy("device", "metric").agg(
      count(lit(1)).as("n"),
      sum(col("c").cast("decimal(38,0)")).as("d1"),
      sum((col("c") * col("c")).cast("decimal(38,0)")).as("d2"),
      min("c").as("min_c"), max("c").as("max_c"),
      expr("percentile(c, 0.5)").as("med_c"),
      expr("percentile(c, 0.95)").as("p95_c"))
    .select(
      col("device"), col("metric"), col("n"),
      microRound(meanU, 4).as("mean"),
      microRound(col("med_c") / unit, 4).as("median"),
      microRound(col("min_c") / unit, 4).as("min"),
      microRound(col("max_c") / unit, 4).as("max"),
      microRound(sdU, 4).as("std_dev"),
      microRound(col("p95_c") / unit, 4).as("p95"),
      when(col("n") === 1, lit(true))
        .when(meanU === 0, sdU === 0)
        .otherwise(sdU / abs(meanU) < 0.15).as("is_stable"))
  }

  def pf04(s: SparkSession, dir: String): DataFrame =
    multiRunVitalsOn(vitalsRunsFromEvents(s, dir))
}
