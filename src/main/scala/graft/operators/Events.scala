package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.{cents, microRatio, microRound}

/** Event / log analytics over the `events` fact table.
  *
  * Mirrors the reference's ClickHouse SLI pipeline
  * (clickhouse/migrations/009_create_sli_metrics.sql:21 — per-minute
  * error-rate and throughput materialized views) and the Grafana SLO
  * queries over http_logs (clickhouse/migrations/002,003), plus the
  * event-sourced CQRS projections of knowledge-sovereign
  * (knowledge-sovereign/migrations/00001_initial_schema.sql:8
  * knowledge_events, 00006_partition_knowledge_events.sql).
  *
  * Scale notes: every query shuffles once on (bucket and/or user) keys
  * with map-side partial aggregation; windows partition on
  * high-cardinality user_id (never a single global window over raw
  * events). At 100 TB the same plans hold: time-bucket keys keep group
  * cardinality bounded, and AQE coalesces the post-shuffle partitions.
  */
object Events {

  /** Event timestamps are nanosecond-precision in parquet; Spark truncates
    * to microseconds on read. The DuckDB oracles CAST to microsecond
    * timestamps so both engines agree exactly.
    */
  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** The ONE sessionize prelude every session-scoped operator builds
    * on (ev04 sessions, ot01 traces, ot02 edges, ev26 attribution,
    * ev28 paths): second-truncated event time, per-user gap to the
    * previous event, and the session-break flag at the standard
    * 30-minute gap. The gap definition and its oracle mirrors must
    * never drift apart per call site.
    */
  private def withSessionBreaks(df: DataFrame, gapS: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    df.withColumn("ts_s", date_trunc("second", col("ts")))
      .withColumn("gap_s",
        unix_timestamp(col("ts_s")) - unix_timestamp(lag("ts_s", 1).over(byUser)))
      .withColumn("is_break", when(col("gap_s").isNull || col("gap_s") > gapS, 1).otherwise(0))
  }

  /** ev01: time-bucketed throughput (toStartOfMinute/Hour analog). */
  def hourlyThroughput(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** ev02: windowed error-rate ratio (sli_error_rate_mv pattern). */
  def errorRate(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("bucket"))
      .agg(
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        count(lit(1)).as("n_total"),
        microRatio(count(when(col("event_type") === "error", 1)), count(lit(1)), 4)
          .as("error_rate"))

  /** ev30: long-format SLI projection — ONE aggregation pass emits
    * every minute-granularity SLI as (bucket, metric, value) rows,
    * the exact shape of the reference's `sli_metrics` table that its
    * error-rate and throughput materialized views both write into
    * (clickhouse/migrations/009_create_sli_metrics.sql: a shared
    * long-format metric store, one MV per metric). Spark computes all
    * metrics in one scan + one shuffle, then `stack`s the wide row
    * into long form — a stateless post-aggregation projection, so
    * adding a metric costs a column, never another pass over the log.
    *
    * error_rate guards the empty-bucket division the way the MV's
    * `countIf/count` does implicitly (count() > 0 per group).
    */
  def sliProjection(s: SparkSession, dir: String): DataFrame =
    sliProjectionOn(ev(s, dir))

  /** Long-format SLI projection over any events-shaped frame.
    *
    * apdex is the per-minute Apdex score the reference's trace-explorer
    * dashboard computes (observability/grafana/dashboards/
    * trace-explorer.json: `(countIf(d<100) + 0.5·countIf(100≤d<500)) /
    * count()`), emitted here as ONE MORE COLUMN in the same aggregation
    * — the design claim of this projection made concrete: a new SLO
    * metric never costs another pass over the log. The half-weight is
    * cross-multiplied into integers ((2·sat + tol)/(2·n)) so the score
    * is an exact-integer ratio with one scale-0 round.
    */
  def sliProjectionOn(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("minute", col("ts")).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("event_type") === "error", 1)).as("n_err"),
        countDistinct("user_id").as("n_users"),
        count(when(col("value") < 100, 1)).as("n_sat"),
        count(when(col("value") >= 100 && col("value") < 500, 1)).as("n_tol"))
      // ratios round at scale 0 in 1e-4 units — a ROUND(x, 4) of the
      // double quotient sits on engine-divergent half-way boundaries
      // (57/800 = 0.07125); see the tx21/tx25 discipline
      .select(col("bucket"), expr(
        """stack(4,
             'log_throughput', CAST(n AS DOUBLE),
             'error_rate', CAST(ROUND(n_err * 1e4 / n) AS BIGINT) / 1e4,
             'active_users', CAST(n_users AS DOUBLE),
             'apdex', CAST(ROUND((2 * n_sat + n_tol) * 1e4 / (2 * n)) AS BIGINT) / 1e4
           ) AS (metric, value)"""))

  /** ev32: Apdex score per service + the overall rollup row — the
    * named SLO metric the reference's trace-explorer dashboard derives
    * from request durations (observability/grafana/dashboards/
    * trace-explorer.json: satisfied < 100 ms, tolerating < 500 ms,
    * apdex = (satisfied + 0.5·tolerating)/count, overall and bucketed).
    * The half-weight is cross-multiplied into exact integers
    * ((2·sat + tol)/(2·n)) so the score never rounds a double quotient;
    * one ROLLUP aggregation, map-side combined — q10's conditional-agg
    * shape with a hierarchical total.
    */
  def apdexScore(s: SparkSession, dir: String,
                 satMs: Double = 100.0, tolMs: Double = 500.0): DataFrame =
    ev(s, dir)
      .rollup(col("event_type").as("service"))
      .agg(
        count(lit(1)).as("n_requests"),
        count(when(col("value") < satMs, 1)).as("n_satisfied"),
        count(when(col("value") >= satMs && col("value") < tolMs, 1)).as("n_tolerating"),
        microRatio(
          count(when(col("value") < satMs, 1)) * 2 +
            count(when(col("value") >= satMs && col("value") < tolMs, 1)),
          count(lit(1)) * 2, 4).as("apdex"))

  /** ev03: exact p50/p95/p99 per group (latency SLO pattern). Exact
    * percentile for oracle parity; at 100 TB swap to percentile_approx
    * (same plan shape, sketch-mergeable, no sort-per-group blowup).
    */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    // percentile interpolates between exact integer cents: the only
    // rounding left is scale-0 (a 2-dp round of the interpolated double
    // can sit where Spark's shortest-repr and DuckDB's binary-value
    // HALF_UP disagree)
    ev(s, dir)
      .withColumn("v_c", cents(col("value")))
      .groupBy("event_type")
      .agg(
        (round(expr("percentile(v_c, 0.5)"), 0).cast("long") / 1e2).as("p50"),
        (round(expr("percentile(v_c, 0.95)"), 0).cast("long") / 1e2).as("p95"),
        (round(expr("percentile(v_c, 0.99)"), 0).cast("long") / 1e2).as("p99"))

  /** ev11: sketch-based percentiles — the 100 TB form of ev03. Exact
    * percentile sorts every group; percentile_approx merges bounded
    * KLL-style sketches map-side, so cost is O(n) with constant memory
    * per group. Rows-only check (the sketch is engine-specific); exact
    * parity is ev03's job.
    */
  def valuePercentilesApprox(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("v_c", cents(col("value")))
      .groupBy("event_type")
      .agg(
        (expr("percentile_approx(v_c, 0.5, 10000)") / 1e2).as("p50"),
        (expr("percentile_approx(v_c, 0.95, 10000)") / 1e2).as("p95"),
        (expr("percentile_approx(v_c, 0.99, 10000)") / 1e2).as("p99"))

  /** ev04: gap-based sessionization — a session break is >30 min idle.
    * lag + cumulative-sum-of-breaks over a per-user window; second
    * granularity so both engines agree on the gap comparison.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    withSessionBreaks(ev(s, dir))
      .groupBy("user_id")
      .agg(sum("is_break").as("n_sessions"), count(lit(1)).as("n_events"))

  /** ot01: OTel-style trace reassembly + critical-path attribution over
    * a trace-shaped view of the event stream (clickhouse/migrations/
    * 005_create_otel_traces.sql + 010: spans keyed by TraceId with
    * Duration and ServiceName; the Grafana trace panel groups them per
    * trace). The view: trace = a user's 30-min-gap session (ev04's
    * break rule), span = event, ServiceName = event_type, Duration =
    * value (ms). Per trace: span count, wall time, summed span time,
    * error count, and the critical path — the longest span's service
    * and its share of total span time (the "which service dominates
    * this trace" panel). One sessionize window + one in-trace
    * row_number window + one aggregation; per-service duration
    * PERCENTILES over the same view are ev03 verbatim (event_type =
    * ServiceName), so they are not duplicated here.
    */
  def traceSpans(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // durations carried as exact integer centi-ms: span-time sums are
    // long sums (order-independent) and the critical-path share is a
    // ratio of exact integers
    val spans = withSessionBreaks(ev(s, dir))
      .withColumn("dur_c", cents(coalesce(col("value"), lit(0.0))))
      .withColumn("trace_seq", sum("is_break").over(byUser))
    val wTop = Window.partitionBy("user_id", "trace_seq")
      .orderBy(col("dur_c").desc, col("event_id").asc)
    spans.withColumn("rn", row_number().over(wTop))
      .groupBy("user_id", "trace_seq")
      .agg(
        count(lit(1)).as("n_spans"),
        min("ts_s").as("trace_start"),
        (max(unix_timestamp(col("ts_s"))) - min(unix_timestamp(col("ts_s")))).as("wall_s"),
        sum("dur_c").as("total_c"),
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        max(when(col("rn") === 1, col("event_type"))).as("top_service"),
        max(when(col("rn") === 1, col("dur_c"))).as("top_c"))
      .withColumn("top_share", when(col("total_c") > 0, microRatio(col("top_c"), col("total_c"), 4)))
      .select(col("user_id"), col("trace_seq"), col("n_spans"), col("trace_start"),
        col("wall_s"), (col("total_c") / 1e2).as("total_span_ms"), col("n_errors"),
        col("top_service"), (col("top_c") / 1e2).as("top_span_ms"), col("top_share"))
  }

  /** ev05: top-N users by revenue in a time window, deterministic
    * tie-break. Aggregates first (tiny output), then global top-K.
    */
  def topPurchasers(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg((sum(cents(col("value"))) / 1e2).as("revenue"), count(lit(1)).as("n_purchases"))
      .orderBy(col("revenue").desc, col("user_id").asc)
      .limit(10)

  /** ev06: signup→purchase funnel: users whose first signup precedes
    * their first purchase.
    */
  def funnel(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_signup").isNotNull && col("first_purchase").isNotNull &&
              col("first_signup") < col("first_purchase"))
      .select("user_id", "first_signup", "first_purchase")

  /** ev29: greedy non-overlapping sequence counting — how many
    * complete A→…→B conversions did each user make (ClickHouse
    * `sequenceCount('(?1).*(?2)')`: restart matching after every
    * completion; ev06/ev17 only detect whether ONE conversion exists).
    *
    * The greedy automaton collapses to a closed windowed form: in the
    * per-user time-ordered subsequence of A/B events, every maximal
    * A-run followed by a B-run yields exactly one match (the matcher
    * consumes one A from the run, ignores the rest while seeking B,
    * counts the first B, ignores extra Bs while seeking A). So the
    * count is simply the number of B events whose PREVIOUS A/B event
    * is an A — one `lag` over a user-partitioned window, no iterative
    * state machine.
    *
    * Scale: the type filter pushes to the scan, so only A/B rows
    * shuffle (once, keyed by user); lag + conditional count reuse the
    * same partitioning.
    */
  def sequenceCount(s: SparkSession, dir: String,
                    a: String = "view", b: String = "purchase"): DataFrame =
    sequenceCountOn(ev(s, dir), a, b)

  /** Greedy sequence counting over any events-shaped frame. */
  def sequenceCountOn(events: DataFrame,
                      a: String = "view", b: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .filter(col("event_type").isin(a, b) && col("user_id").isNotNull)
      .withColumn("prev", lag("event_type", 1).over(w))
      .groupBy("user_id")
      .agg(count(when(col("event_type") === b && col("prev") === a, 1)).as("n_matches"))
      .filter(col("n_matches") >= 1)
  }

  /** ev17: multi-step in-window funnel — ClickHouse's windowFunnel
    * shape (the generalization of ev06's two-step min-based funnel):
    * per user, earliest view, then earliest click AFTER it, then
    * earliest purchase after THAT, all within 7 days of the view;
    * report user counts per reached level. Earliest-entry semantics
    * keep it deterministic and SQL-mirrorable. Three stacked
    * whole-partition window aggregates share ONE shuffle on user_id
    * (no orderBy → no sort, each is a running conditional min over the
    * same partitioning), then a per-user distinct and a tiny level
    * rollup.
    */
  def windowFunnel(s: SparkSession, dir: String): DataFrame = {
    val w = 604800L // 7 days in seconds
    val byUser = Window.partitionBy("user_id")
    ev(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(date_trunc("second", col("ts"))).as("ep"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ep"))).over(byUser))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ep") > col("t1") && col("ep") <= col("t1") + w, col("ep"))).over(byUser))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ep") > col("t2") && col("ep") <= col("t1") + w, col("ep"))).over(byUser))
      // t1/t2/t3 are per-user constants: a groupBy on user_id reuses
      // the windows' hash(user_id) partitioning with zero extra
      // exchange, where distinct() would reshuffle every event row on
      // all four columns
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .withColumn("level",
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1).otherwise(0))
      .groupBy("level").agg(count(lit(1)).as("n_users"))
  }

  /** ev18: recency-decayed composite ranking — recap-worker's select
    * stage scores each candidate 0.5·confidence + 0.3·exp(−0.005·age_h)
    * + 0.2·min(tags/5, 1) (recap-worker/recap-worker/src/pipeline/
    * select/scoring.rs:7 calculate_score, including its "unknown
    * published_at ⇒ assume 24 h" rule). Mapped onto events: confidence
    * = value normalized by the corpus max, freshness decays from the
    * corpus max timestamp (deterministic — no wall clock in a query),
    * tag overlap = the props JSON's k. Global stats are a broadcast
    * singleton; the ranking is a top-20 with id tie-break.
    */
  def decayRanking(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(
      col("event_id"), col("event_type"),
      coalesce(col("value"), lit(0.0)).as("v"),
      unix_timestamp(date_trunc("second", col("ts"))).as("ep"),
      coalesce(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0)).as("k"))
    val stats = e.agg(max("ep").as("now_ep"), max("v").as("max_v"))
    e.crossJoin(broadcast(stats))
      // every component in exact integer 1e-6 units (the tx21 discipline),
      // so the 0.5/0.3/0.2 blend is pure long arithmetic:
      // score*1e4 = (5*conf_u + 3*fresh_u + 2*tag_u) / 1e3, one scale-0 round
      .withColumn("conf_u", round(col("v") * 1e6 / col("max_v"), 0).cast("long"))
      .withColumn("age_h", coalesce((col("now_ep") - col("ep")) / 3600.0, lit(24.0)))
      .withColumn("fresh_u", round(exp(lit(-0.005) * col("age_h")) * 1e6, 0).cast("long"))
      .withColumn("tag_u", round(least(col("k") / 5.0, lit(1.0)) * 1e6, 0).cast("long"))
      .withColumn("score",
        round((col("conf_u") * 5 + col("fresh_u") * 3 + col("tag_u") * 2) / 1e3, 0).cast("long") / 1e4)
      .orderBy(col("score").desc, col("event_id").asc)
      .limit(20)
      .select("event_id", "event_type", "score")
  }

  /** ev19: weekly cohort retention matrix — users grouped by
    * first-active week, tracked by week offset (the engagement-cohort
    * grid behind every retention dashboard; the reference's weekly
    * recap cadence (es04) implies exactly this user view). ev08 is the
    * day-over-day special case; this is the full (cohort × offset)
    * matrix. Input collapses to distinct (user, week) pairs before any
    * join, so the join volume is users×weeks, never raw events; cohort
    * sizes are a tiny broadcast.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val uw = ev(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sz = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, "user_id")
      .withColumn("offset_w",
        floor(datediff(col("week"), col("cohort_week")) / 7.0).cast("int"))
      .groupBy("cohort_week", "offset_w")
      .agg(countDistinct("user_id").as("n_active"))
      .join(broadcast(sz), "cohort_week")
      .withColumn("retention", microRatio(col("n_active"), col("cohort_size"), 4))
      .select("cohort_week", "offset_w", "n_active", "cohort_size", "retention")
  }

  /** ev20: fixed-width value histogram per event type — the
    * distribution panel next to ev03's percentiles (ClickHouse's
    * histogram()/Grafana heatmap surface). Fixed bin width keeps the
    * query one shuffle with map-side combine (a min/max-scaled
    * histogram needs a pre-pass; fixed bins don't) and bins are
    * directly comparable across days/services. Null values excluded,
    * negative values land in negative bins via floor.
    */
  def valueHistogram(s: SparkSession, dir: String, binWidth: Double = 50.0): DataFrame =
    ev(s, dir)
      .filter(col("value").isNotNull)
      .withColumn("bin", floor(col("value") / binWidth).cast("long"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"),
           round(min("value"), 2).as("bin_min"),
           round(max("value"), 2).as("bin_max"))

  /** ev07: daily active users. */
  def dailyActiveUsers(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct("user_id").as("dau"))

  /** ev08: day-over-day retention — users active on day d who return on
    * d+1. Self-join on (user, day) pairs AFTER distinct-ing, so the join
    * input is bounded by users×days, not raw events.
    */
  def nextDayRetention(s: SparkSession, dir: String): DataFrame = {
    val userDays = ev(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val next = userDays.select(col("user_id").as("r_user"),
      (col("day") - expr("INTERVAL 1 DAY")).as("r_day"))
    userDays.join(next, col("user_id") === col("r_user") && col("day") === col("r_day"))
      .groupBy("day")
      .agg(count(lit(1)).as("retained_users"))
  }

  /** ev09: semi-structured JSON extraction + aggregation (the
    * `fields Map(String,String)` pattern in clickhouse logs).
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg((round(sum("k") * 1e4 / count("k"), 0).cast("long") / 1e4).as("avg_k"),
           max("k").as("max_k"), min("k").as("min_k"))

  /** ev10: running cumulative aggregate over time (bounded: window runs
    * over the per-day aggregate, not raw events).
    */
  def cumulativeRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(cents(col("value"))).as("rev_c"))
    daily
      .withColumn("cum_c", sum("rev_c").over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), (col("rev_c") / 1e2).as("daily_rev"), (col("cum_c") / 1e2).as("cum_rev"))
  }

  /** ev12: sliding range-frame count — for each error event, how many
    * events the same user produced in the preceding 5 minutes (the
    * burst-detection window behind alerting rules). RANGE frame over
    * epoch seconds, per-user partition — no self-join.
    */
  def errorBurst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("epoch_s"))
      .rangeBetween(-300, Window.currentRow)
    ev(s, dir)
      .withColumn("epoch_s", unix_timestamp(date_trunc("second", col("ts"))))
      .withColumn("n_last_5min", count(lit(1)).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("n_last_5min"))
  }

  /** ev21: multi-window SLO burn rate (the Grafana SLO alert rule over
    * the reference's sli_error_rate_mv: burn = observed error rate /
    * error budget, evaluated over a short AND a long window so a
    * one-hour blip can't page — both must burn ≥2× budget).
    * One shuffle builds the hourly error-rate frame; the 6-hour
    * trailing window then runs over that pre-aggregated series (≤
    * hours-in-retention rows at any data scale — never raw events),
    * RANGE-framed on epoch so missing hours don't stretch the window.
    */
  def sloBurn(s: SparkSession, dir: String, targetErrRate: Double = 0.01): DataFrame = {
    val hourly = ev(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(when(col("event_type") === "error", 1)).as("n_errors"),
           count(lit(1)).as("n_total"))
      .withColumn("epoch_s", unix_timestamp(col("bucket")))
    val w6h = Window.orderBy(col("epoch_s")).rangeBetween(-5 * 3600, Window.currentRow)
    hourly
      .withColumn("err_6h", sum("n_errors").over(w6h))
      .withColumn("tot_6h", sum("n_total").over(w6h))
      // two-step quotient: scale the numerator FIRST (the microRatio
      // discipline extended to num/den/target — same op order in the oracle)
      .withColumn("burn_1h",
        round(col("n_errors") * 1e4 / col("n_total") / targetErrRate, 0).cast("long") / 1e4)
      .withColumn("burn_6h",
        round(col("err_6h") * 1e4 / col("tot_6h") / targetErrRate, 0).cast("long") / 1e4)
      .select(col("bucket"), col("n_errors"), col("n_total"), col("burn_1h"), col("burn_6h"),
              when(col("burn_1h") >= 2 && col("burn_6h") >= 2, 1).otherwise(0).as("alert"))
  }

  /** ev23: exponential (log2) latency buckets per event type — the
    * Prometheus/OTel-style histogram whose bucket widths grow with the
    * value (a 1 ms and a 2 s request should not share a fixed-width
    * bin; clickhouse dashboards bucket span durations the same way;
    * ev20 is the fixed-width sibling). Still one map-side-combined
    * shuffle: the bucket id is floor(log2(value)) computed in the
    * scan projection.
    */
  def latencyBuckets(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .filter(col("value") > 0)
      .groupBy(col("event_type"), floor(log2(col("value"))).as("bucket"))
      .agg(count(lit(1)).as("n"),
           round(min("value"), 2).as("bucket_min"),
           round(max("value"), 2).as("bucket_max"))

  /** ev22: heavy hitters per event type via the mergeable SpaceSaving
    * aggregate (ClickHouse `topK()`; the 100 TB path for top-N over
    * HIGH-cardinality keys, where q04/ev05's exact groupBy would
    * shuffle one row per distinct key). Each group keeps a bounded
    * `capacity`-entry summary, merged across partitions. The default
    * capacity covers the test-SF user space (1.5k distinct/type at
    * sf0.1), so estimates are exact and the DuckDB oracle mirrors
    * them with a plain count — the same "exact below the buffer"
    * contract ev11's percentile sketch has. Above the buffer the
    * SpaceSaving guarantee degrades gracefully (any key with
    * frequency > N/capacity is retained; `max_overcount` bounds the
    * error per entry) — callers at real cardinality size `capacity`
    * to the heavy-hitter threshold they need, not to the key space.
    */
  def heavyHitters(s: SparkSession, dir: String, k: Int = 10, capacity: Int = 4096): DataFrame = {
    import graft.functions.SpaceSavingAgg.spaceSavingTopK
    ev(s, dir)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type")
      .agg(spaceSavingTopK(col("user_id").cast("string"), k, capacity).as("hh"))
      .select(col("event_type"), posexplode(col("hh")).as(Seq("i", "e")))
      .select(col("event_type"), (col("i") + 1).as("rank"),
              col("e.item").as("user_id"), col("e.est").as("est_events"),
              col("e.err").as("max_overcount"))
  }

  /** ev13: trailing 7-day moving average of daily revenue — the
    * Grafana smoothing window, computed over the per-day aggregate
    * (tiny frame), not raw events.
    */
  def movingAvgRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(cents(col("value"))).as("rev_c"))
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily.select(col("day"), (col("rev_c") / 1e2).as("daily_rev"),
                 (round(sum("rev_c").over(w) / count(lit(1)).over(w), 0).cast("long") / 1e2).as("ma7"))
  }

  /** ev14: z-score anomaly counts — events beyond 3σ of their type's
    * value distribution (the alert-rule shape over SLI series). Two
    * passes over the fact: per-type moments, then a broadcast join
    * back for the outlier test.
    */
  def valueAnomalies(s: SparkSession, dir: String): DataFrame = {
    // The 3σ gate is cross-multiplied into EXACT integer moments over
    // cents (n, Σc, Σc²): |c·n − Σc|² · (n−1) > 9 · n · (n·Σc² − (Σc)²).
    // A double mu/sigma differs between engines in its last ulps
    // (summation order), so a value sitting exactly on the boundary
    // could flip; rounding mu/sigma (the old form) merely moved the
    // boundary to a representable point. Products go through
    // decimal(38,0) — dev²·n overflows a long at any realistic SF.
    val evC = ev(s, dir).withColumn("c", cents(col("value")))
    // Σc² itself must accumulate in decimal(38,0) too: c·c ~ 1e10 per
    // row for 1000.00-unit values, so a type with ~1e9 rows wraps a
    // plain long sum SILENTLY under non-ANSI arithmetic while the
    // oracle's HUGEINT stays correct
    val stats = evC.groupBy(col("event_type").as("t"))
      .agg(sum("c").as("sc"),
           sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"),
           count("c").as("n"))
    evC
      .join(broadcast(stats), col("event_type") === col("t"))
      .withColumn("dev", col("c").cast("decimal(38,0)") * col("n") - col("sc"))
      .withColumn("m2n", col("n").cast("decimal(38,0)") * col("sc2") -
        col("sc").cast("decimal(38,0)") * col("sc"))
      .groupBy("event_type")
      .agg(
        count(when(col("dev") * col("dev") * (col("n") - 1) > col("m2n") * 9 * col("n"), 1))
          .as("n_outliers"),
        count(lit(1)).as("n_total"))
  }

  /** ev15: sketch count-distinct (HLL++) — the 100 TB path for q06's
    * exact countDistinct: mergeable constant-size sketches instead of
    * a distinct shuffle. Rows-only check (sketch estimates are
    * engine-specific; exact parity is q06's job).
    */
  def approxDistinctUsers(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id", 0.01).as("n_users_approx"),
           count(lit(1)).as("n_events"))

  /** ev16: re-aggregatable distinct counts — hourly HLL sketches
    * (Datasketches, `hll_sketch_agg`) unioned up to daily estimates.
    * The 100 TB materialized-view pattern: store tiny sketches per
    * fine bucket once, roll up to ANY coarser window without
    * re-scanning raw events (exactly what a ClickHouse
    * uniqState/uniqMerge MV does). Rows-only: estimates are
    * engine-specific; exactness is ev07's job — the spec checks the
    * estimate lands within HLL error of the exact DAU.
    */
  def sketchDau(s: SparkSession, dir: String): DataFrame = {
    val hourly = ev(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sketch"))
    hourly
      .groupBy(date_trunc("day", col("hour")).as("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("dau_approx"))
      .orderBy("day")
  }

  /** es01: event-log replay → latest-state-per-entity projection
    * (knowledge-sovereign CQRS read-model pattern: knowledge_events →
    * knowledge_home_items).
    */
  def latestStateProjection(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
              round(col("value"), 2).as("last_value"), col("ts").as("last_ts"))
  }

  /** es06: point-in-time replay — es01's latest-state projection AS OF
    * a cutoff T: the read model rebuilt from only events ≤ T
    * (knowledge-sovereign's replayable backfill — its migrations keep
    * events append-only precisely so any historical state can be
    * reconstructed). At scale the cutoff is a partition-pruning
    * predicate: replaying to T scans only time partitions ≤ T, never
    * the whole log.
    */
  def stateAsOf(s: SparkSession, dir: String,
                asOf: String = "2024-01-15"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    ev(s, dir)
      .filter(col("ts") <= lit(asOf).cast("timestamp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
              round(col("value"), 2).as("last_value"), col("ts").as("last_ts"))
  }

  /** es07: incremental projection refresh — merge a new time slice's
    * PARTIAL aggregates into the running (type, day) state instead of
    * recomputing from the full log (the materialized-view refresh
    * pattern: ClickHouse AggregatingMergeTree merges, Spark MV
    * refresh; knowledge-sovereign's projector applies exactly this on
    * every batch of new events). The driver oracle is the FULL batch
    * recompute over events ≤ T2 — the hash match is the proof that
    * refresh ≡ recompute.
    *
    * Counts and value sums are both mergeable; values aggregate in
    * exact CENTS (long) so partial-merge order cannot perturb a
    * double sum — the same property that makes the state mergeable on
    * a real cluster makes it bit-stable here.
    *
    * Scale: the state side scans only partitions ≤ T1 (on a real
    * deployment it IS the stored state table — no scan at all); the
    * delta side prunes to (T1, T2]. The merge shuffles the bounded
    * (type, day) frame, never raw volume.
    */
  def incrementalRollup(s: SparkSession, dir: String,
                        t1: String = "2024-01-15",
                        t2: String = "2024-01-20"): DataFrame = {
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val state = partials(ev(s, dir).filter(col("ts") <= lit(t1).cast("timestamp")))
    val delta = partials(ev(s, dir).filter(
      col("ts") > lit(t1).cast("timestamp") && col("ts") <= lit(t2).cast("timestamp")))
    state.unionByName(delta)
      .groupBy("event_type", "day")
      .agg(sum("n").as("n"), sum("cents").as("cents"))
      .select(col("event_type"), col("day"), col("n"),
        (col("cents") / 1e2).as("total_value"))
  }

  /** es02: full-replay aggregation by (type, day) — the backfill path of
    * the CQRS projector.
    */
  def eventTypeDaily(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 1e2).as("total_value"))

  /** es04: the weekly-recap rollup cadence (recap-worker compiles
    * weekly recaps; this is its input aggregation): per ISO week,
    * event volume, revenue, and active users.
    */
  def weeklyRecapRollup(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("active_users"),
        (sum(when(col("event_type") === "purchase", cents(col("value")))) / 1e2).as("revenue"))

  /** es03: retention/TTL accounting — rows kept vs expired at a cutoff
    * (ClickHouse `TTL timestamp + INTERVAL 2 DAY DELETE` in
    * clickhouse/migrations/001, knowledge-sovereign retention tables).
    * At scale this predicate is the partition-pruning key: time-
    * partitioned storage drops whole partitions, never row-scans.
    */
  def retentionTtl(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy("event_type")
      .agg(
        count(when(col("ts") < lit("2024-01-15").cast("timestamp"), 1)).as("n_expired"),
        count(when(col("ts") >= lit("2024-01-15").cast("timestamp"), 1)).as("n_retained"))

  /** ev24: gaps-and-islands outage merge — consecutive error events
    * closer than `gapS` seconds fuse into one outage island; per island
    * report error volume and duration (the Grafana alert-duration /
    * uptime panel over clickhouse sli_error_rate_mv, and the incident
    * timeline the reference's alert rules imply).
    *
    * Islands are scoped WITHIN a calendar day by construction: an
    * outage spanning midnight reports as two islands, one per day.
    * That is the deliberate trade the partitioning buys — it is how
    * day-bucketed incident dashboards count anyway, and it is what
    * keeps the window bounded (see below); callers needing cross-
    * midnight fusion re-merge the first/last islands of adjacent days,
    * a |days|-sized post-pass.
    *
    * Scale: errors are filtered FIRST (a few % of the stream, with the
    * predicate at the parquet scan), then islands are built per (day)
    * partition so the window never exceeds one day of sparse error
    * rows; island aggregation reuses the day hash partitioning (day ⊆
    * (day, island) clustering), so the whole query is one shuffle. An
    * error storm that overwhelms a single day-partition would move the
    * partition key to (day, hour) — same plan, finer key.
    */
  def gapIslands(s: SparkSession, dir: String, gapS: Long = 600L): DataFrame = {
    val byDay = Window.partitionBy("day").orderBy(col("ts_s"), col("event_id"))
    ev(s, dir)
      .filter(col("event_type") === "error")
      .withColumn("ts_s", date_trunc("second", col("ts")))
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("gap_s",
        unix_timestamp(col("ts_s")) - unix_timestamp(lag("ts_s", 1).over(byDay)))
      .withColumn("island",
        sum(when(col("gap_s").isNull || col("gap_s") > gapS, 1).otherwise(0))
          .over(byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("day", "island")
      .agg(
        count(lit(1)).as("n_errors"),
        min("ts_s").as("start_ts"),
        max("ts_s").as("end_ts"),
        (max(unix_timestamp(col("ts_s"))) - min(unix_timestamp(col("ts_s")))).as("duration_s"))
  }

  /** ot02: service dependency graph over ot01's trace view — each
    * consecutive span pair inside a trace is a caller→callee edge
    * (the Jaeger/Grafana service-graph panel ClickHouse builds from
    * otel_traces parent links; with no explicit ParentSpanId in the
    * synthetic stream, trace adjacency stands in for the parent edge).
    * Per edge: call count, the edge's share of its caller's outgoing
    * calls (the service-graph edge weight — NOT a per-edge error rate,
    * which would be a constant 0/1 here because the callee type IS the
    * group key), and exact p95 callee duration (percentile_approx is
    * the 100 TB swap, the ev03→ev11 precedent). Error-path volume is
    * still visible: the edges whose dst_service = 'error' are the
    * error transitions, weighted by out_share.
    *
    * Scale: one window shuffle partitioned by high-cardinality
    * user_id (sessionize + lag share the same sort, so Spark plans
    * ONE exchange + sort), then an aggregation whose key space is
    * bounded by |services|² — tiny output, map-side combine.
    */
  def serviceGraph(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    withSessionBreaks(ev(s, dir))
      .withColumn("dur_c", cents(coalesce(col("value"), lit(0.0))))
      .withColumn("src_service",
        when(col("is_break") === 0, lag("event_type", 1).over(byUser)))
      .filter(col("src_service").isNotNull)
      .groupBy(col("src_service"), col("event_type").as("dst_service"))
      .agg(
        count(lit(1)).as("n_calls"),
        (round(expr("percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_ms"))
      .withColumn("out_share",
        microRatio(col("n_calls"), sum("n_calls").over(Window.partitionBy("src_service")), 4))
  }

  /** ot03: log↔trace correlation — the drilldown the reference wires
    * its log schema for: clickhouse/migrations/
    * 011_add_trace_context_to_logs.sql adds trace_id/span_id to the
    * logs table precisely so error logs join to their enclosing trace
    * (008_add_business_context_columns.sql materializes the join
    * keys). Here both views derive from the shared sessionize prelude:
    * traces are ot01's (user_id, trace_seq) frame, logs are lt01's
    * composed lines restricted to error events and carrying the same
    * trace context. The correlation is one equi-join on
    * (user_id, trace_seq); output = the 10 slowest error-containing
    * traces (by summed span time) with their error-log rollup and a
    * deterministic exemplar line (min event_id — the "show me an
    * actual error from this slow trace" panel).
    *
    * Scale: everything shuffles ONCE on user_id — the sessionize
    * window, both aggregations (user_id ⊆ (user_id, trace_seq)
    * satisfies their clustering), and the join itself reuse the same
    * hash(user_id) partitioning, so the correlation adds zero
    * exchanges over ot01 alone; the top-10 is a TakeOrdered over the
    * trace-level frame (bounded by traces, never raw events).
    */
  def traceErrorLogs(s: SparkSession, dir: String): DataFrame = {
    val byUserCum = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = withSessionBreaks(ev(s, dir))
      .withColumn("dur_c", cents(coalesce(col("value"), lit(0.0))))
      .withColumn("trace_seq", sum("is_break").over(byUserCum))
    val wTop = Window.partitionBy("user_id", "trace_seq")
      .orderBy(col("dur_c").desc, col("event_id").asc)
    val traces = spans.withColumn("rn", row_number().over(wTop))
      .groupBy("user_id", "trace_seq")
      .agg(
        count(lit(1)).as("n_spans"),
        sum("dur_c").as("total_c"),
        max(when(col("rn") === 1, col("event_type"))).as("top_service"))
    val errLogs = spans.filter(col("event_type") === "error")
      .withColumn("line", LogMining.composedLine)
      .groupBy("user_id", "trace_seq")
      .agg(
        count(lit(1)).as("n_error_logs"),
        min("ts_s").as("first_error_ts"),
        min_by(col("line"), col("event_id")).as("exemplar_line"))
    traces.join(errLogs, Seq("user_id", "trace_seq"))
      .orderBy(col("total_c").desc, col("user_id").asc, col("trace_seq").asc)
      .limit(10)
      .withColumn("total_span_ms", col("total_c") / 1e2)
      .drop("total_c")
  }

  /** ot04: span events/links explode — the nested `Events.*`/`Links.*`
    * array columns the reference adds to its trace table
    * (clickhouse/migrations/010_alter_otel_traces_nested_events.sql:
    * Events.Timestamp/Name/Attributes, Links.TraceId/SpanId arrays per
    * span, the OTel spec shape Grafana's trace panel reads) made
    * queryable: every span carries a nested array of span-level events
    * (exception on error spans, commit on purchases — attributes from
    * props) and a links array (the preceding in-trace span — the trace
    * context a span links to); `explode` turns them into rows with the
    * span context kept, and the exception rows join back to ot01's
    * trace frame for the exception-drilldown panel ("show me the traces
    * whose spans recorded exceptions, with trace stats and an exemplar
    * span").
    *
    * Scale: the nested arrays are a stateless projection of the
    * sessionize output and the explode is a bounded fan-out (≤1 event
    * per span here, ≤ a few in OTel practice) — no shuffle of its own;
    * the trace aggregation, the exception rollup, and their join ALL
    * reuse the one hash(user_id) partitioning (user ⊆ (user, trace)),
    * so the whole query still shuffles once like ot01/ot03.
    */
  def spanEvents(s: SparkSession, dir: String): DataFrame = {
    val byUserCum = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    val emptyEvents = "array<struct<name:string,ev_ts:timestamp,attrs:string>>"
    val spans = withSessionBreaks(ev(s, dir))
      .withColumn("dur_c", cents(coalesce(col("value"), lit(0.0))))
      .withColumn("trace_seq", sum("is_break").over(byUserCum))
      .withColumn("prev_span", when(col("is_break") === 0, lag("event_id", 1).over(byUser)))
      .withColumn("span_events",
        when(col("event_type") === "error",
          array(struct(lit("exception").as("name"), col("ts_s").as("ev_ts"),
            coalesce(col("props"), lit("{}")).as("attrs"))))
        .when(col("event_type") === "purchase",
          array(struct(lit("commit").as("name"), col("ts_s").as("ev_ts"),
            coalesce(col("props"), lit("{}")).as("attrs"))))
        .otherwise(array().cast(emptyEvents)))
      .withColumn("links",
        when(col("prev_span").isNotNull, array(col("prev_span")))
          .otherwise(array().cast("array<long>")))
    val evRows = spans
      .select(col("user_id"), col("trace_seq"), col("event_id"),
        size(col("links")).as("n_links"), explode(col("span_events")).as("se"))
      .select(col("user_id"), col("trace_seq"), col("event_id"), col("n_links"),
        col("se.name").as("event_name"), col("se.ev_ts").as("ev_ts"))
    val traces = spans.groupBy("user_id", "trace_seq")
      .agg(count(lit(1)).as("n_spans"), sum("dur_c").as("total_c"))
    val exc = evRows.groupBy("user_id", "trace_seq")
      .agg(
        count(lit(1)).as("n_span_events"),
        count(when(col("event_name") === "exception", 1)).as("n_exceptions"),
        min(when(col("event_name") === "exception", col("ev_ts"))).as("first_exception_ts"),
        min(when(col("event_name") === "exception", col("event_id"))).as("exemplar_span"),
        sum(when(col("event_name") === "exception", col("n_links")).otherwise(0)).as("n_linked"))
      .filter(col("n_exceptions") > 0)
    traces.join(exc, Seq("user_id", "trace_seq"))
      .select(col("user_id"), col("trace_seq"), col("n_spans"),
        (col("total_c") / 1e2).as("total_span_ms"), col("n_span_events"),
        col("n_exceptions"), col("first_exception_ts"), col("exemplar_span"), col("n_linked"))
  }

  /** es05: SCD2 interval build from the event log — collapse each
    * user's consecutive same-type runs into validity intervals
    * (valid_from = first ts of the run, valid_to = next state change),
    * then account per (user, state): version count, total closed-
    * interval dwell seconds, and whether the state is the user's
    * current one. This is the slowly-changing-dimension/CDC compaction
    * the knowledge-sovereign projector implies (es01 is its
    * latest-version special case).
    *
    * Scale: one shuffle on user_id — the change-detection window, the
    * valid_to lead window, and the final (user, state) aggregation all
    * reuse the same hash(user_id) partitioning (Spark plans one
    * Exchange; the second window adds only a sort, and user ⊆
    * (user, state) satisfies the aggregation's clustering).
    */
  def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    val changes = ev(s, dir)
      .withColumn("ts_s", date_trunc("second", col("ts")))
      .withColumn("prev_type", lag("event_type", 1).over(byUser))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("ts_s", 1).over(byUser))
    changes
      .groupBy(col("user_id"), col("event_type").as("state"))
      .agg(
        count(lit(1)).as("n_versions"),
        sum(unix_timestamp(col("valid_to")) - unix_timestamp(col("ts_s"))).as("closed_dwell_s"),
        max(when(col("valid_to").isNull, 1).otherwise(0)).as("is_current"))
  }

  /** ev25: CUSUM change-point detection on the daily error rate — the
    * sustained-drift alarm that complements ev14's per-point z-score
    * and ev21's fixed-window burn (Page 1954; the "error rate has been
    * creeping above baseline for days" alert a Grafana SLO panel
    * can't express). The one-sided CUSUM recursion
    * S_t = max(0, S_{t−1} + (x_t − μ − κ)) is not a SQL window
    * function, but its prefix identity IS:
    * S_t = P_t − min(0, min_{j≤t} P_j) over the deviation prefix sums
    * P (the 0 term is the empty prefix P_0) — two cumulative windows,
    * no recursion, no UDAF.
    *
    * Scale: raw events reduce to the daily frame first (one shuffle,
    * map-side combined); μ and every window then run over ≤ days
    * rows — global single-partition windows over a frame that stays
    * tiny at any corpus scale, the ev10/ev13 precedent.
    */
  def cusumDrift(s: SparkSession, dir: String, slack: Double = 0.002,
                 threshold: Double = 0.01): DataFrame = {
    // Exact integer pipeline: daily rates become 1e6-unit longs, and the
    // whole prefix identity is multiplied through by D (the day count)
    // so μ = Σrates/D never materializes as a double — P'_t =
    // D·Σ_{j≤t} r_j − t·(Σ_all r + D·slack_u) is an exact long, the
    // running min and the CUSUM stay exact, and the alarm gate compares
    // longs. The old form rounded doubles whose ulps depended on the
    // engine's summation order over the window frame.
    val slackU = math.round(slack * 1e6)
    val thrU = math.round(threshold * 1e6)
    val daily = ev(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(graft.functions.Numeric.microUnits(
        count(when(col("event_type") === "error", 1)), count(lit(1)), 6).as("rate_u"))
    val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("d_days", count(lit(1)).over(Window.partitionBy()))
      .withColumn("sum_all", sum("rate_u").over(Window.partitionBy()))
      .withColumn("t", count(lit(1)).over(wCum))
      .withColumn("pp", col("d_days") * sum("rate_u").over(wCum) -
        col("t") * (col("sum_all") + col("d_days") * slackU))
      .withColumn("cusum_u", round((col("pp") - least(lit(0L), min("pp").over(wCum))) / col("d_days"), 0)
        .cast("long"))
      .withColumn("alarm", when(col("cusum_u") > thrU, 1).otherwise(0))
      .select(col("day"), (col("rate_u") / 1e6).as("rate"),
        (col("cusum_u") / 1e6).as("cusum"), col("alarm"))
  }

  /** ev27: sliding-window distinct users from re-aggregatable HLL
    * sketches — the trailing-24h DAU panel computed WITHOUT ever
    * re-scanning raw events per window: hourly sketches (ev16's MV
    * pattern) union over a 24-row sliding frame. This is the whole
    * point of mergeable sketch state: the raw stream is touched once,
    * every derived window is sketch algebra on the tiny hourly frame.
    * Rows-only (estimates are engine-specific); the spec pins the
    * estimate between max(hourly) and Σ(hourly).
    */
  def slidingDau(s: SparkSession, dir: String, hours: Int = 24): DataFrame = {
    val hourly = ev(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    // RANGE frame over epoch seconds, not ROWS: with sparse traffic a
    // 24-ROW frame would reach arbitrarily far back in time
    val w = Window.orderBy(col("epoch_h")).rangeBetween(-(hours - 1) * 3600L, 0L)
    hourly
      .withColumn("epoch_h", unix_timestamp(col("hour")))
      .withColumn("users_sliding", hll_sketch_estimate(hll_union_agg(col("sk")).over(w)))
      .select("hour", "users_sliding")
      .orderBy("hour")
  }

  /** ev28: top in-session event paths — the most frequent 3-step
    * event-type sequences with no session break inside them (the
    * behavior-flow / "top paths" panel; ev06/ev17 test ONE fixed
    * funnel, this mines which flows actually happen). A trigram is
    * valid when neither of its two transitions crosses the 30-min
    * session gap: the current row's break flag covers (prev → cur)
    * and the lagged flag covers (prev2 → prev).
    *
    * Scale: the same single user-partitioned window sort as ev04/ot02
    * (lags and the break flags share it), then a path rollup bounded
    * by \|types\|³ with map-side combine, then TakeOrdered top-k.
    */
  def topPaths(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    withSessionBreaks(ev(s, dir))
      .withColumn("prev_break", lag("is_break", 1).over(byUser))
      .withColumn("t2", lag("event_type", 2).over(byUser))
      .withColumn("t1", lag("event_type", 1).over(byUser))
      .filter(col("is_break") === 0 && col("prev_break") === 0 && col("t2").isNotNull)
      .select(concat_ws(">", col("t2"), col("t1"), col("event_type")).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** ev26: first-touch conversion attribution — every purchase's
    * revenue is credited to the entry event type of its session (ev04's
    * 30-min-gap session; "which entry path converts" is the funnel
    * panel's attribution sibling, ev06/ev17 ask whether, this asks
    * from where). Per entry type: converted sessions, purchases,
    * attributed revenue, and revenue share.
    *
    * Scale: the sessionize + first_value windows share ONE
    * user-partitioned sort (one shuffle over raw events); the
    * aggregation output is bounded by |event types|, and the share
    * window runs over that tiny frame.
    */
  def firstTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = withSessionBreaks(ev(s, dir))
      .withColumn("trace_seq", sum("is_break").over(run))
      // the break row IS the session's first event, so the entry type is
      // a running last-non-null over the SAME window sort — no second
      // (user, session)-keyed sort pass
      .withColumn("first_touch",
        last(when(col("is_break") === 1, col("event_type")), ignoreNulls = true).over(run))
    val out = sessions
      .filter(col("event_type") === "purchase")
      .groupBy("first_touch")
      .agg(
        countDistinct(col("user_id"), col("trace_seq")).as("converted_sessions"),
        count(lit(1)).as("n_purchases"),
        sum(cents(col("value"))).as("rev_c"))
    out.withColumn("revenue_share",
        microRatio(col("rev_c"), sum("rev_c").over(Window.partitionBy()), 4))
      .withColumn("attributed_revenue", col("rev_c") / 1e2)
      .drop("rev_c")
  }
}
