package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ks01: the Knowledge Home SLO read model — alt-backend
  * orchestrator/usecase/knowledge_slo_usecase/usecase.go GetSLOStatus
  * (:29-87), the production RPC behind `altctl home slo`. The one
  * real compute is computeFreshnessSLI (:89-117) over the
  * knowledge-sovereign projection lag plus computeOverallHealth
  * (:120-140), a worst-status fold; the other four SLIs are the
  * reference's own hardcoded placeholders (:40-74 — availability
  * 100/99.9, action_durability 100/99.99, stream_continuity
  * 100/99.5, correctness_proxy 100/99.0, all "meeting" at budget 0),
  * reproduced as the constants they are.
  *
  * The lag, quirk for quirk:
  *
  *  - knowledge-sovereign read_infra.go:219-232 defines projection
  *    lag in EVENT-SEQUENCE units: GREATEST(max(event_seq) −
  *    min(checkpoint last_event_seq), 0) — "how many events the
  *    farthest-behind projector trails the tip". read_client.go:533
  *    then multiplies by time.Second and usecase.go:101 compares
  *    lag.Seconds() against a 300-SECOND target — so the freshness
  *    SLO actually gates on "≤ 300 events behind", a genuine unit
  *    conflation in the reference, kept here (current_value is the
  *    event count, unit stays "seconds" as domain/knowledge_slo.go
  *    labels it).
  *  - Re-expressed over the events table with projectors = event
  *    types: each projector's checkpoint is the (ts, event_id)
  *    composite of its last event; the farthest-behind checkpoint T
  *    is the min of those; lag = count of events strictly after T in
  *    (ts, event_id) order — identical to max_seq − seq(T) without
  *    materializing a global row_number (no global sort: one
  *    per-type agg, one scalar min, one filtered count).
  *  - The band ladder (:101-109): lag ≤ 300 → "meeting" with
  *    error_budget_consumed_pct = lag/300·100 (both engines evaluate
  *    the same double expression in the same order); lag > 300 →
  *    "burning" at 100. The "breached" band (:96-99) is the
  *    TRANSPORT-ERROR path (GetProjectionLag RPC failure →
  *    current_value −1, budget 100) — unreachable in a batch
  *    re-expression where the scan cannot "error politely", so it is
  *    exercised through [[freshnessSli]]'s lag parameter in the spec
  *    rather than planted in data. (A second reference quirk, pinned
  *    but equally unreachable: a NEGATIVE LagSeconds response maps to
  *    Duration(−1ns) with err=nil at read_client.go:530-532, which
  *    would take the meeting branch at budget −3e-10 — the SQL's
  *    GREATEST(…, 0) makes negative lag impossible.)
  *  - computeOverallHealth (:120-140): any breached → "breaching";
  *    else any burning → "at_risk"; else "healthy". Folded as a
  *    max-severity aggregate over the SLI rows, not a hardcoded
  *    freshness passthrough, so the general fold is what's tested.
  *
  * Output: one row per SLI in status.SLIs order (:76-82, sli_order
  * pins it) with the report scalars denormalized on every row
  * (overall_health, error_budget_window_days = 30 per :16) — the
  * xs01/hs02 report convention. ComputedAt (wall clock) is omitted:
  * nondeterministic by construction.
  *
  * Scale: the lag is one groupBy on event_type (bounded cardinality,
  * map-side combined), one scalar min, and one count under a
  * broadcast scalar comparison — no global window, no global sort;
  * the SLI assembly is a 5-row literal frame. At 100 TB the count
  * prunes to a (ts ≥ T.ts) predicate pushed to the parquet scan when
  * the table is ts-partitioned.
  */
object KnowledgeSlo {

  val FreshnessTargetSeconds = 300.0
  val ErrorBudgetWindowDays = 30

  /** The freshness band ladder (usecase.go:96-109) over a lag column:
    * lag < 0 models the transport-error path (−1 → breached at 100).
    */
  def freshnessSli(lag: Column): (Column, Column) = {
    val status =
      when(lag < 0, "breached")
        .when(lag <= FreshnessTargetSeconds, "meeting")
        .otherwise("burning")
    val budget =
      when(lag < 0, 100.0)
        .when(lag <= FreshnessTargetSeconds, lag / FreshnessTargetSeconds * 100.0)
        .otherwise(100.0)
    (status, budget)
  }

  /** The SLO status report over any (ts, event_id, event_type) event
    * frame.
    */
  def sloStatusOn(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._

    // projection lag in event units: count of events past the
    // farthest-behind projector checkpoint (see scaladoc)
    val cp = events.groupBy("event_type")
      .agg(max(struct(col("ts"), col("event_id"))).as("last"))
    val tmin = cp.agg(min(col("last")).as("tmin"))
    val lag = events.crossJoin(broadcast(tmin))
      .filter(struct(col("ts"), col("event_id")) > col("tmin"))
      .agg(count(lit(1)).cast("double").as("lag_events"))

    // the four placeholder SLIs, exactly as hardcoded (:40-74)
    val placeholders = Seq(
      (1, "availability", 100.0, 99.9),
      (3, "action_durability", 100.0, 99.99),
      (4, "stream_continuity", 100.0, 99.5),
      (5, "correctness_proxy", 100.0, 99.0)
    ).toDF("sli_order", "name", "current_value", "target_value")
      .select(col("sli_order"), col("name"), col("current_value"),
        col("target_value"), lit("percent").as("unit"),
        lit("meeting").as("status"), lit(0.0).as("error_budget_consumed_pct"))

    val (fStatus, fBudget) = freshnessSli(col("lag_events"))
    val freshness = lag.select(
      lit(2).as("sli_order"), lit("freshness").as("name"),
      col("lag_events").as("current_value"),
      lit(FreshnessTargetSeconds).as("target_value"), lit("seconds").as("unit"),
      fStatus.as("status"), fBudget.as("error_budget_consumed_pct"))

    val slis = placeholders.unionByName(freshness)
    // the worst-status fold (:120-140) as a max-severity aggregate
    val overall = slis.agg(max(
      when(col("status") === "breached", 2)
        .when(col("status") === "burning", 1).otherwise(0)).as("sev"))
      .select(when(col("sev") === 2, "breaching")
        .when(col("sev") === 1, "at_risk").otherwise("healthy").as("overall_health"))

    slis.crossJoin(broadcast(overall))
      .withColumn("error_budget_window_days", lit(ErrorBudgetWindowDays))
      .orderBy("sli_order")
  }

  def ks01(s: SparkSession, dir: String): DataFrame =
    sloStatusOn(Tables.events(s, dir).select("ts", "event_id", "event_type"))

  /** DuckDB mirror: struct max/min for the composite checkpoint, the
    * same double expression order for the budget.
    */
  val ks01OracleSql: String =
    s"""WITH cp AS (
  SELECT event_type, max(struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id)) AS last
  FROM events GROUP BY 1),
t AS (SELECT min(last) AS tmin FROM cp),
lag AS (
  SELECT CAST(count(*) AS DOUBLE) AS lag_events
  FROM events, t
  WHERE struct_pack(ts := CAST(ts AS TIMESTAMP), id := event_id) > t.tmin),
slis AS (
  SELECT 1 AS sli_order, 'availability' AS name, 100.0 AS current_value,
         99.9 AS target_value, 'percent' AS unit, 'meeting' AS status,
         0.0 AS error_budget_consumed_pct
  UNION ALL
  SELECT 2, 'freshness', lag_events, 300.0, 'seconds',
         CASE WHEN lag_events < 0 THEN 'breached'
              WHEN lag_events <= 300.0 THEN 'meeting' ELSE 'burning' END,
         CASE WHEN lag_events < 0 THEN 100.0
              WHEN lag_events <= 300.0 THEN lag_events / 300.0 * 100.0
              ELSE 100.0 END
  FROM lag
  UNION ALL
  SELECT 3, 'action_durability', 100.0, 99.99, 'percent', 'meeting', 0.0
  UNION ALL
  SELECT 4, 'stream_continuity', 100.0, 99.5, 'percent', 'meeting', 0.0
  UNION ALL
  SELECT 5, 'correctness_proxy', 100.0, 99.0, 'percent', 'meeting', 0.0),
overall AS (
  SELECT CASE max(CASE status WHEN 'breached' THEN 2 WHEN 'burning' THEN 1 ELSE 0 END)
           WHEN 2 THEN 'breaching' WHEN 1 THEN 'at_risk' ELSE 'healthy' END AS overall_health
  FROM slis)
SELECT s.sli_order, s.name, s.current_value, s.target_value, s.unit, s.status,
       s.error_budget_consumed_pct, o.overall_health,
       30 AS error_budget_window_days
FROM slis s CROSS JOIN overall o
ORDER BY s.sli_order"""
}
