package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}
import graft.functions.SimHashAgg.simhashAgg
import graft.functions.TextFunctions.tokens

/** Data-quality profiling — the pipeline gate the reference runs at
  * ingestion (feed-validator service; pre-processor input checks):
  * null rates, value ranges, domain cardinality, rule violations,
  * computed in ONE scan per table (every stat is a conditional
  * aggregate, so the whole profile is a single map-side-combined
  * aggregation regardless of table size).
  */
object DataQuality {

  /** dq01: one-scan quality profile of the events fact table. */
  def eventsProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      count(lit(1)).as("n_rows"),
      count(when(col("value").isNull, 1)).as("null_values"),
      count(when(col("value") < 0, 1)).as("negative_values"),
      round(min("value"), 2).as("min_value"),
      round(max("value"), 2).as("max_value"),
      countDistinct("event_type").as("n_event_types"),
      count(when(col("ts").isNull, 1)).as("null_ts"),
      count(when(col("user_id").isNull, 1)).as("null_users"))

  /** dq02: partition freshness/completeness gate — flag days whose
    * event volume collapses below half the trailing-7-day average (a
    * silently-dead forwarder or a missing ingest partition; the check
    * the reference's feed-validator/monitoring implies but ClickHouse
    * leaves to Grafana). One shuffle builds the daily frame; the
    * trailing window runs over ≤ days-in-retention rows at any scale,
    * and the average is rounded before the boundary test so both
    * engines flag identical days.
    */
  def volumeAnomalies(s: SparkSession, dir: String, minRatio: Double = 0.5): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("day").rowsBetween(-7, -1)
    daily
      // exact ratio of long sums, one scale-0 round (the window avg's
      // summation order is engine-dependent in its last ulps)
      .withColumn("trailing_avg",
        round(sum("n_events").over(w) * 1e2 / count("n_events").over(w), 0).cast("long") / 1e2)
      .withColumn("ratio",
        when(col("trailing_avg") > 0, microRatio(col("n_events"), col("trailing_avg"), 4)))
      .select(col("day"), col("n_events"), col("trailing_avg"), col("ratio"),
              when(col("ratio") < minRatio, 1).otherwise(0).as("flagged"))
  }

  /** dq03: join-key skew profile of the lineitem fact's shuffle key —
    * the pre-join diagnostic that decides whether a key needs salting
    * or AQE skew splitting (Scale.saltedJoin is the cure; this is the
    * thermometer). Per-key counts partial-aggregate map-side, then a
    * one-row summary over the |keys| frame: max/avg/top-share are all
    * partial-aggregable, so the whole profile is two shuffles at any
    * scale. p99 uses exact `percentile` for oracle parity at test SF —
    * at 100 TB swap in percentile_approx (the ev03 → ev11 precedent);
    * the headline skew_factor/top_share never need the sort.
    */
  def joinKeySkew(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_rows"),
        microRatio(sum("cnt"), count(lit(1)), 4).as("avg_rows"),
        (microRound(expr("percentile(cnt, 0.99)"), 4)).as("p99_rows"),
        // max/avg = max·n_keys/n_rows — all exact longs, no double avg
        microRatio(max("cnt") * count(lit(1)), sum("cnt"), 4).as("skew_factor"),
        microRatio(max("cnt"), sum("cnt"), 9).as("top_share"))

  /** tx14: per-source SimHash signature via the mergeable AGGREGATE
    * form — one 256-byte buffer per group shuffles instead of the
    * group's rows (rows-only check; grouped-vs-array equivalence is
    * spec-verified).
    */
  /** dq04: distribution drift between two halves of the stream —
    * Population Stability Index of the per-type `value` distribution
    * over ev20's fixed bins, PSI = Σ (p_a − p_b)·ln(p_a/p_b). The
    * training-data distribution-shift monitor (is this week's feed
    * shaped like last week's?) next to dq02's volume gate; PSI > 0.2
    * is the conventional "significant shift" flag. Laplace-smoothed
    * bin probabilities keep the log finite on bins one side misses.
    *
    * Scale: BOTH halves' bin counts come from ONE conditional-
    * aggregate scan (no self-join of the stream); everything after
    * runs on the (types × bins) frame, which is bounded by the bin
    * width, not the data. One shuffle, map-side combined.
    */
  def distributionDrift(s: SparkSession, dir: String,
                        binWidth: Double = 50.0): DataFrame = {
    val split = lit("2024-01-16").cast("timestamp")
    val binned = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(
        count(when(col("ts") < split, 1)).as("n_a"),
        count(when(col("ts") >= split, 1)).as("n_b"))
    val wType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    binned
      .withColumn("tot_a", sum("n_a").over(wType))
      .withColumn("tot_b", sum("n_b").over(wType))
      .withColumn("n_bins", count(lit(1)).over(wType))
      .withColumn("p_a", (col("n_a") + lit(0.5)) / (col("tot_a") + lit(0.5) * col("n_bins")))
      .withColumn("p_b", (col("n_b") + lit(0.5)) / (col("tot_b") + lit(0.5) * col("n_bins")))
      // Σ addends in exact integer MICRO-units (the tx21 discipline):
      // each (p_a−p_b)·ln(p_a/p_b) term rounds to a 1e-6-unit long at
      // scale 0 (half-integers are exact doubles → both engines' rounds
      // agree), the long sum is order-independent across partitions AND
      // engines, and the 0.2 drift gate compares the exact integer.
      .withColumn("addend_u",
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")) * 1e6, 0).cast("long"))
      .groupBy("event_type")
      .agg(
        max("n_bins").as("n_bins"),
        sum("addend_u").as("psi_u"))
      .select(col("event_type"), col("n_bins"),
        (col("psi_u") / 1e6).as("psi"),
        when(col("psi_u") > 200000L, 1).otherwise(0).as("drifted"))
  }

  /** dq05: referential-integrity gate over the star schema's FK edges
    * (lineitem→orders, orders→customer, events→customer): orphan and
    * null-FK counts per relation plus parent-side duplicate-key
    * counts — the constraint checks a lake has no engine to enforce
    * (feed-validator's cross-table gate; dbt-style relationship
    * tests).
    *
    * Scale: each relation is one left join keyed on the FK (the scan
    * projects ONLY the key) + one conditional aggregate; the dup-key
    * probe is a one-row aggregate of the parent. At 100 TB put
    * Scale.bloomPreFilter in front of each join so only
    * might-be-orphan keys shuffle.
    */
  def referentialIntegrity(s: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, ck: String,
            parent: DataFrame, pk: String): DataFrame = {
      val hits = parent.select(col(pk).as("k")).distinct().withColumn("__hit", lit(1))
      val stats = child.select(col(ck).as("k"))
        .join(hits, Seq("k"), "left")
        .agg(
          count(lit(1)).as("n_child"),
          count(when(col("__hit").isNull && col("k").isNotNull, 1)).as("n_orphans"),
          count(when(col("k").isNull, 1)).as("n_null_fk"))
      val dups = parent.agg(
        (count(lit(1)) - countDistinct(col(pk))).as("n_dup_parent_keys"))
      stats.crossJoin(broadcast(dups))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          microRatio(col("n_orphans"), col("n_child"), 6).as("orphan_rate"),
          col("n_null_fk"), col("n_dup_parent_keys"))
    }
    rel("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey")
      .unionByName(rel("orders->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"))
      .unionByName(rel("events->customer", Tables.events(s, dir), "user_id",
        Tables.customer(s, dir), "c_custkey"))
  }

  /** dq07: per-day null-rate drift for the event fact's nullable
    * columns — the column-completeness monitor next to dq02's volume
    * gate (a schema change or a broken enrichment job shows up as a
    * null-rate step, not a volume drop; Great-Expectations-style
    * `expect_column_values_to_not_be_null` tracked over time).
    *
    * A day is flagged when its null rate exceeds 1.5× the whole-table
    * baseline. The comparison is cross-multiplied into exact integer
    * arithmetic (2·nulls_day·n_total > 3·n_day·nulls_total), so the
    * flag never sits on a floating-point boundary — both engines
    * classify identically from the same counts. The products run in
    * decimal(38,0) (HUGEINT on the oracle side): two 100 TB-scale
    * counts multiplied would overflow a 64-bit long (1e10 · 1e12 · 3),
    * and a silent wraparound would invert flags.
    *
    * Scale: one shuffle to the daily frame (conditional counts are
    * map-side partial), baseline is a broadcast one-row aggregate;
    * |days| rows of state at any volume.
    */
  def nullDrift(s: SparkSession, dir: String): DataFrame =
    nullDriftOn(Tables.events(s, dir))

  /** Null-rate drift over any events-shaped frame. */
  def nullDriftOn(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("user_id").isNull, 1)).as("null_users"),
        count(when(col("value").isNull, 1)).as("null_values"))
    val overall = ev.agg(
      count(lit(1)).as("t_n"),
      count(when(col("user_id").isNull, 1)).as("t_nu"),
      count(when(col("value").isNull, 1)).as("t_nv"))
    // rates round at SCALE 0 in micro-units (the tx21/tx25 boundary
    // discipline): round(x, 6) of a double quotient diverges between
    // Spark's shortest-string rounding and DuckDB's binary round when
    // the quotient's shortest repr ends in "…5" (e.g. 41/640) —
    // half-INTEGERS are exact doubles, so scale-0 rounds agree
    daily.crossJoin(broadcast(overall))
      .select(col("day"), col("n_events"), col("null_users"), col("null_values"),
        (round(col("null_users") * 1e6 / col("n_events"), 0).cast("long") / 1e6)
          .as("user_null_rate"),
        (round(col("null_values") * 1e6 / col("n_events"), 0).cast("long") / 1e6)
          .as("value_null_rate"),
        when(col("null_users").cast("decimal(38,0)") * col("t_n") * 2 >
             col("n_events").cast("decimal(38,0)") * col("t_nu") * 3, 1)
          .otherwise(0).as("user_drift"),
        when(col("null_values").cast("decimal(38,0)") * col("t_n") * 2 >
             col("n_events").cast("decimal(38,0)") * col("t_nv") * 3, 1)
          .otherwise(0).as("value_drift"))
  }

  /** dq08: per-producer field-shape drift — the monitor that catches a
    * producer CHANGING ITS KEY SHAPE, which is precisely the failure
    * behind the reference's 4-week silent SLO corruption
    * (003_create_http_logs_mv.sql's comment block: a producer's field
    * names didn't match the MV's expectations, rows silently fell out
    * of the http_logs fact, and every downstream SLO read wrong data
    * until a human noticed). ev31's producer gating makes the mapping
    * correct; THIS makes the failure visible the day it happens: per
    * (service, field key, day), the fraction of the service's rows
    * carrying that key, flagged when it collapses below half the
    * service's whole-stream baseline for that key — a renamed or
    * dropped key reads as a presence-rate step to zero.
    *
    * The comparison cross-multiplies into exact integer arithmetic
    * (2·n_with_key·svc_total < key_total·n_rows, in decimal(38,0) —
    * dq07's discipline, since two 100 TB-scale counts multiplied
    * overflow a long), and rates round at scale 0 in 1e-4 units.
    *
    * Scale: ONE corpus-scale aggregation — each row explodes to its
    * key set plus a `__row__` sentinel so per-day row counts and
    * per-key counts fall out of the same map-side-combined shuffle
    * (bounded fan-out: |keys|+1 ≤ ~7 per row). Everything after runs
    * on the |services|×|keys|×|days| frame: the candidate grid is
    * (service, key) × (service, day) — a key that disappears ENTIRELY
    * on a day (the postmortem case) still produces a flagged row,
    * which observed counts alone could never emit.
    */
  def fieldShapeDrift(s: SparkSession, dir: String): DataFrame =
    fieldShapeDriftOn(HttpLogs.httpLogsFromEvents(s, dir))

  /** Field-shape drift over any (ts, service_name, fields: map) frame. */
  def fieldShapeDriftOn(logs: DataFrame): DataFrame = {
    val counts = logs.select(
        date_trunc("day", col("ts")).as("day"),
        col("service_name"),
        explode(concat(array(lit("__row__")), map_keys(col("fields")))).as("key"))
      .groupBy("service_name", "key", "day")
      .agg(count(lit(1)).as("n"))
    val rowsPerDay = counts.filter(col("key") === "__row__")
      .select(col("service_name"), col("day"), col("n").as("n_rows"))
    val keyDay = counts.filter(col("key") =!= "__row__")
      .select(col("service_name"), col("key"), col("day"), col("n").as("n_with_key"))
    val svcTotal = rowsPerDay.groupBy("service_name").agg(sum("n_rows").as("svc_total"))
    val keyTotal = keyDay.groupBy("service_name", "key").agg(sum("n_with_key").as("key_total"))
    keyTotal.join(rowsPerDay, Seq("service_name"))
      .join(keyDay, Seq("service_name", "key", "day"), "left")
      .na.fill(0L, Seq("n_with_key"))
      .join(broadcast(svcTotal), Seq("service_name"))
      .select(col("service_name"), col("key"), col("day"), col("n_rows"), col("n_with_key"),
        microRatio(col("n_with_key"), col("n_rows"), 4).as("day_rate"),
        microRatio(col("key_total"), col("svc_total"), 4).as("base_rate"),
        when(col("n_with_key").cast("decimal(38,0)") * col("svc_total") * 2 <
             col("key_total").cast("decimal(38,0)") * col("n_rows"), 1)
          .otherwise(0).as("flagged"))
  }

  /** The whole-stream field-shape baseline (service_name, key,
    * key_total, svc_total) — the yardstick st19's live comparator
    * scores closed windows against (built batch-side from history,
    * broadcast into the stream; rebuild it on the dq02/es07 cadence).
    */
  def fieldShapeBaseline(logs: DataFrame): DataFrame = {
    val counts = logs.select(col("service_name"),
        explode(concat(array(lit("__row__")), map_keys(col("fields")))).as("key"))
      .groupBy("service_name", "key")
      .agg(count(lit(1)).as("n"))
    val svc = counts.filter(col("key") === "__row__")
      .select(col("service_name"), col("n").as("svc_total"))
    counts.filter(col("key") =!= "__row__")
      .withColumnRenamed("n", "key_total")
      .join(broadcast(svc), Seq("service_name"))
  }

  def sourceSignatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy("source")
      .agg(simhashAgg(col("token")).as("signature"), count(lit(1)).as("n_tokens"))
      .orderBy("source")

  /** dq06: snapshot diff — entity-level change classification between
    * the projected state as of T1 and as of T2 (the CDC / audit view
    * over knowledge-sovereign's append-only event log: "what changed
    * between the Monday and the Friday backfill?"). Reuses es06's
    * as-of projection on both sides; a full outer join on the entity
    * key classifies each entity as added (absent at T1), changed
    * (present at both, different last event), or unchanged. Removal
    * cannot occur under append-only semantics but the branch is kept
    * so the operator works on genuinely mutable snapshots too.
    *
    * Scale: both sides shuffle once on the entity key (the same
    * argmax-per-key plan as es01), the diff join co-partitions on that
    * key, and the output is one row per entity — never per event.
    */
  def snapshotDiff(s: SparkSession, dir: String,
                   t1: String = "2024-01-10",
                   t2: String = "2024-01-20"): DataFrame = {
    def st(t: String, tag: String): DataFrame =
      Events.stateAsOf(s, dir, t).select(
        col("user_id"),
        col("last_event_type").as(s"${tag}_event_type"),
        col("last_value").as(s"${tag}_value"),
        col("last_ts").as(s"${tag}_ts"))
    st(t1, "old").join(st(t2, "new"), Seq("user_id"), "full_outer")
      .withColumn("status",
        when(col("old_ts").isNull, lit("added"))
          .when(col("new_ts").isNull, lit("removed"))
          .when(col("old_ts") === col("new_ts") &&
                col("old_event_type") === col("new_event_type"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col("user_id"), col("status"),
              col("old_event_type"), col("old_value"), col("old_ts"),
              col("new_event_type"), col("new_value"), col("new_ts"))
  }
}
