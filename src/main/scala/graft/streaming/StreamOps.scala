package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
import graft.functions.Numeric.microRatio

/** Structured Streaming operators (SURVEY §2 st01–st03).
  *
  * Mirrors the reference's continuous pipelines: rask-log-forwarder →
  * ClickHouse per-minute SLI materialized views (clickhouse/migrations/
  * 009_create_sli_metrics.sql) become watermarked windowed aggregates;
  * mq-hub's at-least-once delivery dedup becomes watermarked
  * dropDuplicates; knowledge-sovereign's event-stream session state
  * becomes flatMapGroupsWithState.
  *
  * All three run identically over `readStream` sources at cluster scale:
  * state is partitioned by group key in the state store, watermarks bound
  * state size, and the aggregation shuffles once on (window, key).
  */
object StreamOps {

  /** st01: watermarked tumbling-window counts per event_type — the
    * streaming form of Events.hourlyThroughput / the SLI throughput MV.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"))

  /** st07: streaming error-rate SLI — the exact streaming form of
    * clickhouse sli_error_rate_mv (countIf/count per window), emitted
    * once per closed window via watermark.
    */
  def windowedErrorRate(events: DataFrame, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        count(when(col("event_type") === "error", 1)).as("n_errors"),
        count(lit(1)).as("n_total"))
      .select(col("window.start").as("bucket"), col("n_errors"), col("n_total"),
              microRatio(col("n_errors"), col("n_total"), 4).as("error_rate"))

  /** st17: streaming long-format SLI projection — ev30's continuous
    * form, and the closest mirror of the reference's design: the
    * sli_metrics store is fed by CONTINUOUS materialized views, one
    * per metric, all writing (Timestamp, Metric, Value) rows into one
    * shared table. Here ONE windowed aggregation computes every
    * metric and a stateless `stack` emits the long-format rows when
    * the watermark closes the window — adding a metric is a column in
    * the aggregate, not another streaming query with its own state.
    * The error_rate rounds at scale 0 in 1e-4 units (the batch ev30
    * discipline). Parity with ev30 is EXACT for log_throughput and
    * error_rate; active_users is approximate by necessity — streaming
    * aggregation cannot hold exact countDistinct state, so it uses the
    * HLL sketch (relative error ~2% above the sparse-exact regime;
    * ev30 is the exact batch sibling, ev15/ev16 the batch HLL path).
    */
  def sliMetricsStream(events: DataFrame, windowLen: String = "1 minute",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("event_type") === "error", 1)).as("n_err"),
        approx_count_distinct("user_id").as("n_users"),
        count(when(col("value") < 100, 1)).as("n_sat"),
        count(when(col("value") >= 100 && col("value") < 500, 1)).as("n_tol"))
      .select(col("window.start").as("bucket"), expr(
        """stack(4,
             'log_throughput', CAST(n AS DOUBLE),
             'error_rate', CAST(ROUND(n_err * 1e4 / n) AS BIGINT) / 1e4,
             'active_users', CAST(n_users AS DOUBLE),
             'apdex', CAST(ROUND((2 * n_sat + n_tol) * 1e4 / (2 * n)) AS BIGINT) / 1e4
           ) AS (metric, value)"""))

  /** st18: ev31's http_logs golden-signals MV running CONTINUOUSLY —
    * the most literal streaming mirror in the repo, because the
    * reference artifact IS a continuous materialized view
    * (clickhouse/migrations/003_create_http_logs_mv.sql transforms
    * each arriving log row into the http_logs fact as it lands).
    * The producer-gated normalization is `HttpLogs.normalize`, the
    * IDENTICAL stateless operator body as batch (the st14 discipline —
    * filter+projection, no state), so the gating semantics that
    * prevented the reference's 4-week silent SLO corruption are
    * batch/stream-identical by construction; the rollup is one
    * watermarked per-minute windowed aggregation. Latency p95 uses
    * approx_percentile: a mergeable sketch is the only percentile
    * whose state a stream can hold (ev31's exact percentile is the
    * batch/oracle sibling — the ev03→ev11 precedent), and volume,
    * error count, error rate (scale-0 micro-units), and bytes are
    * exactly the batch arithmetic.
    */
  def goldenSignalsStream(logs: DataFrame, windowLen: String = "1 minute",
                          watermark: String = "2 hours"): DataFrame =
    graft.operators.HttpLogs.normalize(logs)
      .withColumn("dur_c", graft.functions.Numeric.cents(col("duration_ms")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        count(lit(1)).as("n_requests"),
        count(when(col("status_code") >= 500, 1)).as("n_errors"),
        microRatio(count(when(col("status_code") >= 500, 1)), count(lit(1)), 4).as("error_rate"),
        sum("response_size").as("total_bytes"),
        (round(expr("approx_percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_latency_ms"))
      .select(col("window.start").as("bucket"), col("n_requests"), col("n_errors"),
              col("error_rate"), col("total_bytes"), col("p95_latency_ms"))

  /** st19 (streaming half): watermarked per-window field-key counts —
    * dq08's one corpus-scale aggregation running continuously: each
    * log row explodes to its key set plus the `__row__` sentinel so
    * per-window row counts and per-key counts share one windowed
    * aggregation; state is bounded by live windows × services ×
    * (keys+1), never by volume. The monitor's value is LIVE — the
    * reference's producer-shape corruption ran silent for four weeks
    * precisely because nothing watched the key shape as it changed.
    */
  def windowedKeyCounts(logs: DataFrame, windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    logs
      .select(col("ts"), col("service_name"),
        explode(concat(array(lit("__row__")), map_keys(col("fields")))).as("key"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("service_name"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("service_name"), col("key"), col("n"))

  /** st19 (stateless half): score each closed window's key profile
    * against a static whole-stream baseline (service_name, key,
    * key_total, svc_total — DataQuality.fieldShapeBaseline), the st11
    * comparator pattern run inside foreachBatch or downstream of the
    * sink. A baseline key whose window presence-rate collapses below
    * half its baseline rate flags `missing` — INCLUDING keys entirely
    * absent from the window, which the baseline-side grid join
    * resurrects as zero-count rows (the postmortem case). Keys the
    * baseline has never seen flag `novel` (a producer ADDING a shape
    * is the same deploy-shaped event; st16's novelty discipline).
    * Flag arithmetic is dq08's exact decimal(38,0) cross-multiply.
    * Everything runs on the windows × services × keys frame.
    */
  /** st20: slo01's SLO-violation detection running CONTINUOUSLY —
    * per (service, 5-minute window) error rate above the 1%
    * threshold, evaluated on the same exact integers as the batch
    * form (100·errors > samples — a threshold must not flip on a
    * double in either mode). The window aligns to the epoch exactly
    * like slo01's floor(epoch/300) bucketing, so a closed stream
    * window and the batch row for the same 5 minutes are
    * BIT-IDENTICAL (the spec asserts it). State is one count pair
    * per live (service, window) — watermark-bounded, independent of
    * volume; the alert-shaped output is the point: the batch form
    * finds last week's violations, this one pages before the window
    * even closes downstream.
    */
  def sloViolationsStream(logs: DataFrame, watermark: String = "2 hours"): DataFrame =
    logs.select(col("ts"), col("service_name"),
        col("severity_text").isin("ERROR", "FATAL").cast("int").as("is_err"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "5 minutes"), col("service_name"))
      .agg(count(lit(1)).as("sample_count"), sum("is_err").as("n_err"))
      .filter(col("n_err") * 100 > col("sample_count"))
      .select(col("service_name"), col("window.start").as("time_bucket"),
        microRatio(col("n_err") * 100, col("sample_count"), 2).as("error_rate_pct"),
        col("sample_count"))

  /** st21: hs01's service-health scorecard running CONTINUOUSLY —
    * per (service, window): volume, error/warn counts, the exact
    * 3-dp error-rate percent, approx p95 latency (the mergeable
    * sketch is the only percentile a stream can hold — the ev31→st18
    * precedent), and the SAME penalty-ladder score + status bands as
    * batch (HealthScore.healthScore — the ladder itself is a
    * stateless projection, identical by construction). The log-gap
    * input pins to 0: a service present in the window is by
    * definition fresh, and a service ABSENT from the window emits no
    * row at all — staleness detection is the liveness monitor's job
    * (es08/st16), not the in-window scorer's.
    */
  def serviceHealthStream(logs: DataFrame, windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    val severe = col("severity_text").isin("ERROR", "FATAL")
    logs
      .withColumn("dur_c", graft.functions.Numeric.cents(
        coalesce(col("duration_ms"), lit(0.0))))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("service_name"))
      .agg(
        count(lit(1)).as("total_logs"),
        count(when(severe, 1)).as("error_count"),
        count(when(col("severity_text") === "WARNING", 1)).as("warn_count"),
        microRatio(count(when(severe, 1)) * 100, count(lit(1)), 3).as("error_rate"),
        (round(expr("approx_percentile(dur_c, 0.95)"), 0).cast("long") / 1e2).as("p95_ms"))
      .withColumn("health_score", graft.operators.HealthScore.healthScore(
        col("error_rate"), col("p95_ms"), lit(0L)))
      .withColumn("health_status",
        graft.operators.HealthScore.healthStatus(col("health_score")))
      .select(col("window.start").as("bucket"), col("service_name"),
        col("total_logs"), col("error_count"), col("warn_count"),
        col("error_rate"), col("p95_ms"), col("health_score"), col("health_status"))
  }

  def shapeDriftVsBaseline(keyCounts0: DataFrame, baseline: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // the closed-window frame is bounded (windows × services × keys) and
    // feeds BOTH sides of the grid join — a memory-sink View on both
    // sides of a join trips Spark's reference dedup (st11's
    // psiVsBaseline hit the same internal error), so materialize the
    // tiny frame once, the centroid-collect pattern
    val kcRows = keyCounts0.collect()
    val keyCounts = keyCounts0.sparkSession.createDataFrame(
      java.util.Arrays.asList(kcRows: _*), keyCounts0.schema)
    val rows = keyCounts.filter(col("key") === "__row__")
      .select(col("bucket"), col("service_name"), col("n").as("n_rows"))
    val obs = keyCounts.filter(col("key") =!= "__row__")
      .select(col("bucket"), col("service_name"), col("key"), col("n").as("n_with_key"))
    val scored = rows.join(broadcast(baseline), Seq("service_name"))
      .join(obs, Seq("bucket", "service_name", "key"), "left")
      .na.fill(0L, Seq("n_with_key"))
      .select(col("bucket"), col("service_name"), col("key"),
        col("n_rows"), col("n_with_key"),
        when(col("n_with_key").cast(dec) * col("svc_total") * 2 <
             col("key_total").cast(dec) * col("n_rows"), 1).otherwise(0).as("missing"),
        lit(0).as("novel"))
    val novel = obs
      .join(broadcast(baseline.select("service_name", "key")),
        Seq("service_name", "key"), "left_anti")
      .join(rows, Seq("bucket", "service_name"))
      .select(col("bucket"), col("service_name"), col("key"),
        col("n_rows"), col("n_with_key"), lit(0).as("missing"), lit(1).as("novel"))
    scored.unionByName(novel)
  }

  /** st09: streaming heavy hitters — approximate top-k keys per
    * tumbling window via the mergeable SpaceSaving aggregate (ev22's
    * streaming form; ClickHouse topK over a live SLI window). The
    * TypedImperativeAggregate's serialized buffer IS the state-store
    * value, so state per (window) group is a bounded capacity-entry
    * summary — never one state row per distinct key, which is what a
    * naive streaming groupBy(key).count() top-N would keep.
    */
  def windowedTopK(events: DataFrame, keyCol: String,
                   k: Int = 5, capacity: Int = 64,
                   windowLen: String = "1 hour",
                   watermark: String = "2 hours",
                   tsCol: String = "ts"): DataFrame = {
    import graft.functions.SpaceSavingAgg.spaceSavingTopK
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(spaceSavingTopK(col(keyCol).cast("string"), k, capacity).as("hh"))
      .select(col("window.start").as("bucket"), posexplode(col("hh")).as(Seq("i", "e")))
      .select(col("bucket"), (col("i") + 1).as("rank"),
              col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err"))
  }

  /** st10: gap-based session aggregation via the NATIVE session_window —
    * the declarative form of st02's flatMapGroupsWithState. Sessions
    * merge in the state store as mergeable window state (Spark unions
    * overlapping session windows per key), so this is the version to
    * prefer when per-session logic is pure aggregation: no user state
    * class, watermark bounds state, and the planner understands the
    * window column. Keep st02 for logic that must emit mid-session.
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"))

  /** st03: watermarked streaming dedup on event_id — the at-least-once →
    * exactly-once compaction mq-hub performs on redelivery.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id", "ts")

  /** st12: keyed streaming dedup with bounded state —
    * `dropDuplicatesWithinWatermark` dedups on the KEY ALONE while the
    * watermark still expires state. st03's classic form must include
    * the event-time column in the key, so a redelivery whose timestamp
    * was re-stamped (an mq-hub retry after a broker failover stamps a
    * new ingest time) slips through as a "new" row; this form catches
    * any redelivery arriving within the watermark window, which is the
    * delivery-system guarantee actually on offer.
    */
  def dedupStreamKeyed(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** st04: stream-static enrichment — a stream joined against a
    * (broadcastable) dimension table, the streaming form of the
    * ingestion pipeline enriching events with feed/user metadata.
    * The static side re-reads per micro-batch, so slowly-changing
    * dims stay fresh without restarting the query.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), key)

  /** st06: incremental CQRS projection — maintain a latest-state-per-key
    * table from an event stream with foreachBatch merge (the
    * knowledge-sovereign projector loop: knowledge_events →
    * knowledge_home_items, kept fresh per micro-batch instead of
    * replayed). Each batch reduces to its per-key latest row, then
    * merges against the existing projection parquet.
    */
  def maintainProjection(events: DataFrame, keyCol: String, tsCol: String,
                         projectionPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.foreachBatch { (rawBatch: DataFrame, _: Long) =>
      // persist: otherwise isEmpty runs one job and the merge re-reads
      // the batch source a second time
      val batch = rawBatch.persist()
      try {
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // ts desc + content-hash tie-break: equal-timestamp events and
          // at-least-once replays must resolve to the SAME winner every
          // time, or recovery can flip committed state
          def latest(df: DataFrame): DataFrame = df
            .withColumn("__rn", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
                .orderBy(col(tsCol).desc, xxhash64(df.columns.map(col): _*).asc)))
            .filter(col("__rn") === 1).drop("__rn")
          val target = new java.io.File(projectionPath)
          val backup = new java.io.File(projectionPath + "__backup")
          // crash recovery: a previous run that died mid-swap leaves the
          // state in the backup dir
          if (!target.exists() && backup.exists()) {
            if (!backup.renameTo(target))
              throw new IllegalStateException(s"projection recovery rename failed: $backup -> $target")
          }
          val merged =
            if (target.exists())
              latest(spark.read.parquet(projectionPath).unionByName(batch))
            else latest(batch)
          // staged swap with explicit failure checks — never delete the
          // only copy before its replacement is in place
          val staging = new java.io.File(projectionPath + "__staging")
          if (staging.exists()) org.apache.commons.io.FileUtils.deleteDirectory(staging)
          merged.write.mode("overwrite").parquet(staging.getPath)
          if (target.exists()) {
            if (backup.exists()) org.apache.commons.io.FileUtils.deleteDirectory(backup)
            if (!target.renameTo(backup))
              throw new IllegalStateException(s"projection swap rename failed: $target -> $backup")
          }
          if (!staging.renameTo(target))
            throw new IllegalStateException(s"projection swap rename failed: $staging -> $target")
          if (backup.exists()) org.apache.commons.io.FileUtils.deleteDirectory(backup)
        }
      } finally batch.unpersist()
      ()
    }.start()

  /** st08: stream-stream interval join — each purchase matched to the
    * same user's views from the preceding `joinWindowSec`, the
    * streaming form of AsOf.purchaseAfterView (and the "correlate a
    * log line with its trace within a window" join the reference's
    * observability stack performs between log and trace streams). Both
    * sides are watermarked and the join condition bounds view_ts to a
    * purchase-relative interval, so the state store provably drops
    * view state older than watermark + window — without the time bound
    * the state grows forever and the query is rejected at analysis.
    */
  def purchaseAfterViewStream(views: DataFrame, purchases: DataFrame,
                              joinWindowSec: Long = 1800,
                              watermark: String = "2 hours"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $joinWindowSec SECONDS"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id", "view_ts")
  }

  case class SessionInput(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp, n_events: Int)

  case class VolInput(service: String, ts: Timestamp)
  case class VolState(open: Map[Long, Long], prevN: Long)
  case class VolAlert(service: String, bucket_start: Timestamp,
                      recent: Long, previous: Long, ratio: Double)

  /** st26: continuous log-volume spike alerting — hw01's W6 rule
    * (analysis.py:317: a service's most recent hour at more than twice
    * the hour before it) running LIVE instead of at report time, which
    * is the form with operational value: a crash-restart loop or retry
    * storm doubles a service's log volume long before the daily report
    * reads mt04's frame.
    *
    * A bucket closes ONLY when the watermark passes its end — never on
    * the first later-bucket event — so in-watermark stragglers from a
    * slow producer still count (the batch rule reads FULL bucket
    * counts; closing early would under-count `recent` and over-fire
    * the next bucket's ratio). State per service is therefore the
    * open-bucket counts inside the watermark horizon — at most
    * ⌈watermark/bucket⌉+1 (count, start) pairs regardless of volume —
    * plus the previous closed count; empty buckets carry the last
    * non-empty count forward as "previous" (the batch rule compares
    * the two most recent buckets WITH data). Alert when
    * recent > 2 × previous, ratio at 1 dp on exact integers.
    */
  def volumeSpikeStream(events: Dataset[VolInput], bucketSec: Long = 3600,
                        watermark: String = "2 hours"): Dataset[VolAlert] = {
    import events.sparkSession.implicits._
    val bucketMs = bucketSec * 1000
    def close(service: String, s: VolState, watermarkMs: Long): (VolState, List[VolAlert]) = {
      val (done, open) = s.open.partition { case (b, _) => b + bucketMs <= watermarkMs }
      var prev = s.prevN
      val alerts = done.toSeq.sortBy(_._1).flatMap { case (b, n) =>
        val a = if (prev > 0 && n > prev * 2)
          Some(VolAlert(service, new Timestamp(b), n, prev,
            math.round(n * 10.0 / prev) / 10.0))
        else None
        prev = n
        a
      }
      (VolState(open, prev), alerts.toList)
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.service)
      .flatMapGroupsWithState[VolState, VolAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (service: String, rows: Iterator[VolInput], state: GroupState[VolState]) =>
          val incoming = rows.map(r => (r.ts.getTime / bucketMs) * bucketMs)
            .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val before = state.getOption.getOrElse(VolState(Map.empty, 0L))
          val merged = VolState(
            incoming.foldLeft(before.open) { case (m, (b, c)) =>
              m.updated(b, m.getOrElse(b, 0L) + c)
            }, before.prevN)
          val (after, alerts) = close(service, merged, state.getCurrentWatermarkMs())
          state.update(after)
          // wake when the watermark can close the earliest open bucket
          if (after.open.nonEmpty)
            state.setTimeoutTimestamp(after.open.keys.min + bucketMs)
          alerts.iterator
      }
  }

  /** st02: gap-based sessionization with custom state — the streaming
    * form of Events.sessionize. Sessions close after `gapSec` idle
    * (event-time timeout keyed by watermark); each closed session is
    * emitted once.
    */
  def sessionize(events: Dataset[SessionInput], gapSec: Long = 1800,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val gapMs = gapSec * 1000
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            // chain of late events older than the open session's window;
            // consecutive late events within the gap merge, and the chain
            // bridges into the open session if an event connects them
            var early: Option[SessionState] = None
            def flushEarly(): Unit = early.foreach { e =>
              closed ::= SessionOut(user, new Timestamp(e.start), new Timestamp(e.last), e.n)
              early = None
            }
            sorted.foreach { t =>
              cur match {
                // within gap of the session window on either side —
                // late-but-in-watermark events extend the START too
                case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
                  early match {
                    case Some(e) if t - e.last <= gapMs => // t bridges chain→session
                      cur = Some(SessionState(math.min(s.start, e.start),
                        math.max(s.last, t), s.n + e.n + 1))
                      early = None
                    case _ =>
                      flushEarly()
                      cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                  }
                case Some(s) if t > s.last =>
                  flushEarly()
                  closed ::= SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(_) =>
                  // older than the open session by more than the gap:
                  // accumulate into the late chain (sorted, so t >= e.last)
                  early = early match {
                    case Some(e) if t - e.last <= gapMs => Some(e.copy(last = t, n = e.n + 1))
                    case Some(_) => flushEarly(); Some(SessionState(t, t, 1))
                    case None => Some(SessionState(t, t, 1))
                  }
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            flushEarly()
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSec * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** st13: streaming exact top-k by VALUE per window — the live
    * leaderboard (largest purchases this hour) via the bounded-heap
    * TopKByAgg: the aggregate's k-entry buffer IS the state-store
    * value, so state per window is k entries regardless of event
    * volume, and it stays EXACT (st09's SpaceSaving counterpart is
    * for counted frequency, approximate above capacity).
    */
  def windowedTopValues(events: DataFrame, k: Int = 3,
                        windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    import graft.functions.TopKByAgg.topKBy
    events
      .withWatermark("ts", watermark)
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), windowLen))
      .agg(topKBy(col("value"), col("event_id"), k).as("top"))
      .select(col("window.start").as("bucket"), posexplode(col("top")).as(Seq("rk0", "e")))
      .select(col("bucket"), (col("rk0") + 1).as("rank"),
        col("e.id").as("event_id"), col("e.value").as("value"))
  }

  /** st11 (stateful half): watermarked per-window value-distribution
    * bin counts — the streaming form of dq04's binned profile (ev20's
    * histogram, emitted per closed window). State per (window, type,
    * bin) is one count; watermark bounds the live windows.
    */
  def windowedBinCounts(events: DataFrame, binWidth: Double = 50.0,
                        windowLen: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .filter(col("value").isNotNull)
      .groupBy(window(col("ts"), windowLen), col("event_type"),
               floor(col("value") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("event_type"), col("bin"), col("n"))

  /** st11 (stateless half): PSI of each closed window's bin profile
    * against a static baseline histogram (event_type, bin, n_b) — the
    * live drift monitor over windowedBinCounts, run inside foreachBatch
    * or as a downstream batch job over the sink (the st06 pattern).
    * PSI terms are scored on the baseline's bin support (a reference
    * histogram is a fixed yardstick), but the window's TOTAL count
    * includes its out-of-support bins — mass that moved off the
    * support must read as depletion of the support bins, or a fully
    * shifted window would smooth to zero drift. Laplace smoothing
    * keeps the log finite on support bins the window missed. A
    * (window, type) with NO baseline support at all — a brand-new
    * event type — cannot be scored numerically but is the maximally
    * drifted case: it emits psi NULL with drifted = 1, never a silent
    * absence. Baseline is bounded by (types × bins) and broadcasts;
    * per-window math runs on that same tiny frame.
    */
  def psiVsBaseline(binCounts: DataFrame, baseline: DataFrame,
                    threshold: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the (bucket, type) support list is bounded (live windows × types)
    // and must not stay a self-join of binCounts' plan — a memory-sink
    // View on both sides of a join trips reference dedup; collecting
    // the tiny distinct list is the centroid-collect pattern
    val proj = binCounts.select("bucket", "event_type").distinct()
    val buckets = binCounts.sparkSession.createDataFrame(
      java.util.Arrays.asList(proj.collect(): _*), proj.schema)
    val obs = binCounts.select(col("bucket"), col("event_type"), col("bin"),
      col("n"), lit(null).cast("long").as("n_b"))
    val base = buckets.join(broadcast(baseline), Seq("event_type"))
      .select(col("bucket"), col("event_type"), col("bin"),
        lit(null).cast("long").as("n"), col("n_b"))
    val wG = Window.partitionBy("bucket", "event_type")
    obs.unionByName(base)
      .groupBy("bucket", "event_type", "bin")
      .agg(max("n").as("n"), max("n_b").as("n_b"))
      .withColumn("tot_a", sum(coalesce(col("n"), lit(0L))).over(wG))
      .withColumn("tot_b", sum(coalesce(col("n_b"), lit(0L))).over(wG))
      .withColumn("n_bins", count(col("n_b")).over(wG))
      // terms exist only on support bins; a support-less group keeps its
      // rows (null terms) so it still aggregates to a (psi NULL) row
      .withColumn("p_a", when(col("n_b").isNotNull,
        (coalesce(col("n"), lit(0L)) + lit(0.5)) / (col("tot_a") + lit(0.5) * col("n_bins"))))
      .withColumn("p_b", when(col("n_b").isNotNull,
        (col("n_b") + lit(0.5)) / (col("tot_b") + lit(0.5) * col("n_bins"))))
      // Σ addends in exact integer micro-units — the dq04 batch form,
      // so batch/stream drift verdicts stay aligned
      .withColumn("addend_u",
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")) * 1e6, 0).cast("long"))
      .groupBy("bucket", "event_type")
      .agg(sum("addend_u").as("psi_u"))
      .select(col("bucket"), col("event_type"), (col("psi_u") / 1e6).as("psi"),
        when(col("psi_u").isNull || col("psi_u") > math.round(threshold * 1e6), 1)
          .otherwise(0).as("drifted"))
  }

  /** st14: streaming document quality gate — tx39's Gopher rule battery
    * applied in the ingest path. The battery is a stateless per-row
    * projection (no aggregation, no watermark, no state store), so the
    * IDENTICAL operator body runs unchanged under Structured Streaming:
    * low-quality documents are dropped at ingestion, before they ever
    * land in the lake — the shape the reference's pre-processor gate
    * implies, and the cheapest place to spend the filter at 100 TB/day
    * (a dropped doc is never written, compacted, or re-read).
    */
  def qualityGate(docs: DataFrame): DataFrame =
    graft.operators.TextOps.gopherRulesOn(docs).filter(col("keep"))

  /** st23: streaming genre classification at ingest — the kw02/gd01
    * presence battery with its in-row top-3 (pipeline/
    * genre_keywords.rs score_text + top_genres) running as articles
    * ARRIVE, which is the reference's actual shape (recap-worker
    * classifies each article when it ingests it, not in nightly
    * batches). Stateless — the IDENTICAL batch body, zero state
    * stores — so it chains after st14's quality gate and st22's
    * triage in one ingest pipeline; the emitted `genres` array is the
    * routing key downstream recap jobs consume.
    */
  def genreTagStream(docs: DataFrame): DataFrame =
    graft.operators.Golden.withTopGenres(docs, "text", "genres")

  /** st24: the COMPOSED ingest pipeline as one streaming query — the
    * capstone of the stateless-gate family: Gopher quality gate
    * (st14) drops junk on the raw text, the triage HTML cleanup +
    * category cascade (st22) normalizes what survives, the genre
    * presence battery (st23) attaches routing tags, and
    * prompt-injection neutralization (ps01) makes the text safe to
    * interpolate downstream. Every stage is a stateless codegen
    * projection, so the WHOLE pipeline runs with zero state stores,
    * one lineage, no joins — the shape that filters/normalizes/
    * routes 100 TB/day at ingest, with each dropped document never
    * written, compacted, or re-read. Row-identical to the batch
    * composition (spec-pinned).
    */
  def ingestPipeline(docs: DataFrame): DataFrame = {
    val gated = graft.operators.TextOps.gopherKeepOn(
        docs.select(col("doc_id"), col("source"), col("content").as("text")))
      .filter(col("keep"))
      .select(col("doc_id"), col("source"), col("text").as("content"))
    val triaged = graft.operators.Triage.withCleaned(gated)
      .withColumn("category", graft.operators.Triage.category)
    graft.operators.Golden.withTopGenres(triaged, "cleaned", "genres")
      .select(col("doc_id"), col("source"), col("category"), col("genres"),
        graft.operators.PromptSafety.neutralizeText(col("cleaned")).as("safe_text"))
  }

  /** st25: the Tier-1 classification gate at ingest — ti01's ordered
    * rejection ladder (tier1_classifier.go) running as articles
    * ARRIVE, which is where the reference actually runs it (the
    * pre-processor sidecar classifies each fetched article before
    * persisting). Stateless codegen projection over (doc_id, url,
    * content) — zero state stores — so it slots in FRONT of the st24
    * pipeline: a non-Tier-1 article is dropped before quality gating,
    * triage, or tagging ever see it, and the rejection reason streams
    * to the side for ingest observability. Row-identical to the batch
    * ladder (spec-pinned).
    */
  def tier1GateStream(articles: DataFrame): DataFrame =
    graft.operators.Tier1.tier1GateOnUnordered(articles)

  /** st28: feed-URL canonicalization at ingest — ur01's normalizeURL
    * running as feeds ARRIVE (the reference normalizes in
    * feeds_gateway.go at registration time; the batch ur01 is the
    * one-shot repair for history). The normalization is a stateless
    * codegen projection; duplicate registrations collapse with
    * `dropDuplicatesWithinWatermark` on the canonical URL —
    * FIRST-ARRIVAL-WINS, the stream-time form of the batch keep-oldest
    * rule, with state provably bounded to one canonical URL per
    * watermark window (the dd03/st15 ingest-gate shape).
    */
  def feedNormalizeStream(feeds: DataFrame,
                          watermark: String = "1 hour"): DataFrame =
    feeds
      .withColumn("normalized",
        graft.operators.FeedNormalize.normalizeUrl(col("link")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("normalized")

  /** st29: pe01's stage-health running CONTINUOUSLY — per closed
    * (window, stage): log volume, completed count, the exact 6-dp
    * success rate, and the alert ladder applied per stage with the
    * batch evaluator's own bands (pipeline_evaluator.py :117 via
    * config.py:85-86 — warn 0.95 / critical 0.90, strict <, compared
    * on the exact rational by integer cross-multiplication). The
    * batch evaluator's JOB-level success rate joins the jobs TABLE —
    * that rollup stays pe01's; the stream alerts on what the stage-log
    * stream itself carries (the st21 scoping precedent: what's absent
    * from the stream is the batch monitor's job). Every non-completed
    * row — failed OR still-running — counts against its stage, exactly
    * as :104's status == 'completed' test does.
    */
  def pipelineHealthStream(logs: DataFrame, windowLen: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame = {
    val done = count(when(col("status") === "completed", 1))
    logs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("stage"))
      .agg(count(lit(1)).as("n_logs"), done.as("n_completed"),
        microRatio(done, count(lit(1)), 6).as("success_rate"))
      .select(col("window.start").as("bucket"), col("stage"),
        col("n_logs"), col("n_completed"), col("success_rate"),
        when(col("n_completed") * 1000000L <
            lit(graft.operators.PipelineHealth.CriticalM) * col("n_logs"), "critical")
          .when(col("n_completed") * 1000000L <
            lit(graft.operators.PipelineHealth.WarnM) * col("n_logs"), "warn")
          .otherwise("ok").as("alert_level"))
  }

  case class RouteInput(router_id: String, seq: Long, needed_tokens: Long)
  case class RouteState(bucket: Long)
  case class RouteOut(router_id: String, seq: Long, requested_bucket: Long,
                      selected_bucket: Long, switched: Boolean)

  /** st27: the model router's 2× downgrade hysteresis
    * (model_router.py:140) as a stateful stream — the part of mr01's
    * routing that is inherently SEQUENTIAL per router process:
    * upgrades to a larger bucket apply immediately, a downgrade only
    * happens when the current bucket is ≥ 2 × the requested one
    * (avoids thrashing model loads on alternating prompt sizes), the
    * first request pins the bucket. State per router is ONE LONG;
    * rows fold in `seq` order within each micro-batch (the reference
    * router is a per-process serial call chain).
    */
  def modelRoutingStream(requests: Dataset[RouteInput],
                         buckets: Seq[Long] = Seq(
                           graft.operators.ModelRouting.Bucket8K,
                           graft.operators.ModelRouting.Bucket60K)): Dataset[RouteOut] = {
    import requests.sparkSession.implicits._
    val ladder = buckets.sorted
    requests
      .groupByKey(_.router_id)
      .flatMapGroupsWithState[RouteState, RouteOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (router: String, rows: Iterator[RouteInput], state: GroupState[RouteState]) =>
          var cur = state.getOption.map(_.bucket)
          val out = rows.toSeq.sortBy(_.seq).map { r =>
            val requested = ladder.find(r.needed_tokens <= _).getOrElse(ladder.last)
            val (selected, switched) = cur match {
              case None => (requested, true)                        // first selection pins
              case Some(c) if requested > c => (requested, true)    // upgrade always
              case Some(c) if c >= requested * 2 => (requested, true) // 2x rule satisfied
              case Some(c) => (c, false)                            // keep current
            }
            cur = Some(selected)
            RouteOut(router, r.seq, requested, selected, switched)
          }
          cur.foreach(b => state.update(RouteState(b)))
          out.iterator
      }
  }

  /** st15: streaming sentence-level dedup — tx28's semantics running
    * continuously (recap-worker's ACTUAL behavior: it hashes sentences
    * and keeps first occurrences as articles ARRIVE, not in nightly
    * batches). Documents explode to (doc, idx, sentence-hash) rows;
    * `dropDuplicatesWithinWatermark` on the 8-byte hash keeps the
    * first-seen occurrence of each sentence and expires state with the
    * watermark — cross-batch exact dedup with provably bounded state
    * (one hash per distinct sentence inside the window, vs unbounded
    * in the naive dropDuplicates form). Output is the surviving
    * sentence stream; re-assembly or per-doc survival stats are a
    * downstream aggregation.
    */
  def sentenceDedupStream(docs: DataFrame,
                          watermark: String = "2 hours"): DataFrame =
    docs
      .select(col("doc_id"), col("ts"),
        posexplode(graft.functions.TextFunctions.sentences(col("text")))
          .as(Seq("idx", "sentence")))
      .withColumn("h", xxhash64(col("sentence")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("h")
      .select("doc_id", "ts", "idx", "sentence")

  /** st16: streaming novel-template alert — lt02's first-seen
    * detection running continuously: mask each log line to its
    * Drain-style template and emit ONLY templates never seen before
    * (a deploy that introduces a new error class pages immediately,
    * instead of surfacing in the nightly rollup). `dropDuplicates` on
    * the template alone keeps one state row per DISTINCT template —
    * bounded by emitting code sites, not log volume, which is the
    * rare case where watermark-free dedup state is the correct
    * choice (the "seen" set must live forever or novelty is wrong).
    * The emitted row carries the FIRST minting line (earliest by
    * (ts, line)) as the alert sample — `flatMapGroupsWithState`
    * rather than `dropDuplicates("template")`, because the latter
    * keeps an ARBITRARY row per template within a multi-partition
    * micro-batch; the grouped iterator lets us elect the earliest
    * deterministically while holding the same one-boolean-per-
    * template state (O(1) memory over the iterator, never buffered).
    */
  def novelTemplateStream(lines: DataFrame): DataFrame = {
    val s = lines.sparkSession
    import s.implicits._
    lines
      .withColumn("template",
        graft.operators.LogMining.template(col("line")))
      .select(col("ts").as[Timestamp], col("template").as[String],
              col("line").as[String])
      .as[(Timestamp, String, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (Timestamp, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (template: String, rows: Iterator[(Timestamp, String, String)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(r => (r._1.getTime, r._3)))
          }
      }
      .toDF("ts", "template", "line")
  }

  case class ScoreInput(user_id: Long, item_key: String, ts: Timestamp,
                        event_id: Long, score: Double, op: String)
  case class ScoreState(lastSetTs: Long, lastSetEid: Long, score: Double, n: Long)
  case class ScoreOut(user_id: Long, item_key: String, score: Double,
                      suppressed: Boolean, n_score_events: Long)

  /** st30: the Knowledge Home score_op fold as an INCREMENTAL stream —
    * es12's batch fold (knowledge_home_projector/projector.go
    * :52-68/:262-268) in the form the projector actually runs it: a
    * per-batch apply over the ordered event log (RunBatch's checkpoint
    * loop). State per (user, item) is the fold's whole memory — the
    * last set-op's (ts, event_id) and the running score (max-ops
    * ratchet, a NEWER set overwrites, later max-ops ratchet from it).
    * Rows fold in (ts, event_id) order within each micro-batch, and
    * the stream carries the projector's own premise: the event feed is
    * the ordered log (a cross-batch late max-op older than the
    * standing set would wrongly ratchet — the reference's sequential
    * log consumption has the identical exposure, which is why its
    * checkpoint is a sequence number). Update-mode emission: one
    * current-score row per touched key per batch — exactly the
    * projector's upsert stream.
    */
  def scoreFoldStream(events: Dataset[ScoreInput]): Dataset[ScoreOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => (e.user_id, e.item_key))
      .mapGroupsWithState[ScoreState, ScoreOut](GroupStateTimeout.NoTimeout) {
        case ((user, item), rows, state) =>
          var st = state.getOption.getOrElse(
            ScoreState(Long.MinValue, Long.MinValue, Double.MinValue, 0L))
          rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
            val (t, eid) = (r.ts.getTime, r.event_id)
            st = r.op match {
              case "set" if t > st.lastSetTs ||
                  (t == st.lastSetTs && eid > st.lastSetEid) =>
                ScoreState(t, eid, r.score, st.n + 1)
              case "set" => st.copy(n = st.n + 1)
              case _ => st.copy(score = math.max(st.score, r.score), n = st.n + 1)
            }
          }
          state.update(st)
          ScoreOut(user, item, st.score, st.lastSetTs != Long.MinValue, st.n)
      }
  }

  /** st31: expanded-query line hygiene at SERVING time — rag13's
    * per-line rule ladder (expand_queries.go) running on each LLM
    * expansion line as it streams out of the generator. The drop
    * rules (scaffolding, length, garbage, romanization, date,
    * instruction/XML/conversation leaks) are all per-line stateless,
    * so they gate a stream with zero state stores; the
    * case-insensitive dedup and the 8-cap are per-RESPONSE assembly
    * steps and stay in the micro-batch that closes a response
    * (rag13's windows). Per-record the scaffolding chain re-evaluates
    * per rule (~10×) — the per-line cost an ingest gate pays where
    * the batch entry materializes once (QueryFilters' persist note).
    */
  def queryLineGateStream(lines: DataFrame): DataFrame = {
    import graft.operators.QueryFilters._
    val q = stripScaffolding(col("raw"))
    lines.withColumn("q", q)
      .filter(col("q").isNotNull)
      .filter(length(col("q")).between(MinQueryRuneLen, MaxQueryRuneLen))
      .filter(!isGarbage(col("q")))
      .filter(!isRomanized(col("q")))
      .filter(!trim(col("q")).rlike("^\\d{4}[-/.]\\d{1,2}[-/.]\\d{1,2}$"))
      .filter(!isInstructionLeak(col("q")))
      .filter(!(col("q").startsWith("<") && col("q").contains(">")))
      .filter(!(lower(col("q")).startsWith("assistant:") ||
        lower(col("q")).startsWith("user:")))
  }

  /** st32: the summary quality gate at ingest — qj01's full decision
    * (placeholder exemption, byte-length skip, three-tier score
    * parse, threshold) running as judge responses ARRIVE, which is
    * the reference's actual shape (JudgeArticleQuality runs per
    * summarized article inside the pre-processor worker, not
    * nightly). Stateless codegen projection — zero state stores; the
    * delete_summary rows stream to the compensating-transaction
    * consumer.
    */
  def summaryJudgeStream(rows: DataFrame): DataFrame =
    graft.operators.QualityJudge.judge(rows)

  /** st33: language detection at ingest — ld01's DetectLanguage on
    * each fetched article (article_driver.go:57 tags language at
    * fetch time; the batch ld01 is language_backfill.go's repair
    * shape). Stateless projection.
    */
  def langDetectStream(docs: DataFrame): DataFrame =
    docs.withColumn("detected",
      graft.operators.LangDetect.detect(col("text")))
}
