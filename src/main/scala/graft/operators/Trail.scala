package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Knowledge-trail read models — knowledge-sovereign's CQRS query side
  * beyond the es01-es07 projection machinery:
  *
  *  - es08: producer-liveness ages (app/driver/sovereign_db/
  *    read_projection_health.go:26): per REQUESTED event type, the age
  *    of its most recent event — the signal that distinguishes "the
  *    producer died" from "no usage". Types never seen publish a large
  *    sentinel age (the exporter's convention: visibly stale, never
  *    absent).
  *  - es09: trail footprints with wear bands (read_trail.go:124): the
  *    user's walked-item spine. Repeated contacts with one (item,
  *    verb) collapse to a single row that sorts by its LATEST contact,
  *    remembers its first, and carries the contact count; wear still
  *    folds over raw rows (a revisit deepens the path even though it
  *    no longer adds a row). Wear bands: has_ask or ≥4 raw contacts or
  *    (engaged and ≥2) → deep; ≥2 contacts or engaged → worn; else
  *    thin — where engaged means a dwell at or above the threshold or
  *    a legacy engaged label (the act-outcome side table, folded onto
  *    the same composed events here).
  *
  * The reference serves both per user id; the Spark form computes the
  * projection for EVERY user in one pass (the es01 batch-read-model
  * discipline) — the per-user query is then a key lookup.
  *
  * Scale: es08 is one map-side-combined max per type joined to a
  * literal requested-type frame; es09 is two aggregations of the same
  * scan keyed by (user, item[, verb]) — both map-side combined, the
  * wear join on the bounded collapsed frame. No windows: the
  * latest-contact exemplar is a struct-max aggregate, not a sort.
  */
object Trail {

  /** es08: seconds since each requested producer's latest event, with
    * the never-seen sentinel. `now` is the corpus max timestamp, so
    * the ages are deterministic (the reference uses wall-clock now()).
    */
  def producerLiveness(s: SparkSession, dir: String,
                       requested: Seq[String] = Seq("view", "click", "purchase",
                         "signup", "error", "recap.topic_snapshotted"),
                       sentinelAge: Long = 999999999L): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir)
      .select(col("event_type"), date_trunc("second", col("ts")).as("ts_s"))
    val perType = e.groupBy("event_type").agg(max("ts_s").as("latest"))
    val now = e.agg(max("ts_s").as("now_ts"))
    requested.toDF("event_type")
      .join(broadcast(perType), Seq("event_type"), "left")
      .crossJoin(broadcast(now))
      .select(col("event_type"),
        when(col("latest").isNotNull,
          unix_timestamp(col("now_ts")) - unix_timestamp(col("latest")))
          .otherwise(sentinelAge).as("age_seconds"))
  }

  /** es09: the collapsed trail spine with wear bands, for every user.
    * Composition: item from the payload key, verb from the event type
    * (click is the 'asked' verb that deepens wear), dwell = value with
    * the engaged threshold at 150, legacy engaged label on k % 19.
    */
  def trailWear(s: SparkSession, dir: String,
                engagedDwell: Double = 150.0): DataFrame = {
    val e = Tables.events(s, dir)
    val k = coalesce(
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0))
    trailWearOn(e.select(
      coalesce(col("user_id"), lit(0L)).as("user_id"),
      concat(lit("item-"), pmod(k, lit(20))).as("item_key"),
      when(col("event_type") === "view", "walked")
        .when(col("event_type") === "click", "asked")
        .when(col("event_type") === "purchase", "acted")
        .when(col("event_type") === "signup", "saved")
        .otherwise("flagged").as("verb"),
      col("ts"), col("event_id"),
      coalesce(col("value"), lit(0.0)).as("dwell"),
      (k % 19 === 0).as("legacy_engaged")), engagedDwell)
  }

  /** The spine + wear computation over any (user_id, item_key, verb,
    * ts, event_id, dwell, legacy_engaged) footprints frame.
    */
  def trailWearOn(base: DataFrame, engagedDwell: Double = 150.0): DataFrame = {
    // wear folds over RAW rows per item; engagement is the act-outcome
    // gate (dwell threshold OR legacy label) folded in the same pass
    val wear = base.groupBy("user_id", "item_key")
      .agg(count(lit(1)).as("cnt"),
        max(when(col("verb") === "asked", 1).otherwise(0)).as("has_ask"),
        max(when(col("dwell") >= engagedDwell || col("legacy_engaged"), 1).otherwise(0))
          .as("engaged"))
    val collapsed = base.groupBy("user_id", "item_key", "verb")
      .agg(count(lit(1)).as("contact_count"),
        min("ts").as("first_ts"),
        max(struct(col("ts"), col("event_id"))).as("last"))
    collapsed.join(wear, Seq("user_id", "item_key"))
      .select(col("user_id"), col("item_key"), col("verb"),
        col("contact_count"), col("first_ts"),
        col("last.ts").as("last_ts"), col("last.event_id").as("last_event_id"),
        when(col("has_ask") === 1 || col("cnt") >= 4 ||
             (col("engaged") === 1 && col("cnt") >= 2), "deep")
          .when(col("cnt") >= 2 || col("engaged") === 1, "worn")
          .otherwise("thin").as("wear"))
  }

  /** es10: the stream hard-cap trim report (mq-hub/app/usecase/
    * trim_streams_usecase.go:17 TrimStreamsUsecase) — every known
    * stream is held to an absolute MAXLEN ceiling; the maintenance
    * pass exists because publish-time trimming rides XADD, which is
    * exactly the command a maxmemory-locked Redis rejects, so only
    * the out-of-band XTRIM can release the latch. The report records
    * per-stream deletions ONLY where something was trimmed
    * (report.PerStream keeps `deleted > 0`, :58) plus the pass total.
    *
    * The batch form needs no ranking at all: deleted = max(n − cap,
    * 0) per stream — one map-side-combined count, the under-cap
    * streams filtered out, the total a broadcast one-row frame. (The
    * retained-rows side of a count-capped retention is q25's
    * top-N-per-group shape; the REPORT is pure aggregation.)
    */
  def streamTrimReport(s: SparkSession, dir: String,
                       hardMaxLen: Long = 200L): DataFrame =
    streamTrimReportOn(Tables.events(s, dir), hardMaxLen)

  def streamTrimReportOn(events: DataFrame, hardMaxLen: Long): DataFrame = {
    val perStream = events
      .groupBy(col("event_type").as("stream"))
      .agg(count(lit(1)).as("n_before"))
      .filter(col("n_before") > hardMaxLen)
      .select(col("stream"), col("n_before"),
        (col("n_before") - hardMaxLen).as("n_deleted"),
        lit(hardMaxLen).as("n_kept"))
    val total = perStream.agg(coalesce(sum("n_deleted"), lit(0L)).as("total_deleted"))
    perStream.crossJoin(broadcast(total))
  }
}
