package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (point-in-time) join — for each left row, the most recent
  * right row at or before its timestamp, per key.
  *
  * Spark has no native ASOF JOIN; the naive formulations are a range
  * cross-join (quadratic) or a per-row correlated subquery (driver
  * death). This is the scalable shape: tag both sides, union, and take
  * a running `last(..., ignoreNulls)` over a per-key time-ordered
  * window — one shuffle on the key, linear work, identical semantics
  * on any engine (the DuckDB oracle runs the same window, which also
  * pins tie-breaking: right rows sort before left rows at equal
  * timestamps, later event_id wins among equal right rows).
  *
  * The reference shape: correlating a knowledge event with the latest
  * preceding state snapshot (knowledge-sovereign's event→projection
  * reads), or a log line with the deployment that preceded it.
  */
object AsOf {

  /** Generic as-of join on `key`: left (key, ts, leftId) gains
    * right's (rightId, ts) of the latest right row with ts <= left.ts.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, idCol: String): DataFrame = {
    val l = left.select(col(key), col(tsCol).as("__ts"), col(idCol).as("__id"), lit(1).as("__is_left"))
    val r = right.select(col(key), col(tsCol).as("__ts"), col(idCol).as("__id"), lit(0).as("__is_left"))
    val w = Window.partitionBy(key)
      .orderBy(col("__ts").asc, col("__is_left").asc, col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("__asof_id", last(when(col("__is_left") === 0, col("__id")), ignoreNulls = true).over(w))
      .withColumn("__asof_ts", last(when(col("__is_left") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(col(key), col("__id").as(idCol), col("__ts").as(tsCol),
              col("__asof_id").as(s"asof_$idCol"), col("__asof_ts").as(s"asof_$tsCol"))
  }

  /** As-of join with a staleness tolerance: like `joinAsOf`, but a
    * matched right row older than `toleranceSec` is rejected (matches
    * become NULL). The real-world contract of every as-of read — a
    * price/state snapshot from last week is usually worse than no
    * snapshot. Same single-shuffle union+window plan; the tolerance is
    * a post-window projection, so the cost is identical to the
    * untolerated join.
    */
  def joinAsOfTolerance(left: DataFrame, right: DataFrame, key: String,
                        tsCol: String, idCol: String, toleranceSec: Long): DataFrame = {
    val within = col(s"asof_$tsCol").isNotNull &&
      unix_timestamp(col(tsCol)) - unix_timestamp(col(s"asof_$tsCol")) <= toleranceSec
    joinAsOf(left, right, key, tsCol, idCol)
      .withColumn(s"asof_$idCol", when(within, col(s"asof_$idCol")))
      .withColumn(s"asof_$tsCol", when(within, col(s"asof_$tsCol")))
  }

  /** asof02 adapter: purchases matched to the user's most recent view
    * only when it happened within the last hour — stale attributions
    * fall out as NULL.
    */
  def purchaseAfterRecentView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    joinAsOfTolerance(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"),
      "user_id", "ts", "event_id", toleranceSec = 3600)
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"),
              col("asof_event_id").as("view_id"), col("asof_ts").as("view_ts"))
  }

  /** asof01 adapter: each purchase matched to the user's most recent
    * view at or before it.
    */
  def purchaseAfterView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    joinAsOf(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"),
      "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("ts").as("purchase_ts"),
              col("asof_event_id").as("view_id"), col("asof_ts").as("view_ts"))
  }

  /** asof03: NEAREST-within as-of — match each purchase to the closest
    * view in either direction within a tolerance, preferring the
    * earlier (backward) view on exact ties. asof01 is the pure
    * backward-looking form; sensor/trace alignment usually wants
    * nearest-in-time (pandas merge_asof direction='nearest').
    *
    * Same linear shape, still one shuffle: both sides share ONE
    * user-partitioned time sort, the backward candidate is a running
    * last-non-null and the forward candidate a first-non-null over the
    * tail frame of the SAME sort — never a range cross-join. Views
    * order before purchases at equal timestamps so a same-second view
    * matches at Δ=0.
    */
  def nearestViewWithin(s: SparkSession, dir: String,
                        tolSec: Long = 3600L): DataFrame = {
    val f = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("ts_s", date_trunc("second", col("ts")))
      .withColumn("is_view", (col("event_type") === "view").cast("int"))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_s").asc, col("is_view").desc, col("event_id").asc)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val viewTs = when(col("is_view") === 1, col("ts_s"))
    val cand = f
      .withColumn("prev_view_ts", last(viewTs, ignoreNulls = true).over(back))
      .withColumn("next_view_ts", first(viewTs, ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "purchase")
      .withColumn("d_prev", unix_timestamp(col("ts_s")) - unix_timestamp(col("prev_view_ts")))
      .withColumn("d_next", unix_timestamp(col("next_view_ts")) - unix_timestamp(col("ts_s")))
    val takePrev = col("prev_view_ts").isNotNull && col("d_prev") <= tolSec &&
      (col("next_view_ts").isNull || col("d_next") > tolSec || col("d_prev") <= col("d_next"))
    val takeNext = !takePrev && col("next_view_ts").isNotNull && col("d_next") <= tolSec
    cand.select(
      col("user_id"), col("event_id").as("purchase_id"), col("ts_s").as("purchase_ts"),
      when(takePrev, col("prev_view_ts")).when(takeNext, col("next_view_ts")).as("nearest_view_ts"),
      when(takePrev, -col("d_prev")).when(takeNext, col("d_next")).as("delta_s"),
      when(takePrev, lit("backward")).when(takeNext, lit("forward")).as("direction"))
  }
}
