package graft

import org.apache.spark.sql.functions._
import graft.operators.HomeItemScore

/** Rule-per-case pins for es12 (knowledge_home_projector/projector.go
  * score_op fold :52-68/:262-268): max-ops ratchet, set-ops
  * overwrite, later max-ops ratchet from the overwritten value.
  */
class HomeItemScoreSpec extends SparkSpec {
  import spark.implicits._

  /** (user, item, epoch, event_id, score, op) → rows by item. */
  private def run(rows: Seq[(Long, String, Long, Long, Double, String)]) =
    HomeItemScore.scoreFoldOn(
      rows.toDF("user_id", "item_key", "epoch", "event_id", "score", "op")
        .select(col("user_id"), col("item_key"),
          timestamp_seconds(col("epoch")).as("ts"), col("event_id"),
          col("score"), col("op")))
      .collect().map(r => r.getString(1) -> r).toMap

  // layout: user_id, item_key, score, suppressed, n_score_events, last_event_at

  test("max-ops ratchet upward in any order (the GREATEST merge): " +
       "0.5 then 0.8 then 0.7 holds 0.8") {
    val out = run(Seq(
      (1L, "a", 10L, 1L, 0.5, "max"),
      (1L, "a", 20L, 2L, 0.8, "max"),
      (1L, "a", 30L, 3L, 0.7, "max")))
    assert(out("a").getDouble(2) == 0.8 && out("a").getInt(3) == 0)
  }

  test("a set-op OVERWRITES — the :265-267 suppression bug fix: opened " +
       "after summary drops the stored 0.8 to 0.1") {
    val out = run(Seq(
      (1L, "a", 10L, 1L, 0.8, "max"),
      (1L, "a", 20L, 2L, 0.1, "set")))
    assert(out("a").getDouble(2) == 0.1 && out("a").getInt(3) == 1)
  }

  test("max-ops AFTER the set ratchet from the overwritten value: " +
       "opened (0.1 set) then a new summary (0.8 max) reads 0.8; an " +
       "EARLIER max never resurrects past the set") {
    val out = run(Seq(
      (1L, "a", 10L, 1L, 0.8, "max"),
      (1L, "a", 20L, 2L, 0.1, "set"),
      (1L, "a", 30L, 3L, 0.8, "max"),
      (1L, "b", 10L, 4L, 0.8, "max"),
      (1L, "b", 20L, 5L, 0.1, "set"),
      (1L, "b", 30L, 6L, 0.5, "max")))
    assert(out("a").getDouble(2) == 0.8)
    assert(out("b").getDouble(2) == 0.5,
      "b: 0.5 after the set beats 0.1; the pre-set 0.8 is gone")
  }

  test("the LAST set wins; ties on ts break by event_id (the feed's " +
       "(occurred_at, event_id) order)") {
    val out = run(Seq(
      (1L, "a", 10L, 1L, 0.9, "set"),
      (1L, "a", 20L, 2L, 0.1, "set"),
      (1L, "b", 10L, 3L, 0.1, "set"),
      (1L, "b", 10L, 4L, 0.9, "set")))
    assert(out("a").getDouble(2) == 0.1)
    assert(out("b").getDouble(2) == 0.9, "event_id 4 is later at equal ts")
  }

  test("st30: the streaming fold carries state across micro-batches " +
       "and agrees with the batch fold verdict-for-verdict") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long, Double, String)]
    val in = mem.toDF.toDF("user_id", "item_key", "epoch", "event_id", "score", "op")
      .select(col("user_id"), col("item_key"),
        timestamp_seconds(col("epoch")).as("ts"), col("event_id"),
        col("score"), col("op"))
      .as[graft.streaming.StreamOps.ScoreInput](
        org.apache.spark.sql.Encoders.product[graft.streaming.StreamOps.ScoreInput])
    val q = graft.streaming.StreamOps.scoreFoldStream(in)
      .writeStream.format("memory").queryName("st30").outputMode("update").start()
    try {
      mem.addData((1L, "a", 10L, 1L, 0.8, "max"))
      q.processAllAvailable()
      mem.addData((1L, "a", 20L, 2L, 0.1, "set"))   // overwrite across batches
      q.processAllAvailable()
      mem.addData((1L, "a", 30L, 3L, 0.5, "max"))   // ratchet from the set
      q.processAllAvailable()
      val hist = spark.sql("SELECT score, suppressed, n_score_events FROM st30")
        .collect().map(r => (r.getDouble(0), r.getBoolean(1), r.getLong(2))).toSet
      assert(hist == Set((0.8, false, 1L), (0.1, true, 2L), (0.5, true, 3L)),
        "each batch emits the then-current fold state")
      // the final state equals the batch fold on the full log
      val batch = run(Seq((1L, "a", 10L, 1L, 0.8, "max"),
        (1L, "a", 20L, 2L, 0.1, "set"), (1L, "a", 30L, 3L, 0.5, "max")))
      assert(batch("a").getDouble(2) == 0.5 && batch("a").getInt(3) == 1)
    } finally q.stop()
  }

  test("es12 over the corpus: every score is one of the four fold " +
       "constants, suppressed rows exist, and error events never " +
       "create items") {
    val out = HomeItemScore.es12(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set(0.5, 0.8, 0.7, 0.1)(r.getDouble(2))))
    assert(out.exists(_.getInt(3) == 1) && out.exists(_.getInt(3) == 0))
  }

  // ---- kh02 ----

  private val HourUs = 3600000000L
  private def rank(rows: Seq[(Long, String, Double, Long, Option[Long], Boolean)],
                   asOf: Long, pageSize: Int = 5) =
    HomeItemScore.rankedHomeOn(
      rows.toDF("user_id", "item_key", "score", "gen_us", "pub_us", "dismissed"),
      asOf, pageSize)
      .collect().map(r => r.getString(1) -> r).toMap

  // kh02 layout: user_id, item_key, score, rank_score, undated, page, pos_in_page

  test("kh02: the read-time day-decay — rank = score/(1 + age_days), " +
       "generated_at fallback when undated, GREATEST floors a " +
       "future-dated publish at decay zero (sql_fragments.go:37-39)") {
    val asOf = 1000L * 24 * HourUs
    val out = rank(Seq(
      (1L, "day1", 0.8, asOf, Some(asOf - 24 * HourUs), false),
      (1L, "undated", 0.8, asOf - 24 * HourUs, None, false),
      (1L, "future", 0.8, asOf, Some(asOf + 24 * HourUs), false)), asOf)
    assert(out("day1").getDouble(3) == 0.8 / 2.0, "one day old halves... /(1+1)")
    assert(out("undated").getDouble(3) == 0.8 / 2.0 &&
      out("undated").getInt(4) == 1, "generated_at drives the undated row")
    assert(out("future").getDouble(3) == 0.8, "negative age floors at 0")
  }

  test("kh02: order is (rank DESC, published DESC with undated LAST, " +
       "item_key DESC), dismissed rows never appear, pages split at " +
       "pageSize (:141/:192)") {
    val asOf = 1000L * 24 * HourUs
    val t = asOf - 12 * HourUs
    val out = rank(Seq(
      (1L, "a", 0.8, t, Some(t), false),
      (1L, "b", 0.8, t, Some(t - HourUs), false),
      (1L, "c", 0.8, t, None, false),          // same gen ts -> ties a's rank? no: undated uses gen_us = t -> same rank as a
      (1L, "gone", 0.9, t, Some(t), true)), asOf, pageSize = 2)
    assert(!out.contains("gone"))
    // a and c tie on rank (both age from t); published DESC NULLS LAST
    // puts a first, c after; b (older publish) ranks below both
    assert(out("a").getInt(6) == 1 && out("a").getInt(5) == 1)
    assert(out("c").getInt(6) == 2 && out("c").getInt(5) == 1)
    assert(out("b").getInt(5) == 2 && out("b").getInt(6) == 1, "page 2 starts at b")
  }

  test("kh02: the anchored-now invariant (:96-105) — with the anchor " +
       "held, page boundaries partition cleanly; a DRIFTED anchor " +
       "lowers the boundary row's rank below its own cursor value " +
       "(the each_key_duplicate bug the reference pins)") {
    val asOf = 1000L * 24 * HourUs
    val pub = asOf - 24 * HourUs
    val rows = (1 to 4).map(i =>
      (1L, f"it$i%02d", 0.8, asOf, Some(pub - i * HourUs), false))
    val page1 = rank(rows, asOf, pageSize = 2)
    val boundary = page1.values.find(r => r.getInt(5) == 1 && r.getInt(6) == 2).get
    val cursorRank = boundary.getDouble(3)
    // held anchor: recomputing at the SAME asOf reproduces the rank —
    // the keyset predicate (rank < cursor) admits exactly pages 2+
    val again = rank(rows, asOf, pageSize = 2)
    assert(again(boundary.getString(1)).getDouble(3) == cursorRank)
    // drifted anchor: one hour later the same row ranks strictly lower
    // than the cursor captured -> it would re-satisfy (rank < cursor)
    val drifted = rank(rows, asOf + HourUs, pageSize = 2)
    assert(drifted(boundary.getString(1)).getDouble(3) < cursorRank,
      "decay strictly shrinks — the reference re-binds the anchor instead")
  }

  test("kh02 over the corpus: dense pages per user, rank never exceeds " +
       "the stored score, the %13 dismissed class absent") {
    val out = HomeItemScore.kh02(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(3) <= r.getDouble(2) + 1e-12))
    val n = out.map(r => (r.getLong(0),
      r.getString(1).split("-").last.toInt)).count { case (u, i) => (u + i) % 13 == 0 }
    assert(n == 0, "dismissed rows excluded at read")
  }
}
