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
}
