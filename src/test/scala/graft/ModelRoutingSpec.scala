package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.ModelRouting
import graft.streaming.StreamOps

/** Specs for mr01 (the token-budget routing decision) and st27 (the
  * 2× downgrade hysteresis as a stateful stream).
  */
class ModelRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def route(text: String) =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(col("doc_id") +: ModelRouting.routingColumns(col("text")): _*)
      .head()

  test("mr01: token estimate, margin max, bucket boundary, overflow flag") {
    // empty text → max(1, 0) = 1 token; margin floor 512
    val empty = route("")
    assert(empty.getAs[Long]("prompt_tokens") == 1L)
    assert(empty.getAs[Long]("safety_margin") == 512L)
    assert(empty.getAs[Long]("bucket") == 8192L)
    // 100 chars → 75 tokens; 10% = 7 < 512 → fixed margin wins
    assert(route("a" * 100).getAs[Long]("safety_margin") == 512L)
    // 10000 chars → 7500 tokens; 10% = 750 > 512 → percent wins
    val big = route("a" * 10000)
    assert(big.getAs[Long]("prompt_tokens") == 7500L)
    assert(big.getAs[Long]("safety_margin") == 750L)
    // needed = 7500 + 1200 + 750 = 9450 > 8192 → 60K model
    assert(big.getAs[Long]("needed_tokens") == 9450L)
    assert(big.getAs[String]("model") == "gemma3-4b-60k")
    // the exact 8K boundary: needed == 8192 stays on the 8K model
    // tokens t with max(t/10, 512) margin: t = 6480 → 648 margin →
    // needed = 6480+1200+648 = 8328 > 8192; t = 6356 (8475 chars)
    // → 635 margin → needed = 8191 → 8K
    val atEdge = route("a" * 8475)
    assert(atEdge.getAs[Long]("needed_tokens") == 8191L)
    assert(atEdge.getAs[Long]("bucket") == 8192L)
    // past 60K → still the 60K model, flagged for hierarchical summarization
    val huge = route("a" * 90000)
    assert(huge.getAs[String]("model") == "gemma3-4b-60k")
    assert(huge.getAs[Boolean]("needs_hierarchical"))
  }

  test("mr01: the 8K-only branch always routes to the 8K model") {
    val r = Seq((1L, "a" * 90000)).toDF("doc_id", "text")
      .select(col("doc_id") +:
        ModelRouting.routingColumns(col("text"), model60kEnabled = false): _*)
      .head()
    assert(r.getAs[Long]("bucket") == 8192L)
  }

  test("st27: first pins, upgrades immediate, 2x-rule downgrades, keep-current on near misses") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    // a 3-bucket ladder makes the keep branch live: 12288 < 8192*2
    val out = StreamOps.modelRoutingStream(
      mem.toDF.toDF("router_id", "seq", "needed_tokens").as[StreamOps.RouteInput],
      buckets = Seq(8192L, 12288L, 61440L))
    val q = out.writeStream.format("memory").queryName("st27").outputMode("append").start()
    try {
      mem.addData(
        ("r", 1L, 5000L),   // first → 8192, pins
        ("r", 2L, 10000L),  // upgrade → 12288
        ("r", 3L, 5000L))   // requested 8192; 12288 < 16384 → KEEP 12288
      q.processAllAvailable()
      mem.addData(
        ("r", 4L, 30000L),  // upgrade → 61440 (state carried across batches)
        ("r", 5L, 5000L))   // requested 8192; 61440 ≥ 16384 → switch down
      q.processAllAvailable()
      val rows = spark.sql("SELECT seq, requested_bucket, selected_bucket, switched FROM st27")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
      assert(rows == Seq(
        (1L, 8192L, 8192L, true),
        (2L, 12288L, 12288L, true),
        (3L, 8192L, 12288L, false),
        (4L, 61440L, 61440L, true),
        (5L, 8192L, 8192L, true)))
    } finally q.stop()
  }

  test("mr01 composes at sf0.001: one row per document, both models in play") {
    val out = ModelRouting.mr01(spark, sfDir).collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    out.foreach { r =>
      assert(r.getAs[Long]("needed_tokens") ==
        r.getAs[Long]("prompt_tokens") + 1200 + r.getAs[Long]("safety_margin"))
    }
  }
}
