package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the round-4 widening batch: time-RANGE window frames
  * (q27), novel-template detection (lt02), null-rate drift (dq07),
  * and reciprocal-rank-fusion hybrid retrieval (rag05).
  */
class Round4cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("q27 trailing spend: RANGE frame is value-based — sparse and bursty customers both correct") {
    val orders = Seq(
      // customer 1: 2024-01-01, 2024-01-20, 2024-01-31, 2024-03-05
      (1L, 1L, ts("2024-01-01 00:00:00"), 100.00),
      (2L, 1L, ts("2024-01-20 00:00:00"), 50.25),
      (3L, 1L, ts("2024-01-31 00:00:00"), 25.00),
      (4L, 1L, ts("2024-03-05 00:00:00"), 10.10),
      // customer 2: a single order
      (5L, 2L, ts("2024-01-05 00:00:00"), 7.77))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.trailingSpendOn(orders, days = 30).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[Double]("trailing_spend"), r.getAs[Long]("trailing_orders"))).toMap
    assert(out(1L) == (100.00, 1L))
    assert(out(2L) == (150.25, 2L))
    // 2024-01-01 is EXACTLY 30 days before 2024-01-31 — the RANGE
    // frame is inclusive at the lower bound, so all three are in
    assert(out(3L) == (175.25, 3L))
    // a row-frame would have seen the previous 3 orders here; the
    // value frame correctly sees none of them (29+ day gap)
    assert(out(4L) == (10.10, 1L))
    assert(out(5L) == (7.77, 1L))
  }

  private def ev(rows: Seq[(Long, Timestamp, java.lang.Long, String, java.lang.Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("lt02 novel templates: first-seen day counts the template as novel exactly once") {
    val events = ev(Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "alpha", 1.0, "{}"),
      (2L, ts("2024-01-01 02:00:00"), 2L, "beta", 2.0, "{}"),
      (3L, ts("2024-01-02 01:00:00"), 3L, "alpha", 3.0, "{}"),
      (4L, ts("2024-01-02 02:00:00"), 4L, "gamma", 4.0, "{}"),
      (5L, ts("2024-01-03 01:00:00"), 5L, "gamma", 5.0, "{}")))
    val out = LogMining.novelTemplatesOn(events).collect()
      .map(r => r.getAs[Timestamp]("day").toString.take(10) ->
        (r.getAs[Long]("n_templates"), r.getAs[Long]("n_novel"), r.getAs[Long]("n_lines"))).toMap
    // day1 introduces alpha+beta (both novel); day2 re-sees alpha and
    // introduces gamma; day3 re-sees gamma only
    assert(out("2024-01-01") == (2L, 2L, 2L))
    assert(out("2024-01-02") == (2L, 1L, 2L))
    assert(out("2024-01-03") == (1L, 0L, 1L))
  }

  test("lt02 null-safe lines: NULL user/props rows mine a real template, never a NULL group") {
    val events = ev(Seq(
      (1L, ts("2024-01-01 01:00:00"), null, "alpha", 1.0, "{}"),
      (2L, ts("2024-01-01 02:00:00"), 1L, "alpha", null, "{}"),
      (3L, ts("2024-01-02 01:00:00"), null, "alpha", 1.0, "{}")))
    val out = LogMining.novelTemplatesOn(events).collect()
      .map(r => r.getAs[Timestamp]("day").toString.take(10) ->
        (r.getAs[Long]("n_templates"), r.getAs[Long]("n_novel"), r.getAs[Long]("n_lines"))).toMap
    // the coalesce guard keeps NULL-field lines alive: 'user=null'
    // (no digits) is a constant token, 'user=1' masks to <*> — so
    // day 1 mines TWO templates (null-user vs digit-user), both
    // novel, and day 2 re-sees the null-user one
    assert(out("2024-01-01") == (2L, 2L, 2L), s"day1: $out")
    assert(out("2024-01-02") == (1L, 0L, 1L), s"day2: $out")
    // novelty never exceeds the distinct-template count — the
    // inconsistency a NULL template group used to create
    out.values.foreach { case (nt, nn, _) => assert(nn <= nt, s"n_novel > n_templates: $out") }
  }

  test("dq07 null drift: integer cross-multiplied flag — no FP boundary, exact 1.5x threshold") {
    val events = ev(Seq(
      // day1: 4 rows, 1 null user (25% vs 62.5% baseline -> clean)
      (1L, ts("2024-01-01 01:00:00"), null, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 02:00:00"), 1L, "a", 1.0, "{}"),
      (3L, ts("2024-01-01 03:00:00"), 2L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 04:00:00"), 3L, "a", 1.0, "{}"),
      // day2: 4 rows, all user_id null (100% > 1.5 x 62.5% -> drift)
      (5L, ts("2024-01-02 01:00:00"), null, "a", 1.0, "{}"),
      (6L, ts("2024-01-02 02:00:00"), null, "a", 1.0, "{}"),
      (7L, ts("2024-01-02 03:00:00"), null, "a", 1.0, "{}"),
      (8L, ts("2024-01-02 04:00:00"), null, "a", 1.0, "{}")))
    val out = DataQuality.nullDriftOn(events).collect()
      .map(r => r.getAs[Timestamp]("day").toString.take(10) ->
        (r.getAs[Int]("user_drift"), r.getAs[Int]("value_drift"))).toMap
    assert(out("2024-01-01") == (0, 0))
    assert(out("2024-01-02") == (1, 0))
    // exact-boundary case: day rate exactly 1.5x baseline must NOT
    // flag (strict >): one day 3/4 null, other day 1/4 null ->
    // baseline 1/2, threshold 3/4 — equality, not excess
    val boundary = ev(Seq(
      (1L, ts("2024-01-01 01:00:00"), null, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 02:00:00"), null, "a", 1.0, "{}"),
      (3L, ts("2024-01-01 03:00:00"), null, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 04:00:00"), 1L, "a", 1.0, "{}"),
      (5L, ts("2024-01-02 01:00:00"), null, "a", 1.0, "{}"),
      (6L, ts("2024-01-02 02:00:00"), 2L, "a", 1.0, "{}"),
      (7L, ts("2024-01-02 03:00:00"), 3L, "a", 1.0, "{}"),
      (8L, ts("2024-01-02 04:00:00"), 4L, "a", 1.0, "{}")))
    val b = DataQuality.nullDriftOn(boundary).collect()
      .map(r => r.getAs[Timestamp]("day").toString.take(10) -> r.getAs[Int]("user_drift")).toMap
    assert(b("2024-01-01") == 0 && b("2024-01-02") == 0)
  }

  test("ev29 sequence count: greedy non-overlapping matching via the run-boundary identity") {
    def e(id: Long, t: String, u: Long, typ: String) =
      (id, ts(t), (u: java.lang.Long), typ, (1.0: java.lang.Double), "{}")
    val events = ev(Seq(
      // user 1: V V P P V P -> greedy matches (V,P) then (V,P) = 2
      e(1, "2024-01-01 01:00:00", 1L, "view"),
      e(2, "2024-01-01 02:00:00", 1L, "view"),
      e(3, "2024-01-01 03:00:00", 1L, "purchase"),
      e(4, "2024-01-01 04:00:00", 1L, "purchase"),
      e(5, "2024-01-01 05:00:00", 1L, "view"),
      e(6, "2024-01-01 06:00:00", 1L, "purchase"),
      // user 2: P V -> purchase before any view never matches
      e(7, "2024-01-01 01:00:00", 2L, "purchase"),
      e(8, "2024-01-01 02:00:00", 2L, "view"),
      // user 3: interleaved with ignored event types
      e(9, "2024-01-01 01:00:00", 3L, "view"),
      e(10, "2024-01-01 01:30:00", 3L, "click"),
      e(11, "2024-01-01 02:00:00", 3L, "purchase"),
      e(12, "2024-01-01 03:00:00", 3L, "view"),
      e(13, "2024-01-01 04:00:00", 3L, "purchase")))
    val out = Events.sequenceCountOn(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_matches")).toMap
    assert(out == Map(1L -> 2L, 3L -> 2L), s"got $out")
  }

  test("q28 trend dashboard: bucket axis is the union of all sources, gaps fill with zero") {
    val out = Relational.trendDashboard(spark, sfDir).collect()
    assert(out.nonEmpty)
    // no nulls anywhere — COALESCE guarantees a dense frame
    out.foreach { r => (0 until r.length).foreach(i =>
      assert(!r.isNullAt(i), s"null at ${r.schema.fieldNames(i)} in $r")) }
    val buckets = out.map(_.getAs[Timestamp]("bucket")).toSet
    // every source's buckets are present in the merged axis
    def srcBuckets(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(date_trunc("day", col(c)).as("b")).distinct()
        .collect().map(_.getAs[Timestamp]("b")).toSet
    val ob = srcBuckets(graft.Tables.orders(spark, sfDir), "o_orderdate")
    val eb = srcBuckets(graft.Tables.events(spark, sfDir), "ts")
    assert(ob.subsetOf(buckets) && eb.subsetOf(buckets))
    // orders and events barely overlap in time — the outer join is
    // doing real gap work: event-only buckets carry zero orders
    val eventOnly = (eb -- ob)
    if (eventOnly.nonEmpty) {
      val zeroed = out.filter(r => eventOnly.contains(r.getAs[Timestamp]("bucket")))
      assert(zeroed.forall(_.getAs[Long]("n_orders") == 0L))
      assert(zeroed.forall(_.getAs[Double]("revenue") == 0.0))
    }
  }

  test("ev30 SLI projection: one pass emits the long-format metric table with exact values") {
    val events = ev(Seq(
      (1L, ts("2024-01-01 00:00:10"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 00:00:20"), 1L, "error", 1.0, "{}"),
      (3L, ts("2024-01-01 00:00:30"), 2L, "view", 1.0, "{}"),
      (4L, ts("2024-01-01 00:00:40"), 2L, "error", 1.0, "{}"),
      (5L, ts("2024-01-01 00:01:10"), 3L, "view", 1.0, "{}")))
    val out = Events.sliProjectionOn(events).collect()
      .map(r => (r.getAs[Timestamp]("bucket").toString.take(16), r.getAs[String]("metric")) ->
        r.getAs[Double]("value")).toMap
    assert(out(("2024-01-01 00:00", "log_throughput")) == 4.0)
    assert(out(("2024-01-01 00:00", "error_rate")) == 0.5)
    assert(out(("2024-01-01 00:00", "active_users")) == 2.0)
    assert(out(("2024-01-01 00:01", "log_throughput")) == 1.0)
    assert(out(("2024-01-01 00:01", "error_rate")) == 0.0)
    // every value < 100 ms → all requests satisfied
    assert(out(("2024-01-01 00:00", "apdex")) == 1.0)
    // every bucket carries every metric — the long-format contract
    assert(out.keys.map(_._1).toSet.size * 4 == out.size)
  }

  test("es07 incremental rollup: partial-merge refresh equals full batch recompute, bit for bit") {
    val inc = Events.incrementalRollup(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("day")) ->
        (r.getAs[Long]("n"), r.getAs[Any]("total_value"))).toMap
    // full recompute over events <= t2 with the same cents aggregation
    val batch = graft.Tables.events(spark, sfDir)
      .filter(col("ts") <= lit("2024-01-20").cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 1e2).as("total_value"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("day")) ->
        (r.getAs[Long]("n"), r.getAs[Any]("total_value"))).toMap
    assert(inc.nonEmpty && inc == batch)
    // nothing past the delta cutoff leaks into the refreshed state
    assert(inc.keys.forall(!_._2.after(ts("2024-01-20 00:00:00"))))
  }

  test("sim11 binary ANN: sign-bit packing round-trips, Hamming is exact, identical vectors rank first") {
    import graft.operators.Similarity
    // hand-checkable 3-dim corpus: bcode packs sign bits little-endian
    val vecs = Seq(
      (0L, Array(1.0f, -1.0f, 1.0f)),   // bits 101 -> 5
      (1L, Array(1.0f, -1.0f, 1.0f)),   // clone of 0 -> hamming 0
      (2L, Array(-1.0f, 1.0f, -1.0f)),  // antipodal -> hamming 3
      (3L, Array(1.0f, 1.0f, 1.0f)))    // bits 111 -> 7, hamming 1
      .toDF("vec_id", "embedding")
    val codes = Similarity.binarize(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("bcode").toSeq).toMap
    assert(codes(0L) == Seq(5L) && codes(2L) == Seq(2L) && codes(3L) == Seq(7L))
    val out = Similarity.binaryKnnOn(vecs, col("vec_id") === 0, k = 3).collect()
      .map(r => r.getAs[Long]("neighbor_id") ->
        (r.getAs[Int]("hamming"), r.getAs[Int]("rank"))).toMap
    assert(out(1L)._1 == 0 && out(2L)._1 == 3 && out(3L)._1 == 1)
    // exact-cosine rerank puts the clone first
    assert(out(1L)._2 == 1)
  }

  test("rag05 RRF: fused score is exactly 1/(60+r_cos)+1/(60+r_lex), ranked and bounded per query") {
    val rows = Rag.hybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      assert(rs.length <= 5, s"query $q returned ${rs.length} rows")
      val ranks = rs.map(_.getAs[Int]("fused_rank")).sorted
      assert(ranks.toSeq == (1 to rs.length), s"query $q ranks: ${ranks.toSeq}")
      rs.foreach { r =>
        val expect = 1.0 / (60 + r.getAs[Int]("r_cos")) + 1.0 / (60 + r.getAs[Int]("r_lex"))
        assert(r.getAs[Double]("rrf_score") == expect,
          s"query $q neighbor ${r.getAs[Long]("neighbor_id")}: rrf not bit-exact")
      }
      // fused order follows rrf desc
      val inOrder = rs.sortBy(_.getAs[Int]("fused_rank")).map(_.getAs[Double]("rrf_score"))
      assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a >= b })
      // both underlying rankers contributed a rank-1 candidate to the pool
      assert(rs.exists(r => r.getAs[Int]("r_cos") == 1 || r.getAs[Int]("r_lex") == 1),
        s"query $q: no ranker winner survived fusion")
    }
  }
}
