package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{TagCloud, TagTrends}

/** Rule-per-case specs for tt01 (the trending-tags surge gateway) and
  * tc01 (the deterministic 3D tag-cloud layout).
  */
class TagTrendsSpec extends SparkSpec {
  import spark.implicits._

  private val now = 1700000000000L
  private def daysAgo(d: Double) = new Timestamp(now - (d * 86400000L).toLong)

  private def frame(rows: Seq[(Long, String, Timestamp)]) =
    rows.toDF("doc_id", "tag_name", "created_at")

  test("tt01: floor, surge gate, zero-baseline branch, and the exact Go division chain") {
    val rows =
      // anchor: the newest row pins "now"
      Seq((0L, "anchor", daysAgo(0))) ++
      // hot: 6 recent, 2 older-in-baseline → surge 6/(8/4) = 3.0
      (1 to 6).map(i => (100L + i, "hot", daysAgo(1))) ++
      (1 to 2).map(i => (110L + i, "hot", daysAgo(20))) ++
      // steady: 3 recent, 9 older → 3/(12/4) = 1.0 → gated out
      (1 to 3).map(i => (200L + i, "steady", daysAgo(2))) ++
      (1 to 9).map(i => (210L + i, "steady", daysAgo(15))) ++
      // thin: 2 recent (< minRecentCount) → dropped before any ratio
      (1 to 2).map(i => (300L + i, "thin", daysAgo(1))) ++
      // boundary: 3 recent, 8 total → 3/(8/4) = 1.5 exactly → INCLUDED (>=)
      (1 to 3).map(i => (400L + i, "boundary", daysAgo(3))) ++
      (1 to 5).map(i => (410L + i, "boundary", daysAgo(25))) ++
      // stale tag: everything outside 30d → absent entirely
      (1 to 4).map(i => (500L + i, "stale", daysAgo(40)))
    val out = TagTrends.trendingOn(frame(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set("hot", "boundary"))
    assert(out("hot") == ((6L, 3.0)))
    assert(out("boundary") == ((3L, 1.5)))
  }

  test("tt01: an all-recent tag surges at exactly 4.0 (and the :88 zero-baseline branch is structurally dead through the operator)") {
    // gateway.go:88's surge = recent branch needs baseline == 0 with
    // recent > 0, which cannot happen through trendingOn: the 30-day
    // baseline window CONTAINS the 7-day recent window, so
    // baseline_count ≥ recent_count ≥ the 3-row floor. The branch is
    // kept for reference fidelity (live only if history is purged
    // between the two fetches); what IS reachable — and pinned here —
    // is its limit shape: all rows recent → surge = r/(r/4) = 4.0.
    val rows = Seq((0L, "anchor", daysAgo(0))) ++
      (1 to 4).map(i => (i.toLong, "burst", daysAgo(0.5)))
    val out = TagTrends.trendingOn(frame(rows)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("burst") == 4.0)
  }

  test("tt01: top-20 cut ranks by surge with deterministic ties") {
    val rows = Seq((0L, "anchor", daysAgo(0))) ++
      (1 to 25).flatMap { t =>
        (1 to 3).map(i => ((t * 100 + i).toLong, f"tag$t%02d", daysAgo(1)))
      }
    val out = TagTrends.trendingOn(frame(rows)).collect()
    assert(out.length == 20)
    // all surge 4.0 → the cut is alphabetical (the deterministic tie-break)
    assert(out.map(_.getString(0)).toSeq == (1 to 20).map(t => f"tag$t%02d"))
  }

  test("tc01 layout: deterministic, bounded, attraction pulls the connected pair together") {
    val nodes = Seq("a", "b", "c", "d", "e", "f")
    // a-b heavily connected; e/f isolated
    val edges = Seq(("a", "b", 500L), ("b", "c", 2L))
    val p1 = TagCloud.layout(nodes, edges)
    val p2 = TagCloud.layout(nodes, edges)
    assert(p1 == p2, "seeded layout must be byte-deterministic")
    def dist(x: (String, Double, Double, Double), y: (String, Double, Double, Double)) =
      math.sqrt(math.pow(x._2 - y._2, 2) + math.pow(x._3 - y._3, 2) + math.pow(x._4 - y._4, 2))
    val byName = p1.map(p => p._1 -> p).toMap
    assert(p1.forall(p => Seq(p._2, p._3, p._4).forall(v => math.abs(v) <= 100.0 + 1e-9)))
    // the strongly-attracted pair ends nearer than the mean isolated distance
    val ab = dist(byName("a"), byName("b"))
    val isolated = for (x <- Seq("d", "e", "f"); y <- Seq("d", "e", "f") if x < y)
      yield dist(byName(x), byName(y))
    assert(ab < isolated.min,
      s"a-b ($ab) should sit closer than any isolated pair (${isolated.min})")
  }

  test("tc01 layout edge shapes: empty, single node at origin") {
    assert(TagCloud.layout(Seq.empty, Seq.empty).isEmpty)
    assert(TagCloud.layout(Seq("only"), Seq.empty) == Seq(("only", 0.0, 0.0, 0.0)))
  }

  test("tc01 composes at sf0.001: one row per kept tag, positions bounded, repeat-run identical") {
    val out1 = TagCloud.tc01(spark, sfDir).collect()
    val out2 = TagCloud.tc01(spark, sfDir).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    assert(out1.nonEmpty && out1.length <= 60)
    out1.foreach { r =>
      Seq(3, 4).foreach(i => assert(math.abs(r.getDouble(i)) <= 100.0 + 1e-9))
    }
    // the normalization touches the bound on at least one axis
    val maxAbs = out1.flatMap(r => Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .map(math.abs).max
    assert(math.abs(maxAbs - 100.0) < 1e-6)
  }
}
