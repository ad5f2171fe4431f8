package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, KMeans, RangeJoin, Similarity}

class AdvancedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def clustered = {
    val rnd = new scala.util.Random(13)
    (for (c <- 0 until 3; i <- 0 until 30) yield {
      val v = Array.tabulate(8)(j => (if (j == c) 1.0f else 0.0f) + rnd.nextFloat() * 0.2f)
      (c * 100L + i, v, (c + 1) % 3) // deliberately WRONG seed labels
    }).toDF("vec_id", "embedding", "label")
  }

  test("kmeans: cost is non-decreasing across Lloyd iterations and recovers planted clusters") {
    val e = clustered
    val c1 = KMeans.cost(KMeans.fit(e, 1))
    val c3 = KMeans.cost(KMeans.fit(e, 3))
    assert(c3 >= c1 - 1e-9, s"cost decreased: $c1 -> $c3")
    // after convergence each cluster should be pure: every vec groups
    // with the others of its planted axis
    val sizes = KMeans.fit(e, 3).groupBy("cluster").count().collect().map(_.getLong(1)).sorted
    assert(sizes.sameElements(Array(30L, 30L, 30L)), sizes.mkString(","))
  }

  test("mini-batch kmeans recovers planted clusters and is seed-deterministic") {
    val e = clustered
    // the label seeding is deliberately wrong — mini-batch epochs must
    // still pull the centroids onto the planted axes
    val fitted = KMeans.fitMiniBatch(e, epochs = 3, fraction = 0.5)
    val sizes = fitted.groupBy("cluster").count().collect().map(_.getLong(1)).sorted
    assert(sizes.sum == 90L, sizes.mkString(","))
    assert(sizes.sameElements(Array(30L, 30L, 30L)), sizes.mkString(","))
    // purity: each cluster holds exactly one planted axis (vec_id/100)
    val pairs = fitted.select((col("vec_id") / 100).cast("int").as("axis"), col("cluster"))
      .distinct().collect()
    assert(pairs.length == 3, s"clusters mix planted axes: ${pairs.mkString(",")}")
    // sampled updates must land within a whisker of full-batch Lloyd
    val mbCost = KMeans.cost(fitted)
    val lloydCost = KMeans.cost(KMeans.fit(e, 3))
    assert(mbCost >= lloydCost - 0.005, s"mini-batch cost $mbCost far from Lloyd $lloydCost")
    // same seed, same result (sampling is seeded per epoch)
    val again = KMeans.fitMiniBatch(e, epochs = 3, fraction = 0.5)
    assert(fitted.select("vec_id", "cluster").exceptAll(again.select("vec_id", "cluster")).isEmpty)
  }

  test("multi-probe IVF recall is >= single-probe on clustered data") {
    val e = clustered
    val pred = col("vec_id") % 10 === 0
    val brute = Similarity.knnBruteOn(e, pred).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recall(probes: Int): Double = {
      val ivf = Similarity.ivfAnnOn(e, pred, probes = probes).filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      ivf.count { case (q, n) => brute.get(q).contains(n) }.toDouble / ivf.size
    }
    val r1 = recall(1); val r2 = recall(2)
    assert(r2 >= r1, s"probes=2 recall $r2 < probes=1 recall $r1")
    assert(r2 >= 0.9, s"multi-probe recall too low: $r2")
  }

  test("kmeans-seeded IVF: cells grow ~sqrt(N) and recall@1 stays high on clustered data") {
    val e = clustered
    val pred = col("vec_id") % 10 === 0
    val brute = Similarity.knnBruteOn(e, pred).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recallAt1(probes: Int): Double = {
      val hits = Similarity.ivfAnnKmeans(e, pred, probes = probes).filter(col("rank") === 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      hits.count { case (q, n) => brute.get(q).contains(n) }.toDouble / hits.size
    }
    val r1 = recallAt1(1); val r2 = recallAt1(2)
    assert(r1 >= 0.7, s"recall@1 probes=1 $r1") // cells subdivide clusters
    assert(r2 >= r1 && r2 >= 0.85, s"recall@1 probes=2 $r2 (probes=1 $r1)")
    // occupied cell count follows corpus size (ceil(sqrt(90)) = 10
    // centroids vs ceil(sqrt(30)) = 6) — the knob label seeding pins
    // at |labels| forever. Query every vector so the result exposes
    // the full assignment.
    def occupiedCells(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAnnKmeans(corpus, lit(true), k = 1)
        .select(countDistinct("cell")).head.getLong(0)
    val cellsBig = occupiedCells(e)
    val cellsSmall = occupiedCells(clustered.filter(col("vec_id") % 3 === 0))
    assert(cellsBig > cellsSmall, s"cells: N=90 -> $cellsBig, N=30 -> $cellsSmall")
    assert(cellsBig > 3, s"cells pinned near |labels|: $cellsBig")
  }

  test("hll sketch DAU lands within error bounds of exact DAU") {
    val approx = Events.sketchDau(spark, sfDir).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1).toDouble).toMap
    val exact = Events.dailyActiveUsers(spark, sfDir).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (day, est) =>
      val ex = exact(day).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"$day: est $est vs exact $ex")
    }
  }

  test("label propagation converges on a two-community graph") {
    import graft.operators.Graph
    // clique A={1,2,3} seeded "a"; clique B={4..8} seeded "b" except a
    // wrong seed on 8; one bridge 3-4. Majorities are tie-free, so one
    // round fixes 8 and the labeling is a fixed point thereafter
    // (synchronous LPA oscillates on tie-heavy graphs — that's inherent
    // to the algorithm, not this implementation).
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a != b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(4L, 5L, 6L, 7L, 8L)) ++
      Seq((3L, 4L), (4L, 3L))).toDF("src", "dst")
    val seed = (Seq(1L -> "a", 2L -> "a", 3L -> "a", 8L -> "a") ++
      Seq(4L, 5L, 6L, 7L).map(_ -> "b")).toDF("node", "label")
    val once = Graph.propagate(edges, seed)
    val labels = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(labels(_) == "a"), labels.toString)
    assert(Seq(4L, 5L, 6L, 7L, 8L).forall(labels(_) == "b"), labels.toString)
    // fixed point: further rounds change nothing
    val twice = Graph.propagate(edges, once)
    assert(twice.exceptAll(once).isEmpty)
  }

  test("range join matches the naive containment join") {
    val points = Seq((1L, 100L), (2L, 250L), (3L, 999L), (4L, 300L))
      .toDF("pid", "t")
    val intervals = Seq((10L, 90L, 260L), (11L, 250L, 400L), (12L, 500L, 600L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", bucketSec = 60)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"got $got, want $naive")
    assert(naive == Set((1L, 10L), (2L, 10L), (2L, 11L), (4L, 11L))) // sanity of the fixture
    // a malformed end<start interval matches nothing and must not blow
    // up sequence(); shared column names must not be ambiguous
    val bad = Seq((13L, 1700000000L, 0L)).toDF("iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, bad, "t", "s", "e", 60).count() == 0)
    val sharedName = intervals.withColumnRenamed("iid", "pid")
    val r = RangeJoin.pointInInterval(points, sharedName, "t", "s", "e", 60)
    assert(r.count() == 4) // same matches, no AMBIGUOUS_REFERENCE
  }
}
