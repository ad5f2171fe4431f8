package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** tc01 — deterministic 3D force-directed tag-cloud layout
  * (alt-backend shared/usecase/fetch_tag_cloud_usecase/layout.go:33
  * ComputeLayout; edges from fetch_tag_cooccurrence_driver.go, nodes
  * from fetch_tag_cloud_driver.go's top-N-by-article-count read):
  * positions for the Tag Verse 3D view, computed ONCE per cloud and
  * stored on the items.
  *
  * The algorithm re-expressed: seeded volumetric sphere init (:82 —
  * determinism is the contract, "reproducible 3D tag-cloud layout";
  * the seed stream here is a splitmix64 hash of the node index rather
  * than Go's math/rand sequence — the REFERENCE semantics is
  * deterministic-given-seed, not Go's generator bits), then the :98
  * iteration loop with the reference's constants verbatim: cooling
  * temperature, per-iteration displacement cap (0.1·R·temperature),
  * inverse-square repulsion (k=150), spring attraction along
  * co-occurrence edges weighted log2(w+1) (k=3e-4), centering pull
  * (1e-4), damping 0.9, early convergence when max displacement stays
  * under 0.005·R for 5 consecutive iterations (:20), and the final
  * normalization into ±100 (:185). Repulsion is exact pairwise where
  * the reference uses a Barnes-Hut octree — the octree is an
  * approximation for big clouds; at the driver-bounded cloud size
  * (top-N tags, N ≤ a few hundred by the driver's LIMIT) exact O(n²)
  * per iteration is simpler and strictly more accurate.
  *
  * Scale: the cloud is a BOUNDED frame by construction (the reference
  * fetches top-N tags). The distributed work is the corpus-scale
  * part: the tag counts (one agg) and the co-occurrence edges (tx11's
  * blocked self-join), both cut to the top-N tags BEFORE collecting;
  * the physics runs driver-side on ≤N nodes (the literal-centroid /
  * size-gated union-find precedent) and returns as a local frame.
  * Rows-only: a physics layout has no SQL oracle; repeat runs are
  * byte-stable by the seeded init.
  */
object TagCloud {

  private val LayoutIterations = 300
  private val RepulsionK = 150.0
  private val AttractionK = 0.0003
  private val CenteringK = 0.0001
  private val Damping = 0.9
  private val MinDistance = 1.0
  private val PositionBound = 100.0
  private val ConvergenceRatio = 0.005
  private val StableRuns = 5

  /** splitmix64 — the deterministic per-node seed stream. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unit(z: Long): Double = (z >>> 11).toDouble / (1L << 53).toDouble

  /** The in-driver layout over collected (tag, count) nodes and
    * (a, b, weight) edges. Returns (tag, x, y, z) rows.
    */
  def layout(nodes: Seq[String], edges: Seq[(String, String, Long)],
             seed: Long = 42L): Seq[(String, Double, Double, Double)] = {
    val n = nodes.length
    if (n == 0) return Seq.empty
    if (n == 1) return Seq((nodes.head, 0.0, 0.0, 0.0))
    val idx = nodes.zipWithIndex.toMap
    val edgeList = edges.flatMap { case (a, b, w) =>
      for (i <- idx.get(a); j <- idx.get(b)) yield (i, j, w.toDouble)
    }
    val initialRadius = math.sqrt(n.toDouble) * 8.0
    val x = new Array[Double](n); val y = new Array[Double](n); val z = new Array[Double](n)
    for (i <- 0 until n) {
      val base = mix(seed) ^ mix(i.toLong * 3 + 1)
      val theta = unit(mix(base)) * 2 * math.Pi
      val phi = math.acos(2 * unit(mix(base + 1)) - 1)
      val r = initialRadius * math.cbrt(unit(mix(base + 2)))
      x(i) = r * math.sin(phi) * math.cos(theta)
      y(i) = r * math.sin(phi) * math.sin(theta)
      z(i) = r * math.cos(phi)
    }
    val convergenceThreshold = initialRadius * ConvergenceRatio
    var stable = 0
    var iter = 0
    var continue = true
    val fx = new Array[Double](n); val fy = new Array[Double](n); val fz = new Array[Double](n)
    while (iter < LayoutIterations && continue) {
      val temperature = 1.0 - iter.toDouble / LayoutIterations
      val maxDisp = initialRadius * 0.1 * temperature
      java.util.Arrays.fill(fx, 0.0); java.util.Arrays.fill(fy, 0.0); java.util.Arrays.fill(fz, 0.0)
      // exact pairwise inverse-square repulsion (see scaladoc)
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = x(i) - x(j); val dy = y(i) - y(j); val dz = z(i) - z(j)
          var dist = math.sqrt(dx * dx + dy * dy + dz * dz)
          if (dist < MinDistance) dist = MinDistance
          val f = RepulsionK / (dist * dist)
          val ux = dx / dist; val uy = dy / dist; val uz = dz / dist
          fx(i) += f * ux; fy(i) += f * uy; fz(i) += f * uz
          fx(j) -= f * ux; fy(j) -= f * uy; fz(j) -= f * uz
          j += 1
        }
        i += 1
      }
      edgeList.foreach { case (a, b, w) =>
        val dx = x(b) - x(a); val dy = y(b) - y(a); val dz = z(b) - z(a)
        var dist = math.sqrt(dx * dx + dy * dy + dz * dz)
        if (dist < MinDistance) dist = MinDistance
        val f = AttractionK * dist * (math.log(w + 1) / math.log(2))
        val ux = f * dx / dist; val uy = f * dy / dist; val uz = f * dz / dist
        fx(a) += ux; fy(a) += uy; fz(a) += uz
        fx(b) -= ux; fy(b) -= uy; fz(b) -= uz
      }
      var maxIterDisp = 0.0
      i = 0
      while (i < n) {
        var vx = (fx(i) - CenteringK * x(i)) * Damping
        var vy = (fy(i) - CenteringK * y(i)) * Damping
        var vz = (fz(i) - CenteringK * z(i)) * Damping
        val disp = math.sqrt(vx * vx + vy * vy + vz * vz)
        if (disp > maxDisp) {
          val s = maxDisp / disp
          vx *= s; vy *= s; vz *= s
        }
        maxIterDisp = math.max(maxIterDisp, math.min(disp, maxDisp))
        x(i) += vx; y(i) += vy; z(i) += vz
        i += 1
      }
      if (maxIterDisp < convergenceThreshold) {
        stable += 1
        if (stable >= StableRuns) continue = false
      } else stable = 0
      iter += 1
    }
    var maxCoord = 0.0
    for (i <- 0 until n) {
      maxCoord = math.max(maxCoord, math.abs(x(i)))
      maxCoord = math.max(maxCoord, math.abs(y(i)))
      maxCoord = math.max(maxCoord, math.abs(z(i)))
    }
    val scale = if (maxCoord > 0) PositionBound / maxCoord else 0.0
    nodes.indices.map(i => (nodes(i), x(i) * scale, y(i) * scale, z(i) * scale))
  }

  /** tc01: top-N tag cloud with 3D positions. Nodes = the tag-cloud
    * driver's top-N-by-article-count read; edges = the co-occurrence
    * driver's shared-article counts among those tags.
    */
  def tc01(s: SparkSession, dir: String, topN: Int = 60): DataFrame = {
    import s.implicits._
    val docTags = TagTrends.articleTags(s, dir).select("doc_id", "tag_name")
    val counts = docTags.groupBy("tag_name")
      .agg(count_distinct(col("doc_id")).as("article_count"))
      .orderBy(col("article_count").desc, col("tag_name").asc)
      .limit(topN)
    val nodeRows = counts.collect().map(r => (r.getString(0), r.getLong(1)))
    val kept = nodeRows.map(_._1).toSet
    val keptTags = docTags.filter(col("tag_name").isin(kept.toSeq.map(x => x: Any): _*))
    // edge order is load-bearing: the layout folds edge forces with
    // non-associative double addition, so a partition-order collect
    // would make the "deterministic" positions depend on shuffle
    // configuration — sort before collecting
    val edges = keptTags.as("a").join(keptTags.as("b"), "doc_id")
      .filter(col("a.tag_name") < col("b.tag_name"))
      .groupBy(col("a.tag_name").as("ta"), col("b.tag_name").as("tb"))
      .agg(count(lit(1)).as("shared"))
      .orderBy(col("ta").asc, col("tb").asc)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val pos = layout(nodeRows.map(_._1).toSeq, edges)
      .map { case (t, px, py, pz) => t -> (px, py, pz) }.toMap
    val countMap = nodeRows.toMap
    nodeRows.map(_._1).toSeq.map { t =>
      val (px, py, pz) = pos(t)
      (t, countMap(t), px, py, pz)
    }.toDF("tag_name", "article_count", "pos_x", "pos_y", "pos_z")
      .orderBy(col("article_count").desc, col("tag_name").asc)
  }
}
