package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphRescue

/** Rule-per-case pins for gp01/gp02 — recap-worker classifier/graph.rs
  * build_graph (:52-174), propagate_labels (:180-211),
  * predict_by_neighbors (:394-477), and the classifier/workflow.rs
  * wiring (:309 startup 0.5, :560-567 all-candidates rescue, :662 k=5
  * with the dead "default" thresholds key).
  */
class GraphRescueSpec extends SparkSpec {
  import spark.implicits._

  // axis-ish unit vectors with controllable pairwise cosine
  private def vec(x: Float, y: Float, z: Float = 0f) = Array(x, y, z)

  private def lab(rows: (Long, String, Array[Float])*) =
    rows.toDF("src_id", "genre", "emb_l")
  private def unl(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "emb_u")

  test("default threshold 0.85 (graph.rs:480-485) and startup 0.5 (workflow.rs:309) gate edges") {
    // cos(a, b) = 0.8 exactly: a=(1,0), b=(0.8, 0.6)
    val l = lab((1L, "ga", vec(1f, 0f)))
    val u = unl((10L, vec(0.8f, 0.6f)))
    assert(GraphRescue.buildEdges(l, u, 0.85).count() == 0)
    assert(GraphRescue.buildEdges(l, u, 0.5).count() == 1)
  }

  test("candidate gate asymmetry: a non-candidate unlabeled node keeps edges only from SMALLER-id labeled nodes (:117-119 i<j continue, insertion order pinned to id asc)") {
    val l = lab((1L, "ga", vec(1f, 0f)), (10L, "gb", vec(1f, 0f)))
    val u = unl((5L, vec(1f, 0f))) // cos 1.0 with both
    val noCand = Seq.empty[Long].toDF("id")
    val e = GraphRescue.buildEdges(l, u, 0.5, Some(noCand))
      .select("src_id").as[Long].collect().sorted
    assert(e.toSeq == Seq(1L), s"expected only the earlier labeled node, got ${e.toSeq}")
    // in the candidate set, both edges exist (the rescue wiring's shape)
    val cand = Seq(5L).toDF("id")
    val e2 = GraphRescue.buildEdges(l, u, 0.5, Some(cand))
      .select("src_id").as[Long].collect().sorted
    assert(e2.toSeq == Seq(1L, 10L))
  }

  test("propagate_labels one-hop last-writer: contested neighbor takes the max-ordinal labeled source (:180-211, HashMap-overwrite pinned to max src_id)") {
    val l = lab((3L, "ga", vec(1f, 0f)), (9L, "gb", vec(1f, 0f)))
    val u = unl((7L, vec(1f, 0f)))
    val got = GraphRescue.propagateOneHop(GraphRescue.buildEdges(l, u, 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((7L, "gb", 9L, 2L)))
  }

  test("zero-norm feature vector never clears a threshold (normalize_vector :226-232 leaves zeros; cosine null-gates)") {
    val l = lab((1L, "ga", vec(1f, 0f)))
    val u = unl((10L, vec(0f, 0f)))
    assert(GraphRescue.buildEdges(l, u, 0.0).count() == 0)
  }

  test("predict_by_neighbors: per-label threshold from the map, 0.3 fallback; the wiring's 'default' key is dead (:420, workflow.rs:648-651)") {
    // cos to target: ga node 0.95, gb node 0.4
    val l = lab(
      (1L, "ga", vec(1f, 0f)),
      (2L, "gb", vec(0.4f, 0.9165151f))) // cos = 0.4 with (1,0)
    val t = unl((10L, vec(1f, 0f)))
    // a threshold keyed by the REAL genre applies: gb needs >= 0.5 -> only ga votes
    val strict = GraphRescue.predictByNeighbors(l, t, 5, Map("gb" -> 0.5))
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(strict.toSeq == Seq(("ga", 1.0)))
    // the production map {"default": 0.5} matches no genre -> identical
    // to the empty map: both fall back to 0.3 and admit gb
    val dead = GraphRescue.predictByNeighbors(l, t, 5, Map("default" -> 0.5))
      .orderBy("vec_id").collect().map(r => (r.getString(1), r.getDouble(2)))
    val empty = GraphRescue.predictByNeighbors(l, t, 5, Map.empty)
      .orderBy("vec_id").collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(dead.toSeq == empty.toSeq)
    assert(dead.toSeq == Seq(("ga", 1.0))) // ga sum 1.0 beats gb 0.4
  }

  test("top-k cut is k=5 by (similarity desc, src_id asc pin); vote weight is the SUM of similarities, not the count (:448-470)") {
    // six candidates above threshold; the sixth (lowest cos) must not vote.
    // gb outnumbers ga in the top 5 (3 votes vs 2) but ga's summed
    // similarity wins — a count vote would flip it.
    val l = lab(
      (1L, "ga", vec(1f, 0f)), // cos 1.0
      (2L, "ga", vec(0.99f, 0.14106736f)), // cos .99
      (3L, "gb", vec(0.5f, 0.8660254f)), // cos .5
      (4L, "gb", vec(0.5f, 0.8660254f)), // cos .5
      (5L, "gb", vec(0.5f, 0.8660254f)), // cos .5
      (6L, "gb", vec(0.45f, 0.8930286f))) // cos .45 -> cut by k=5
    val t = unl((10L, vec(1f, 0f)))
    val got = GraphRescue.predictByNeighbors(l, t, 5, Map.empty)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(got.length == 1 && got(0)._1 == "ga", got.toSeq.toString)
    // float32 inputs leave the quantized sum within a unit of 1.99
    assert(math.abs(got(0)._2 - 1.99) < 1e-4, got(0)._2.toString)
    // and gb's runner-up sum is 1.5 (three .5s, the .45 excluded):
    // shrink k to 4 and gb loses its third vote but ga still wins
    val k4 = GraphRescue.predictByNeighbors(l, t, 4, Map.empty)
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(k4.length == 1 && k4(0)._1 == "ga", k4.toSeq.toString)
  }

  test("winner ties pin to ascending genre (max_by on HashMap iteration order, :470-476)") {
    val l = lab(
      (1L, "gb", vec(1f, 0f)),
      (2L, "ga", vec(1f, 0f))) // both cos 1.0 -> equal sums
    val t = unl((10L, vec(1f, 0f)))
    val got = GraphRescue.predictByNeighbors(l, t, 5, Map.empty)
      .collect().map(r => r.getString(1))
    assert(got.toSeq == Seq("ga"))
  }

  test("gp01/gp02 entries run non-degenerate on the test corpus") {
    assert(GraphRescue.gp01(spark, sfDir).count() > 0)
    assert(GraphRescue.gp02(spark, sfDir).count() > 0)
  }
}
