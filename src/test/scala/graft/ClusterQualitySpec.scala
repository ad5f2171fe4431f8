package graft

import graft.operators.ClusterQuality

/** Pulse cluster-quality semantics on planted clusters: the < 2-member
  * defaults, the three-tier diagnosis, and the two entity denominators
  * (consistency counts each entity once per member; top_entities ranks
  * by total mentions).
  */
class ClusterQualitySpec extends SparkSpec {
  import spark.implicits._

  private val up = Array(1.0f, 0.0f)
  private val right = Array(0.0f, 1.0f)

  // (cluster_id, id, embedding, title, ents)
  private def members = Seq(
    // cluster 1: singleton → cohesion 1.0, ambiguity 0.0 by definition
    (1L, 10L, up, Seq("solo", "doc"), Seq("soloent")),
    // cluster 2: two members, identical titles + identical embeddings,
    // shared entity → every threshold passes → Ok
    (2L, 20L, up, Seq("alpha", "beta"), Seq("shared")),
    (2L, 21L, up, Seq("alpha", "beta"), Seq("shared", "shared")),
    // cluster 3: identical embeddings (ambiguity 0) + shared entity,
    // but disjoint titles → ONLY cohesion misses → Caution
    (3L, 30L, up, Seq("aa", "bb"), Seq("common1")),
    (3L, 31L, up, Seq("cc", "dd"), Seq("common1")),
    // cluster 4: disjoint titles AND orthogonal embeddings → cohesion
    // + ambiguity miss (entities still shared) → Ng
    (4L, 40L, up, Seq("ee", "ff"), Seq("entity9")),
    (4L, 41L, right, Seq("gg", "hh"), Seq("entity9")))
    .toDF("cluster_id", "id", "embedding", "title", "ents")

  test("tier ladder: Ok / Caution / Ng and the singleton defaults") {
    val out = ClusterQuality.clusterQualityOn(members)
      .collect().map(r => r.getLong(0) -> r).toMap
    val solo = out(1L)
    assert(solo.getDouble(2) == 1.0 && solo.getDouble(3) == 0.0, "singleton defaults")
    assert(solo.getDouble(4) == 1.0, "its one member has the modal entity")
    assert(solo.getString(6) == "Ok")
    assert(out(2L).getString(6) == "Ok")
    assert(out(2L).getDouble(2) == 1.0, "identical titles → cohesion 1")
    assert(out(3L).getString(6) == "Caution", "only cohesion misses")
    assert(out(3L).getDouble(2) == 0.0 && out(3L).getDouble(3) == 0.0)
    assert(out(4L).getString(6) == "Ng", "cohesion + ambiguity miss")
    assert(out(4L).getDouble(3) == 1.0, "orthogonal pair below the 0.5 threshold")
  }

  test("entity denominators: consistency per-member-once, top entities by total mentions") {
    // one member mentions 'loud' three times, two members mention
    // 'wide' once each → consistency counts wide (2/3 members) as the
    // modal entity, but top_entities ranks loud (3 mentions) first
    val m = Seq(
      (9L, 90L, up, Seq("t"), Seq("loud", "loud", "loud", "wide")),
      (9L, 91L, up, Seq("t"), Seq("wide")),
      (9L, 92L, up, Seq("t"), Seq("quiet")))
      .toDF("cluster_id", "id", "embedding", "title", "ents")
    val r = ClusterQuality.clusterQualityOn(m).collect()(0)
    assert(r.getDouble(4) == 0.666667, "modal entity 'wide' is in 2 of 3 members (6 dp)")
    assert(r.getString(5) == "loud,wide,quiet", "mentions rank, name breaks ties")
  }
}
