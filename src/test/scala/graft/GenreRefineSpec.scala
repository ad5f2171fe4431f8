package graft

import graft.operators.GenreRefine

/** The genre-refine cascade, one planted article per decision path:
  * require_tags fallback, FallbackOther, the tag-consistency winner
  * (incl. the two-winners miss), the GraphBoost gate, the weighted
  * tie-break, candidate expansion, and the final attribution rule.
  */
class GenreRefineSpec extends SparkSpec {
  import spark.implicits._

  // graph: (genre, tag, weight, sample_size)
  private def graph = Seq(
    ("tech", "spark", 1.0, 5L),
    ("sports", "goal", 0.8, 5L),
    ("finance", "market", 0.5, 5L))
    .toDF("genre", "tag", "weight", "sample_size")

  private def docs = (1L to 8L).toDF("doc_id")

  // (doc_id, name, conf_u6, score_u6, keyword_support, cand_rank)
  private def cands = Seq(
    // doc 1: no tags → first candidate wins as coarse_only
    (1L, "tech", 700000L, 700000L, 2, 0),
    (1L, "sports", 600000L, 600000L, 1, 1),
    // doc 2: NO candidates (and its tag matches nothing) → fallback_other
    // doc 3: gated tag equals 'tech' → tag_consistency
    (3L, "tech", 400000L, 400000L, 0, 0),
    (3L, "sports", 300000L, 300000L, 0, 1),
    // doc 4: two gated tags match two DIFFERENT candidates → no winner;
    // big margin + boost → graph_boost
    (4L, "tech", 500000L, 500000L, 0, 0),
    (4L, "sports", 100000L, 100000L, 0, 1),
    // doc 5: near-tie scores, no boost → weighted tie-break; sports'
    // keyword support dominates the blend
    (5L, "tech", 300000L, 300000L, 0, 0),
    (5L, "sports", 300000L, 290000L, 9, 1),
    // doc 6: clear margin but NO boost → top candidate as coarse_only
    (6L, "tech", 800000L, 800000L, 0, 0),
    (6L, "sports", 200000L, 200000L, 0, 1),
    // doc 7: tag drives EXPANSION of 'finance' (not a candidate);
    // its boost beats the weak original → finance tops
    (7L, "tech", 200000L, 50000L, 0, 0))
    .toDF("doc_id", "name", "conf_u6", "score_u6", "keyword_support", "cand_rank")

  // (doc_id, label, conf_u6)
  private def tagRows = Seq(
    // doc 1: none
    (2L, "nothing", 900000L),
    (3L, "tech", 900000L),      // gated, equals candidate
    (4L, "tech", 700000L),      // gated, matches BOTH...
    (4L, "sports", 700000L),    // ...two winners → no consistency
    (4L, "spark", 900000L),     // boosts tech by 1.0·0.9 = 0.9
    (5L, "plain", 500000L),     // under the 0.6 gate — no consistency
    (6L, "plain", 900000L),     // gated but matches nothing
    (7L, "market", 800000L),    // expands finance: 0.5·0.8 = 0.4 ≥ 0.3
    (8L, "goal", 900000L))      // doc 8 has tags but no candidates →
                                 // sports expands: 0.8·0.9 = 0.72
    .toDF("doc_id", "label", "conf_u6")

  private def out = GenreRefine.refineOn(cands, tagRows, graph, docs)
    .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
    .toMap

  test("require_tags and fallback paths") {
    assert(out(1L) == (("tech", 0.7, "coarse_only")), "no tags → first candidate")
    assert(out(2L) == (("other", 0.0, "fallback_other")), "no candidates, no expansion")
  }

  test("tag-consistency winner fires only on a UNIQUE match") {
    assert(out(3L)._3 == "tag_consistency")
    assert(out(3L)._1 == "tech" && out(3L)._2 == 0.9, "max(tag 0.9, classifier 0.4)")
    assert(out(4L)._3 != "tag_consistency", "two distinct matches → no winner")
  }

  test("graph-boost gate: margin + boost + confidence") {
    // doc 4: tech scored = 0.5 + 0.9 = 1.4, sports = 0.1 + 0 →
    // margin 1.3 ≥ 0.15, boost 0.9 ≥ 0.1, conf 0.5 ≥ 0.15
    assert(out(4L)._1 == "tech" && out(4L)._3 == "graph_boost")
    assert(out(4L)._2 == 0.66, "0.6·0.5 + 0.4·0.9")
  }

  test("weighted tie-break on a near-tie, keyword support decides") {
    // doc 5 margins: |0.3 − 0.29| = 0.01 < 0.05; weighted:
    // tech = 0·0.2 + 0.3·0.4 = 0.12; sports = 0.9·0.2 + 0.3·0.4 = 0.3
    assert(out(5L)._1 == "sports" && out(5L)._3 == "weighted_score")
    assert(out(5L)._2 == 0.3)
  }

  test("no boost and clear margin → coarse_only top candidate") {
    assert(out(6L) == (("tech", 0.8, "coarse_only")))
  }

  test("expansion: a tag-derived genre can out-rank the original candidates") {
    // doc 7: finance expands with conf min(0.4, 1) = 0.4, score 0 +
    // boost 0.4 = 0.4 vs tech 0.05 + 0 → margin 0.35, boost 0.4,
    // conf 0.4 → graph_boost on the EXPANDED candidate
    assert(out(7L)._1 == "finance" && out(7L)._3 == "graph_boost")
    assert(out(7L)._2 == 0.4, "0.6·0.4 + 0.4·0.4")
    // doc 8: expansion is the ONLY candidate (none original): sports
    // 0.72 boost... single candidate → no second → final branch:
    // boosted + confident → graph_boost
    assert(out(8L)._1 == "sports" && out(8L)._3 == "graph_boost")
  }
}
