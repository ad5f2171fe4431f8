package graft

import graft.operators.HybridModel

/** Rule-per-case pins for hm01/hm02 (features.rs extract :275-349 +
  * model.rs predict :136-165 over the checked-in weights JSON).
  * Expected values replicated in IEEE doubles against the reference
  * formulas with the shipped 3-dp weights.
  */
class HybridModelSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[String])]) = rows.toDF("doc_id", "toks")

  test("hm01: tf is vocabulary-HIT denominated; BM25 carries the doc-length norm") {
    // 5 tokens, 3 vocabulary hits: economy×2, business×1;
    // length_norm = 0.25 + 0.75·(5/320)
    val out = HybridModel.featuresOn(
      df(Seq((1L, Seq("economy", "economy", "business", "x", "y")))))
      .collect().map(r => r.getString(1) -> r).toMap
    val e = out("economy")
    assert(e.getLong(2) == 2 && e.getLong(3) == 3 && e.getLong(4) == 5)
    assert(e.getDouble(5) == 3.163333, "tf = 2/3 (HITS), not 2/5 (doc length) — the :327 quirk")
    assert(e.getDouble(6) == 10.201137)
    assert(out("business").getDouble(5) == 1.176)
    assert(out("business").getDouble(6) == 6.46541)
    assert(out.size == 2, "raw = 0 terms are skipped (:325)")
  }

  test("hm01: no vocabulary hits → no rows (the :322 total_hits gate zeroes both vectors)") {
    assert(HybridModel.featuresOn(df(Seq((2L, Seq("x", "zz"))))).count() == 0)
  }

  test("hm02: the shipped-weights forward pass — top-3 hand-replicated") {
    val out = HybridModel.scoresOn(
      df(Seq((1L, Seq("economy", "economy", "business", "x", "y")))))
      .orderBy("rank").collect()
    assert(out.map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSeq ==
      Seq((1, "environment", 13.804036), (2, "sports", 12.883),
        (3, "business_finance", 12.176928)))
    assert(out.forall(_.getDouble(4) == 10.201137), "bm25_peak = the economy slot's value")
  }

  test("hm03: df over unique lowered tokens, raw total length, df-desc/token-asc cut, smooth idf") {
    val docs = df(Seq(
      (1L, Seq("Alpha", "alpha", "beta")), // alpha counts ONCE in df (unique, lowered), twice in length
      (2L, Seq("beta", "gamma")),
      (3L, Seq("delta"))))
    val out = HybridModel.corpusVocabOn(docs, vocabSize = 3)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((1, "beta", 2L, 1.287682),          // ln(4/3)+1
        (2, "alpha", 1L, 1.693147),            // df ties order alphabetically (determinized)
        (3, "delta", 1L, 1.693147)),
      "gamma falls to the vocab_size cut; Alpha/alpha dedupe per document")
    assert(out.forall(r => r.getLong(4) == 3 && r.getLong(5) == 6 && r.getDouble(6) == 2.0),
      "avg_doc_len = RAW token total / docs = 6/3")
  }

  test("hm02: zero hits scores every genre at its bias; bias ties break by genre-list index") {
    val out = HybridModel.scoresOn(df(Seq((2L, Seq("x", "zz")))))
      .orderBy("rank").collect()
    assert(out.map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).toSeq ==
      Seq((1, "art_culture", 8.127), (2, "society_justice", 8.127),
        (3, "developer_insights", 7.433)),
      "art_culture and society_justice share bias 8.127 — genres-list order wins")
    assert(out.forall(_.getDouble(4) == 0.0), "max_bm25 of the all-zero vector unwraps to 0.0")
  }
}
