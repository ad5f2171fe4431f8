package graft

import graft.operators.GenreRetrain

/** Rule-per-case pins for gw03/gw04 (retrain_genre_classifier.py
  * compute_weights :387-475) on a planted 6-sample frame — every
  * divergence from gw01's trainer is pinned by a case:
  * occurrence-counting TF, document-frequency IDF that counts
  * invalid-genre samples, the 3-dp-rounded-idf-used-downstream quirk,
  * the dead multi-word vocab entries, per-(sample, genre)-pair
  * totals, the frequency-WEIGHTED embedding average with the zero
  * fallback, and the log-inverse-frequency bias.
  *
  * Expected values hand-derived (and cross-checked in IEEE doubles):
  * total_docs = 6, total_samples = 7 pairs;
  * df: economy 2 (docs 1 AND the invalid-genre doc 3), business /
  * transformer / treaty / 決算 / 音楽 1; idf = round(ln(7/(df+1))+1, 3):
  * economy 1.847, the five df=1 terms 2.253, every unseen term 2.946.
  */
class GenreRetrainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val samples = Seq(
    (1L, Seq("AI"), "economy economy business"),
    (2L, Seq("tech", "business"), "Transformers treaty"),
    (3L, Seq("unmapped"), "economy"),
    (4L, Seq("sports"), "confidential computing 決算"),
    (5L, Seq("other"), "nothing here"),
    (6L, Seq("ai", "tech"), "音楽"))
    .toDF("doc_id", "genres", "text")

  private lazy val w = GenreRetrain.weightsOn(samples)
    .collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap

  test("gw03: occurrences count (not once-per-sample), idf counts invalid-genre docs") {
    // doc1 plants economy TWICE → cnt 2 (gw01 would count 1); df(economy)
    // = 2 because the invalid-genre doc 3 still counts in document
    // frequency (its genre loop is skipped, the doc is not)
    val (cnt, tot, idf, weight) = w(("ai", "economy"))
    assert(cnt == 2 && tot == 4)
    assert(idf == 1.847, "idf = round(ln(7/3)+1, 3) — df includes the skipped-genre doc")
    assert(weight == 0.924, "round(2·1.847·1e3/4)/1e3 — the 3dp-rounded idf is used downstream")
  }

  test("gw03: a multi-genre sample counts its tokens in EVERY valid genre") {
    assert(w(("tech", "transformer")) == ((1L, 3L, 2.253, 0.751)),
      "plural 'Transformers' expands and counts under tech")
    assert(w(("business", "transformer")) == ((1L, 2L, 2.253, 1.127)),
      "the same doc counts independently under business (its own total)")
    assert(w(("ai", "音楽"))._1 == 1L, "doc 6 counts in ai AND tech")
    assert(w(("tech", "音楽"))._1 == 1L)
  }

  test("gw03: multi-word vocab entries are dead — token membership can never match them") {
    // doc 4 plants the literal words 'confidential computing'; the
    // whitespace tokens are 'confidential' and 'computing', never the
    // two-word vocab entry
    val (cnt, _, idf, weight) = w(("sports", "confidential computing"))
    assert(cnt == 0 && weight == 0.0)
    assert(idf == 2.946, "df = 0 runs the smooth formula (no gw01-style idf=1.0 pin)")
    assert(w(("sports", "決算")) == ((1L, 1L, 2.253, 2.253)), "the CJK token beside it matches")
  }

  test("gw03: zero-occurrence genres emit all-zero weight rows") {
    assert(w(("other", "economy")) == ((0L, 0L, 1.847, 0.0)),
      "'other' is a VALID genre here (sampled, no matches) — weights 0.0, idf still global")
    assert(w(("science", "treaty"))._4 == 0.0, "never-sampled genre")
    assert(w.count { case ((g, _), _) => g == "games_puzzles" } == GenreRetrain.vocab.size)
  }

  private lazy val eb = GenreRetrain.embeddingBiasOn(samples)
    .collect().map(r => (r.getString(0), r.getInt(1)) ->
      (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap

  test("gw04: frequency-WEIGHTED embedding average (gw01 takes the unweighted mean)") {
    // ai: economy cnt 2 + business cnt 1 (both dim1=1.0) + 音楽 cnt 1
    // (dim5=1.0) → dim1 = 3000/4 = 0.75, dim5 = 1000/4 = 0.25
    assert(eb(("ai", 1)) == ((4L, 0.75, 2L, 1.253)))
    assert(eb(("ai", 5))._2 == 0.25)
    // tech: transformer + treaty + 音楽, one each → dim0 1000/3 → 0.333
    assert(eb(("tech", 0))._2 == 0.333)
    assert(eb(("tech", 1))._2 == 0.1, "treaty's 0.3 weight averages over all three hits")
    assert(eb(("business", 2))._2 == 0.4, "the same doc's terms average over business's own counts")
  }

  test("gw04: zero-hit genres get the ZERO vector (gw01's fallback is 0.167-uniform)") {
    (0 until GenreRetrain.EmbeddingDim).foreach { d =>
      assert(eb(("other", d))._2 == 0.0)
      assert(eb(("science", d))._2 == 0.0)
    }
  }

  test("gw04: bias = round(ln(total_pairs/n_g), 3) over (sample, genre) PAIRS; 0.0 when unsampled") {
    // total_samples = 7 PAIRS (docs 2 and 6 carry two valid genres),
    // not 6 documents
    assert(eb(("ai", 0))._3 == 2L && eb(("ai", 0))._4 == 1.253, "ln(7/2)")
    assert(eb(("sports", 0))._4 == 1.946, "ln(7/1) — rarer genre, HIGHER bias (inverse frequency)")
    assert(eb(("other", 0))._4 == 1.946, "'other' is valid and biased like any genre")
    assert(eb(("science", 0))._4 == 0.0, "genre_count = 0 → 0.0 (:462)")
  }
}
