package graft

import graft.operators.GenreBlend

/** Rule-per-case pins for gc02 — recap-worker classification.rs
  * GenreClassifier::predict (:166-252), threshold_for (:254-287),
  * default_thresholds (:290-306).
  */
class GenreBlendSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, genre, kw_support, boost, model_u, bm25_peak_u, tfidf_sum_u)
  private def run(rows: (Long, String, Long, Long, Long, Long, Long)*) =
    GenreBlend.decide(rows.toDF(
      "doc_id", "genre", "kw_support", "boost", "model_u", "bm25_peak_u", "tfidf_sum_u"))
      .orderBy("doc_id", "pick_ord").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3), r.getInt(4)))

  // neutral stats: bm25 1.0 / tfidf 1.0 -> no adjustments
  private val B = 100L
  private val T = 100L

  test("blend = kw + boost + 0.4*model; per-genre base threshold vs the 0.75 default for unknown genres (:180-197, :290-306, :87)") {
    // tech base .65: kw 0 (+0.08) -> 0.73; score = 0.4*1.0 = 0.4 fails;
    // score 0 + 1 boost = 1.0 passes
    val got = run(
      (1L, "tech", 0L, 1L, 0L, B, T), // 1.0 >= 0.73 pass
      (1L, "quantum", 0L, 0L, 1000000L, B, T)) // 0.4 < 0.75+0.08=0.83 fail
    assert(got.toSeq == Seq((1L, 1, "tech", 1.0, 0)))
  }

  test("threshold adjustments: support 0/+0.08 and >=3/-0.05; bm25 >1.6/-0.05 <0.45/+0.04; tfidf <0.4/+0.05 >1.4/-0.03; STRICT boundaries adjust nothing (:261-285)") {
    // health base .70. support 3 (-0.05) + bm25 1.7 (-0.05) + tfidf 1.5
    // (-0.03) -> 0.57; model .57 exactly passes (exact units)
    // score = 3 + 0 + 0 = 3.0 >= the fully-discounted 0.57 -> accepted
    val pass = run((1L, "health", 3L, 0L, 0L, 170L, 150L))
    assert(pass.nonEmpty && pass(0)._3 == "health" && pass(0)._5 == 0)
    // boundary isolation on the stats bands:
    val boundary = run(
      (2L, "science", 0L, 0L, 1950000L, 45L, 40L), // thr .7+.08=.78; score .78 exact pass
      (3L, "science", 0L, 0L, 1940000L, 45L, 40L)) // score .776 < .78 fail -> fallback
    assert(boundary.filter(_._1 == 2L).head._5 == 0)
    assert(boundary.filter(_._1 == 3L).head._5 == 1)
    // sub-boundary stats DO adjust: bm25 0.44 (+0.04), tfidf 0.39
    // (+0.05): thr = .7+.08+.04+.05 = .87; score .78 now fails
    val adjusted = run((4L, "science", 0L, 0L, 1950000L, 44L, 39L))
    assert(adjusted(0)._5 == 1, "0.78 must fail the 0.87 adjusted threshold")
  }

  test("threshold clamps to [0.5, 0.9] (:286)") {
    // other base .6: support 3 (-.05), bm25 1.7 (-.05), tfidf 1.5 (-.03)
    // -> .47 clamps to .5; a 0.49 score fails, 0.5 passes
    val got = run(
      (1L, "other", 3L, 0L, 1250000L, 170L, 150L), // 3.5 passes trivially
      (2L, "sports", 0L, 0L, 2250000L, 44L, 39L)) // .65+.08+.04+.05=.82 < .9; score .9 passes
    assert(got.count(_._5 == 0) == 2)
    // society_justice base .75 + .08 + .04 + .05 = .92 clamps to .9:
    // score exactly .9 passes
    val clamped = run((3L, "society_justice", 0L, 0L, 2250000L, 44L, 39L))
    assert(clamped(0)._5 == 0, "thr must clamp to 0.9")
  }

  test("false-positive gates: world needs support >= 2, business/entertainment >= 1, applied ONLY above threshold (:224-232)") {
    val got = run(
      (1L, "world", 1L, 3L, 0L, B, T), // 4.0 >= thr but support 1 -> gated
      (2L, "world", 2L, 3L, 0L, B, T), // support 2 -> passes
      (3L, "business", 0L, 3L, 0L, B, T), // support 0 -> gated
      (4L, "entertainment", 1L, 3L, 0L, B, T)) // support 1 -> passes
    assert(got.filter(_._1 == 1L).head._5 == 1) // fallback row
    assert(got.filter(_._1 == 2L).head._5 == 0)
    assert(got.filter(_._1 == 3L).head._5 == 1)
    assert(got.filter(_._1 == 4L).head._5 == 0)
  }

  test("top-3 cut in (score desc, genre asc pin) order; fallback takes the best-ranked genre when nothing passes (:233-250)") {
    val got = run(
      (1L, "ai", 2L, 2L, 0L, B, T), // 4.0
      (1L, "tech", 2L, 1L, 0L, B, T), // 3.0
      (1L, "health", 1L, 2L, 0L, B, T), // 3.0 — tie: genre asc -> health first
      (1L, "science", 1L, 1L, 0L, B, T), // 2.0 — 4th, cut
      (2L, "sports", 0L, 0L, 500000L, B, T), // 0.2 < thr
      (2L, "ai", 0L, 0L, 250000L, B, T)) // 0.1 < thr
    val d1 = got.filter(_._1 == 1L).map(x => (x._2, x._3)).toSeq
    assert(d1 == Seq((1, "ai"), (2, "health"), (3, "tech")))
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length == 1 && d2(0)._3 == "sports" && d2(0)._5 == 1)
  }
}
