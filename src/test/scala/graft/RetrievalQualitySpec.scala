package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalQuality

/** Rule-per-case pins for rag09 (rag-orchestrator retrieval_quality.go
  * AssessWithIntent :102-160 and helpers): the minContexts gate, the
  * intent-aware thresholds, the two downgrade heuristics with their
  * exact boundaries, the marginal-only mismatch path, and the dual
  * CJK/Latin keyword extraction.
  */
class RetrievalQualitySpec extends SparkSpec {
  import spark.implicits._

  /** queries: (qid, intent, query); contexts: (qid, rank, title,
    * chunk, score, rerank, applied).
    */
  private def run(qs: Seq[(Long, String, String)],
                  cs: Seq[(Long, Int, String, String, Double, Double, Boolean)]) =
    RetrievalQuality.assessOn(
      qs.toDF("query_id", "intent_type", "query"),
      cs.toDF("query_id", "rank", "title", "chunk_text", "score",
        "rerank_score", "rerank_applied"))
      .collect().map(r => r.getLong(0) -> r).toMap

  // layout: query_id, intent_type, n_contexts, avg_score, incoherent,
  //         high_variance, mismatch, verdict
  private def verdict(r: org.apache.spark.sql.Row) = r.getString(7)

  private def ctx(qid: Long, scores: Seq[Double],
                  titles: Seq[String] = Seq("alpha beta story", "beta gamma tale", "gamma delta item"),
                  chunk: String = "body text") =
    scores.zipWithIndex.map { case (s, i) =>
      (qid, i + 1, titles(i), chunk, s, s, true) }

  test("fewer than minContexts (3 by config default) is insufficient " +
       "outright (:104-106), with no gate columns surfaced") {
    val out = run(Seq((1L, "general", "alpha query")),
      ctx(1L, Seq(0.9, 0.9)).take(2))
    assert(verdict(out(1L)) == "insufficient")
    assert(out(1L).isNullAt(3) && out(1L).isNullAt(4) && out(1L).isNullAt(6))
  }

  test("intent-aware thresholds (:86-100): avg 0.35 is insufficient for " +
       "'general' (< 0.5 good, >= 0.25 marginal -> marginal), but GOOD " +
       "for causal_explanation/synthesis/topic_deep_dive (>= 0.30)") {
    val qs = Seq((1L, "general", "alpha query"),
      (2L, "causal_explanation", "alpha query"),
      (3L, "synthesis", "alpha query"), (4L, "topic_deep_dive", "alpha query"))
    val cs = (1L to 4L).flatMap(q => ctx(q, Seq(0.35, 0.35, 0.35)))
    val out = run(qs, cs)
    assert(verdict(out(1L)) == "marginal")
    assert(Seq(2L, 3L, 4L).forall(q => verdict(out(q)) == "good"))
  }

  test("the average uses RerankScore only when RerankApplied (:118-123)") {
    val cs = Seq(
      (1L, 1, "alpha beta", "b", 0.1, 0.9, true),
      (1L, 2, "beta gamma", "b", 0.1, 0.9, true),
      (1L, 3, "gamma alpha", "b", 0.1, 0.9, false))
    val out = run(Seq((1L, "general", "alpha")), cs)
    assert(out(1L).getDouble(3) == (0.9 + 0.9 + 0.1) / 3)
  }

  test("variance downgrade boundary (:224-231): ratio STRICTLY > 5 — " +
       "exactly 5x stays good, above downgrades to marginal; a zero " +
       "second score fires whenever the top is positive") {
    val at5 = run(Seq((1L, "general", "alpha query")), ctx(1L, Seq(0.75, 0.15, 0.9)))
    assert(verdict(at5(1L)) == "good" && at5(1L).getInt(5) == 0)
    val over = run(Seq((1L, "general", "alpha query")), ctx(1L, Seq(0.8, 0.15, 0.85)))
    assert(verdict(over(1L)) == "marginal" && over(1L).getInt(5) == 1)
    val zero = run(Seq((1L, "general", "alpha query")), ctx(1L, Seq(0.9, 0.0, 0.9)))
    assert(zero(1L).getInt(5) == 1)
  }

  test("topic incoherence (:162-196): no title pair sharing a >=3-rune " +
       "word downgrades good to marginal; one shared significant word " +
       "suppresses it; titles under 2 skip the check") {
    val distinct = Seq("alpha one", "beta two", "gamma six")
    val inco = run(Seq((1L, "general", "alpha query")),
      ctx(1L, Seq(0.9, 0.9, 0.9), titles = distinct))
    assert(verdict(inco(1L)) == "marginal" && inco(1L).getInt(4) == 1,
      "'one'/'two'/'six' are under 3 runes — no shared significant word")
    val coherent = run(Seq((1L, "general", "alpha query")),
      ctx(1L, Seq(0.9, 0.9, 0.9)))
    assert(verdict(coherent(1L)) == "good" && coherent(1L).getInt(4) == 0)
    val untitled = run(Seq((1L, "general", "alpha query")),
      ctx(1L, Seq(0.9, 0.9, 0.9), titles = Seq("alpha one", " ", "")))
    assert(untitled(1L).getInt(4) == 0, "fewer than 2 titled contexts skip")
  }

  test("downgrades cap at marginal and mismatch is the ONLY path to " +
       "insufficient from marginal (:139-156); good verdicts never " +
       "evaluate mismatch") {
    // marginal band + query keywords absent everywhere -> insufficient
    val miss = run(Seq((1L, "general", "zzqx wwvv uupp")),
      ctx(1L, Seq(0.3, 0.3, 0.3)))
    assert(verdict(miss(1L)) == "insufficient" && miss(1L).getInt(6) == 1)
    // marginal + a keyword present in one chunk -> stays marginal
    val hit = run(Seq((1L, "general", "zzqx body")),
      ctx(1L, Seq(0.3, 0.3, 0.3)))
    assert(verdict(hit(1L)) == "marginal" && hit(1L).getInt(6) == 0,
      "'body' appears in every chunk_text")
    // good + absent keywords -> stays good, mismatch not surfaced
    val good = run(Seq((1L, "general", "zzqx wwvv")),
      ctx(1L, Seq(0.9, 0.8, 0.9)))
    assert(verdict(good(1L)) == "good" && good(1L).isNullAt(6))
  }

  test("keyword extraction (:262-290): CJK katakana/kanji runs of >=2 " +
       "runes with hiragana as boundaries; Latin words >=3 runes after " +
       "the exact punctuation cutset, stop words excluded") {
    // CJK: の splits the two segments; both absent from contexts -> mismatch
    val cjk = run(Seq((1L, "general", "分散処理の最適化")),
      ctx(1L, Seq(0.3, 0.3, 0.3)))
    assert(verdict(cjk(1L)) == "insufficient" && cjk(1L).getInt(6) == 1)
    // one CJK segment present in a chunk suppresses the mismatch
    val cjkHit = run(Seq((1L, "general", "分散処理の最適化")),
      ctx(1L, Seq(0.3, 0.3, 0.3), chunk = "covers 最適化 deeply"))
    assert(verdict(cjkHit(1L)) == "marginal")
    // stop words and short words never count as keywords: a query of
    // ONLY those yields zero keywords -> mismatch cannot fire
    val stops = run(Seq((1L, "general", "the and why up?!")),
      ctx(1L, Seq(0.3, 0.3, 0.3)))
    assert(verdict(stops(1L)) == "marginal" && stops(1L).getInt(6) == 0)
    // punctuation trims before the length/stop checks: 'alpha?' matches
    val punct = run(Seq((1L, "general", "alpha?")),
      ctx(1L, Seq(0.3, 0.3, 0.3)))
    assert(verdict(punct(1L)) == "marginal" && punct(1L).getInt(6) == 0,
      "'alpha' appears in the titles")
  }

  test("rag09 over the corpus runs and lands every query in a valid " +
       "verdict with the %13 class insufficient by count") {
    val out = RetrievalQuality.rag09(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("good", "marginal", "insufficient")(r.getString(7))))
    assert(out.filter(_.getLong(0) % 13 == 0).forall(r =>
      r.getLong(2) == 2 && r.getString(7) == "insufficient"))
  }
}
