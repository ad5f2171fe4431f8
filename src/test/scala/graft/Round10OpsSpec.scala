package graft

import org.apache.spark.sql.functions._
import graft.operators.Rag

/** Round-10 fusion checks: the N-list RRF core pinned against a
  * hand-computed three-list case (acolyte domain/fusion.py:45),
  * including both tie-break tiers.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("fuseRankedLists: hand-computed 3-list fusion with max-score and first-source tie-breaks") {
    // query 1 — doc A=10 only in primary; B=2 in primary+broad; C=4 in
    // broad+narrow; D=7 in primary+broad at EQUAL rank and EQUAL score
    val hits = Seq(
      (1L, 10L, "primary", 0.9, 1),
      (1L, 2L, "primary", 0.8, 2),
      (1L, 7L, "primary", 0.5, 3),
      (1L, 2L, "broad", 0.7, 1),
      (1L, 4L, "broad", 0.6, 2),
      (1L, 7L, "broad", 0.5, 3),
      (1L, 4L, "narrow", 0.95, 1))
      .toDF("query_id", "neighbor_id", "src", "score", "r")
    val out = Rag.fuseRankedLists(hits, Seq("primary", "broad", "narrow"))
      .collect().map(r => (r.getInt(8), r.getLong(1), r.getDouble(5),
        r.getDouble(6), r.getString(7))).sortBy(_._1).toSeq

    // B and C tie exactly on RRF (1/62 + 1/61) — C wins on max
    // individual score (.95 narrow vs .8 primary), the fusion.py:67
    // tie-break; D's equal-score tie resolves to the FIRST source
    val bc = 1.0 / 62 + 1.0 / 61
    assert(out == Seq(
      (1, 4L, 0.0 + bc, 0.95, "narrow"),
      (2, 2L, bc + 0.0, 0.8, "primary"),
      (3, 7L, 1.0 / 63 + 1.0 / 63 + 0.0, 0.5, "primary"),
      (4, 10L, 1.0 / 61 + 0.0 + 0.0, 0.9, "primary")))
  }

  test("xs01: numeric-first stable order, fact parens, 。 termination, empty-claim skip") {
    val claims = Seq(
      // (report, ord, claim, facts, evidence)
      (1L, 1L, "売上は伸びた", Seq("45%"), Seq("E1")),          // fact NOT in text → parens, then 。
      (1L, 2L, "横ばいだった", Seq.empty[String], Seq("E2", "E3")), // no facts → renders AFTER ord-1&3
      (1L, 3L, "45%まで伸びたと結論した。", Seq("45%"), Seq("E4")), // fact in text → no parens; already 。
      (1L, 4L, "", Seq.empty[String], Seq("E5")),               // skipped by render, counted by citations
      (2L, 5L, "other report", Seq.empty[String], Seq("E6")))
      .toDF("report_id", "ord", "claim", "numeric_facts", "evidence_ids")
    val out = graft.operators.ExecSummary.renderOn(claims).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L)._1 ==
      "売上は伸びた（45%）。45%まで伸びたと結論した。横ばいだった。",
      "numeric claims first in original order, then the rest; parens only when a fact is absent from the text")
    assert(out(1L)._2 == 3L, "the empty claim renders nothing")
    assert(out(1L)._3 == 5L, "build_citations counts evidence of ALL claims, empty text included")
    assert(out(2L)._1 == "other report。")
  }

  test("ke01: phrase gates, seen-word skip, substring dedupe, cap, and confidence rounding") {
    def sel(cands: (String, Double)*) = graft.operators.KeywordSelect.selectOn(
      Seq((1L, cands)).toDF("doc_id", "candidates")
        .withColumn("candidates",
          col("candidates").cast("array<struct<phrase:string,score:double>>")))
      .collect().map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).sortBy(_._1).toSeq
    // capitalized phrase over 0.225 survives; uncapitalized twin never
    // does; the phrase's own words are seen → 'neural' single skipped;
    // an unrelated word at base threshold survives
    assert(sel(("Neural engine", 0.30), ("query planner", 0.30),
      ("neural", 0.80), ("batch", 0.20)) == Seq(
      (1, "neural engine", 0.3), (2, "batch", 0.2)),
      "phrases lower for output; capitalization gate reads the RAW phrase")
    // phrase-covered words die in the WORD pass (seen set)
    assert(sel(("Vector Index Store", 0.50), ("index", 0.45), ("store", 0.40)) ==
      Seq((1, "vector index store", 0.5)))
    // substring dedupe is EITHER direction: a containing word drops
    // against the accepted shorter one, regardless of the :92 comment
    assert(sel(("vector", 0.50), ("vectorize", 0.40)) == Seq((1, "vector", 0.5)))
    // generic gates: digits and len<=2 never pass; sub-threshold dies
    assert(sel(("2024", 0.90), ("ai", 0.90), ("ok", 0.90), ("engine", 0.10)) == Seq())
    // confidence clips to [0,1] and rounds to 3 dp
    assert(sel(("verylongword", 1.40)) == Seq((1, "verylongword", 1.0)))
    // the cap stops at 10 even with more eligible words
    val many = (1 to 14).map(i => (f"word$i%02d", 0.5 + i * 0.01))
    assert(sel(many: _*).size == 10)
  }

  test("tv01: every validation rule and the two-step clean order match tag_validator.py") {
    def v(tags: String*) = graft.operators.TagValidate.validateOn(
      tags.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("tag_id", "tag"))
      .collect().map(r => r.getString(1) -> (r.getBoolean(2), r.getString(3))).toMap
    val out = v("機械学習", "発表します", "検索の", "2024", "HTTPS", "語",
      "するの", "自然言語処理自然言語処理自然言語", "データた")
    assert(out("機械学習") == (true, "機械学習"))
    assert(out("発表します") == (false, "発表し"), "ます$ is a verb fragment")
    assert(out("検索の") == (false, "検索"), "trailing particle rejects and strips")
    assert(out("2024") == (false, "2024"), "digits-only")
    assert(out("HTTPS") == (false, "HTTPS"), "URL fragments reject case-insensitively")
    assert(out("語")._1 == false, "under 2 chars")
    assert(out("するの") == (false, ""),
      "particle strips FIRST, exposing the verb ending — cleaned to empty (:97-100)")
    assert(out("自然言語処理自然言語処理自然言語")._1 == false, "over 15 chars")
    assert(out("データた") == (true, "データた"),
      "た alone is neither a listed verb ending nor a particle — single-pass, no stemming")
  }

  test("gb01: boosted ranking is Python-stable; margin/flag rules match the reference") {
    def runs(cands: Seq[(Double, Double)]) = Seq((1L, cands, 2, 0.5))
      .toDF("job_id", "candidates", "tag_count", "confidence")
      .withColumn("candidates",
        col("candidates").cast("array<struct<score:double,boost:double>>"))
    def snap(cands: Seq[(Double, Double)]) = {
      val r = graft.operators.GraphBoost.snapshotOn(runs(cands)).collect().head
      (r.getDouble(1), r.getDouble(2), r.getInt(3), r.getBoolean(4))
    }
    // clear winner: margin = 0.9 − 0.6, top_boost from the winner
    assert(snap(Seq((0.5, 0.4), (0.3, 0.3), (0.1, 0.0))) == (0.3, 0.4, 3, true))
    // exact boosted tie → FIRST candidate wins (Python stable sort,
    // genre_learning.py:78) → its boost reported, margin 0 → flag off
    assert(snap(Seq((0.5, 0.2), (0.7, 0.0))) == (0.0, 0.2, 2, false))
    // margin clears 0.15 but the winner has no boost → flag off
    assert(snap(Seq((0.9, 0.0), (0.2, 0.1))) == (0.6, 0.0, 2, false))
    // single candidate: second = top → margin 0 (:81)
    assert(snap(Seq((0.4, 0.3))) == (0.0, 0.3, 1, false))
    // empty candidates → (0, 0, 0, false) (:76)
    assert(snap(Seq.empty) == (0.0, 0.0, 0, false))
  }

  test("fz01: per-dimension stats match the hand case; the σ floor guards constant dimensions") {
    val emb = Seq(
      (0L, Seq(1.0f, 5.0f), 0), (10L, Seq(3.0f, 5.0f), 0),
      (1L, Seq(4.0f, 5.0f), 0)) // vec 1 is apply-only — not in the fit set
      .toDF("vec_id", "embedding", "label")
    val stats = graft.operators.Features.embeddingStats(emb)
    assert(stats.toSeq == Seq((2.0, 1.0), (5.0, 1e-6)),
      "population σ over the fit set only; a zero-variance dimension floors at 1e-6")
  }

  test("fz01: the fit set re-normalizes to zero mean / unit variance per dimension") {
    val out = graft.operators.Features.fz01(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") % 10 === 0)
      .select(col("dim_idx").as("d"), col("normalized_value").as("v"))
      .groupBy("d").agg(avg("v").as("m"), stddev_pop("v").as("sd"))
      .agg(max(abs(col("m"))).as("worst_mean"),
        max(abs(col("sd") - 1)).as("worst_sd")).collect().head
    assert(out.getDouble(0) < 1e-3 && out.getDouble(1) < 1e-3,
      s"fit-set normalized moments drifted: $out")
  }

  test("rag08: per-source membership genuinely differs and ranks stay bounded") {
    val out = Rag.rag08(spark, "/root/testdata/sf0.001").cache()
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
    // the top-6 cuts disagree somewhere: fused docs missing from at
    // least one list exist at this SF
    assert(out.filter(col("r_primary").isNull || col("r_broad").isNull ||
      col("r_narrow").isNull).count() > 0)
    // every fused row carries a real best score from a real source
    assert(out.filter(col("best_score") < 0).count() == 0)
    out.unpersist()
  }
}
