package graft

import graft.operators.Evidence
import org.apache.spark.sql.DataFrame

/** Evidence compression: one planted case per reference rule
  * (acolyte compressed_evidence.py) — every expected value below was
  * confirmed against the reference implementation run on the same
  * fixture strings.
  */
class EvidenceSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, String, Seq[String], Boolean)]): DataFrame =
    rows.toDF("doc_id", "body", "queries", "fallback")

  private def spans(df: DataFrame): Seq[(Int, String, Int, Double)] =
    df.collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  test("split: boundaries, offsets, decimal/abbreviation conservatism") {
    val body = "alpha beta. Spark covers 3.14% at U.S. level. Deep dive\n" +
      "機械学習の導入を発表した。データ分析を解説する。\nnote tail"
    val out = Evidence.scoredSentences(frame(Seq((1L, body, Seq("zzzqx"), false))))
      .select("t", "o").collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    // the reference split of this body: "3.14%" and "U.S." never
    // split; ". S"/". D" and \n do; 。 splits with no whitespace
    assert(out.toSeq == Seq(
      ("alpha beta.", 0),
      ("Spark covers 3.14% at U.S. level.", 12),
      ("Deep dive", 46),
      ("機械学習の導入を発表した。", 56),
      ("データ分析を解説する。", 69),
      ("note tail", 81)))
  }

  test("split: lowercase after period does NOT split; duplicate sentences keep true offsets") {
    val noSplit = Evidence.scoredSentences(frame(Seq(
      (1L, "alpha spark beta. Spark wins again here. gamma delta", Seq("zzzqx"), false))))
      .select("t", "o").collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2)
    assert(noSplit.toSeq == Seq(
      ("alpha spark beta.", 0),
      ("Spark wins again here. gamma delta", 18)),
      "'. g' must not split — the running offset find still resolves")
    // a short sentence REPEATED (and embedded in an earlier span):
    // the running text.find(stripped, offset) fold gives each copy
    // its own position (reference: [0, 5, 13])
    val dup = Evidence.scoredSentences(frame(Seq(
      (2L, "発表した。xx 発表した。発表した。", Seq("zzzqx"), false))))
      .select("o").collect().map(_.getInt(0)).sorted
    assert(dup.toSeq == Seq(0, 5, 13))
  }

  test("empty / whitespace-only body yields no spans in either operator") {
    val f = frame(Seq((1L, "  ", Seq("spark"), true), (2L, "", Seq("spark"), true)))
    assert(Evidence.compressOn(f, 220).count() == 0)
    assert(Evidence.topSentencesOn(f, 3, 120).count() == 0,
      "position_fallback never resurrects an empty body")
  }

  test("selective augmentation: nothing clears the threshold → empty output") {
    val f = frame(Seq((1L, "nothing here at all. More words beyond", Seq("zzzqx"), false)))
    assert(Evidence.compressOn(f, 220).count() == 0)
    assert(Evidence.topSentencesOn(f, 2, 120).count() == 0, "no fallback flag → []")
  }

  test("position_fallback: first N document-order sentences, scores kept at 0") {
    val f = frame(Seq((1L, "nothing here at all. More words beyond", Seq("zzzqx"), true)))
    assert(spans(Evidence.topSentencesOn(f, 2, 120)) == Seq(
      (1, "nothing here at all.", 0, 0.0),
      (2, "More words beyond", 21, 0.0)))
  }

  test("budget packing: exact-fit boundary admits, one-under rejects, top span always kept") {
    val body = "alpha spark beta. Spark wins again here. Gamma delta spark epsilon zeta"
    val f = frame(Seq((1L, body, Seq("spark analytics"), false)))
    // ties at 0.5 pack in document order (stable sort); lens 17+22=39
    assert(spans(Evidence.compressOn(f, 39)) == Seq(
      (1, "alpha spark beta.", 0, 0.5),
      (2, "Spark wins again here.", 18, 0.5)))
    assert(spans(Evidence.compressOn(f, 38)) == Seq(
      (1, "alpha spark beta.", 0, 0.5)))
    // the top sentence is selected even when it alone exceeds the
    // budget (the reference breaks only when `selected` is non-empty)
    val big = frame(Seq((2L,
      "one two three four five six seven eight nine ten eleven twelve spark! Boom spark",
      Seq("spark"), false)))
    assert(spans(Evidence.compressOn(big, 10)) == Seq(
      (1, "one two three four five six seven eight nine ten eleven twelve spark!", 0, 1.0)))
  }

  test("CJK-only sentence scores by char-bigram Jaccard") {
    // query 機械の学習 is NOT a substring (ascii track 0); bigrams:
    // query {機械,械の,の学,学習}, sentence 機械学習の導入を発表した
    // (12 chars → 11 bigrams); ∩ = {機械,学習} = 2, ∪ = 13 →
    // round(2e6/13) = 153846
    val f = frame(Seq((1L, "機械学習の導入を発表した。データ分析を行う。",
      Seq("機械の学習"), false)))
    assert(spans(Evidence.compressOn(f, 220)) == Seq(
      (1, "機械学習の導入を発表した。", 0, 0.153846)))
  }

  test("ascii track counts substring hits, not only word hits") {
    // 'spark' is not a word of sentence 1 but IS a substring of
    // 'sparkling' — the reference's `term in lower` branch
    val f = frame(Seq((1L, "sparkling water is here. Next sentence spark", Seq("spark"), false)))
    assert(spans(Evidence.compressOn(f, 220)) == Seq(
      (1, "sparkling water is here.", 0, 1.0),
      (2, "Next sentence spark", 25, 1.0)))
  }

  test("top-N selection truncates to max_len but keeps the true offset") {
    val body = "spark " + "x" * 130 + " end. Tail spark here"
    val f = frame(Seq((1L, body, Seq("spark"), false)))
    assert(spans(Evidence.topSentencesOn(f, 3, 20)) == Seq(
      (1, "spark xxxxxxxxxxxxxx", 0, 1.0),
      (2, "Tail spark here", 142, 1.0)))
  }

  test("composed corpus: every planted path occurs and ranks are dense from 1") {
    val ce01 = Evidence.ce01(spark, sfDir)
    val ce02 = Evidence.ce02(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).select("doc_id").as[Long].collect().toSet
    val c1 = ce01.select("doc_id").as[Long].collect().toSet
    val c2 = ce02.select("doc_id").as[Long].collect().toSet
    // whitespace-body docs emit nothing anywhere
    assert(docs.filter(_ % 13 == 0).forall(d => !c1.contains(d) && !c2.contains(d)))
    // no-hit docs: ce01 always empty; ce02 only via the even-id fallback
    val noHit = docs.filter(d => d % 17 == 5 && d % 13 != 0)
    assert(noHit.forall(!c1.contains(_)))
    assert(noHit.filter(_ % 2 == 1).forall(!c2.contains(_)))
    assert(noHit.filter(_ % 2 == 0).forall(c2.contains), "fallback path populated")
    // dense ranks starting at 1; ce02 capped at 3
    import org.apache.spark.sql.functions._
    val r1 = ce01.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("pack_rank").as("mx"), min("pack_rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(r1 == 0)
    val r2 = ce02.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("sel_rank").as("mx")).filter(col("mx") > 3).count()
    assert(r2 == 0)
  }
}
