package graft

import graft.operators.QueryIntent

/** Rule-per-case pins for rag18 — rag-orchestrator query_intent.go
  * (ParseQueryIntent :57-98) + query_classifier.go (Classify :22-62,
  * ClassifySubIntent :117-141) + the answer_with_rag_usecase.go
  * :1008-1022 wiring.
  */
class QueryIntentSpec extends SparkSpec {
  import spark.implicits._

  private val U = "00000000-0000-4000-8000-000000000001"

  private def run(raws: String*) =
    QueryIntent.resolve(raws.zipWithIndex.map { case (r, i) => (i.toLong, r) }
      .toDF("id", "raw")).orderBy("id").collect()
      .map(r => (r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null else r.getString(4),
        r.getString(5))).toSeq

  test("step parse survives brackets in titles; LAST separator and LAST marker win; FIRST ] closes (query_intent.go:57-98)") {
    val got = run(
      s"Regarding the article: A [B] C [articleId: $U]\n\nQuestion:\nwhat now",
      s"Regarding the article: T [articleId: $U]\n\nQuestion:\nmid\n\nQuestion:\nfinal q")
    assert(got(0) == ("article_scoped", "none", U, "A [B] C", "what now"))
    // last separator wins: the question is the FINAL block, the header
    // keeps the earlier one
    assert(got(1)._1 == "article_scoped" && got(1)._5 == "final q")
  }

  test("every parse-step failure falls back to the classifier on the RAW text: bad uuid, missing separator, missing marker, missing ] (:62-91)") {
    val got = run(
      "Regarding the article: X [articleId: not-a-uuid]\n\nQuestion:\ncompare a and b",
      "Regarding the article: no separator, compare things",
      s"Regarding the article: no marker here\n\nQuestion:\ncompare x",
      s"Regarding the article: T [articleId: $U no close\n\nQuestion:\ncompare y")
    assert(got.forall(g => g._1 == "comparison" && g._3 == null))
  }

  test("intent priority ladder with the reference's own ordering pins: causal beats temporal, synthesis beats temporal, fact-check beats deep-dive (query_classifier.go:22-62)") {
    val got = run(
      "最近の障害の真因は何か", // 最近 temporal kw present, causal wins
      "最近のNYと芸術のかかわり", // synthesis (relation+と) beats temporal
      "本当のところを詳しく", // fact_check beats deep_dive
      "今週の latest news", "Spark 対 Flink")
    assert(got.map(_._1) == Seq("causal_explanation", "synthesis",
      "fact_check", "temporal", "comparison"))
  }

  test("synthesis structural rules: とは何, relation-word + と, 影響 + (全体|と) (:286-330)") {
    assert(run("LLMとは何か", "経済と政治の関係", "政策の影響と全体像")
      .map(_._1) == Seq("synthesis", "synthesis", "synthesis"))
  }

  test("sub-intent priority: related_articles > evidence > detail > critique > opinion > implication > summary_refresh; none when nothing matches (:117-141)") {
    def scoped(q: String) = s"Regarding the article: T [articleId: $U]\n\nQuestion:\n$q"
    val got = run(
      scoped("関連記事と根拠を両方"), // related beats evidence
      scoped("根拠の詳細を"), // evidence beats detail
      scoped("この主張の弱点"), // critique
      scoped("どう思う"), // opinion
      scoped("今後の影響は"), // implication
      scoped("結論だけもう一度"), // summary_refresh
      scoped("plain question"))
    assert(got.map(_._2) == Seq("related_articles", "evidence", "critique",
      "opinion", "implication", "summary_refresh", "none"))
  }

  test("JP keywords match the raw query, EN the lowercase: 'EXPLAIN THE PLAN' classifies deep-dive") {
    assert(run("EXPLAIN THE PLAN")(0)._1 == "topic_deep_dive")
  }
}
