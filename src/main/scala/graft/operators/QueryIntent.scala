package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** rag18: query intent classification — rag-orchestrator's
  * `ParseQueryIntent`/`ResolveQueryIntent` (internal/usecase/
  * query_intent.go:57-124) + the rule-based `QueryClassifier`
  * (query_classifier.go:22-331), production-wired at
  * answer_with_rag_usecase.go:1008-1022: every RAG query parses for
  * article scope, then either sub-classifies the user question
  * (article-scoped) or runs the full intent ladder. The intent drives
  * strategy selection, rag09's thresholds and rag15's
  * fact-check/causal flags.
  *
  * Reference semantics:
  *
  *  - ParseQueryIntent (:57-98) is a STEP parse, not a regex — so
  *    brackets inside titles survive: the `Regarding the article: `
  *    prefix, the LAST `\n\nQuestion:\n` separator, the LAST
  *    `[articleId: ` marker in the header, the FIRST `]` after it,
  *    and a uuid.Parse gate (google/uuid accepts the same four
  *    textual forms as cb01's UuidShapeRe) — any step failing falls
  *    back to a general-intent query with the RAW text as the user
  *    question. Re-expressed with greedy `(?s)` regexes (greedy
  *    prefix = last-occurrence anchor, the rag15 technique).
  *  - Classify (:22-62) runs the keyword ladders in PRIORITY order —
  *    article-scoped → comparison → causal → synthesis → temporal →
  *    fact_check → deep_dive → general — with the reference's own
  *    ordering comments pinned ("最近の真因" is causal, not temporal;
  *    "最近のNYと芸術のかかわり" is synthesis, not temporal;
  *    fact-check's 本当 beats deep-dive). Japanese keywords match the
  *    RAW query, English ones the lowercase (verbatim tables,
  *    data-as-semantics). Synthesis adds three structural rules: the
  *    とは何 pattern, relation-word + と, and 影響 with 全体-or-と.
  *  - ClassifySubIntent (:117-141, article-scoped only per the
  *    wiring): related_articles > evidence > detail > critique >
  *    opinion > implication > summary_refresh > none.
  *  - The wiring's `classified != general` override guard (:1018-1020)
  *    is a NO-OP — the non-scoped parse always leaves general, so
  *    overriding with general is identity (pinned).
  *
  * Output: (id, intent, sub_intent, article_id, title,
  * user_question) — sub_intent/article_id/title NULL off the scoped
  * path.
  *
  * Scale: a stateless contains/regex ladder fused into the scan —
  * zero shuffles.
  */
object QueryIntent {

  private def anyJp(q: Column, kws: Seq[String]): Column =
    kws.map(k => q.contains(k)).reduce(_ || _)
  private def anyEn(lower: Column, kws: Seq[String]): Column =
    kws.map(k => lower.contains(k)).reduce(_ || _)

  def matchesComparison(q: Column, l: Column): Column =
    anyJp(q, Seq("違い", "比較", "対")) ||
      anyEn(l, Seq(" vs ", " vs. ", "compare", "difference between", "compared to"))
  def matchesCausal(q: Column, l: Column): Column =
    anyJp(q, Seq("真因", "原因", "要因", "なぜ", "理由", "根源")) ||
      anyEn(l, Seq("root cause", "why did", "reason behind", "caused by", "what caused"))
  def matchesSynthesis(q: Column, l: Column): Column =
    anyJp(q, Seq("そもそも", "全体像", "概観", "歴史的")) ||
      q.contains("とは何") ||
      (anyJp(q, Seq("かかわり", "関係", "つながり", "関連", "関係性")) && q.contains("と")) ||
      (q.contains("影響") && (q.contains("全体") || q.contains("と"))) ||
      anyEn(l, Seq("relationship between", "overview of", "how are", "connected"))
  def matchesTemporal(q: Column, l: Column): Column =
    anyJp(q, Seq("最近", "今週", "今日", "最新", "昨日", "先週")) ||
      anyEn(l, Seq("latest", "recent", "this week", "today", "yesterday", "last week"))
  def matchesFactCheck(q: Column, l: Column): Column =
    anyJp(q, Seq("本当", "事実", "正しい")) ||
      anyEn(l, Seq("is it true", "fact check", "is it correct", "is it accurate"))
  def matchesDeepDive(q: Column, l: Column): Column =
    anyJp(q, Seq("詳しく", "深掘り", "について教えて", "について詳しく")) ||
      anyEn(l, Seq("in detail", "explain", "tell me about", "deep dive"))

  /** Classify (:22-62) minus the article-scoped head (handled by the
    * caller's parse).
    */
  def classify(q: Column): Column = {
    val l = lower(q)
    when(matchesComparison(q, l), "comparison")
      .when(matchesCausal(q, l), "causal_explanation")
      .when(matchesSynthesis(q, l), "synthesis")
      .when(matchesTemporal(q, l), "temporal")
      .when(matchesFactCheck(q, l), "fact_check")
      .when(matchesDeepDive(q, l), "topic_deep_dive")
      .otherwise("general")
  }

  /** ClassifySubIntent (:117-141), priority order. */
  def subIntent(q: Column): Column = {
    val l = lower(q)
    when(anyJp(q, Seq("関連する記事", "似た記事", "関連記事", "他にもある")) ||
      anyEn(l, Seq("related articles", "similar articles", "related stories")), "related_articles")
      .when(anyJp(q, Seq("根拠", "エビデンス", "証拠", "出典")) ||
        anyEn(l, Seq("evidence", "proof", "citation", "source of")), "evidence")
      .when(anyJp(q, Seq("技術的", "詳細", "具体例", "仕組み", "メカニズム")) ||
        anyEn(l, Seq("technical", "detail", "specific example", "mechanism", "how does it work")), "detail")
      .when(anyJp(q, Seq("反論", "批判", "弱点", "問題点", "欠点", "リスク", "デメリット", "懸念", "課題", "限界")) ||
        anyEn(l, Seq("counterargument", "criticism", "weakness", "limitation", "drawback", "risk", "concern", "flaw", "downside")), "critique")
      .when(anyJp(q, Seq("どう思う", "評価", "意見", "見解", "感想", "判断")) ||
        anyEn(l, Seq("what do you think", "opinion", "assessment", "evaluation", "judgment", "your view")), "opinion")
      .when(anyJp(q, Seq("影響は", "意味は", "どういう意味", "結果は", "将来", "今後")) ||
        anyEn(l, Seq("implication", "what does this mean", "impact", "consequence", "going forward")), "implication")
      .when(anyJp(q, Seq("結論だけ", "もう一度", "要約して", "まとめ直して")) ||
        anyEn(l, Seq("just the conclusion", "summarize again", "recap")), "summary_refresh")
      .otherwise("none")
  }

  /** The full wiring over (id, raw) rows. */
  def resolve(rows: DataFrame): DataFrame = {
    val raw = col("raw")
    val isPrefixed = raw.startsWith("Regarding the article: ")
    val hasSep = raw.contains("\n\nQuestion:\n")
    val userQScoped = trim(regexp_extract(raw, "(?s).*\\n\\nQuestion:\\n(.*)$", 1))
    val header = regexp_extract(raw,
      "(?s)^Regarding the article: (.*)\\n\\nQuestion:\\n.*$", 1)
    val artFound = header.contains("[articleId: ")
    val artTail = regexp_extract(header, "(?s)^.*\\[articleId: (.*)$", 1)
    val artId = trim(regexp_extract(artTail, "^([^\\]]*)\\]", 1))
    val hasClose = artTail.contains("]")
    val validUuid = artId.rlike(CitationReconcile.UuidShapeRe)
    val scoped = isPrefixed && hasSep && artFound && hasClose && validUuid
    val title = trim(regexp_extract(header, "(?s)^(.*)\\[articleId: ", 1))
    rows.select(col("id"),
      when(scoped, lit("article_scoped")).otherwise(classify(raw)).as("intent"),
      when(scoped, subIntent(userQScoped)).as("sub_intent"),
      when(scoped, artId).as("article_id"),
      when(scoped, title).as("title"),
      when(scoped, userQScoped).otherwise(raw).as("user_question"))
  }

  private val U = "00000000-0000-4000-8000-000000000042"

  /** rag18 adapter: twelve composed query classes. */
  def rag18(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 12
    val raw = when(cls === 0,
        lit(s"Regarding the article: Kubernetes [Deep] Dive [articleId: $U]\n\nQuestion:\n根拠を教えて"))
      .when(cls === 1,
        lit("Regarding the article: Broken [articleId: not-a-uuid]\n\nQuestion:\ntell me about spark"))
      .when(cls === 2, lit("Spark vs Flink streaming 比較"))
      .when(cls === 3, lit("最近の障害の真因は何か"))
      .when(cls === 4, lit("AIと芸術のかかわりについて"))
      .when(cls === 5, lit("今週のニュースは"))
      .when(cls === 6, lit("これは本当ですか"))
      .when(cls === 7, lit("explain the scheduler internals"))
      .when(cls === 8, lit("hello there friend"))
      .when(cls === 9, lit("円安の影響と全体の見通し"))
      .when(cls === 10,
        lit(s"Regarding the article: T [articleId: $U]\n\nQuestion:\nこの主張の弱点は"))
      .otherwise(lit("Regarding the article: no separator here, compare things"))
    resolve(Tables.documents(s, dir).select(col("doc_id").as("id"), raw.as("raw")))
  }

  /** DuckDB twin of [[rag18]]. */
  val rag18OracleSql: String = {
    def jp(col: String, kws: Seq[String]) =
      kws.map(k => s"contains($col, '$k')").mkString("(", " OR ", ")")
    def en(col: String, kws: Seq[String]) =
      kws.map(k => s"contains($col, '${k.replace("'", "''")}')").mkString("(", " OR ", ")")
    val cmp = s"(${jp("q", Seq("違い", "比較", "対"))} OR ${en("lq", Seq(" vs ", " vs. ", "compare", "difference between", "compared to"))})"
    val cau = s"(${jp("q", Seq("真因", "原因", "要因", "なぜ", "理由", "根源"))} OR ${en("lq", Seq("root cause", "why did", "reason behind", "caused by", "what caused"))})"
    val syn = s"(${jp("q", Seq("そもそも", "全体像", "概観", "歴史的"))} OR contains(q, 'とは何')" +
      s" OR (${jp("q", Seq("かかわり", "関係", "つながり", "関連", "関係性"))} AND contains(q, 'と'))" +
      s" OR (contains(q, '影響') AND (contains(q, '全体') OR contains(q, 'と')))" +
      s" OR ${en("lq", Seq("relationship between", "overview of", "how are", "connected"))})"
    val tmp = s"(${jp("q", Seq("最近", "今週", "今日", "最新", "昨日", "先週"))} OR ${en("lq", Seq("latest", "recent", "this week", "today", "yesterday", "last week"))})"
    val fct = s"(${jp("q", Seq("本当", "事実", "正しい"))} OR ${en("lq", Seq("is it true", "fact check", "is it correct", "is it accurate"))})"
    val dpd = s"(${jp("q", Seq("詳しく", "深掘り", "について教えて", "について詳しく"))} OR ${en("lq", Seq("in detail", "explain", "tell me about", "deep dive"))})"
    val subLadder =
      s"""CASE WHEN ${jp("uq", Seq("関連する記事", "似た記事", "関連記事", "他にもある"))} OR ${en("luq", Seq("related articles", "similar articles", "related stories"))} THEN 'related_articles'
           WHEN ${jp("uq", Seq("根拠", "エビデンス", "証拠", "出典"))} OR ${en("luq", Seq("evidence", "proof", "citation", "source of"))} THEN 'evidence'
           WHEN ${jp("uq", Seq("技術的", "詳細", "具体例", "仕組み", "メカニズム"))} OR ${en("luq", Seq("technical", "detail", "specific example", "mechanism", "how does it work"))} THEN 'detail'
           WHEN ${jp("uq", Seq("反論", "批判", "弱点", "問題点", "欠点", "リスク", "デメリット", "懸念", "課題", "限界"))} OR ${en("luq", Seq("counterargument", "criticism", "weakness", "limitation", "drawback", "risk", "concern", "flaw", "downside"))} THEN 'critique'
           WHEN ${jp("uq", Seq("どう思う", "評価", "意見", "見解", "感想", "判断"))} OR ${en("luq", Seq("what do you think", "opinion", "assessment", "evaluation", "judgment", "your view"))} THEN 'opinion'
           WHEN ${jp("uq", Seq("影響は", "意味は", "どういう意味", "結果は", "将来", "今後"))} OR ${en("luq", Seq("implication", "what does this mean", "impact", "consequence", "going forward"))} THEN 'implication'
           WHEN ${jp("uq", Seq("結論だけ", "もう一度", "要約して", "まとめ直して"))} OR ${en("luq", Seq("just the conclusion", "summarize again", "recap"))} THEN 'summary_refresh'
           ELSE 'none' END"""
    val uuidRe = "^(urn:uuid:)?[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$$|^[0-9a-fA-F]{32}$$|^\\{[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\}$$"
    s"""WITH comp AS (SELECT doc_id AS id,
         CASE doc_id % 12
           WHEN 0 THEN 'Regarding the article: Kubernetes [Deep] Dive [articleId: $U]' || e'\\n\\nQuestion:\\n' || '根拠を教えて'
           WHEN 1 THEN 'Regarding the article: Broken [articleId: not-a-uuid]' || e'\\n\\nQuestion:\\n' || 'tell me about spark'
           WHEN 2 THEN 'Spark vs Flink streaming 比較'
           WHEN 3 THEN '最近の障害の真因は何か'
           WHEN 4 THEN 'AIと芸術のかかわりについて'
           WHEN 5 THEN '今週のニュースは'
           WHEN 6 THEN 'これは本当ですか'
           WHEN 7 THEN 'explain the scheduler internals'
           WHEN 8 THEN 'hello there friend'
           WHEN 9 THEN '円安の影響と全体の見通し'
           WHEN 10 THEN 'Regarding the article: T [articleId: $U]' || e'\\n\\nQuestion:\\n' || 'この主張の弱点は'
           ELSE 'Regarding the article: no separator here, compare things'
         END AS raw
         FROM documents),
       parsed AS (SELECT id, raw,
         starts_with(raw, 'Regarding the article: ') AS pref,
         contains(raw, e'\\n\\nQuestion:\\n') AS hassep,
         trim(regexp_extract(raw, '(?s).*\\n\\nQuestion:\\n(.*)$$', 1)) AS uq0,
         regexp_extract(raw, '(?s)^Regarding the article: (.*)\\n\\nQuestion:\\n.*$$', 1) AS header
         FROM comp),
       art AS (SELECT *,
         contains(header, '[articleId: ') AS artfound,
         regexp_extract(header, '(?s)^.*\\[articleId: (.*)$$', 1) AS arttail
         FROM parsed),
       sc AS (SELECT *,
         trim(regexp_extract(arttail, '^([^\\]]*)\\]', 1)) AS art_id,
         contains(arttail, ']') AS hasclose,
         trim(regexp_extract(header, '(?s)^(.*)\\[articleId: ', 1)) AS title0
         FROM art),
       fin AS (SELECT id, raw,
         (pref AND hassep AND artfound AND hasclose
          AND regexp_matches(art_id, '$uuidRe')) AS scoped,
         uq0, art_id, title0
         FROM sc),
       cl AS (SELECT *, raw AS q, lower(raw) AS lq,
                     uq0 AS uq, lower(uq0) AS luq FROM fin)
       SELECT id,
         CASE WHEN scoped THEN 'article_scoped'
              WHEN $cmp THEN 'comparison'
              WHEN $cau THEN 'causal_explanation'
              WHEN $syn THEN 'synthesis'
              WHEN $tmp THEN 'temporal'
              WHEN $fct THEN 'fact_check'
              WHEN $dpd THEN 'topic_deep_dive'
              ELSE 'general' END AS intent,
         CASE WHEN scoped THEN $subLadder END AS sub_intent,
         CASE WHEN scoped THEN art_id END AS article_id,
         CASE WHEN scoped THEN title0 END AS title,
         CASE WHEN scoped THEN uq0 ELSE raw END AS user_question
       FROM cl"""
  }
}
