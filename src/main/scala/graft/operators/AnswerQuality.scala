package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** rag15: post-generation answer quality flags — rag-orchestrator's
  * `AssessAnswerQuality` (internal/usecase/output_validator.go:281-483,
  * production-wired at answer_with_rag_usecase.go:534/:612,
  * stream_hybrid_longform.go:230 and rag_answer_stream.go:381 — every
  * generated RAG answer passes through it; "all checks are
  * string-based (no LLM calls)" per the reference's own comment).
  * Distinct from rag09 (retrieval_quality.go judges the RETRIEVED
  * context before generation; this battery judges the ANSWER after).
  *
  * The six checks, flag order fixed by the append sequence:
  *
  *  1. `low_keyword_coverage` (checkKeywordCoverage :318-351):
  *     the query's user question (extractUserQuestion :376-383 — the
  *     text after the LAST `\n\nQuestion:\n` separator, the
  *     article-scoped prompt format) must cover ≥ 50% of its
  *     significant words (≥3 runes, lowercased, whitespace fields) as
  *     substrings of the lowercased answer — exact integer
  *     cross-multiplication 2·covered ≥ significant; CJK-dominant
  *     questions skip entirely (isCJKDominant :354-374: >30% of runes
  *     in Hiragana/Katakana/CJK-Unified/Ext-A/Fullwidth — 10·cjk >
  *     3·total exact); zero significant words passes.
  *  2. `low_citation_density` (checkCitationDensity :385-396): answers
  *     under 200 runes pass; otherwise ≥ max(1, runeLen/500 floored)
  *     citations.
  *  3. `incoherent_ending` (checkCoherentEnding :398-411): the TRIMMED
  *     answer must end with one of the sentence terminators
  *     。 . ！ ! ？ ? ） ) 」 " — the reference also lists "\n", which
  *     is DEAD after TrimSpace (pinned; spec proves a
  *     newline-terminated answer still flags through its last real
  *     character).
  *  4. `fact_check_missing_evidence` (:300, fact_check intent only):
  *     none of the ten evidence keywords present (checkFactCheckEvidence
  *     :413-422; the `contains(lower, kw) || contains(answer, kw)`
  *     double check is a no-op — every keyword is already lowercase or
  *     caseless Japanese — pinned).
  *  5. `expansion_failed` (:305, causal_explanation intent with zero
  *     surviving expanded queries — rag13's output feeds this count).
  *  6. `context_insufficiency_disclaimer`
  *     (checkContextInsufficiencyDisclaimer :424-483): trimmed,
  *     non-empty, ≤260 runes, and a Japanese prefix×signal or
  *     lowercased English prefix×signal table match.
  *
  * Output: (doc_id, n_flags, flags) with flags ", "-free comma-joined
  * in check order ("" when clean) — scalar columns for the comparator.
  *
  * Scale: a stateless per-row projection (two split/filter HOFs, a
  * fixed suffix/prefix battery) — zero shuffles.
  */
object AnswerQuality {

  val EvidenceKeywords: Seq[String] = Seq(
    "根拠", "出典", "研究", "evidence", "source", "according", "study",
    "report", "データ", "調査")

  val CoherentEndings: Seq[String] = Seq(
    "。", ".", "！", "!", "？", "?", "）", ")", "」", "\"") // "\n" dead post-trim

  val JaPrefixes: Seq[String] =
    Seq("提供されたコンテキストには", "このコンテキストには", "コンテキストには")
  val JaLackSignals: Seq[String] =
    Seq("含まれていません", "十分な情報がありません", "情報がありません", "記載されていません")
  val EnPrefixes: Seq[String] = Seq(
    "the provided context", "the supplied context", "the context provided",
    "i couldn't find enough information")
  val EnLackSignals: Seq[String] = Seq(
    "does not contain", "doesn't contain", "does not include",
    "not enough information", "insufficient evidence", "knowledge base",
    "not enough indexed evidence")

  private val CjkClass =
    "[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF\\u3400-\\u4DBF\\uFF00-\\uFFEF]"

  /** isCJKDominant: 10·cjk > 3·total over runes; empty → false. */
  def isCjkDominant(s: Column): Column = {
    val total = length(s)
    val cjk = total - length(regexp_replace(s, CjkClass, ""))
    total > 0 && cjk * 10 > total * 3
  }

  /** extractUserQuestion: text after the LAST `\n\nQuestion:\n`. */
  def userQuestion(query: Column): Column =
    when(query.contains("\n\nQuestion:\n"),
      trim(regexp_extract(query, "(?s).*\\n\\nQuestion:\\n(.*)$", 1)))
      .otherwise(query)

  /** The battery over (id, query, answer, intent, n_citations,
    * n_expanded) rows.
    */
  def assess(rows: DataFrame): DataFrame = {
    val eq = userQuestion(col("query"))
    val lowerAns = lower(col("answer"))
    val words = filter(split(lower(eq), "\\s+"), w => length(w) >= 3 && w =!= "")
    val significant = size(words)
    val covered = size(filter(words, w => contains(lowerAns, w)))
    val coverageOk = isCjkDominant(eq) || significant === 0 ||
      covered * 2 >= significant
    val ansLen = length(col("answer"))
    val densityOk = ansLen < 200 ||
      col("n_citations") >= greatest(ansLen.cast("long") / 500, lit(1L)).cast("long")
    val t = trim(col("answer"))
    val endingOk = length(t) === 0 ||
      CoherentEndings.map(e => t.endsWith(e)).reduce(_ || _)
    val evidenceOk = EvidenceKeywords.map(k => contains(lowerAns, lit(k)))
      .reduce(_ || _)
    val factCheckFlag = col("intent") === "fact_check" && !evidenceOk
    val expansionFlag = col("intent") === "causal_explanation" &&
      col("n_expanded") === 0
    val tLen = length(t)
    val jaDisc = JaPrefixes.map(p => t.startsWith(p)).reduce(_ || _) &&
      JaLackSignals.map(sg => t.contains(sg)).reduce(_ || _)
    val lowerT = lower(t)
    val enDisc = EnPrefixes.map(p => lowerT.startsWith(p)).reduce(_ || _) &&
      EnLackSignals.map(sg => lowerT.contains(sg)).reduce(_ || _)
    val disclaimer = t =!= "" && tLen <= 260 && (jaDisc || enDisc)

    val flagArr = array_compact(array(
      when(!coverageOk, "low_keyword_coverage"),
      when(!densityOk, "low_citation_density"),
      when(!endingOk, "incoherent_ending"),
      when(factCheckFlag, "fact_check_missing_evidence"),
      when(expansionFlag, "expansion_failed"),
      when(disclaimer, "context_insufficiency_disclaimer")))
    rows.select(col("id").as("doc_id"),
      size(flagArr).as("n_flags"),
      array_join(flagArr, ",").as("flags"))
  }

  /** rag15 adapter: nine composed answer classes per document. */
  def rag15(s: SparkSession, dir: String): DataFrame = {
    val cls = col("doc_id") % 9
    val longAns = "This long answer discusses kubernetes scheduling at length. " // 60 chars
    val rows = Tables.documents(s, dir).select(col("doc_id").as("id"),
      when(cls === 1, lit("kubernetes scheduling performance issues"))
        .when(cls === 2, lit("クラスタのスケジューリング性能について教えて"))
        .otherwise(lit("kubernetes scheduling notes")).as("query"),
      when(cls === 0, lit("Notes on kubernetes scheduling behaviour."))
        .when(cls === 1, lit("Unrelated prose about databases entirely."))
        .when(cls === 2, lit("スケジューラは負荷に応じて配置します。"))
        .when(cls === 3, lit(longAns * 10 + "The end."))
        .when(cls === 4, lit("kubernetes scheduling stops mid senten"))
        .when(cls === 5, lit("kubernetes scheduling claims without backup."))
        .when(cls === 6, lit("kubernetes scheduling causal chain explained."))
        .when(cls === 7, lit("提供されたコンテキストには該当する情報が含まれていません。"))
        .otherwise(lit("The provided context does not contain details on kubernetes scheduling."))
        .as("answer"),
      when(cls === 5, lit("fact_check"))
        .when(cls === 6, lit("causal_explanation"))
        .otherwise(lit("general")).as("intent"),
      when(cls === 3, lit(0L)).otherwise(lit(2L)).as("n_citations"),
      when(cls === 6, lit(0L)).otherwise(lit(3L)).as("n_expanded"))
    assess(rows)
  }

  /** DuckDB twin of [[rag15]]. */
  val rag15OracleSql: String = {
    val cjkClass = "[\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}\\x{FF00}-\\x{FFEF}]"
    val endsList = CoherentEndings.map(e =>
      s"suffix(t, '${if (e == "\"") "\"" else e}')").mkString(" OR ")
    val evid = EvidenceKeywords.map(k => s"contains(lower_ans, '$k')").mkString(" OR ")
    val jaPre = JaPrefixes.map(p => s"starts_with(t, '$p')").mkString(" OR ")
    val jaSig = JaLackSignals.map(p => s"contains(t, '$p')").mkString(" OR ")
    val enPre = EnPrefixes.map(p => s"starts_with(lower_t, '${p.replace("'", "''")}')").mkString(" OR ")
    val enSig = EnLackSignals.map(p => s"contains(lower_t, '${p.replace("'", "''")}')").mkString(" OR ")
    val longAns = "This long answer discusses kubernetes scheduling at length. "
    s"""WITH rows0 AS (SELECT doc_id AS id,
         CASE WHEN doc_id % 9 = 1 THEN 'kubernetes scheduling performance issues'
              WHEN doc_id % 9 = 2 THEN 'クラスタのスケジューリング性能について教えて'
              ELSE 'kubernetes scheduling notes' END AS query,
         CASE WHEN doc_id % 9 = 0 THEN 'Notes on kubernetes scheduling behaviour.'
              WHEN doc_id % 9 = 1 THEN 'Unrelated prose about databases entirely.'
              WHEN doc_id % 9 = 2 THEN 'スケジューラは負荷に応じて配置します。'
              WHEN doc_id % 9 = 3 THEN repeat('$longAns', 10) || 'The end.'
              WHEN doc_id % 9 = 4 THEN 'kubernetes scheduling stops mid senten'
              WHEN doc_id % 9 = 5 THEN 'kubernetes scheduling claims without backup.'
              WHEN doc_id % 9 = 6 THEN 'kubernetes scheduling causal chain explained.'
              WHEN doc_id % 9 = 7 THEN '提供されたコンテキストには該当する情報が含まれていません。'
              ELSE 'The provided context does not contain details on kubernetes scheduling.' END AS answer,
         CASE WHEN doc_id % 9 = 5 THEN 'fact_check'
              WHEN doc_id % 9 = 6 THEN 'causal_explanation'
              ELSE 'general' END AS intent,
         CASE WHEN doc_id % 9 = 3 THEN 0 ELSE 2 END AS n_citations,
         CASE WHEN doc_id % 9 = 6 THEN 0 ELSE 3 END AS n_expanded
         FROM documents),
       prep AS (SELECT *,
         CASE WHEN contains(query, e'\\n\\nQuestion:\\n')
              THEN trim(regexp_extract(query, '(?s).*\\n\\nQuestion:\\n(.*)$$', 1))
              ELSE query END AS eq,
         lower(answer) AS lower_ans, trim(answer) AS t
         FROM rows0),
       metr AS (SELECT *,
         length(eq) - length(regexp_replace(eq, '$cjkClass', '', 'g')) AS cjk_n,
         length(eq) AS eq_n,
         list_filter(regexp_split_to_array(lower(eq), '\\s+'),
           w -> length(w) >= 3 AND w <> '') AS words,
         lower(t) AS lower_t
         FROM prep),
       flg AS (SELECT id,
         NOT (eq_n > 0 AND cjk_n * 10 > eq_n * 3
              OR len(words) = 0
              OR 2 * len(list_filter(words, w -> contains(lower_ans, w))) >= len(words))
           AS f_cov,
         NOT (length(answer) < 200
              OR n_citations >= greatest(length(answer) // 500, 1)) AS f_den,
         NOT (length(t) = 0 OR $endsList) AS f_end,
         (intent = 'fact_check' AND NOT ($evid)) AS f_fact,
         (intent = 'causal_explanation' AND n_expanded = 0) AS f_exp,
         (t <> '' AND length(t) <= 260 AND
          (($jaPre) AND ($jaSig) OR ($enPre) AND ($enSig))) AS f_disc
         FROM metr),
       fin AS (SELECT id,
         list_filter([
           CASE WHEN f_cov THEN 'low_keyword_coverage' END,
           CASE WHEN f_den THEN 'low_citation_density' END,
           CASE WHEN f_end THEN 'incoherent_ending' END,
           CASE WHEN f_fact THEN 'fact_check_missing_evidence' END,
           CASE WHEN f_exp THEN 'expansion_failed' END,
           CASE WHEN f_disc THEN 'context_insufficiency_disclaimer' END],
           x -> x IS NOT NULL) AS fl
         FROM flg)
       SELECT id AS doc_id, len(fl) AS n_flags,
              coalesce(array_to_string(fl, ','), '') AS flags FROM fin"""
  }
}
