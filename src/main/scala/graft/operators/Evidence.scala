package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.microUnits

/** Query-biased extractive evidence compression — the compression
  * stage acolyte runs before every LLM call (acolyte-orchestrator/
  * acolyte/domain/compressed_evidence.py), re-expressed as stateless
  * per-document Spark lineage. Four pieces, each mirrored rule by
  * rule:
  *
  *  - sentence splitting with character offsets (:53): split after
  *    。！？ (plus any trailing whitespace), after .!? only when
  *    followed by whitespace + uppercase/CJK (so "3.14%" and "U.S."
  *    never split), and on newlines; each surviving sentence carries
  *    its offset via the running `text.find(stripped, offset)` fold
  *    (:65), so a short sentence embedded inside an EARLIER one still
  *    resolves to its own position. The reference's zero-width
  *    lookbehind split is re-expressed as a capture-group sentinel
  *    replace (RE2 in the DuckDB oracle has no lookarounds; the
  *    rewrite is output-identical because the consumed boundary chars
  *    are re-emitted around the sentinel).
  *  - term extraction (:210): ASCII words of length > 1 from the
  *    lowercased queries plus contiguous CJK chunks of length ≥ 2
  *    from the raw queries. The reference joins the term SET in
  *    Python set-iteration order when deriving query bigrams; graft
  *    sorts the terms — with at most one CJK chunk per query set (the
  *    composition guarantees it) the two are indistinguishable, since
  *    only bigrams ACROSS two CJK terms depend on join order.
  *  - dual-track scoring (:81): ascii = |terms hitting the sentence
  *    (exact lowercased word OR substring)| / |terms|; cjk = Jaccard
  *    of distinct character bigrams over the CJK chars of sentence
  *    vs. query text; score = max of the tracks, quantized to exact
  *    1e-6-unit longs (the Numeric discipline) so the ≥ 0.01
  *    relevance gate (:21) compares integers in both engines.
  *  - packing: compress_article (:116) sorts score-descending (ties
  *    by offset — Python's stable sort keeps document order) and
  *    takes the prefix until the FIRST budget overflow, always
  *    keeping the top sentence; select_top_sentences (:158) takes
  *    exactly ≤ N, with the position_fallback tertiary path emitting
  *    the first N document-order sentences when nothing clears the
  *    threshold, and truncates each to max_len.
  *
  * Composition: bodies are token slices of the document text shaped
  * into EN sentences (". Capital" boundaries), a decimal/abbreviation
  * trap ("3.14% at U.S. level"), newline bullets, and two planted JP
  * sentences with a rotating verb; doc_id % 13 = 0 plants the
  * whitespace-only body (→ no rows), doc_id % 17 = 5 plants a
  * no-hit query set (→ selective-augmentation empty output; the
  * ce02 position_fallback flag is doc_id % 2 = 0).
  *
  * Scale: everything before the final windows is a stateless
  * projection of the document scan (the split/offset fold runs over
  * ≤ 8 parts per row); ranking and budget packing are windows
  * PARTITIONED BY doc over those ≤ 8 sentence rows — one shuffle on
  * doc_id, no corpus-wide window, no join anywhere.
  */
object Evidence {

  /** Boundary rewrite: `([。！？])\s*|([.!?])\s+([A-Z CJK])|\n` with
    * replacement `$1$2U+0001$3` — consumed boundary chars re-emitted,
    * so splitting on U+0001 reproduces the reference's lookbehind
    * split exactly (fixtures pinned in EvidenceSpec).
    */
  private val boundaryPat = "([。！？])\\s*|([.!?])\\s+([A-Z぀-鿿])|\\n"
  private val cjkClass = "぀-ヿ一-鿿"

  private val RelevanceThresholdU = 10000L // 0.01 in 1e-6 units

  /** Composed (doc_id, body, queries, fallback) evidence inputs. */
  def composeEvidence(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val jpVerb = element_at(
      array(lit("発表した"), lit("開始した"), lit("公開した"), lit("実施した")),
      (col("doc_id") % 4 + 1).cast("int"))
    val jp1 = concat(lit("機械学習の導入を"), jpVerb, lit("。"))
    val jp2 = lit("データ分析と自然言語処理の最新動向を解説する。")
    def seg(start: Int, n: Int): Column = array_join(slice(col("toks"), start, n), " ")
    val body = when(col("doc_id") % 13 === 0, lit("  "))
      .otherwise(concat(
        seg(1, 12), lit(". Spark "), seg(13, 8),
        lit(" covers 3.14% at U.S. level. Deep "), seg(21, 6),
        lit("\n"), jp1, jp2, lit("\nnote "), seg(27, 5)))
    val queries = when(col("doc_id") % 17 === 5, array(lit("zzzqx")))
      .otherwise(array(
        seg(14, 2),
        when(col("doc_id") % 3 === 0, lit("機械学習の導入")).otherwise(lit("spark analytics"))))
    d.select(col("doc_id"), body.as("body"), queries.as("queries"),
      (col("doc_id") % 2 === 0).as("fallback"))
  }

  /** Distinct char bigrams of an already-CJK-only string (empty under
    * 2 chars — never a descending sequence).
    */
  private def bigrams(sC: Column): Column =
    when(length(sC) >= 2,
      array_distinct(transform(sequence(lit(1), length(sC) - 1),
        i => sC.substr(i, lit(2)))))
      .otherwise(array().cast("array<string>"))

  /** Split + offset fold + per-sentence dual-track scores over a
    * (doc_id, body, queries, fallback) frame: one sentence row per
    * surviving part, columns (doc_id, fallback, t, o, score_u).
    */
  private[graft] def scoredSentences(frame: DataFrame): DataFrame = {
    val lowq = transform(col("queries"), q => lower(q))
    val asciiTerms = filter(
      array_distinct(flatten(transform(lowq,
        q => regexp_extract_all(q, lit("[a-z0-9]+"), lit(0))))),
      w => length(w) > 1)
    val cjkTerms = filter(
      array_distinct(flatten(transform(col("queries"),
        q => regexp_extract_all(q, lit(s"[$cjkClass]+"), lit(0))))),
      w => length(w) >= 2)
    val qcjk = regexp_replace(array_join(array_sort(
      array_distinct(concat(asciiTerms, cjkTerms))), " "), s"[^$cjkClass]", "")
    val marked = regexp_replace(col("body"), boundaryPat, "$1$2\u0001$3")
    // the running text.find(stripped, offset) fold (:65): offsets are
    // 0-based; locate is 1-based and returns 0 on miss, where the
    // reference falls back to the running offset
    val sentsFold = expr(
      """aggregate(parts,
           named_struct('pos', 0,
                        'lst', cast(array() as array<struct<t:string,o:int>>)),
           (st, p) -> CASE WHEN length(trim(p)) = 0 THEN st ELSE
             named_struct(
               'pos', CASE WHEN locate(trim(p), body, st.pos + 1) = 0 THEN st.pos
                           ELSE locate(trim(p), body, st.pos + 1) - 1 END
                      + length(trim(p)),
               'lst', array_append(st.lst, named_struct(
                 't', trim(p),
                 'o', CASE WHEN locate(trim(p), body, st.pos + 1) = 0 THEN st.pos
                           ELSE locate(trim(p), body, st.pos + 1) - 1 END)))
             END,
           st -> st.lst)""")
    val prepared = frame
      .withColumn("terms", array_sort(array_distinct(concat(asciiTerms, cjkTerms))))
      .withColumn("qbg", bigrams(qcjk))
      .withColumn("parts", split(marked, "\u0001"))
      .withColumn("sent", explode(sentsFold))
      .select(col("doc_id"), col("fallback"), col("terms"), col("qbg"),
        col("sent.t").as("t"), col("sent.o").as("o"))
    val lowerT = lower(col("t"))
    val asciiWords = array_distinct(regexp_extract_all(lowerT, lit("[a-z0-9]+"), lit(0)))
    val hits = size(filter(col("terms"),
      tm => array_contains(asciiWords, tm) || lowerT.contains(tm)))
    val asciiU = when(size(col("terms")) > 0,
      microUnits(hits, size(col("terms")), 6)).otherwise(lit(0L))
    val sbg = bigrams(regexp_replace(lowerT, s"[^$cjkClass]", ""))
    val interSz = size(array_intersect(sbg, col("qbg")))
    val cjkU = when(size(sbg) > 0 && size(col("qbg")) > 0,
      microUnits(interSz, size(sbg) + size(col("qbg")) - interSz, 6))
      .otherwise(lit(0L))
    prepared.select(col("doc_id"), col("fallback"), col("t"), col("o"),
      greatest(asciiU, cjkU).as("score_u"))
  }

  /** compress_article (:116): threshold gate, score-descending
    * packing until the first char-budget overflow (top sentence
    * always kept). Emits the packed spans in packing order.
    */
  def compressOn(frame: DataFrame, charBudget: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("score_u").desc, col("o").asc)
    scoredSentences(frame)
      .filter(col("score_u") >= RelevanceThresholdU)
      .withColumn("pack_rank", row_number().over(w))
      .withColumn("cum", sum(length(col("t"))).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("pack_rank") === 1 || col("cum") <= charBudget)
      .select(col("doc_id"), col("pack_rank"), col("t").as("text"),
        col("o").as("char_offset"), (col("score_u") / 1e6).as("relevance_score"))
  }

  /** select_top_sentences (:158): ≤ N above-threshold sentences by
    * (score desc, offset), or — when nothing clears the threshold and
    * the row's position_fallback flag is set — the first N sentences
    * in document order; each span truncated to maxLen chars.
    */
  def topSentencesOn(frame: DataFrame, maxSentences: Int, maxLen: Int): DataFrame = {
    val perDoc = Window.partitionBy("doc_id")
    val scored = scoredSentences(frame)
      .withColumn("n_rel",
        count(when(col("score_u") >= RelevanceThresholdU, 1)).over(perDoc))
    val w = Window.partitionBy("doc_id")
      .orderBy(when(col("n_rel") > 0, -col("score_u")).otherwise(lit(0L)), col("o").asc)
    scored
      .filter((col("n_rel") > 0 && col("score_u") >= RelevanceThresholdU) ||
        (col("n_rel") === 0 && col("fallback")))
      .withColumn("sel_rank", row_number().over(w))
      .filter(col("sel_rank") <= maxSentences)
      .select(col("doc_id"), col("sel_rank"),
        substring(col("t"), 1, maxLen).as("text"),
        col("o").as("char_offset"), (col("score_u") / 1e6).as("relevance_score"))
  }

  /** ce01: char-budget evidence compression over the composed corpus
    * (budget 220 so the packing break actually fires at every SF).
    */
  def ce01(s: SparkSession, dir: String): DataFrame =
    compressOn(composeEvidence(s, dir), charBudget = 220)

  /** ce02: top-3 sentence selection with max_len 120 and the
    * position_fallback tertiary path on even doc_ids.
    */
  def ce02(s: SparkSession, dir: String): DataFrame =
    topSentencesOn(composeEvidence(s, dir), maxSentences = 3, maxLen = 120)
}
