package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** qe07: the Japanese-summary quality penalty ladder — reference
  * scripts/check_japanese_summaries.py `evaluate_summary_quality`
  * (:98): a 100-point score with seven deductions —
  *
  *  - stripped length < 50 → −30; else < 100 → −10; else > 2000 → −20
  *    (one band only, the reference's elif chain);
  *  - stripped summary starting with '{' or '[' (JSON garbage) → −50;
  *  - '"' count / max(len(summary), 1) > 0.15 (UNstripped length —
  *    the reference's quirk, kept) → −30;
  *  - unique-word ratio < 0.3 over whitespace-split words → −20;
  *  - title-token overlap < 0.1 — ONLY when both title and content
  *    are present and non-empty (Python truthiness) and the title
  *    has tokens; overlap = |title ∩ summary| / |title tokens| over
  *    lowered word-character runs;
  *  - stripped summary not ending in 。！？.!? → −5;
  *  - more than 10 newlines → −10;
  *
  * clamped to [0, 100]. Every deduction is an exact integer, so the
  * reference's round(score, 1) is the identity and the score is
  * engine-exact by construction. Same family as rp01/qe04 but a
  * distinct rule set.
  *
  * Scale: a single stateless scan projection — string counters and
  * bounded array ops fused per row, zero shuffles, zero joins (the
  * tx39/tx46 shape).
  *
  * Composition: summaries derive from documents with one planted
  * violator per rule on its own residue; the quote-heavy residue
  * nulls its title so the quote rule is isolated from the overlap
  * rule, and a null-content residue proves the overlap check is
  * SKIPPED (not failed) when the article row is absent.
  */
object JaSummaryQuality {

  private val tokenRe = "[a-z0-9_ぁ-んァ-ヶー一-龯]+"

  /** The isolated quote-heavy constant: 17 distinct quoted words —
    * 34 quotes over 119 chars (ratio 0.29), length in the clean band,
    * unique ratio 1.0, terminal 。.
    */
  val quoteHeavy: String =
    (1 to 17).map(i => f""""w$i%02d"""").mkString(" ") + "。"

  /** Composed (summary_id, title, content, summary). */
  def composeSummaries(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val toks = split(trim(col("text")), "\\s+")
    val title4 = array_join(slice(toks, 1, 4), " ")
    val tok1 = element_at(toks, 1)
    val body120 = substring(repeat(concat(col("text"), lit(" ")), 4), 1, 120)
    val longWords = array_join(
      transform(sequence(lit(1), lit(600)), i => concat(lit("w"), i.cast("string"))), " ")
    val summary =
      when(col("doc_id") % 17 === 0, "短いです。")
        .when(col("doc_id") % 19 === 0,
          concat(substring(repeat(concat(col("text"), lit(" ")), 2), 1, 80), lit("。")))
        .when(col("doc_id") % 23 === 0,
          concat(lit("{\"summary\": \""), substring(col("text"), 1, 60), lit("\"}")))
        .when(col("doc_id") % 29 === 0, lit(quoteHeavy))
        .when(col("doc_id") % 31 === 0,
          concat(repeat(concat(tok1, lit(" ")), 39), tok1, lit("。")))
        .when(col("doc_id") % 37 === 0,
          concat(substring(body120, 1, 100), repeat(lit("\n見出し"), 12), lit("。")))
        .when(col("doc_id") % 41 === 0, body120)
        .when(col("doc_id") % 53 === 0,
          concat(title4, lit(" "), longWords, lit("。")))
        .otherwise(concat(body120, lit("。")))
    d.select(
      col("doc_id").as("summary_id"),
      when(col("doc_id") % 47 === 0 || col("doc_id") % 29 === 0, lit(null).cast("string"))
        .otherwise(title4).as("title"),
      when(col("doc_id") % 43 === 0, lit(null).cast("string"))
        .otherwise(col("text")).as("content"),
      summary.as("summary"))
  }

  /** The ladder over any (summary_id, title, content, summary) frame. */
  def qualityOn(df: DataFrame): DataFrame = {
    val st = trim(col("summary"))
    val len = length(st)
    val words = filter(split(col("summary"), "\\s+"), w => w =!= "")
    val nw = size(words)
    val uniq = size(array_distinct(words))
    val rawLen = length(col("summary"))
    val quotes = rawLen - length(regexp_replace(col("summary"), "\"", ""))
    val newlines = rawLen - length(regexp_replace(col("summary"), "\n", ""))
    val tw = array_distinct(regexp_extract_all(lower(col("title")), lit(tokenRe), lit(0)))
    val sw = array_distinct(regexp_extract_all(lower(col("summary")), lit(tokenRe), lit(0)))
    val overlapGuard = col("title").isNotNull && col("title") =!= "" &&
      col("content").isNotNull && col("content") =!= "" && size(tw) > 0
    val lenShort = len < 50
    val lenShortish = !lenShort && len < 100
    val lenLong = !lenShort && !lenShortish && len > 2000
    val jsonPrefix = st.startsWith("{") || st.startsWith("[")
    val quoteHot = quotes / greatest(rawLen, lit(1)) > 0.15
    val repetitive = nw > 0 && uniq / nw < 0.3
    val lowOverlap = when(overlapGuard,
      size(array_intersect(tw, sw)) / size(tw) < 0.1).otherwise(false)
    val noTerminal = len > 0 &&
      !substring(st, -1, 1).isin("。", "！", "？", ".", "!", "?")
    val manyNewlines = newlines > 10
    def pen(c: Column, p: Int): Column = when(c, p).otherwise(0)
    val score = greatest(lit(0), least(lit(100),
      lit(100) - pen(lenShort, 30) - pen(lenShortish, 10) - pen(lenLong, 20) -
        pen(jsonPrefix, 50) - pen(quoteHot, 30) - pen(repetitive, 20) -
        pen(lowOverlap, 15) - pen(noTerminal, 5) - pen(manyNewlines, 10)))
    df.select(
      col("summary_id"), len.as("length"), nw.as("word_count"),
      score.cast("double").as("score"),
      lenShort.as("len_short"), lenShortish.as("len_shortish"),
      lenLong.as("len_long"), jsonPrefix.as("json_prefix"),
      quoteHot.as("quote_heavy"), repetitive.as("repetitive"),
      lowOverlap.as("low_title_overlap"), noTerminal.as("no_terminal_punct"),
      manyNewlines.as("many_newlines"))
  }

  def qe07(s: SparkSession, dir: String): DataFrame =
    qualityOn(composeSummaries(s, dir))
}
