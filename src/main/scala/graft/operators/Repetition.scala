package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** LLM-output repetition detection — the generation-degeneration gate
  * news-creator runs on every model output before accepting it
  * (news-creator/app/news_creator/utils/repetition_detector.py:9
  * `detect_repetition`): six pattern families, each counted by a
  * backreference regex and scored min(1, n·w), with the OVERALL score
  * the MAX of the present families (:110 — "if any pattern is severe,
  * flag it") and the gate at score ≥ 0.3:
  *
  *  - word-level `\b(\w+)(?:\s+\1){2,}\b` case-insensitive, w=0.2;
  *  - HTML-tag runs `(</?\w+[^>]*>)(?:\s*\1){2,}`, w=0.3;
  *  - attribute runs `(\w+="[^"]*")(?:\s*\1){2,}`, w=0.25;
  *  - short-string runs `([^\s]{1,10})(?:\s+\1){2,}` with the
  *    common-word allowlist filter (:63 — "the the the" counts as a
  *    WORD repeat but not a short-string repeat), w=0.15;
  *  - URL runs, w=0.3;  - 4+ same-character runs `(.)\1{3,}`, w=0.1;
  *  - texts under 10 stripped chars return (false, 0) (:26).
  *
  * Weights are exact 1e-6-unit integers (200000/300000/250000/
  * 150000/300000/100000), so scores and the 0.3 gate are integer
  * arithmetic. Backreference patterns run in Java regex with (?U) so
  * `\w` matches CJK exactly as Python's re does; RE2 has NO
  * backreferences, so this row is rows-only (the tx15 LCS precedent)
  * with a rule-per-case spec and repeat-run byte-stability instead
  * of a DuckDB oracle.
  *
  * Scale: six regexp_extract_all counts fused into one stateless
  * scan projection — no explode, no shuffle, no join; the same body
  * gates a stream of model outputs at generation time.
  */
object Repetition {

  val commonWords: Set[String] = Set(
    "the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with")

  private val wordPat = "(?iU)\\b(\\w+)(?:\\s+\\1){2,}\\b"
  private val htmlPat = "(</?\\w+[^>]*>)(?:\\s*\\1){2,}"
  private val attrPat = "(\\w+=\"[^\"]*\")(?:\\s*\\1){2,}"
  private val shortPat = "([^\\s]{1,10})(?:\\s+\\1){2,}"
  private val urlPat = "(https?://[^\\s]+)(?:\\s+\\1){2,}"
  private val charPat = "(.)\\1{3,}"

  /** The battery over any (out_id, <textCol>) frame. */
  def detectOn(outputs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(pat: String): Column = size(regexp_extract_all(t, lit(pat), lit(0)))
    val nShort = size(filter(
      regexp_extract_all(t, lit(shortPat), lit(1)),
      m => !commonWords.toSeq.map(w => lower(m) === lit(w)).reduce(_ || _)))
    def scoreU(cnt: Column, wU: Long): Column =
      when(cnt > 0, least(lit(1000000L), cnt.cast("long") * wU)).otherwise(0L)
    val counts = outputs.select(col("out_id"),
      n(wordPat).as("n_word"), n(htmlPat).as("n_html"), n(attrPat).as("n_attr"),
      nShort.as("n_short"), n(urlPat).as("n_url"), n(charPat).as("n_char"),
      (length(trim(t)) < 10).as("too_short"))
    counts.select(col("out_id"),
      col("n_word"), col("n_html"), col("n_attr"),
      col("n_short"), col("n_url"), col("n_char"),
      when(col("too_short"), 0L).otherwise(greatest(
        scoreU(col("n_word"), 200000L), scoreU(col("n_html"), 300000L),
        scoreU(col("n_attr"), 250000L), scoreU(col("n_short"), 150000L),
        scoreU(col("n_url"), 300000L), scoreU(col("n_char"), 100000L)))
        .as("score_u"))
      .select(col("out_id"), col("n_word"), col("n_html"), col("n_attr"),
        col("n_short"), col("n_url"), col("n_char"),
        (col("score_u") / 1e6).as("score"),
        (col("score_u") >= 300000L).as("has_repetition"))
  }

  /** Composed model outputs: document text with one degenerate
    * pattern family planted per residue (plus clean and too-short
    * rows).
    */
  def composeOutputs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id").as("out_id"), split(trim(col("text")), "\\s+").as("toks"))
    val base = array_join(slice(col("toks"), 1, 25), " ")
    val text = when(col("out_id") % 13 === 0, "tiny")
      .otherwise(concat(
        base,
        when(col("out_id") % 3 === 0, " echo Echo echo chamber").otherwise(""),
        when(col("out_id") % 4 === 0, " </div></div></div>").otherwise(""),
        when(col("out_id") % 5 === 0, " id=\"x\" id=\"x\" id=\"x\"").otherwise(""),
        when(col("out_id") % 7 === 0, " zz zz zz").otherwise(""),
        when(col("out_id") % 11 === 0, " the the the again").otherwise(""),
        when(col("out_id") % 6 === 1,
          " http://a.io/x http://a.io/x http://a.io/x").otherwise(""),
        when(col("out_id") % 8 === 0, " waiting----- done").otherwise("")))
    d.select(col("out_id"), text.as("llm_output"))
  }

  def rp01(s: SparkSession, dir: String): DataFrame =
    detectOn(composeOutputs(s, dir), "llm_output")
}
