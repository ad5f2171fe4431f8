package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** pre01: the recap-worker article PREPROCESS gate — the
  * deterministic residue of pipeline/preprocess.rs preprocess_article
  * (:204-283) and its helpers (:286-456), the stage every article
  * passes before classification and selection:
  *
  *  - content extraction is the env-blocked half: the subworker
  *    extract_content service call (:209), and on its failure the
  *    local ammonia + html2text rendering (clean_html :355 — a
  *    vendored sanitizer + 80-column text reflow; its
  *    `contains_html_tags` byte scanner (:371-404) IS deterministic:
  *    '<' followed by [/!?A-Za-z] with any later '>', re-expressed as
  *    the RE2/Java-identical `(?s)<[/!?A-Za-z].*>`, and carried here
  *    as the was_html flag); the composed input is the extracted
  *    text, the pl01/fo01 env-blocked-input precedent, already NFC
  *    (the :235 nfc() pass — our composed ASCII+CJK corpus is its
  *    own NFC form; Spark has no codegen normalizer and the
  *    operator documents the identity);
  *  - language: the provided article.language wins (:242-256); the
  *    detect fallback is the lingua wrapper (language_detection.rs),
  *    already ledgered env-blocked with tx05 the heuristic stand-in;
  *  - `calculate_ja_ratio` (:427-456): Japanese chars (hiragana
  *    U+3040-309F, katakana U+30A0-30FF, common kanji U+4E00-9FAF)
  *    over non-whitespace chars; the ≥ 0.3 gate cross-multiplies to
  *    exact integers (10·ja ≥ 3·total — the reference compares f32,
  *    and an exact-boundary ratio like 3/10 must not flip on
  *    representation);
  *  - `is_valid_content` (:406-425): min_len = 10 when the ratio
  *    clears 0.3 else 20; shorter content survives only by ending in
  *    '。' (a complete Japanese sentence) or containing ANY digit
  *    (data-heavy snippets) — both exceptions pinned; empty-after-
  *    trim drops before the gate (:240); invalid rows are DROPPED
  *    (the reference returns None), so the output is the kept set;
  *  - tokenization (:286-343): lang ja* → the char-BIGRAM tokenizer
  *    (alphanumeric-filtered chars, n−1 sliding bigrams, the single
  *    surviving char as its own token, [] on none); otherwise the
  *    latin tokenizer — unicode words, punctuation/symbol edges
  *    stripped, lowercased, length ≥ 2 — re-expressed as lowered
  *    `[\p{L}\p{N}]+` runs of length ≥ 2 (identical on this corpus:
  *    UAX-29 word boundaries and the edge-strip regex reduce to
  *    alphanumeric runs when no intra-word punctuation is present;
  *    Rust's byte-length ≥ 2 equals char-length on ASCII runs).
  *    Trim is the shared regex ^\s+|\s+$ (Rust trims Unicode
  *    whitespace; both engines run the same class). The premise is
  *    spec-ENFORCED, not assumed: PreprocessSpec asserts the
  *    latin-routed composed corpus has no intra-word punctuation and
  *    no non-ASCII — except the ONE pinned counter-example class
  *    (doc_id%17==1 rows whose doc lang ≠ ja route '短い文です。'
  *    through the latin tokenizer, where UAX-29 would segment the
  *    ideographs/kana per character into five 3-BYTE words but the
  *    alnum-run regex yields one 5-char token; the oracle mirrors
  *    the regex, so the divergence is documented, driver-green, and
  *    visible the moment the composition changes).
  *
  * Output per KEPT article: doc_id, language, was_html, char_count,
  * ja_chars, ja_ratio (1e-6), min_len, n_tokens, first_token.
  *
  * Composition plants every branch: a no-digit short English drop, a
  * '。'-saved short Japanese row, a digit-saved short row, a
  * whitespace-only drop, an HTML-flagged row, and a ja-routed mixed
  * CJK/ASCII row for the bigram tokenizer.
  *
  * Scale: ONE stateless scan projection — regex counts, the integer
  * gate and both tokenizers fuse into whole-stage codegen; the drop
  * is a pushed filter. No shuffle, no join.
  */
object Preprocess {

  val JaRanges = "\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FAF"

  /** Composed post-extraction articles:
    * (doc_id, lang, was_html, content).
    */
  def composeArticles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 5 === 0, lit("ja")).otherwise(col("lang")).as("lang"),
      // the was_html flag: the byte scanner over the pre-extraction
      // body — composed as raw HTML for every third article
      when(col("doc_id") % 3 === 0, lit(true)).otherwise(
        regexp_like(col("text"), lit("(?s)<[/!?A-Za-z].*>"))).as("was_html"),
      when(col("doc_id") % 17 === 0, lit("tiny note only"))
        .when(col("doc_id") % 17 === 1, lit("短い文です。"))
        .when(col("doc_id") % 17 === 2, lit("tiny note 42"))
        .when(col("doc_id") % 17 === 3, lit("   "))
        .when(col("doc_id") % 5 === 0,
          concat(lit("日本語のテキスト実験 mixed 42 "), substring(col("text"), 1, 40)))
        .otherwise(col("text")).as("content"))

  /** The gate over any (doc_id, lang, was_html, content) frame. */
  def preprocessOn(articles: DataFrame): DataFrame = {
    val trimmed = regexp_replace(col("content"), "^\\s+|\\s+$", "")
    val base = articles
      .withColumn("t", trimmed)
      .filter(col("t") =!= "")
      .withColumn("char_count", length(col("t")))
      .withColumn("nonws", regexp_replace(col("t"), "\\s", ""))
      .withColumn("ja_chars",
        length(regexp_replace(col("nonws"), s"[^$JaRanges]", "")))
      .withColumn("total_chars", length(col("nonws")))
      // 10·ja ≥ 3·total ⇔ ratio ≥ 0.3, exact
      .withColumn("ja_heavy",
        col("total_chars") > 0 && col("ja_chars") * 10 >= col("total_chars") * 3)
      .withColumn("min_len", when(col("ja_heavy"), 10).otherwise(20))
      .withColumn("kept",
        col("char_count") >= col("min_len") ||
          col("t").endsWith("。") ||
          col("t").rlike("\\p{Nd}"))
    val jaFiltered = regexp_replace(col("t"), "[^\\p{L}\\p{N}]", "")
    val jaN = length(jaFiltered)
    val latinToks = filter(
      regexp_extract_all(lower(col("t")), lit("[\\p{L}\\p{N}]+"), lit(0)),
      w => length(w) >= 2)
    val isJa = col("lang").startsWith("ja")
    base.filter(col("kept"))
      .select(col("doc_id"), col("lang").as("language"), col("was_html"),
        col("char_count").cast("long").as("char_count"),
        col("ja_chars").cast("long").as("ja_chars"),
        when(col("total_chars") > 0,
          microRatio(col("ja_chars"), col("total_chars"), 6)).otherwise(0.0)
          .as("ja_ratio"),
        col("min_len").cast("long").as("min_len"),
        when(isJa,
          when(jaN >= 2, jaN - 1).when(jaN === 1, lit(1)).otherwise(lit(0)))
          .otherwise(size(latinToks)).cast("long").as("n_tokens"),
        when(isJa,
          when(jaN >= 2, substring(jaFiltered, 1, 2))
            .when(jaN === 1, jaFiltered))
          .otherwise(element_at(latinToks, 1)).as("first_token"))
  }

  def pre01(s: SparkSession, dir: String): DataFrame =
    preprocessOn(composeArticles(s, dir))
}
