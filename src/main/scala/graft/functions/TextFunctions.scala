package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions.
  *
  * Mirrors the reference's text pipelines: tag-generator's extraction +
  * stopword filtering (tag-generator/app/tag_extractor/extract.py,
  * english_extractor.py), recap-worker's tokenize/quality filters
  * (recap-worker/recap-worker/src/util/text.rs) and language
  * classification (whatlang usage there), search-indexer's token prep.
  *
  * Everything here composes native `org.apache.spark.sql.functions` —
  * no UDFs — so the expressions stay inside WholeStageCodegen and the
  * parquet scan can still prune columns underneath them.
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** CJK-aware mixed tokenization: lowercased ASCII alphanumeric runs
    * become word tokens, every non-ASCII character becomes its own
    * token, punctuation/whitespace separate. On Japanese text (no
    * spaces) whitespace splitting yields one token per document — this
    * is the dictionary-less fallback the reference's text stack implies:
    * recap-worker's ROUGE tokenizer does exactly this split
    * (recap-worker/recap-worker/src/evaluation/rouge.rs:110 tokenize —
    * ASCII words + per-grapheme CJK), standing in for search-indexer's
    * kagome morphological analysis
    * (search-indexer/app/tokenize/tokenizer.go:10). Compose with
    * `shinglesOfTokens(_, 2)` for the character-bigram blocking that
    * CJK search/dedup needs. One regex pass, no UDF, both engines agree
    * on the pattern (BMP codepoints).
    */
  def tokensMixed(text: Column): Column =
    regexp_extract_all(lower(trim(text)), lit("[a-z0-9]+|[^\\x00-\\x7F]"), lit(0))

  /** ASCII-word-only token count (the subtrahend for counting CJK char
    * tokens without a per-token regex filter).
    */
  def asciiWordCount(text: Column): Column =
    size(regexp_extract_all(lower(trim(text)), lit("[a-z0-9]+"), lit(0)))

  /** Word n-gram shingles, e.g. n=2 → ["a b", "b c", ...], via the
    * native WordShingles expression (a higher-order-function version
    * re-evaluates the token split per shingle element). For n=1 this is
    * just the token array.
    */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 1)
    shinglesOfTokens(tokens(text), n)
  }

  /** n-gram shingles over an arbitrary token array (e.g. tokensMixed
    * for CJK character bigrams).
    */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1)
    if (n == 1) toks
    else org.apache.spark.sql.graft.ColumnBridge.column(
      WordShingles(org.apache.spark.sql.graft.ColumnBridge.expression(toks), n))
  }

  /** Count of tokens that appear in `words`. */
  def tokenCountIn(text: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t)))
  }

  /** Stopword ratio: fraction of tokens in the stopword list (the
    * recap-worker / tag-generator quality-filter signal).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    tokenCountIn(text, stopwords) / tokenCount(text)

  /** Composite document quality score in [0,1]: length saturation plus
    * non-stopword density, the shape of recap-worker's inclusion filter.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val density  = lit(1.0) - stopwordRatio(text, stopwords)
    round(lit(0.5) * lenScore + lit(0.5) * density, 4)
  }

  /** Sentence segmentation: split on terminal punctuation
    * (recap-worker/recap-worker/src/util/text.rs:19 unicode_sentences
    * — the granularity its XXH3 near-dup filter hashes at; that
    * reference segments with full UAX#29 rules). Two rules:
    *
    *  - ASCII terminators [.!?] followed by whitespace (whitespace
    *    consumed);
    *  - CJK terminators 。．！？… — which Japanese text does NOT
    *    follow with whitespace — optionally trailed by up to two
    *    closing quotes/brackets (the break lands AFTER 」』etc., per
    *    UAX#29), with a guard so a ！！ run or 。」 sequence splits
    *    once at its end, not inside.
    *
    * Without the CJK rule a Japanese corpus never splits and sentence
    * dedup silently degenerates to whole-document dedup. Compose with
    * HashFunctions for sentence-level dedup: explode(sentences) →
    * xxhash64 → groupBy.
    */
  def sentences(text: Column): Column =
    filter(
      split(trim(text),
        "(?<=[.!?])\\s+|" +
        "(?<=[。．！？…][」』）】〉》\"']{0,2})" +
        "(?![。．！？…」』）】〉》\"'])\\s*"),
      s => length(trim(s)) > 0)

  /** Strip HTML to text: remove script/style subtrees, drop tags,
    * decode the common entities, collapse whitespace — the article-body
    * cleaning step of the reference's ingestion (pre-processor's
    * sanitizer; recap-worker cleans HTML with ammonia before
    * tokenizing). Pure regexp_replace chain: runs inside codegen, no UDF.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]+>", " ")
    // &amp; must decode LAST: decoding it first turns double-escaped
    // text (&amp;lt;) into markup (&lt; → <) that was never there
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** PII scrub: redact emails, URLs, and multi-digit runs (IDs, phone
    * fragments) — the log-sanitization step the reference's pipeline
    * implies (rask-log-forwarder ships raw container logs; pre-processor
    * sanitizes article bodies before storage). A regexp_replace chain
    * stays inside codegen; order matters — emails before URLs (an email
    * inside a URL query would otherwise be split), digits last so the
    * placeholder text itself is never re-scanned for digits.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://\\S+", "<URL>"),
      "\\d{2,}", "<NUM>")

  /** Count of PII hits scrubPii would redact from `text` under one
    * pattern (for audit rollups alongside the scrub itself).
    */
  def piiHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Language-profile marker sets: per language, words whose presence
    * votes for that language. Deliberately tiny profiles — the operator
    * shape (per-language vote counts + deterministic argmax) is what
    * scales; swap in real frequency profiles for production corpora.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "table"),
    "de" -> Seq("key", "hash", "merge"),
    "fr" -> Seq("query", "filter", "join"),
    "zh" -> Seq("stream", "batch", "window"))

  /** Predicted language: first lang (in declaration order) whose vote
    * count is >= all others — one native-expression pass over the
    * tokens (the composed when-chain walked them once per profile),
    * with semantics the DuckDB oracle's CASE chain mirrors verbatim.
    */
  def langId(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      LangIdExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens(text)),
        langMarkers.map(_._1), langMarkers.map(_._2)))

  /** Token-set Jaccard of two (distinct-element) arrays, unrounded —
    * the verify metric of tx09/tx17 and the lexical half of rag02's
    * rerank blend. One definition so rounding/null semantics can never
    * drift between the exact baseline and its sketch-blocked path.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) / size(array_union(a, b))

  /** Longest-common-subsequence length of two token arrays — the
    * ROUGE-L kernel (native codegen'd DP; see LcsLength).
    */
  def lcsLen(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      LcsLength(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
