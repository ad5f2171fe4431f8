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

  /** Embedded Japanese lexicon for dictionary-assisted tokenization —
    * the small-footprint stand-in for the reference's morphological
    * dictionaries (kagome IPA dict, search-indexer/app/tokenize/
    * tokenizer.go:10; ginza/janome extractors, tag-generator/app/
    * tag_extractor/japanese_extractor.py). ~100 common nouns/compounds
    * (public everyday vocabulary); anything not covered falls back to
    * tokensMixed's per-char convention, so recall never drops below
    * the dictionary-less baseline.
    */
  val jaLexicon: Seq[String] = Seq(
    "自然言語処理", "機械学習", "深層学習", "人工知能", "全文検索",
    "重複排除", "分散処理", "大規模", "可視化", "高速化",
    "東京都", "日本語", "検索", "索引", "構築", "文書", "処理", "学習",
    "言語", "自然", "機械", "深層", "人工", "知能", "東京", "大阪",
    "京都", "日本", "分散", "計算", "高速", "重複", "排除", "解析",
    "分析", "結果", "情報", "技術", "開発", "研究", "論文", "記事",
    "要約", "翻訳", "辞書", "単語", "形態素", "品詞", "文章", "文字",
    "入力", "出力", "保存", "削除", "更新", "追加", "取得", "送信",
    "受信", "接続", "設定", "管理", "運用", "監視", "障害", "復旧",
    "性能", "評価", "指標", "基準", "手法", "方式", "設計", "実装",
    "試験", "検証", "環境", "構成", "配置", "配信", "収集", "抽出",
    "変換", "圧縮", "展開", "統計", "確率", "推定", "予測", "分類",
    "回帰", "学会", "会議", "発表", "質問", "回答", "説明", "理解",
    "データ", "テキスト", "システム", "サーバ", "クラスタ", "ベクトル",
    "インデックス", "ストリーム", "モデル", "グラフ")

  /** Dictionary-assisted Japanese tokenization: longest-match against
    * [[jaLexicon]] with tokensMixed's per-char fallback for everything
    * else. The longest-match is encoded as a LENGTH-DESCENDING regex
    * alternation — both Java regex and RE2 take the first matching
    * alternative at each position, so ordering the dictionary longest
    * first makes one regexp_extract_all pass a greedy longest-match
    * segmenter in BOTH engines (oracle-parity by construction), still
    * zero UDFs and fully codegen'd. 東京都 tokenizes as 東京都, never
    * 東京+都; 機械学習 stays one term instead of four chars.
    */
  def tokensDictJa(text: Column): Column =
    regexp_extract_all(lower(trim(text)), lit(jaDictPattern), lit(0))

  /** The shared segmentation pattern (also embedded in tx38's DuckDB
    * oracle): dictionary entries longest-first, then ASCII word runs,
    * then the per-char CJK fallback.
    */
  val jaDictPattern: String =
    jaLexicon.sortBy(w => -w.length).mkString("|") + "|[a-z0-9]+|[^\\x00-\\x7F]"

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
    // scale-0 round in 1e-4 units (graft.functions.Numeric discipline)
    round((lit(0.5) * lenScore + lit(0.5) * density) * 1e4, 0).cast("long") / 1e4
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
