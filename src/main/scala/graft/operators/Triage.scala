package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Short-document triage — the reference's degenerate-article
  * diagnosis script (scripts/analyze_short_articles.py), the answer
  * to "WHY is this document too short to train on":
  *
  *  - HTML detection + cleaning (:76 clean_html_content): a document
  *    is HTML if it starts with a doctype/html tag or its tag
  *    characters exceed 30% of the content across >50 tags; cleaning
  *    is the script's regex fallback path (:112 — strip `<...>` tags,
  *    strip `&...;` entities, collapse whitespace; the bleach branch
  *    needs a lib this engine doesn't ship, and the fallback is the
  *    reference's own documented degradation).
  *  - the FIRST-MATCH-WINS category cascade (:118
  *    categorize_short_article): empty → html-stripped-away (cleaned
  *    < 10% of an original > 100) → URL-only (joined URL matches >
  *    80% of the text) → repetition (first-10-chars occurs > 3×) →
  *    error-message (404/403/500/Error/Forbidden/... case-
  *    insensitive) → Discussion-only → gallery-meta marker →
  *    tags-only (≥ 3 known tech tags and < 80 chars) → title-only
  *    (< 50 chars, no newline) → symbol-heavy (word+CJK chars < 30%)
  *    → normal-short. ORDER IS THE SEMANTICS: a symbol soup under 50
  *    chars is title-only, not symbol-heavy, because rule 9 fires
  *    first — the spec pins exactly that.
  *
  * Composition: the corpus documents are clean token soup, so raw
  * "content" is composed per doc_id residue to plant every failure
  * mode (the OtelLogs composition precedent); the analysis scopes to
  * content under 200 chars — the script's own fetch WHERE.
  *
  * Scale: the whole triage is ONE stateless projection of the scan —
  * every rule is a regex/arithmetic expression, no shuffle anywhere;
  * a rollup on category is one map-side-combined agg.
  */
object Triage {

  /** Word characters the reference's symbol rule keeps: ASCII \w +
    * whitespace + hiragana/katakana/CJK (the script's explicit
    * ranges; Python's unicode \w is wider, but the explicit ranges
    * are what the rule actually encodes).
    */
  val WordClass: String = "0-9A-Za-z_\\s぀-ゟ゠-ヿ一-龯"

  val ErrorPattern: String =
    "(?i)(404|403|500|Error|Forbidden|Not Found|Access Denied|Page not found)"

  val TechTags: Seq[String] = Seq("Node.js", "PDF", "Puppeteer", "aws", "ses",
    "Nodemailer", "tech", "GitHub", "Linux", "LVM", "idea", "Discussion",
    "Property", "Photography", "Art")

  /** The composed raw-content view: (doc_id, content) planting one
    * failure mode per doc_id residue class, everything else a ≤150
    * char excerpt. Mirrored verbatim in the oracle CTE.
    */
  def rawContent(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(97)) === 0, lit("   "))
        .when(pmod(col("doc_id"), lit(89)) === 0,
          concat(lit("<!DOCTYPE html><html><p>hi</p>"),
            lit("<i></i>" * 18), lit("</html>")))
        .when(pmod(col("doc_id"), lit(83)) === 0,
          concat(lit("go https://example.com/a/"), col("doc_id"),
            lit(" https://example.org/path/to/x")))
        .when(pmod(col("doc_id"), lit(79)) === 0,
          repeat(substring(col("text"), 1, 10), 5))
        .when(pmod(col("doc_id"), lit(73)) === 0,
          lit("oops: 404 Not Found while fetching"))
        .when(pmod(col("doc_id"), lit(71)) === 0, lit("GitHub Linux tech notes"))
        .when(pmod(col("doc_id"), lit(67)) === 0, lit("Discussion"))
        .when(pmod(col("doc_id"), lit(61)) === 0,
          lit("Photos. Explore more on these topics: art"))
        // ≥50 chars, NON-repeating (a repeated symbol unit would be
        // caught by the earlier repetition rule — cascade order)
        .when(pmod(col("doc_id"), lit(59)) === 0,
          lit("!@#$% ^&*() ;:,.? ~!@#$ %^&*( )(*&^ %$#@! ?.,:; =-[]{"))
        .otherwise(substring(trim(col("text")), 1, 150)).as("content"))

  /** clean_html_content over a `content` column: (cleaned, was_html). */
  def withCleaned(docs: DataFrame): DataFrame = {
    val raw = col("content")
    val tags = regexp_extract_all(raw, lit("<[^>]+>"), lit(0))
    val tagLen = length(array_join(tags, ""))
    val isHtml = trim(raw).startsWith("<!doctype") || trim(raw).startsWith("<!DOCTYPE") ||
      trim(raw).startsWith("<html") || trim(raw).startsWith("<HTML") ||
      (tagLen > length(raw) * 0.3 && size(tags) > 50)
    val stripped = trim(regexp_replace(regexp_replace(
      regexp_replace(raw, "<[^>]+>", " "), "&[a-zA-Z0-9#]+;", " "), "\\s+", " "))
    docs
      .withColumn("was_html", isHtml)
      .withColumn("cleaned", when(isHtml, stripped).otherwise(raw))
  }

  /** The first-match category cascade over (content, cleaned). */
  def category: Column = {
    val c = col("cleaned")
    val ct = trim(c)
    val cLen = length(c)
    val first10 = substring(c, 1, 10)
    // non-overlapping occurrence count via replace — Python str.count
    val repCount = (cLen - length(call_function("replace", c, first10, lit("")))) / 10
    val urls = regexp_extract_all(c, lit("https?://[^\\s]+"), lit(0))
    val urlJoined = length(array_join(urls, " "))
    val tagHits = TechTags.map(t => when(c.contains(t), 1).otherwise(0)).reduce(_ + _)
    val textOnly = length(regexp_replace(c, s"[^$WordClass]", ""))
    when(ct === "", "empty")
      .when(length(c) < length(col("content")) * 0.1 && length(col("content")) > 100,
        "html_stripped")
      .when(urlJoined > cLen * 0.8, "url_only")
      .when(cLen > 10 && repCount > 3, "repetition")
      .when(c.rlike(ErrorPattern), "error_message")
      .when(ct === "Discussion" || ct.startsWith("Discussion"), "discussion_only")
      .when(c.contains("Explore more on these topics"), "gallery_meta")
      .when(tagHits >= 3 && cLen < 80, "tags_only")
      .when(cLen < 50 && !c.contains("\n"), "title_only")
      .when(textOnly < cLen * 0.3, "symbol_heavy")
      .otherwise("normal_short")
  }

  /** tx46: per-short-document triage rows (the script's analysis
    * list), scoped to content under 200 chars.
    */
  def tx46(s: SparkSession, dir: String): DataFrame =
    withCleaned(rawContent(s, dir))
      .filter(length(col("content")) < 200)
      .select(col("doc_id"), length(col("content")).as("original_length"),
        length(col("cleaned")).as("cleaned_length"), col("was_html"),
        category.as("category"))
}
