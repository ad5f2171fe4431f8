package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** is01: the tag-extractor INPUT SANITIZATION ladder —
  * tag-generator/app/tag_extractor/input_sanitizer.py
  * InputSanitizer.sanitize (:169-281) with its helpers, the gate every
  * article passes before tag extraction (ps01/hy01's family on the
  * tag-generator surface):
  *
  *  - Step 1, the validation ladder in SOURCE ORDER (:193-219), first
  *    violation wins and short-circuits: empty/whitespace title →
  *    'Title too short'; len > 1000 → 'Title too long'; the same pair
  *    for content at 100000; control characters (ord < 32 outside
  *    \t\n\r) in title then content; url > 2048 → 'URL too long';
  *    url failing URL_PATTERN.fullmatch (:22-30, translated verbatim —
  *    RE2/Java-safe already) → 'Invalid URL format'. Lengths are
  *    Python len() = code points = Spark length() on the BMP corpus.
  *    CORPUS-CONDITIONAL PREMISE (trim flavor): the emptiness checks
  *    use Spark trim(), which strips ASCII SPACES only, where
  *    Python str.strip() (:196/:204 `not title.strip()`) strips ALL
  *    whitespace — a title of '\t' or '\n' alone is 'Title too
  *    short' in the reference but passes step 1 here. DuckDB trim()
  *    is space-only too, so the divergence is oracle-invisible; the
  *    composed corpus plants whitespace-only fields as SPACES
  *    (composeInputs %19==0 plants "   "), never as bare
  *    tab/newline, which is where the premise holds.
  *  - Step 1.5 (:232): _looks_like_html (:364 — '<' AND '>' present
  *    and ≥ 3 `<[a-zA-Z/][^>]*>` tags) routes to readability-lxml
  *    extraction — which in THIS container (and any env without
  *    readability) throws ImportError and falls back to the raw html
  *    (:398-401 `except Exception: return html`), so the fallback is
  *    the faithful path, not a stub; the FLAG itself is deterministic
  *    and exposed.
  *  - Step 2 _sanitize_text (:283-307): DANGEROUS_ELEMENT_PATTERN
  *    (script/style/iframe/object/embed with contents, closed or
  *    running to end-of-string) subbed to ' ' — the backreference
  *    `</\1>` expanded to per-tag alternatives (equivalent: \1 ranges
  *    over five literals) so the oracle's RE2 can mirror it; then the
  *    nh3 clean with NO allowed tags — a vendored HTML5 sanitizer
  *    (pre01's ammonia precedent), re-expressed corpus-conditionally
  *    as comment-strip + tag-strip (the composed corpus plants only
  *    well-formed simple tags and no bare &<> entities, where the two
  *    agree); then \s+ → ' ' collapse + trim; the final control-char
  *    strip (:305) is a provable no-op here — step 1 already rejected
  *    every control char outside \t\n\r, and those are \s.
  *  - Step 3 NFC (:309): identity on the composed corpus (pre01's
  *    documented premise).
  *  - Step 4 security checks (:314-335) on `title + ' ' + content`
  *    (sanitized): excessive repetition (distinct lowered whitespace
  *    tokens < 10% of total — exact integer gate 10·distinct <
  *    total); then _has_unusual_character_frequency (:403), SKIPPED
  *    for CJK text (_is_cjk_text :337 — CJK chars > 10%, the five
  *    ranges verbatim; integer gate 10·cjk > len): special chars
  *    (not alnum, not space) > 30% (10·special > 3·len) or uppercase
  *    > 70% (10·upper > 7·len). Any hit → 'Suspicious patterns
  *    detected', sanitized_input = None. GATE EXACTNESS: the 0.1 and
  *    0.3 integer gates equal CPython's float comparisons at every
  *    reachable length (len·0.1 and len·0.3 never round to cross an
  *    integer the ratio can hit), but the 0.7 gate has a pinned
  *    round-DOWN boundary: where len·0.7's nearest double is just
  *    below the true product (e.g. len=180 → CPython compares
  *    upper > 125.99999999999999, so upper=126 fires there while
  *    10·126 > 7·180 does not), the reference flags the row and this
  *    gate (and the oracle, which mirrors the integer form) passes
  *    it. Pinned as a convention like TagExtract's confidence
  *    half-milli note — exact-rational gates beat replicating each
  *    engine's float rounding, and the composed corpus's uppercase
  *    bomb sits far from the boundary.
  *
  * Output per article: doc_id, is_valid, violation (first, or null),
  * looks_like_html / is_cjk as NULLABLE INTS (null when step 1
  * short-circuited — a nullable boolean hits the comparator's
  * None-vs-NaN object gap; nullable ints take keeper_id's float64
  * path on both engines),
  * original_length (raw title+content code points, :185-187),
  * sanitized_length (valid rows only, :262).
  *
  * The composition plants one row class per rule: whitespace title,
  * 1001-char title, control chars in each field, empty and
  * 100001-char content, a 2049-char url, a malformed url, a valid
  * url, a looks-like-html row, closed and UNCLOSED dangerous
  * elements, a comment strip, a repetition bomb, a special-char
  * bomb, an uppercase bomb, a CJK row whose special-char ratio would
  * fire but is exempted, and a multi-violation row pinning ladder
  * order.
  *
  * Scale: ONE stateless scan projection — every rule is a regex
  * count or integer gate fused into whole-stage codegen; no shuffle,
  * no join, no UDF.
  */
object InputSanitize {

  /** URL_PATTERN (:22-30), fullmatch semantics, case-insensitive. */
  val UrlPattern: String =
    "https?://" +
    "(?:(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\\.)+[A-Z]{2,6}\\.?|" +
    "localhost|" +
    "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})" +
    "(?::\\d+)?" +
    "(?:/?|[/?]\\S+)"

  /** DANGEROUS_ELEMENT_PATTERN (:18-21) with the `</\1>` backreference
    * expanded per tag (RE2-mirrorable; equivalent since \1 only ever
    * binds one of the five literals).
    */
  val DangerousPattern: String = {
    val tags = Seq("script", "style", "iframe", "object", "embed")
    tags.map(t => s"(?is)<$t\\b[^>]*>.*?(?:</$t\\s*>|$$)").mkString("|")
  }

  /** The five CJK ranges of _is_cjk_text (:337-361), verbatim. */
  val CjkRanges: String =
    "\\u4E00-\\u9FFF\\u3040-\\u309F\\u30A0-\\u30FF\\uAC00-\\uD7AF\\u3000-\\u303F"

  /** Composed article inputs: (doc_id, title, content, url). */
  def composeInputs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val id = col("doc_id")
    val m = id % 19
    val title =
      when(m === 0, lit("   "))
        .when(m === 1, lit("T" * 1001))
        .when(m === 2, concat(lit("Bad"), lit("\u0001"), lit("title")))
        .when(m === 14, lit("L" * 1001))
        .otherwise(concat(lit("Article "), id.cast("string")))
    val content =
      when(m === 3, lit(""))
        .when(m === 4, rpad(col("text"), 100001, "x"))
        .when(m === 5, concat(lit("bell"), lit("\u0007"), col("text")))
        .when(m === 9, concat(
          lit("<p>Intro paragraph here.</p><div>Second block text</div>" +
            "<span>Third tagged chunk</span> "), col("text")))
        .when(m === 15, concat(
          lit("<script type=\"module\">alert(1)</script>Safe tail text "), col("text")))
        .when(m === 16, concat(col("text"), lit(" <style>p{color:red}")))
        .when(m === 17, concat(col("text"), lit(" <!-- hidden comment --> tail words")))
        .when(m === 10, concat(lit(("spam " * 30).trim), lit(" ")))
        .when(m === 11, concat(col("text"), lit(" " + "!#$%&*+=@~^|:;" * 40)))
        .when(m === 12, upper(col("text")))
        .when(m === 13, concat(lit("深層学習の分散処理と類似検索の基盤。" * 6), lit("!#$%&*+=@~" * 12)))
        .when(m === 14, concat(lit("also"), lit("\u0002"), lit("bad")))
        .otherwise(col("text"))
    val url =
      when(m === 6, concat(lit("https://example.com/"), rpad(lit("p"), 2029, "p")))
        .when(m === 7, lit("notaurl"))
        .when(m === 8, concat(lit("https://news.example.org/a/"), id.cast("string"), lit("?ref=rss")))
        .otherwise(lit(null).cast("string"))
    d.select(id, title.as("title"), content.as("content"), url.as("url"))
  }

  /** The staged frame behind [[sanitizeOn]] — input columns plus v1
    * (the step-1 violation), st/sc (sanitized title/content),
    * suspicious, looks_html, is_cjk_f, original_length. Exposed so
    * ex01 (TagExtract) can reuse the exact sanitize pipeline and read
    * the sanitized TEXTS, not just their lengths.
    */
  private[operators] def sanitizeStaged(inputs: DataFrame): DataFrame = {
    val ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]" // ord < 32 minus \t\n\r
    val violation =
      when(trim(col("title")) === "", "Title too short")
        .when(length(col("title")) > 1000, "Title too long")
        .when(trim(col("content")) === "", "Content too short")
        .when(length(col("content")) > 100000, "Content too long")
        .when(col("title").rlike(ctrl), "Contains control characters")
        .when(col("content").rlike(ctrl), "Contains control characters")
        .when(col("url").isNotNull && length(col("url")) > 2048, "URL too long")
        .when(col("url").isNotNull && !col("url").rlike("(?i)^(?:" + UrlPattern + ")$"),
          "Invalid URL format")
    // _sanitize_text: dangerous elements -> ' ', comments stripped,
    // tags stripped, whitespace collapsed, trimmed
    def sanitize(c: Column): Column =
      trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        c, DangerousPattern, " "), "(?s)<!--.*?-->", " "), "<[^>]*>", ""),
        "\\s+", " "))
    // ev33 explode barriers (the hm02 lesson): without them,
    // CollapseProject re-inlines the 4-pass sanitize regex chain into
    // every security-battery reader — ~8 re-scans of up-to-100KB
    // strings per row (measured 65 s at sf0.1 on ex01's truncated
    // corpus; ~4 s with the barriers). Barrier 1 materializes the
    // step-1 verdict; barrier 2 the sanitized texts (ONE regex-chain
    // pass each); barrier 3 the combined security text.
    def keep(d: DataFrame) = d.columns.map(col).toSeq
    val s1 = inputs
      .select(keep(inputs) :+ explode(array(struct(
        violation.as("v1"),
        (length(col("title")) + length(col("content"))).cast("long")
          .as("original_length")))).as("x1"): _*)
      .select(keep(inputs) :+ col("x1.v1").as("v1")
        :+ col("x1.original_length").as("original_length"): _*)
    val s2 = s1
      .select(keep(s1) :+ explode(array(struct(
        when(col("v1").isNotNull, lit(null).cast("boolean"))
          .otherwise(col("content").contains("<") && col("content").contains(">") &&
            size(regexp_extract_all(col("content"), lit("<[a-zA-Z/][^>]*>"), lit(0))) >= 3)
          .as("looks_html"),
        when(col("v1").isNull, sanitize(col("title"))).as("st"),
        when(col("v1").isNull, sanitize(col("content"))).as("sc")))).as("x2"): _*)
      .select(keep(s1) :+ col("x2.looks_html").as("looks_html")
        :+ col("x2.st").as("st") :+ col("x2.sc").as("sc"): _*)
    val staged = s2
      .select(keep(s2) :+ explode(array(
        concat(col("st"), lit(" "), col("sc")))).as("combined"): _*)
      .withColumn("toks", filter(split(lower(col("combined")), "\\s+"), t => t =!= ""))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("clen", length(col("combined")).cast("long"))
      .withColumn("n_cjk",
        (col("clen") - length(regexp_replace(col("combined"), s"[$CjkRanges]", ""))).cast("long"))
      .withColumn("is_cjk_f", col("n_cjk") * 10 > col("clen"))
      .withColumn("n_special",
        length(regexp_replace(col("combined"), "[\\p{L}\\p{N}\\s]", "")).cast("long"))
      .withColumn("n_upper",
        (col("clen") - length(regexp_replace(col("combined"), "\\p{Lu}", ""))).cast("long"))
      .withColumn("suspicious",
        col("n_distinct") * 10 < col("n_toks") ||
          (!col("is_cjk_f") &&
            (col("n_special") * 10 > col("clen") * 3 ||
             col("n_upper") * 10 > col("clen") * 7)))
    staged
  }

  /** The ladder over any (doc_id, title, content, url) frame. */
  def sanitizeOn(inputs: DataFrame): DataFrame =
    sanitizeStaged(inputs).select(
      col("doc_id"),
      (col("v1").isNull && !col("suspicious")).as("is_valid"),
      coalesce(col("v1"),
        when(col("suspicious"), "Suspicious patterns detected")).as("violation"),
      col("looks_html").cast("int").as("looks_like_html"),
      when(col("v1").isNull, col("is_cjk_f")).cast("int").as("is_cjk"),
      col("original_length"),
      when(col("v1").isNull && !col("suspicious"),
        (length(col("st")) + length(col("sc"))).cast("long")).as("sanitized_length"))
      // hash exchange below the global sort — the range sampling pass
      // otherwise re-runs the whole sanitize regex chain (ex01's
      // measured lesson, TagExtract.extractOn; guide §2.4)
      .repartition(col("doc_id"))
      .orderBy("doc_id")

  def is01(s: SparkSession, dir: String): DataFrame =
    sanitizeOn(composeInputs(s, dir))

  // ---- DuckDB oracle (generated from the same constants) ----

  private[operators] def sqlLit(x: String): String = "'" + x.replace("'", "''") + "'"

  /** RE2 spellings of the shared patterns (hex classes instead of
    * Java \\uXXXX; the control chars composed via chr()).
    */
  private[operators] val CtrlSql = "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]"
  private[operators] val CjkSql =
    "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{AC00}-\\x{D7AF}\\x{3000}-\\x{303F}"

  private[operators] def sanitizeSql(c: String): String =
    s"""trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace($c, ${sqlLit(DangerousPattern)}, ' ', 'g'), '(?s)<!--.*?-->', ' ', 'g'), '<[^>]*>', '', 'g'), '\\s+', ' ', 'g'))"""

  val is01OracleSql: String =
    s"""WITH inp AS (
  SELECT doc_id,
    CASE WHEN doc_id % 19 = 0 THEN '   '
         WHEN doc_id % 19 = 1 THEN ${sqlLit("T" * 1001)}
         WHEN doc_id % 19 = 2 THEN 'Bad' || chr(1) || 'title'
         WHEN doc_id % 19 = 14 THEN ${sqlLit("L" * 1001)}
         ELSE 'Article ' || CAST(doc_id AS VARCHAR) END AS title,
    CASE WHEN doc_id % 19 = 3 THEN ''
         WHEN doc_id % 19 = 4 THEN rpad(text, 100001, 'x')
         WHEN doc_id % 19 = 5 THEN 'bell' || chr(7) || text
         WHEN doc_id % 19 = 9 THEN '<p>Intro paragraph here.</p><div>Second block text</div><span>Third tagged chunk</span> ' || text
         WHEN doc_id % 19 = 15 THEN '<script type="module">alert(1)</script>Safe tail text ' || text
         WHEN doc_id % 19 = 16 THEN text || ' <style>p{color:red}'
         WHEN doc_id % 19 = 17 THEN text || ' <!-- hidden comment --> tail words'
         WHEN doc_id % 19 = 10 THEN ${sqlLit(("spam " * 30).trim)} || ' '
         WHEN doc_id % 19 = 11 THEN text || ' ' || ${sqlLit("!#$%&*+=@~^|:;" * 40)}
         WHEN doc_id % 19 = 12 THEN upper(text)
         WHEN doc_id % 19 = 13 THEN ${sqlLit("深層学習の分散処理と類似検索の基盤。" * 6 + "!#$%&*+=@~" * 12)}
         WHEN doc_id % 19 = 14 THEN 'also' || chr(2) || 'bad'
         ELSE text END AS content,
    CASE WHEN doc_id % 19 = 6 THEN 'https://example.com/' || rpad('p', 2029, 'p')
         WHEN doc_id % 19 = 7 THEN 'notaurl'
         WHEN doc_id % 19 = 8 THEN 'https://news.example.org/a/' || CAST(doc_id AS VARCHAR) || '?ref=rss'
         ELSE NULL END AS url
  FROM documents),
v AS (
  SELECT *,
    CASE WHEN trim(title) = '' THEN 'Title too short'
         WHEN length(title) > 1000 THEN 'Title too long'
         WHEN trim(content) = '' THEN 'Content too short'
         WHEN length(content) > 100000 THEN 'Content too long'
         WHEN regexp_matches(title, '$CtrlSql') THEN 'Contains control characters'
         WHEN regexp_matches(content, '$CtrlSql') THEN 'Contains control characters'
         WHEN url IS NOT NULL AND length(url) > 2048 THEN 'URL too long'
         WHEN url IS NOT NULL AND NOT regexp_full_match(url, '(?i)(?:$UrlPattern)') THEN 'Invalid URL format'
    END AS v1,
    CAST(length(title) + length(content) AS BIGINT) AS original_length
  FROM inp),
st AS (
  SELECT *,
    CASE WHEN v1 IS NULL THEN
      content LIKE '%<%' AND content LIKE '%>%'
        AND len(regexp_extract_all(content, '<[a-zA-Z/][^>]*>')) >= 3
    END AS looks_html,
    CASE WHEN v1 IS NULL THEN ${sanitizeSql("title")} END AS stt,
    CASE WHEN v1 IS NULL THEN ${sanitizeSql("content")} END AS sc
  FROM v),
sec AS (SELECT *, stt || ' ' || sc AS combined FROM st),
m AS (
  SELECT *,
    list_filter(string_split_regex(lower(combined), '\\s+'), x -> x <> '') AS toks,
    CAST(length(combined) AS BIGINT) AS clen,
    CAST(length(combined) - length(regexp_replace(combined, '[$CjkSql]', '', 'g')) AS BIGINT) AS n_cjk,
    CAST(length(regexp_replace(combined, '[\\pL\\pN\\s]', '', 'g')) AS BIGINT) AS n_special,
    CAST(length(combined) - length(regexp_replace(combined, '\\p{Lu}', '', 'g')) AS BIGINT) AS n_upper
  FROM sec),
f AS (
  SELECT *,
    CAST(len(toks) AS BIGINT) AS n_toks,
    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
    n_cjk * 10 > clen AS is_cjk_f
  FROM m),
g AS (
  SELECT *,
    (n_distinct * 10 < n_toks OR
      (NOT is_cjk_f AND (n_special * 10 > clen * 3 OR n_upper * 10 > clen * 7))) AS suspicious
  FROM f)
SELECT doc_id,
  (v1 IS NULL AND NOT suspicious) AS is_valid,
  coalesce(v1, CASE WHEN suspicious THEN 'Suspicious patterns detected' END) AS violation,
  CAST(looks_html AS INTEGER) AS looks_like_html,
  CAST(CASE WHEN v1 IS NULL THEN is_cjk_f END AS INTEGER) AS is_cjk,
  original_length,
  CASE WHEN v1 IS NULL AND NOT suspicious THEN CAST(length(stt) + length(sc) AS BIGINT) END AS sanitized_length
FROM g ORDER BY doc_id"""
}
