package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ti01 — the Tier-1 article classification gate
  * (pre-processor-sidecar/app/domain/tier1_classifier.go:47
  * ClassifyTier1): decides whether fetched content is worth persisting
  * as a full article, via an ORDERED rejection ladder whose first
  * matching rule names the reason:
  *
  *  1. non-article URL path (:80 — /crosswords/ → /crossword/ →
  *     /gallery/ → /puzzles/, case-insensitive, list order),
  *  2. placeholder content (:90 — trimmed exact "test"/"Discussion",
  *     or the three known prefixes),
  *  3. truncation marker (:108 — the six suffixes in list order,
  *     続きをみる first),
  *  4. img-dominant (:118 — any <img> present AND plain text under the
  *     length floor),
  *  5. minimum length (:66 — under 500 characters of tag-stripped,
  *     whitespace-normalized text).
  *
  * Plain text mirrors stripTags (:73): tags removed (bluemonday
  * StrictPolicy), whitespace runs collapsed to single spaces
  * (strings.Fields + Join). The composed raw-article view plants one
  * cohort per rule from the documents table (URL path variants by
  * doc_id residue, placeholder/truncated/img-heavy bodies), so every
  * branch is load-bearing at every SF.
  *
  * Scale: a stateless projection fused into the document scan — zero
  * shuffles, codegen end to end; the gate composes in front of any
  * ingest pipeline exactly like tx46's triage cascade.
  */
object Tier1 {

  val MinLength = 500

  /** The planted raw-article view: url + raw html from documents. */
  def rawArticles(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val base = concat(lit("https://ex-"), pmod(d, lit(7)), lit(".example.com"))
    val url = concat(base,
      when(pmod(d, lit(19)) === 3, concat(lit("/crosswords/c"), d))
        .when(pmod(d, lit(19)) === 7, concat(lit("/CrossWord/x"), d))
        .when(pmod(d, lit(19)) === 11, concat(lit("/gallery/g"), d))
        .when(pmod(d, lit(19)) === 15, concat(lit("/puzzles/p"), d))
        .otherwise(concat(lit("/a/"), d)))
    val content =
      when(pmod(d, lit(31)) === 0, lit("test"))
        .when(pmod(d, lit(31)) === 1, lit("  Discussion  "))
        .when(pmod(d, lit(31)) === 2,
          concat(lit("Crosswords are saved automatically. "), substring(col("text"), 1, 100)))
        .when(pmod(d, lit(31)) === 3,
          concat(lit("What to Read Next: "), substring(col("text"), 1, 100)))
        .when(pmod(d, lit(31)) === 4,
          concat(lit("はじめに続きをみる"), substring(col("text"), 1, 100)))
        .when(pmod(d, lit(29)) === 5,
          concat(lit("<p>"), substring(col("text"), 1, 600), lit("…</p>")))
        .when(pmod(d, lit(29)) === 6,
          concat(lit("<p>"), substring(col("text"), 1, 620), lit("続きを読む</p>")))
        .when(pmod(d, lit(29)) === 7,
          concat(lit("<p>"), substring(col("text"), 1, 650), lit("Read more</p>")))
        .when(pmod(d, lit(29)) === 8,
          concat(lit("<p>"), substring(col("text"), 1, 650), lit("...</p>")))
        .when(pmod(d, lit(13)) === 9,
          concat(lit("<p>"), substring(col("text"), 1, 120),
            lit("</p><img src=\"a.jpg\"/><img src=\"b.jpg\"/>")))
        .otherwise(concat(lit("<p>"), col("text"), lit("</p>")))
    Tables.documents(s, dir).select(d, url.as("url"), content.as("content"))
  }

  /** stripTags (:73): remove tags, collapse whitespace runs, trim. */
  def plainText(content: Column): Column =
    trim(regexp_replace(regexp_replace(content, "<[^>]*>", ""), "\\s+", " "))

  /** The ordered ladder over (url, content) — NULL when Tier-1. */
  def rejectionReason(url: Column, content: Column): Column = {
    val urlL = lower(url)
    val plain = plainText(content)
    val len = length(plain)
    val imgCount = (length(lower(content)) -
      length(regexp_replace(lower(content), "<img", ""))) / 4
    val urlRule = Seq("/crosswords/", "/crossword/", "/gallery/", "/puzzles/")
      .foldLeft(lit(null).cast("string")) { (acc, p) =>
        coalesce(acc, when(urlL.contains(p), s"non-article URL pattern: $p"))
      }
    val placeholder = when(
      plain === "test" || plain === "Discussion" ||
        plain.startsWith("Crosswords are saved") ||
        plain.startsWith("What to Read Next") ||
        plain.startsWith("はじめに続きをみる"),
      "placeholder content")
    val truncation = Seq("続きをみる", "続きを読む", "Read more", "Read More", "...", "…")
      .foldLeft(lit(null).cast("string")) { (acc, m) =>
        coalesce(acc, when(plain.endsWith(m), s"truncated content (ends with $m)"))
      }
    val imgDominant = when(imgCount > 0 && len < MinLength,
      "img-dominant content with insufficient text")
    val tooShort = when(len < MinLength, "content length below minimum")
    coalesce(urlRule, placeholder, truncation, imgDominant, tooShort)
  }

  /** ti01: the classification verdict per document. */
  def tier1Gate(s: SparkSession, dir: String): DataFrame =
    tier1GateOn(rawArticles(s, dir))

  /** ti01 over any (doc_id, url, content) frame. */
  def tier1GateOn(articles: DataFrame): DataFrame =
    // hash exchange below the global sort — the range sampling pass
    // otherwise re-runs the whole regex ladder (TagExtract.extractOn's
    // measured lesson; guide §2.4)
    tier1GateOnUnordered(articles).repartition(col("doc_id")).orderBy("doc_id")

  /** The ladder without the presentation sort — the form a streaming
    * micro-batch can run (st25; global sorts are illegal on appends).
    */
  def tier1GateOnUnordered(articles: DataFrame): DataFrame = {
    val reason = rejectionReason(col("url"), col("content"))
    articles.select(col("doc_id"),
      reason.isNull.as("is_tier1"),
      coalesce(reason, lit("")).as("reason"))
  }
}
