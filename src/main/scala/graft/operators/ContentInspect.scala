package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRatio

/** ic01: raw-article HTML inspection — reference
  * scripts/inspect_article_content.py `analyze_content` (:96), the
  * diagnostic NEXT TO tx46's triage with its own thresholds:
  *
  *  - html_tag_count / html_ratio: `<[^>]+>` matches, joined length
  *    over content length (reported as a 2-dp percent);
  *  - starts_with_html: the STRIPPED content starting '<!' or
  *    '<html';
  *  - text_ratio: stripped tag-free length over content length;
  *    has_meaningful_text gates on the UNROUNDED ratio > 0.5 —
  *    re-expressed as the exact integer comparison 2·t > len;
  *  - is_html: unrounded html_ratio > 0.3 (10·h > 3·len exactly) OR
  *    the prefix flag;
  *  - empty content → the all-zero/false row (:98);
  *  - sample_start/sample_end: the first 200 chars, and the last 200
  *    only when the content EXCEEDS 200 (:130 — else empty string).
  *
  * A stateless scan projection — two regex passes and integer
  * comparisons per row, zero shuffles.
  */
object ContentInspect {

  def composeContent(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 13 === 0, "")
        .when(col("doc_id") % 7 === 0,
          concat(lit("<!DOCTYPE html><html><body>"), col("text"), lit("</body></html>")))
        .when(col("doc_id") % 7 === 1,
          concat(lit("<div>"), substring(col("text"), 1, 60), lit("</div>")))
        .when(col("doc_id") % 7 === 2,
          concat(repeat(lit("<span></span>"), 10), substring(col("text"), 1, 20)))
        .when(col("doc_id") % 7 === 3,
          concat(lit("  <html lang=\"en\">"), col("text")))
        .otherwise(col("text")).as("content"))

  def inspectOn(docs: DataFrame): DataFrame = {
    val c = col("content")
    val len = length(c)
    val tags = regexp_extract_all(c, lit("<[^>]+>"), lit(0))
    val hlen = length(array_join(tags, ""))
    val tlen = length(trim(regexp_replace(c, "<[^>]+>", "")))
    val st = trim(c)
    val prefix = st.startsWith("<!") || st.startsWith("<html")
    val nonEmpty = c.isNotNull && len > 0
    docs.select(col("doc_id"),
      when(nonEmpty, hlen * 10 > len * 3 || prefix).otherwise(false).as("is_html"),
      when(nonEmpty, size(tags)).otherwise(0).as("html_tag_count"),
      when(nonEmpty, microRatio(hlen * 100, len, 2)).otherwise(0.0).as("html_ratio_pct"),
      when(nonEmpty, prefix).otherwise(false).as("starts_with_html"),
      when(nonEmpty, tlen * 2 > len).otherwise(false).as("has_meaningful_text"),
      when(nonEmpty, microRatio(tlen * 100, len, 2)).otherwise(0.0).as("text_ratio_pct"),
      when(nonEmpty, substring(c, 1, 200)).otherwise("").as("sample_start"),
      when(nonEmpty && len > 200, substring(c, -200, 200)).otherwise("").as("sample_end"))
  }

  def ic01(s: SparkSession, dir: String): DataFrame =
    inspectOn(composeContent(s, dir))
}
