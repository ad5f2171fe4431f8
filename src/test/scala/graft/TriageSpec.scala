package graft

import graft.operators.Triage

/** The short-document triage cascade: first-match-wins ORDER is the
  * semantics — pinned with inputs that would match several rules.
  */
class TriageSpec extends SparkSpec {
  import spark.implicits._

  private def triage(contents: (Long, String)*): Map[Long, (String, Boolean, Int, Int)] =
    Triage.withCleaned(contents.toDF("doc_id", "content"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Triage.category.as("category"),
        org.apache.spark.sql.functions.col("was_html"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("content")).as("ol"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("cleaned")).as("cl"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2), r.getInt(3), r.getInt(4))))
      .toMap

  test("html detection + regex-fallback cleaning") {
    val got = triage(
      1L -> ("<!DOCTYPE html><html><p>hi</p>" + "<i></i>" * 18 + "</html>"),
      2L -> "plain text stays untouched <b>even with a tag</b>")
    assert(got(1L)._1 == "html_stripped" && got(1L)._2, "doctype start → html, cleaned to 'hi'")
    assert(got(1L)._4 == 2, "cleaned length is just 'hi'")
    // two tags, ratio under 30% and count under 50 → NOT html
    assert(!got(2L)._2 && got(2L)._4 == got(2L)._3, "no doctype, low tag density → untouched")
  }

  test("cascade order beats individual rule matches") {
    val got = triage(
      // repeated symbols: matches BOTH repetition and symbol_heavy →
      // repetition (rule 4) wins
      1L -> ("!?*% " * 12),
      // symbol soup under 50 chars: matches BOTH title_only and
      // symbol_heavy → title_only (rule 9) wins
      2L -> "!@# $% ^&* () ;: ,. ?!",
      // non-repeating symbols ≥ 50 chars → symbol_heavy finally fires
      3L -> "!@#$% ^&*() ;:,.? ~!@#$ %^&*( )(*&^ %$#@! ?.,:; =-[]{",
      // an error marker inside otherwise-normal text → error_message
      // beats title_only even under 50 chars
      4L -> "oops: 404 Not Found",
      // ≥3 tech tags under 80 chars → tags_only beats title_only
      5L -> "GitHub Linux tech notes",
      // 'Discussion' prefix beats the tags rule ('Discussion' is also
      // in the tech-tag list)
      6L -> "Discussion Linux GitHub",
      // URL-dominated → url_only even though it also has repetition-free text
      7L -> "go https://example.com/a/1 https://example.org/path/to/x",
      8L -> "",
      9L -> "   ")
    assert(got(1L)._1 == "repetition")
    assert(got(2L)._1 == "title_only")
    assert(got(3L)._1 == "symbol_heavy")
    assert(got(4L)._1 == "error_message")
    assert(got(5L)._1 == "tags_only")
    assert(got(6L)._1 == "discussion_only")
    assert(got(7L)._1 == "url_only")
    assert(got(8L)._1 == "empty" && got(9L)._1 == "empty")
  }
}
