package graft

import org.apache.spark.sql.functions._
import graft.operators.InputSanitize

/** Rule-per-case pins for is01 (tag-generator
  * tag_extractor/input_sanitizer.py InputSanitizer.sanitize :169-281):
  * one planted row per rejection rule, the ladder order, the
  * dangerous-element/tag/comment strip, the CJK exemption, and the
  * URL pattern's accept/reject edges.
  */
class InputSanitizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, Option[String])]) =
    InputSanitize.sanitizeOn(rows.toDF("doc_id", "title", "content", "url"))
      .collect().map(r => r.getLong(0) -> r).toMap

  // row: doc_id, is_valid, violation, looks_like_html, is_cjk,
  //      original_length, sanitized_length
  private def valid(r: org.apache.spark.sql.Row) = r.getBoolean(1)
  private def viol(r: org.apache.spark.sql.Row) =
    if (r.isNullAt(2)) null else r.getString(2)

  val okText = "A perfectly ordinary article body with enough words to pass every check."

  test("the validation ladder, one rule per row, in source order") {
    val out = run(Seq(
      (1L, "   ", okText, None),                       // whitespace title
      (2L, "T" * 1001, okText, None),                  // title too long
      (3L, "Fine title", "", None),                    // empty content
      (4L, "Fine title", "y" * 100001, None),          // content too long
      (5L, "Bad\u0001title", okText, None),            // ctrl in title
      (6L, "Fine title", "x\u0007y " + okText, None),  // ctrl in content
      (7L, "Fine title", okText, Some("https://e.com/" + "p" * 2040)), // url too long
      (8L, "Fine title", okText, Some("not a url")),   // url malformed
      (9L, "Fine title", okText, Some("https://news.example.org/a/9?ref=rss")),
      (10L, "Fine title", okText, None)))
    assert(viol(out(1L)) == "Title too short")
    assert(viol(out(2L)) == "Title too long")
    assert(viol(out(3L)) == "Content too short")
    assert(viol(out(4L)) == "Content too long")
    assert(viol(out(5L)) == "Contains control characters")
    assert(viol(out(6L)) == "Contains control characters")
    assert(viol(out(7L)) == "URL too long")
    assert(viol(out(8L)) == "Invalid URL format")
    assert(valid(out(9L)) && valid(out(10L)))
    // tab/newline/CR are NOT control violations (the \t\n\r exception)
    val ws = run(Seq((11L, "Tabbed\ttitle", "line one\nline two\r" + okText, None)))
    assert(valid(ws(11L)))
  }

  test("ladder ORDER: a row violating title length AND content control " +
       "chars reports the title violation (first check wins)") {
    val out = run(Seq((1L, "L" * 1001, "x\u0002y", None)))
    assert(viol(out(1L)) == "Title too long")
  }

  test("URL pattern edges: fullmatch semantics, localhost/IP/port accepted, " +
       "scheme-less and bare-word hosts rejected") {
    val out = run(Seq(
      (1L, "T t", okText, Some("http://localhost:8080/x")),
      (2L, "T t", okText, Some("https://10.0.0.1/metrics")),
      (3L, "T t", okText, Some("HTTPS://News.Example.ORG/Path?q=1")), // case-insensitive
      (4L, "T t", okText, Some("ftp://example.com/x")),
      (5L, "T t", okText, Some("https://example.com/x y")),  // space breaks fullmatch
      (6L, "T t", okText, Some("example.com/path"))))
    assert(valid(out(1L)) && valid(out(2L)) && valid(out(3L)))
    assert(viol(out(4L)) == "Invalid URL format")
    assert(viol(out(5L)) == "Invalid URL format")
    assert(viol(out(6L)) == "Invalid URL format")
  }

  test("sanitize: dangerous elements (closed AND unclosed-to-EOF) vanish " +
       "with their payloads; plain tags strip to inner text; comments strip") {
    val out = run(Seq(
      (1L, "T t", "<script type=\"m\">alert(1)</script>Safe tail. " + okText, None),
      (2L, "T t", okText + " <style>p{color:red}", None),
      (3L, "T t", okText + " <!-- hidden --> tail", None),
      (4L, "T t", "<p>Kept text</p><div>also kept</div> " + okText, None)))
    // payload gone: sanitized_length excludes the script AND its body
    val sl1 = out(1L).getLong(6)
    assert(valid(out(1L)) && sl1 == ("T t".length + ("Safe tail. " + okText).length))
    val sl2 = out(2L).getLong(6)
    assert(valid(out(2L)) && sl2 == ("T t".length + okText.length))
    val sl3 = out(3L).getLong(6)
    assert(valid(out(3L)) && sl3 == ("T t".length + (okText + " tail").length))
    val sl4 = out(4L).getLong(6)
    assert(valid(out(4L)) && sl4 == ("T t".length + ("Kept textalso kept " + okText).length))
  }

  test("looks_like_html: needs both brackets AND >= 3 tags; computed only " +
       "past step 1") {
    val out = run(Seq(
      (1L, "T t", "<p>a</p><div>b</div> " + okText, None),         // 4 tags
      (2L, "T t", "<p>a</p> 2 < 3 and 4 > 1 " + okText, None),     // 2 tags
      (3L, "T t", "x < y > z " + okText, None),                    // 0 tags
      (4L, "", "<p>a</p><div>b</div><span>c</span>", None)))       // short-circuited
    assert(out(1L).getInt(3) == 1 && out(2L).getInt(3) == 0 && out(3L).getInt(3) == 0)
    assert(out(4L).isNullAt(3), "step-1 rejection leaves the flag null")
  }

  test("security battery: repetition, special-char and uppercase bombs " +
       "fire; the CJK exemption suppresses the char-frequency rules") {
    val cjk = "深層学習の分散処理と類似検索の基盤。" * 6
    val out = run(Seq(
      (1L, "T t", ("spam " * 40).trim, None),
      (2L, "T t", okText + " " + ("!#$%&*+=@~" * 30), None),
      (3L, "T t", okText.toUpperCase + " MORE SHOUTING WORDS HERE", None),
      (4L, "T t", cjk + ("!#$%&*+=@~" * 12), None),  // CJK >10% -> exempt
      (5L, "T t", okText, None)))
    assert(viol(out(1L)) == "Suspicious patterns detected")
    assert(viol(out(2L)) == "Suspicious patterns detected")
    assert(viol(out(3L)) == "Suspicious patterns detected")
    assert(valid(out(4L)), "CJK text skips the char-frequency rules")
    assert(out(4L).getInt(4) == 1 && out(5L).getInt(4) == 0)
    assert(valid(out(5L)))
  }

  test("integer boundary gates: repetition needs STRICTLY under 10%, " +
       "special strictly over 30%, uppercase strictly over 70%") {
    // title "ab ab" + 29 content tokens -> 31 total, 2 distinct: 20 < 31 fires
    val out = run(Seq((1L, "ab ab", ("ab " * 28).trim + " cd", None)))
    assert(viol(out(1L)) == "Suspicious patterns detected")
    // the exact boundary: 10*distinct == total is NOT suspicious (gate is <)
    val boundary = run(Seq(
      (3L, "t1 t2", ("t1 " * 18).trim, None)))  // distinct {t1,t2}=2, total 20: 20<20 false
    assert(valid(boundary(3L)), "10*distinct == total sits exactly ON the gate and passes")
  }

  test("is01 over the composed corpus: every planted class lands its rule") {
    val out = InputSanitize.is01(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    def cls(m: Int) = out.collect { case (id, r) if id % 19 == m => r }
    assert(cls(0).forall(r => viol(r) == "Title too short"))
    assert(cls(1).forall(r => viol(r) == "Title too long"))
    assert(cls(2).forall(r => viol(r) == "Contains control characters"))
    assert(cls(3).forall(r => viol(r) == "Content too short"))
    assert(cls(4).forall(r => viol(r) == "Content too long"))
    assert(cls(5).forall(r => viol(r) == "Contains control characters"))
    assert(cls(6).forall(r => viol(r) == "URL too long"))
    assert(cls(7).forall(r => viol(r) == "Invalid URL format"))
    assert(cls(8).forall(valid), "the valid-url class passes")
    assert(cls(9).forall(r => valid(r) && r.getInt(3) == 1), "html class valid + flagged")
    assert(cls(10).forall(r => viol(r) == "Suspicious patterns detected"))
    assert(cls(11).forall(r => viol(r) == "Suspicious patterns detected"))
    assert(cls(13).forall(r => valid(r) && r.getInt(4) == 1), "CJK exemption")
    assert(cls(14).forall(r => viol(r) == "Title too long"), "ladder order")
    assert(cls(15).forall(valid) && cls(16).forall(valid) && cls(17).forall(valid))
    // sanitization shrank the html/script/comment classes
    assert(cls(9).forall(r => r.getLong(6) < r.getLong(5)))
    assert(cls(15).forall(r => r.getLong(6) < r.getLong(5)))
  }
}
