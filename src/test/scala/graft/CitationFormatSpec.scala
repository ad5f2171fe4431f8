package graft

import graft.operators.CitationFormat

/** Rule-per-case pins for cf01 — acolyte domain/citation_format.py
  * (_BAD_BRACKET_RE :20, validate_citation_format :25-48,
  * validate_citation_grounding :50-67) and the writer_node.py:554-556
  * gate order.
  */
class CitationFormatSpec extends SparkSpec {
  import spark.implicits._

  private def run(bodies: (Long, String)*) =
    CitationFormat.validate(bodies.toDF("id", "body"), Seq("S1", "S2", "S3"))
      .orderBy("doc_id").collect()
      .map(r => (r.getInt(1), r.getString(2)))

  test("bad-bracket classes: pipe titles, legacy [1], [Sn]-suffixed, nested starts — and [Sn] markers pass (_BAD_BRACKET_RE)") {
    val got = run(
      (1L, "ok [S1] and [S2]"),
      (2L, "x [Title | Source | Tags] y"),
      (3L, "legacy [1] style"),
      (4L, "suffixed [S5x] marker"), // lookahead needs S\d+] exactly
      (5L, "nested [[inner]] brackets"), // scan starts at the inner token
      (6L, "empty [] brackets")) // [^\[\]]+ needs one char: passes
    assert(got.toSeq == Seq(
      (1, ""),
      (0, "inline_title_in_brackets: [Title | Source | Tags]"),
      (0, "inline_title_in_brackets: [1]"),
      (0, "inline_title_in_brackets: [S5x]"),
      (0, "inline_title_in_brackets: [inner]"),
      (1, "")))
  }

  test("bare URL rejection runs after the bracket rule (format order), http and https") {
    val got = run(
      (1L, "see https://example.com/a?b=1 here"),
      (2L, "see http://example.com plain"),
      (3L, "both [Note] and https://x.test/z")) // bracket wins
    assert(got.toSeq == Seq(
      (0, "bare_url: https://example.com/a?b=1"),
      (0, "bare_url: http://example.com"),
      (0, "inline_title_in_brackets: [Note]")))
  }

  test("grounding: unknown [Sn] ids reject, first-occurrence-deduped in body order (dict.fromkeys); no markers always passes (:60-66)") {
    val got = run(
      (1L, "claims [S9] and [S12] and [S9] again [S1]"),
      (2L, "known only [S1][S3]"),
      (3L, "no markers at all"))
    assert(got.toSeq == Seq(
      (0, "unknown_citation_id: S9, S12"),
      (1, ""), (1, "")))
  }

  test("snippet truncation at 80 chars ([:80])") {
    val longTok = "[" + ("t" * 100) + "]"
    val got = run((1L, s"x $longTok y"))
    assert(got(0)._2 == "inline_title_in_brackets: " + ("[" + "t" * 79))
    assert(got(0)._2.length == "inline_title_in_brackets: ".length + 80)
  }
}
