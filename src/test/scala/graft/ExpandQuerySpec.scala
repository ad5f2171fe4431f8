package graft

import graft.operators.ExpandQuery

/** Rule-per-case pins for eq01 (news-creator expand_query_usecase.py
  * :287-418): the parse ladder, order-preserving case-insensitive
  * dedup, and all four leak-rejection ladders with their boundaries.
  */
class ExpandQuerySpec extends SparkSpec {
  import spark.implicits._

  private def run(raw: String): Seq[(Int, String, Long)] =
    ExpandQuery.parseOn(Seq((1L, raw)).toDF("doc_id", "raw"))
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq

  test("parse: labels skipped, multi-digit numbers and one bullet stripped, spacing required") {
    val out = run(Seq(
      "Japanese:", "10. spark query planning", "- cost model basics",
      "• unicode bullet line", "English(3):", "100) deep dive",
      "1.no-space stays numbered", "").mkString("\n"))
    assert(out.map(_._2) == Seq("spark query planning", "cost model basics",
      "unicode bullet line", "deep dive", "1.no-space stays numbered"),
      "the :317 regex requires a space/tab AFTER the separator — '1.no-space' keeps its prefix")
    assert(out.map(_._1) == Seq(1, 2, 3, 4, 5))
    assert(out.forall(_._3 == 5), "n_parsed counts parsed lines, labels and blanks excluded")
  }

  test("dedup: first occurrence wins on the lowercased key") {
    val out = run(Seq("Alpha Beta", "alpha beta", "ALPHA BETA", "gamma").mkString("\n"))
    assert(out.map(_._2) == Seq("Alpha Beta", "gamma"))
    assert(out.forall(_._3 == 4), "dedup happens AFTER the parsed count")
  }

  test("instruction echo: exact (dots stripped), long-pattern containment, meta-word density ≥ 3") {
    val out = run(Seq(
      "Generate exactly.",                                              // exact, trailing dot stripped
      "note: output only the generated queries, one per line. thanks",  // contains a >20-char pattern
      "output queries generate variations now",                          // 4 meta words
      "output queries now",                                              // 2 meta words — boundary KEPT
      "real search query").mkString("\n"))
    assert(out.map(_._2) == Seq("output queries now", "real search query"))
  }

  test("preamble and XML-tag leaks") {
    val out = run(Seq(
      "Here are five ideas", "以下は候補です", "<rules>", "</task>",
      "self-closing/>", "a < b > c math stays").mkString("\n"))
    assert(out.map(_._2) == Seq("a < b > c math stays"),
      "only the non-leading '<' line survives (startswith gate, not contains)")
  }

  test("repeating patterns: the reps≥3 ∧ 2/3-coverage rule over pattern lengths 1-4") {
    val out = run(Seq(
      ":):):):):)",   // p=2, 5 reps, full coverage → rejected
      "hahaha",       // p=2, 3 reps of 'ha', 18 ≥ 12 → rejected
      "haha",         // 4 chars < 6 → kept
      "abcabcabcx",   // p=3, 3 reps, 27 ≥ 20 → rejected
      "aabbaabb").mkString("\n")) // best reps = 2 at every p → kept
    assert(out.map(_._2) == Seq("haha", "aabbaabb"))
  }
}
