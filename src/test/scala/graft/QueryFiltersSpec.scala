package graft

import graft.operators.QueryFilters

/** Rule-per-case pins for rag13 — rag-orchestrator
  * retrieval/expand_queries.go (stripMarkdownScaffolding :317-341,
  * isGarbagePattern :395-421, isRomanizedJapanese :423-454, isDateOnly
  * :280-283, isInstructionLeak :368-393, isXMLTagLeak :344-356,
  * isConversationMessageLeak :358-361, filterExpandedQueries :190-236,
  * FilterSearchQueries :267-274).
  */
class QueryFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def run(lines: Seq[String], resolved: String = "rq") = {
    val l = lines.zipWithIndex.map { case (s, i) => (1L, i, s) }
      .toDF("set_id", "line_no", "raw")
    val r = Seq((1L, resolved)).toDF("set_id", "resolved")
    QueryFilters.filterQueries(l, r)
      .orderBy("out_ord").collect().map(_.getString(2)).toSeq
  }

  test("scaffolding: headers, decoration and non-query bold labels drop; query labels extract with quote trim (:317-341)") {
    assert(run(Seq(
      "### Japanese (1)",
      "---",
      "***",
      "**Query Generation Strategy:** how I did it",
      "**Generated Query:** \"real query one\"",
      "*Final Query:** 'real query two'",
      "**Query:**   ", // recognized label, empty content -> drop
      "plain passthrough line")) ==
      Seq("real query one", "real query two", "plain passthrough line"))
  }

  test("rune-length bounds [3, 200] on the CLEANED content (:202, Go []rune)") {
    val exactly200 = "abcdefghij" * 20 // non-repetitive at pattern lengths 1-4
    assert(run(Seq("ab", "abc", "あいう", exactly200, exactly200 + "k" * 10)) ==
      Seq("abc", "あいう", exactly200))
  }

  test("garbage: >=3 consecutive prefix repetitions covering >=2/3 of the runes, pattern lengths 1-4; under 6 runes always passes (:395-421)") {
    assert(run(Seq(
      ":):):):):):)", // patLen 2 x6 -> garbage
      "hahahahaha", // patLen 2 x5 = all 10 -> garbage
      "aaaaaaa", // patLen 1 x7 -> garbage
      "ababab cde xyz more", // reps 3, 6*3=18 < 19*2 -> keeps
      "ababa") // 5 runes < 6 -> keeps
    ) == Seq("ababab cde xyz more", "ababa"))
  }

  test("romanized Japanese: macrons or >=2 hyphenated words drop, any CJK rune overrides (:423-454)") {
    assert(run(Seq(
      "Sei-sai naiyō Rosia", // macron
      "sei-sai roshi-a summary", // two hyphenated words
      "well-known one-liner 日本", // CJK overrides
      "well-known term", // one hyphenated word only
      "-edge- trimmed -only-") // edge hyphens trim away -> 0
    ) == Seq("well-known one-liner 日本", "well-known term", "-edge- trimmed -only-"))
  }

  test("date-only queries drop; dates with content keep (:280-283)") {
    assert(run(Seq("2026-04-07", "2026/3/5", "2026.01.01", "2026-04-07 outage report")) ==
      Seq("2026-04-07 outage report"))
  }

  test("instruction leak: exact (trailing dots stripped), long-pattern containment, >=3 meta words (:368-393)") {
    assert(run(Seq(
      "Output only the generated queries, one per line...",
      "note: do not add numbering, bullets, labels, or explanations please",
      "generate exactly five output variations", // generate/exactly/output/variations = 4
      "generate two variations")) == // 2 meta words -> keeps
      Seq("generate two variations"))
  }

  test("xml and conversation leaks (:344-361)") {
    assert(run(Seq("<input>leak", "</example>", "a < b > c", "Assistant: hi there", "user: query")) ==
      Seq("a < b > c"))
  }

  test("case-insensitive order-preserving dedup keeps the FIRST casing; dup never consumes a cap slot; cap 8 (:224-234)") {
    val nine = (1 to 9).map(i => s"query number $i")
    val got = run(Seq("Spark Tuning", "spark tuning", "SPARK TUNING") ++ nine)
    assert(got.head == "Spark Tuning")
    assert(got.length == 8)
    assert(got.tail == nine.take(7))
  }

  test("fallback: everything filtered -> resolvedQuery; empty resolved -> nothing (:267-274)") {
    // NB: a bare "###" with no trailing space is NOT a header by the
    // reference's own `^#{1,6}\s` and survives as a query — pinned here
    // by using a real header line instead
    assert(run(Seq("### Japanese", "---"), resolved = "the resolved query") ==
      Seq("the resolved query"))
    assert(run(Seq("---"), resolved = "").isEmpty)
  }
}
