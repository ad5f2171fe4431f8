package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnswerQuality, AnswerValidate}

/** Rule-per-case pins for rag14 (output_validator.go Validate :23-96,
  * repairJSON :98-127, extractAnswerOnly :129-190, extractCitationsOnly
  * :192-254, convertLiteralEscapes :485-507) and rag15
  * (AssessAnswerQuality :281-483).
  */
class AnswerValidateSpec extends SparkSpec {
  import spark.implicits._

  private val ctx3 = Seq("ca", "cb", "cc")

  private def run(raw: String, ctx: Seq[String] = ctx3) = {
    val df = Seq((1L, raw, ctx)).toDF("id", "raw", "ctx_ids")
    AnswerValidate.validate(df).collect()(0)
  }

  test("repair ladder order: } / ]} / \"} / \"]} — first VALID append wins; already-}-terminated text returns unrepaired (:98-127)") {
    assert(run("""{"answer":"a.","fallback":false""").getString(1) == "ok") // +}
    assert(run("""{"answer":"a.","nums":[1,2""").getString(1) == "ok") // +]}
    assert(run("""{"answer":"cut mid string""").getString(1) == "ok") // +"}
    assert(run("""{"answer":"a.","extra":["note""").getString(1) == "ok") // +"]}
    // ends with } but invalid -> repair returns it UNREPAIRED -> extraction
    val r = run("""{"answer":"a.","citations":[{"chunk_id":"2"}""")
    assert(r.getString(1) == "recovered")
    assert(r.getString(5) == "recovered_from_truncated_json")
    assert(r.getInt(3) == 1) // citations fragment closed with ]
  }

  test("recovered path: citations span repaired by last-char shape, empty-chunk filtered but allowed-set NOT applied; ShortAnswer never set (:160-190 early return)") {
    val r = run("""{"answer":"tail text","citations":[{"chunk_id":"zz",""")
    assert(r.getString(1) == "recovered")
    assert(r.getString(2) == "tail text")
    // "zz" is NOT in contexts yet survives: the recovered path skips the
    // allowed-set validation entirely
    assert(r.getInt(3) == 1)
    assert(r.getInt(6) == 0) // short_answer never set on recovery
  }

  test("extraction unescape: \\n \\t \\\" \\\\ map, unknown escapes drop the backslash (:152-170)") {
    val r = run("""{"answer":"a\nb\tc\"d\\e\qf""")
    assert(r.getString(1) == "recovered")
    assert(r.getString(2) == "a\nb\tc\"d\\e" + "qf")
  }

  test("citations filter (parsed path): empty chunk skipped, context ids and 1-based INDEX strings allowed, others dropped (:54-74)") {
    val r = run("""{"answer":"a.","citations":[{"chunk_id":"ca"},{"chunk_id":"3"},{"chunk_id":"4"},{"chunk_id":""},{"chunk_id":"nope"}]}""")
    assert(r.getInt(3) == 2) // ca + "3"; "4" out of 1..3 range
    // NO contexts -> citations pass through UNFILTERED, empty included
    val r2 = run("""{"answer":"a.","citations":[{"chunk_id":""},{"chunk_id":"zz"}]}""",
      ctx = Seq.empty)
    assert(r2.getInt(3) == 2)
  }

  test("convertLiteralEscapes: literal \\n to newline EXCEPT after a drive letter; \\t never converts (:485-507)") {
    val r = run("""{"answer":"x\\ny and C:\\new plus t\\tz"}""")
    assert(r.getString(2) == "x\ny and C:\\new plus t\\tz")
  }

  test("empty raw / unparseable / empty-answer-no-fallback errors; fallback=true passes empty (:26-28, :86-89)") {
    assert(run("   ").getString(1) == "error_empty")
    assert(run("""{"answer": 12 garbage [[""").getString(1) == "error_unparseable")
    assert(run("""{"answer":"  ","fallback":false}""").getString(1) == "error_empty_answer")
    val ok = run("""{"answer":"","fallback":true,"reason":"insufficient_context"}""")
    assert(ok.getString(1) == "ok" && ok.getInt(4) == 1 &&
      ok.getString(5) == "insufficient_context")
  }

  test("short-answer flag: rune count < 800 on the parsed path (:91-94; wired default config.go:65)") {
    assert(run(s"""{"answer":"${"long text segment " * 50}end."}""").getInt(6) == 0)
    assert(run("""{"answer":"brief."}""").getInt(6) == 1)
  }

  test("rag15 battery: extractUserQuestion takes the LAST separator; coverage on the user question only (:376-383)") {
    val rows = Seq((1L,
      "Regarding the article: Kubernetes Scheduling Deep Dive [articleId: x]\n\nQuestion:\nwhat about databases here",
      "databases are covered in detail here.", "general", 2L, 3L))
      .toDF("id", "query", "answer", "intent", "n_citations", "n_expanded")
    val got = AnswerQuality.assess(rows).collect()(0)
    // question words (databases/what/about/here) cover >= 50% in the
    // answer even though the TITLE words (kubernetes, scheduling) never
    // appear — the separator strip is what passes it
    assert(got.getString(2) == "", got.getString(2))
  }

  test("rag15: coherent-ending '\\n' suffix is DEAD after TrimSpace — a newline-terminated incoherent answer still flags (:398-411)") {
    val rows = Seq((1L, "kubernetes scheduling", "kubernetes scheduling stops mid\n\n", "general", 2L, 3L))
      .toDF("id", "query", "answer", "intent", "n_citations", "n_expanded")
    val got = AnswerQuality.assess(rows).collect()(0)
    assert(got.getString(2).contains("incoherent_ending"))
  }

  test("rag15: citation density 1 per 500 runes above 200; exact boundaries (:385-396)") {
    def row(len: Int, nc: Long) = Seq((1L, "q", ("x" * (len - 1)) + ".", "general", nc, 3L))
      .toDF("id", "query", "answer", "intent", "n_citations", "n_expanded")
    def flags(len: Int, nc: Long) =
      AnswerQuality.assess(row(len, nc)).collect()(0).getString(2)
    assert(!flags(199, 0).contains("low_citation_density")) // < 200 exempt
    assert(flags(200, 0).contains("low_citation_density")) // needs max(1, 0)=1
    assert(!flags(200, 1).contains("low_citation_density"))
    assert(flags(1000, 1).contains("low_citation_density")) // needs 2
    assert(!flags(1000, 2).contains("low_citation_density"))
  }
}
