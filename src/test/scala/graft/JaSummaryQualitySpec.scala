package graft

import graft.operators.JaSummaryQuality
import org.apache.spark.sql.functions._

/** JA summary quality ladder: one planted violator per reference rule
  * (scripts/check_japanese_summaries.py:98).
  */
class JaSummaryQualitySpec extends SparkSpec {
  import spark.implicits._

  private def eval(summary: String,
                   title: Option[String] = Some("spark engine latency report"),
                   content: Option[String] = Some("long article body")) =
    JaSummaryQuality.qualityOn(
      Seq((1L, title.orNull, content.orNull, summary))
        .toDF("summary_id", "title", "content", "summary")).collect().head

  private val clean =
    "spark engine latency report " + (1 to 20).map(i => s"word$i").mkString(" ") + "。"

  test("a clean summary scores 100") {
    val r = eval(clean)
    assert(r.getDouble(3) == 100.0, s"got $r")
  }

  test("length bands are an elif chain: one band fires, boundaries are strict (:109)") {
    assert(eval("短い。" + "あ" * 10 + "。").getDouble(3) == 100.0 - 30 - 15,
      "<50 chars: −30 (plus the unrelated title-overlap −15)")
    assert(eval((1 to 12).map(i => s"word$i").mkString(" ") + "。",
      title = None).getDouble(3) == 100.0 - 10, "50–99 chars: −10, overlap skipped without title")
    val long = "spark engine latency report " +
      (1 to 600).map(i => s"w$i").mkString(" ") + "。"
    assert(eval(long).getDouble(3) == 100.0 - 20, ">2000 chars: −20")
    assert(eval(clean + "p" * (2000 - clean.length)).getDouble(3) == 100.0 - 5,
      "exactly 2000 chars stays in the clean band (strict >); the padded tail only costs the terminal rule")
  }

  test("JSON prefix on the STRIPPED summary → −50 (:121)") {
    val r = eval("  {\"k\": \"" + clean.drop(0) + "\"}")
    assert(r.getBoolean(7), "leading whitespace must not mask the '{'")
    assert(eval("[1, 2] " + clean).getBoolean(7))
    assert(!eval(clean + " {x}").getBoolean(7))
  }

  test("quote ratio over the UNSTRIPPED length, strict > 0.15 (:126)") {
    assert(eval(JaSummaryQuality.quoteHeavy, title = None).getDouble(3) == 100.0 - 30,
      "the composed quote-heavy constant isolates the rule")
    // exactly 0.15 = 3 quotes / 20 chars → NOT flagged
    val boundary = "\"\"\"" + "a b c d e f g h 。".substring(0, 16) + "。"
    assert(boundary.length == 20 && boundary.count(_ == '"') == 3)
    assert(!eval(boundary).getBoolean(8))
  }

  test("unique-word ratio < 0.3 over whitespace words (:134)") {
    val r = eval(("spark " * 39) + "spark。")
    assert(r.getBoolean(9) && r.getInt(2) == 40)
    assert(!eval(clean).getBoolean(9))
  }

  test("title overlap: fails below 0.1, SKIPPED when title or content is absent (:140)") {
    val noOverlap = (1 to 30).map(i => s"z$i").mkString(" ") + "。"
    assert(eval(noOverlap).getBoolean(10))
    assert(!eval(noOverlap, title = None).getBoolean(10),
      "missing title → the check never runs (Python truthiness)")
    assert(!eval(noOverlap, content = None).getBoolean(10),
      "missing content also skips it")
    assert(!eval(noOverlap, content = Some("")).getBoolean(10),
      "EMPTY content is falsy too")
    // 1 of 4 title tokens present = 0.25 ≥ 0.1 → no penalty
    assert(!eval("spark " + noOverlap).getBoolean(10))
  }

  test("terminal punctuation and newline rules (:152, :157)") {
    assert(eval(clean.dropRight(1)).getBoolean(11), "no 。 → flagged")
    assert(!eval(clean.dropRight(1) + "!").getBoolean(11), "ASCII ! accepted")
    assert(eval(clean + "\nx".repeat(11)).getBoolean(12), "11 newlines > 10")
    assert(!eval(clean + "\nx".repeat(10)).getBoolean(12), "exactly 10 is fine")
  }

  test("score clamps at 0 when every rule fires") {
    // {-prefixed, quote-heavy, repetitive, short, no overlap, bad
    // terminal, 11 newlines: 100−30−50−30−20−15−5−10 < 0 → 0
    val worst = "{\"a\"" + " \"a\"" * 6 + "\nx".repeat(11)
    assert(eval(worst).getDouble(3) == 0.0)
  }

  test("composition plants every rule at sf0.001") {
    val out = JaSummaryQuality.qe07(spark, sfDir).cache()
    for (c <- Seq("len_short", "len_shortish", "len_long", "json_prefix",
                  "quote_heavy", "repetitive", "no_terminal_punct", "many_newlines"))
      assert(out.filter(col(c)).count() > 0, s"rule $c never fires")
    assert(out.filter(col("score") === 100.0).count() > 0, "clean rows exist")
    out.unpersist()
  }
}
