package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityJudge

/** Rule-per-case pins for qj01 — pre-processor
  * quality-checker/quality_judger.go (parseScore :296-350,
  * attemptEmergencyParsing :352-382, JudgeArticleQuality :475-526,
  * knownPlaceholders :43-48, lowScoreThreshold=7 :27,
  * maxQualityCheckContentLength=20000 :31).
  */
class QualityJudgeSpec extends SparkSpec {
  import spark.implicits._

  private def judge(rows: (Long, String, String, String)*) =
    QualityJudge.judge(rows.toDF("id", "content", "summary", "response"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2).toString))

  test("tier 1: <score>X</score> with OPTIONAL closing tag (the Ollama stop list eats it, :301-303); trim first") {
    val got = judge(
      (1L, "c", "s", "<score>8</score>"),
      (2L, "c", "s", "   <score>9   "),
      (3L, "c", "s", "prefix <score>7</score> suffix"))
    assert(got.toSeq == Seq((1L, "keep", "8"), (2L, "keep", "9"), (3L, "keep", "7")))
  }

  test("tier 2 only when tier 1's regex finds NOTHING: first standalone integer (:326-346)") {
    val got = judge(
      (1L, "c", "s", "Rating: 7 out of 10"), // first \b-int is 7
      (2L, "c", "s", "I'd say 5. Maybe 9."))
    assert(got.toSeq == Seq((1L, "keep", "7"), (2L, "delete_summary", "5")))
  }

  test("clamp is [0, 30] verbatim — the template says 1-10 but the code caps at 30 (:315-320)") {
    val got = judge(
      (1L, "c", "s", "<score>45</score>"), // 45 -> 30
      (2L, "c", "s", "<score>12</score>")) // 12 stays (> 10 allowed)
    assert(got.toSeq == Seq((1L, "keep", "30"), (2L, "keep", "12")))
  }

  test("tier-1 overflow errors WITHOUT trying tier 2 and falls to emergency, which can recover an EARLIER number after tag-stripping (:309-314, :352-382)") {
    val got = judge(
      // emergency: '[^\w\s]'->' ' exposes 'Rating 8 score 999... score';
      // first number is 8 (the huge one comes later)
      (1L, "c", "s", "Rating 8 <score>99999999999999999999</score>"),
      // first cleaned number IS the huge one -> ParseInt fails -> skip
      (2L, "c", "s", "<score>99999999999999999999</score> then 6"))
    assert(got.toSeq == Seq((1L, "keep", "8"), (2L, "skip_unparseable", null)))
  }

  test("digits embedded in a word have no \\b boundary — unparseable (RE2 and Java agree)") {
    val got = judge((1L, "c", "s", "totally abc123 embedded"))
    assert(got.toSeq == Seq((1L, "skip_unparseable", null)))
  }

  test("placeholder summaries are exempted FIRST — the infinite summarize-delete loop guard (:481-486)") {
    val got = judge(
      (1L, "c", QualityJudge.Placeholders(0), "<score>1</score>"),
      (2L, "c", QualityJudge.Placeholders(1), "garbage"))
    assert(got.toSeq == Seq(
      (1L, "skip_placeholder", null), (2L, "skip_placeholder", null)))
  }

  test("content-length skip at BYTE length (Go len()): content+summary > 20000 keeps the summary unjudged (:488-497)") {
    val long = "x" * 19990
    val got = judge(
      (1L, long, "0123456789", "<score>1</score>"), // == 20000: judged
      (2L, long, "0123456789a", "<score>1</score>"), // 20001: skipped
      // multibyte: 6667 kanji = 20001 bytes, 6667 chars
      (3L, "", "語" * 6667, "<score>1</score>"))
    assert(got.toSeq == Seq(
      (1L, "delete_summary", "1"), (2L, "skip_too_long", null),
      (3L, "skip_too_long", null)))
  }

  test("decision threshold: score < 7 deletes, 7 keeps (:27, :520 strict <)") {
    val got = judge(
      (1L, "c", "s", "<score>6</score>"),
      (2L, "c", "s", "<score>7</score>"))
    assert(got.toSeq == Seq((1L, "delete_summary", "6"), (2L, "keep", "7")))
  }
}
