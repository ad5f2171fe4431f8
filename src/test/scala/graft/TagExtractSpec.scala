package graft

import org.apache.spark.sql.functions._
import graft.operators.TagExtract

/** Rule-per-case pins for ex01 (tag_extractor/extract.py
  * extract_tags_with_metrics + _truncate_content + _compute_confidence)
  * and cc01 (tag_generator/cascade.py CascadeController.evaluate).
  */
class TagExtractSpec extends SparkSpec {
  import spark.implicits._

  private def runEx(rows: Seq[(Long, String, String, String)]) =
    TagExtract.extractOn(rows.toDF("doc_id", "lang", "title", "content"))
      .collect().map(r => r.getLong(0) -> r).toMap

  // ex01 row: doc_id, language, gate, title_truncated, content_truncated,
  //           cut_at_sentence, content_length, tag_count,
  //           sanitized_length, confidence, inference_ms

  test("_truncate_content: hard cut without a sentence end; rfind of each " +
       "terminator wins past the 80% mark; an early terminator loses") {
    val filler = "wordsalad " * 30 // 300 chars, no terminators
    def long(tail: String, padTo: Int) =
      filler + ("z" * (padTo - filler.length)) + tail
    val out = runEx(Seq(
      (1L, "en", "T one", long("", 100300)),                    // hard cut
      (2L, "en", "T two", long(". Tail words beyond the cut boundary run long", 99990)),
      (3L, "en", "T three", long("! Bang tail also runs past the boundary mark", 99985)),
      (4L, "en", "T four", long("? Question tail runs past the boundary marker", 99980)),
      // terminator at 300 (< 80000): must NOT win -> hard cut
      (5L, "en", "T five", filler + ". " + ("z" * 100100))))
    assert(out(1L).getBoolean(4) && !out(1L).getBoolean(5) &&
      out(1L).getLong(6) == 100000)
    assert(out(2L).getBoolean(5) && out(2L).getLong(6) == 99991, "'.' at 99990 -> cut at end+1")
    assert(out(3L).getBoolean(5) && out(3L).getLong(6) == 99986, "'!' pinned")
    assert(out(4L).getBoolean(5) && out(4L).getLong(6) == 99981, "'?' pinned")
    assert(out(5L).getBoolean(4) && !out(5L).getBoolean(5) &&
      out(5L).getLong(6) == 100000,
      "a sentence end BEFORE 80% of the limit loses to the hard cut")
  }

  test("title hard cut at 1000 runs BEFORE sanitization — an over-long " +
       "title never reaches the 'Title too long' rejection") {
    val title = (1 to 30)
      .map(i => f"Headline piece $i%02d mixed case words here. ").mkString.take(1200)
    val out = runEx(Seq((1L, "en",
      title, "A normal content body with plenty of ordinary words to pass checks.")))
    assert(out(1L).getBoolean(3), "title_truncated")
    assert(out(1L).getString(2) == "ok", "valid after the cut")
  }

  test("gate ladder: invalid input zeroes sanitized_length; too-short " +
       "keeps it (the reference's two distinct empty-outcome shapes)") {
    val out = runEx(Seq(
      (1L, "en", "T t", "bad\u0004content here with many ordinary words"),
      (2L, "en", "T2", "x"),
      (3L, "en", "T t", "A normal content body with plenty of ordinary words here.")))
    val inv = out(1L)
    assert(inv.getString(2) == "invalid_input" && inv.getString(1) == "und")
    assert(inv.getLong(7) == 0 && inv.getLong(8) == 0 &&
      inv.getDouble(9) == 0.0 && inv.getDouble(10) == 0.0)
    val short = out(2L)
    assert(short.getString(2) == "too_short" && short.getString(1) == "und")
    assert(short.getLong(8) == 3, "sanitized_length KEPT on the too-short path ('T2'+'x')")
    assert(short.getDouble(9) == 0.0 && short.getDouble(10) == 0.0)
    assert(out(3L).getString(2) == "ok" && out(3L).getString(1) == "en")
  }

  test("_compute_confidence: 0.7*coverage + 0.3*length_factor at 3 dp, " +
       "coverage capped at top_keywords, length factor at 1200") {
    // tag_count = (doc_id*7) % 13; pick ids for the interesting counts
    def conf(id: Long, body: String): Double =
      runEx(Seq((id, "en", "T t", body)))(id).getDouble(9)
    val body = "A normal content body with plenty of ordinary words to check." // slen 66+3
    // id=1 -> tc 7; slen = 3 + 62 = 65... assert against the exact formula
    val out = runEx(Seq((1L, "en", "T t", body)))
    val slen = out(1L).getLong(8)
    val k = 1400L * math.min(7, 10) + 5L * math.min(slen, 1200L)
    assert(out(1L).getDouble(9) == math.round(k / 20.0) / 1000.0)
    // coverage cap: tc 11 and 12 both clip to 1.0 -> same confidence at
    // equal slen (ids 5 -> tc 9? (5*7)%13=9; use 4 -> 2; 12*7%13=6...)
    val a = runEx(Seq((9L, "en", "T t", body)))(9L)   // tc (63)%13 = 11 -> clips
    val b = runEx(Seq((11L, "en", "T t", body)))(11L) // tc (77)%13 = 12 -> clips
    assert(a.getDouble(9) == b.getDouble(9))
    // tc 0 -> confidence 0 even on the ok path
    val z = runEx(Seq((13L, "en", "T t", body)))(13L) // tc 91%13 = 0
    assert(z.getString(2) == "ok" && z.getDouble(9) == 0.0)
  }

  private def runCc(rows: Seq[(Long, Double, Long, Double)]) =
    TagExtract.cascadeOn(
      rows.toDF("doc_id", "confidence", "tag_count", "inference_ms"))
      .collect().map(r => r.getLong(0) -> r).toMap

  // cc01 row: doc_id, worker_id, seq, needs_refine, reason, confidence,
  //           tag_count, inference_ms, refine_ratio
  private def reason(r: org.apache.spark.sql.Row) = r.getString(4)

  private val hi = (0.9, 10L, 50.0)   // high-confidence exit
  private val lo = (0.1, 10L, 50.0)   // low confidence

  test("cascade reasons in evaluation order + the exact thresholds") {
    // one probe per WORKER so each is that worker's first decision and
    // the budget cap cannot interfere with the reason under test
    val out = runCc(Seq(
      (0L, 0.719, 10L, 50.0),   // conf just under 0.72
      (1L, 0.72, 10L, 50.0),    // exactly at threshold: NOT low
      (2L, 0.9, 4L, 50.0),      // tag_count 4 < 5
      (3L, 0.9, 5L, 180.0),     // ims exactly 180: NOT slow (gate is >)
      (4L, 0.9, 5L, 180.5),     // just over
      (5L, 0.1, 1L, 300.0)))    // all three fire -> low wins (order)
    assert(reason(out(0L)) == "low_confidence")
    assert(reason(out(1L)) == "high_confidence_exit")
    assert(reason(out(2L)) == "insufficient_tag_coverage")
    assert(reason(out(3L)) == "high_confidence_exit", "180.0 is NOT > 180.0")
    assert(reason(out(4L)) == "slow_inference")
    assert(reason(out(5L)) == "low_confidence",
      "all three rules fire -> the FIRST in evaluation order names the reason")
  }

  test("the refine budget: rc/total >= 0.35 caps a would-refine decision, " +
       "including at the EXACT 7/20 boundary; capped rows do not spend") {
    // one worker (ids = 8k): low at seqs 1,4,7,10,13,16,19,20 -> rc walks
    // 1..7 and row 20 hits rc*20 == 7*20 exactly
    val lows = Set(1, 4, 7, 10, 13, 16, 19, 20)
    val rows = (1 to 20).map { i =>
      val (c, t, ms) = if (lows(i)) lo else hi
      ((i - 1) * 8L, c, t, ms)
    }
    val out = runCc(rows)
    def at(seq: Int) = out(((seq - 1) * 8).toLong)
    (Seq(1, 4, 7, 10, 13, 16, 19)).foreach { s =>
      assert(at(s).getBoolean(3) && reason(at(s)) == "low_confidence", s"seq $s refines")
    }
    assert(!at(20).getBoolean(3) && reason(at(20)) == "refine_ratio_budget_capped",
      "rc=7 at total=20: 140 >= 140 — the >= boundary caps")
    assert(at(2).getString(4) == "high_confidence_exit")
    // ratio after seq 20 = 7/20 = 0.35 exactly
    assert(at(20).getDouble(8) == 0.35)
  }

  test("refine_ratio rounds HALF-EVEN like CPython: 1/16 -> 0.062, not 0.063") {
    val rows = (1 to 16).map { i =>
      val (c, t, ms) = if (i == 1) lo else hi
      ((i - 1) * 8L, c, t, ms)
    }
    val out = runCc(rows)
    assert(out(15L * 8).getDouble(8) == 0.062,
      "62.5 milli ties to the even side, matching Python round()")
    // and a non-tie rounds nearest: 1/3 -> 0.333
    val three = runCc(Seq((0L, 0.1, 10L, 50.0), (8L, 0.9, 10L, 50.0), (16L, 0.9, 10L, 50.0)))
    assert(three(16L).getDouble(8) == 0.333)
  }

  test("workers are independent budgets (the per-process controller)") {
    // worker 0 saturates; worker 1 sees its FIRST low-conf row and must
    // still refine (its own budget is untouched)
    val rows = Seq((0L, 0.1, 10L, 50.0), (8L, 0.1, 10L, 50.0),
      (16L, 0.1, 10L, 50.0), (1L, 0.1, 10L, 50.0))
    val out = runCc(rows)
    assert(out(0L).getBoolean(3), "worker 0 seq 1 refines")
    assert(!out(8L).getBoolean(3), "worker 0 seq 2 capped")
    assert(out(1L).getBoolean(3), "worker 1 seq 1 refines on its own budget")
  }

  test("cc01 over ex01: empty outcomes (und gates) enter the cascade as " +
       "low-confidence candidates") {
    val cc = TagExtract.cc01(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val ex = TagExtract.ex01(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val undRows = cc.filter { case (id, _) => ex(id) != "ok" }
    assert(undRows.nonEmpty)
    assert(undRows.values.forall(r =>
      reason(r) == "low_confidence" || reason(r) == "refine_ratio_budget_capped"))
  }
}
