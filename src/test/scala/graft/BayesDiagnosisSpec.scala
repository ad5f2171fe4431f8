package graft

import graft.operators.BayesDiagnosis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Graph-match diagnosis: one planted case per reference rule
  * (scripts/diagnose_bayes_optimization.py).
  */
class BayesDiagnosisSpec extends SparkSpec {
  import spark.implicits._

  private def ts(daysAgo: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 6, 10, 12, 0, 0)
      .minusDays(daysAgo))

  private def art(rows: (Timestamp, String, String)*): DataFrame =
    rows.toSeq.toDF("created_at", "tag_profile", "refine_decision")

  private def diag(rows: (Timestamp, String, String)*) =
    BayesDiagnosis.diagnosisOn(art(rows: _*)).collect().head

  private val g0 = """{"final_genre": "g0"}"""

  test("label extraction: object lists only, strip+lower, empty labels and string tags skip (:90)") {
    val r = diag(
      (ts(0), """{"top_tags": [{"label": " TAG0 "}, {"label": ""}]}""", g0),
      (ts(0), """{"top_tags": ["tag0"]}""", g0),            // string element → NOTHING
      (ts(0), """{"top_tags": {"not": "a list"}}""", g0),   // dict → NOTHING
      (ts(0), null, g0))                                    // null profile → NOTHING
    assert(r.getLong(6) == 1 && r.getLong(7) == 1,
      "one occurrence total, matched via strip+lower against the graph set")
  }

  test("occurrence counting vs set-sized unmatched counts (:90,:199)") {
    val twice = """{"top_tags": [{"label": "nope"}, {"label": "nope"}]}"""
    val r = diag((ts(0), twice, g0), (ts(0), twice, g0))
    assert(r.getLong(6) == 4 && r.getLong(7) == 0,
      "total_tags counts OCCURRENCES")
    assert(r.getLong(8) == 1, "unmatched_tag_count is the SET size")
    assert(r.getString(14) == "low_tag_match")
  }

  test("pairs: falsy genre skips the row's pairs but keeps its tags (:136)") {
    val p = """{"top_tags": [{"label": "tag0"}]}"""
    val r = diag(
      (ts(0), p, g0),                              // pair (g0, tag0) ∈ graph
      (ts(0), p, """{"final_genre": ""}"""),       // falsy → tag counts, pair doesn't
      (ts(0), p, """{"final_genre": " G1 "}"""))   // strips/lowers to g1; (g1, tag0) ∉ graph (odd sum)
    assert(r.getLong(6) == 3 && r.getLong(7) == 3)
    assert(r.getLong(9) == 2 && r.getLong(10) == 1, "2 genred pairs, 1 matched")
    assert(r.getLong(11) == 1, "the (g1, tag0) miss, as a set")
    assert(r.getDouble(12) == 100.0 && r.getDouble(13) == 50.0)
    assert(r.getString(14) == "healthy", "50 is NOT < 50 — the strict boundary")
  }

  test("the 7-day window anchors on max(created_at) and the verdict ladder orders (:221)") {
    val unmatched = """{"top_tags": [{"label": "nope"}]}"""
    val matched = """{"top_tags": [{"label": "tag0"}]}"""
    val r = diag(
      (ts(0), unmatched, """{"final_genre": "g1"}"""),
      (ts(1), matched, g0),
      (ts(8), matched, g0))   // outside the window
    assert(r.getLong(6) == 2, "the 8-day-old row drops")
    assert(r.getDouble(12) == 50.0 && r.getDouble(13) == 50.0 &&
      r.getString(14) == "healthy",
      "both rates sit exactly at 50, and both gates are STRICT < 50")
  }

  test("graph statistics come from the literal graph (:34)") {
    val r = diag((ts(0), """{"top_tags": [{"label": "tag0"}]}""", g0))
    assert(r.getLong(0) == BayesDiagnosis.graphEdges.size)
    assert(r.getLong(1) == 6 && r.getLong(2) == 6)
    val ws = BayesDiagnosis.graphEdges.map(_._3)
    assert(r.getDouble(3) == math.round(ws.sum / ws.size * 1e6) / 1e6)
    assert(r.getDouble(4) == ws.min && r.getDouble(5) == ws.max)
  }

  test("bd02: top-10 cut is deterministic by (count desc, tag asc) (:214)") {
    val rows = (0 until 12).flatMap(i =>
      Seq.fill(12 - i)((ts(0), s"""{"top_tags": [{"label": "t$i"}]}""", g0)))
    val out = BayesDiagnosis.topTagsOn(art(rows: _*)).collect()
    assert(out.length == 10)
    assert(out.map(_.getString(0)).toSeq == (0 until 10).map(i => s"t$i"))
    assert(out.head.getLong(1) == 12)
  }

  test("composition: the cut bites and both verdict inputs are real at sf0.001") {
    val r = BayesDiagnosis.bd01(spark, sfDir).collect().head
    assert(r.getLong(6) > 0 && r.getLong(9) > 0)
    assert(BayesDiagnosis.bd02(spark, sfDir).count() == 10,
      "15 distinct composed labels force a real top-10 cut")
  }
}
