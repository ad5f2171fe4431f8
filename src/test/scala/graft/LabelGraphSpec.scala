package graft

import graft.operators.LabelGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Tag-label graph builder: one case per reference rule
  * (tag-generator/app/scripts/build_label_graph.py).
  */
class LabelGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ts(daysAgo: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 6, 10, 12, 0, 0)
      .minusDays(daysAgo))

  private def tags(ts: (String, Any)*): String =
    "{\"top_tags\": [" + ts.map { case (l, c) =>
      s"""{"label": "$l", "confidence": $c}"""
    }.mkString(", ") + "]}"

  private def lr(rows: (Timestamp, String, String)*): DataFrame =
    rows.toSeq.toDF("updated_at", "refine_decision", "tag_profile")

  private val g1 = """{"final_genre": "g1"}"""

  test("max_tags slice: only the FIRST 6 tags count (:71)") {
    val seven = tags((1 to 7).map(i => s"t$i" -> "0.9375"): _*)
    val rows = (0 until 3).map(i => (ts(i), g1, seven))
    val out = LabelGraph.buildOn(lr(rows: _*))
      .filter(col("window_label") === "30d")
      .collect().map(_.getString(2)).toSet
    assert(out == (1 to 6).map(i => s"t$i").toSet, "t7 never accumulates")
  }

  test("confidence gate: < 0.55 skips, null coerces to 0.0 and skips; empty labels skip (:73-78)") {
    val p = tags("keep" -> "0.5625", "low" -> "0.5", "" -> "0.9375") // 0.5 < 0.55
      .replace("]}", """, {"label": "nullc", "confidence": null}]}""")
    val rows = (0 until 3).map(i => (ts(i), g1, p))
    val out = LabelGraph.buildOn(lr(rows: _*))
      .filter(col("window_label") === "30d").collect()
    assert(out.map(_.getString(2)).toSet == Set("keep"),
      "exactly-0.55 is the floor (>=); lower, null and empty all skip")
  }

  test("genre normalization: missing → other, '' → other, strip+lower (:53,:70)") {
    val p = tags("t" -> "0.9375")
    val rows = (0 until 3).flatMap(i => Seq(
      (ts(i), """{"x": 1}""", p),
      (ts(i), """{"final_genre": ""}""", p),
      (ts(i), """{"final_genre": " G1 "}""", p)))
    val out = LabelGraph.buildOn(lr(rows: _*))
      .filter(col("window_label") === "30d").collect()
      .map(r => r.getString(1) -> r.getLong(4)).toMap
    assert(out == Map("other" -> 6L, "g1" -> 3L),
      "missing and empty final_genre pool under 'other'")
  }

  test("min_support: edges under 3 samples drop; weight is the clamped 6-dp mean (:81-86)") {
    val out = LabelGraph.buildOn(lr(
      (ts(0), g1, tags("hot" -> "0.5625", "rare" -> "0.9375")),
      (ts(1), g1, tags("hot" -> "0.6875")),
      (ts(2), g1, tags("hot" -> "0.9375"))))
      .filter(col("window_label") === "30d").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("hot"), "rare has 1 sample < 3")
    val hot = out.head
    assert(hot.getLong(4) == 3)
    assert(hot.getDouble(3) ==
      math.round((0.5625 + 0.6875 + 0.9375) / 3 * 1e6) / 1e6)
    assert(hot.getTimestamp(5) == ts(0), "last_observed_at is the max updated_at")
  }

  test("both windows build in one pass; the 7-day window excludes older rows (:104,:149)") {
    val p = tags("t" -> "0.9375")
    val rows = Seq((ts(0), g1, p), (ts(1), g1, p), (ts(2), g1, p),
      (ts(10), g1, p), (ts(11), g1, p), (ts(12), g1, p))
    val out = LabelGraph.buildOn(lr(rows: _*))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("30d") == 6 && out("7d") == 3,
      "rows 10-12 days old count only in the 30d window")
  }

  test("composition: every rule fires and bd01's graph shape emerges at sf0.001") {
    val out = LabelGraph.lg01(spark, sfDir).cache()
    assert(out.select("window_label").distinct().count() == 2)
    assert(out.filter(col("genre") === "other").count() > 0)
    assert(out.filter(col("tag") === "seventh").count() == 0,
      "the planted 7th tag never survives the slice")
    assert(out.filter(col("weight") < 0.55).count() == 0,
      "every surviving edge's mean sits at or above the confidence floor")
    out.unpersist()
  }
}
