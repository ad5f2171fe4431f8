package graft

import graft.operators.GenreVerification
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Genre-verification report battery: JSONB NULL semantics, window
  * filters, fallbacks and the deterministic top-20 cut
  * (scripts/generate_genre_verification_report_docker.py).
  */
class GenreVerificationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hoursAgo: Int): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 6, 10, 12, 0, 0)
      .minusHours(hoursAgo))

  private def lr(rows: (Long, Long, Timestamp, String, String)*): DataFrame =
    rows.toSeq.toDF("job_id", "article_id", "created_at",
      "refine_decision", "tag_profile")

  private def rd(strategy: String, conf: Option[String] = Some("0.9"),
                 finalGenre: Option[String] = None, genre: String = "gX"): String = {
    val c = conf.map(v => s""", "confidence": "$v"""").getOrElse("")
    val f = finalGenre.map(v => s""", "final_genre": "$v"""").getOrElse("")
    s"""{"strategy": "$strategy"$c$f, "genre": "$genre"}"""
  }

  test("gv01: NULL refine rows drop, confidence-less rows leave the mean's denominator (:139)") {
    val out = GenreVerification.strategyBreakdownOn(lr(
      (1L, 1L, ts(0), rd("graph_boost", Some("0.8")), null),
      (2L, 2L, ts(1), rd("graph_boost", conf = None), null),  // counts, no confidence
      (3L, 3L, ts(2), rd("weighted_score", Some("0.4")), null),
      (4L, 4L, ts(3), null, null)))                           // refine NULL → nowhere
      .collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("graph_boost") == ((2L, 66.67, 0.8)),
      "percentage denominator = 3 non-null-refine rows; avg over the ONE confident row")
    assert(out("weighted_score") == ((1L, 33.33, 0.4)))
  }

  test("gv01/gv03/gv04 window: rows older than 24h from max(created_at) drop (:NOW-interval)") {
    val out = GenreVerification.strategyBreakdownOn(lr(
      (1L, 1L, ts(0), rd("graph_boost"), null),
      (2L, 2L, ts(23), rd("graph_boost"), null),
      (3L, 3L, ts(25), rd("coarse_only"), null)))   // outside the window
    assert(out.count() == 1)
    assert(out.collect().head.getLong(1) == 2)
  }

  test("tag coverage counts ONLY non-empty top_tags: null profile, missing key, [] all fail (:183)") {
    val out = GenreVerification.hourlyCoverageOn(lr(
      (1L, 1L, ts(0), rd("graph_boost"), """{"top_tags": ["a"]}"""),
      (2L, 2L, ts(0), rd("graph_boost"), """{"top_tags": []}"""),
      (3L, 3L, ts(0), rd("graph_boost"), """{"other": 1}"""),
      (4L, 4L, ts(0), null, null)))
    val r = out.collect().head
    assert(r.getLong(1) == 4 && r.getLong(2) == 1,
      "4 records (NULL refine still counts here), 1 tagged")
    assert(r.getDouble(3) == 25.0)
    assert(r.getLong(4) == 3 && r.getDouble(5) == 75.0,
      "graph_boost share counts strategy rows over ALL records")
  }

  test("gv03: percentiles interpolate over exact milli-units; scope filters differ (:264,:388)") {
    val rows = (0 until 5).map(i =>
      (i.toLong, i.toLong, ts(0), rd("graph_boost", Some(s"0.${2 * i + 1}")), null)) ++ Seq(
      (9L, 9L, ts(0), rd("coarse_only", Some("0.1")), null),
      (10L, 10L, ts(0), rd("graph_boost", conf = None), null)) // no confidence key
    val out = GenreVerification.confidenceProfileOn(lr(rows: _*))
      .collect().map(r => r.getString(0) -> r).toMap
    val gb = out("graph_boost")
    assert(gb.getLong(1) == 6,
      "the graph-boost fetcher's COUNT(*) includes the confidence-less row (:268)")
    assert(gb.getDouble(2) == 0.5 && gb.getDouble(3) == 0.5,
      "confidences .1 .3 .5 .7 .9 → mean (null-skipping denominator) and median 0.5")
    assert(gb.getDouble(4) == 0.86 && gb.getDouble(5) == 0.892,
      "p95 = 0.7 + 0.8·0.2, p99 = 0.7 + 0.96·0.2 (linear interpolation)")
    assert(gb.getDouble(6) == 0.1 && gb.getDouble(7) == 0.9)
    assert(out("overall").getLong(1) == 6,
      "overall requires a non-null confidence (:392): 5 gb + 1 coarse, the keyless gb row drops")
  }

  test("gv04: COALESCE(final_genre, genre) fallback and the deterministic top-20 cut (:345)") {
    val rows =
      Seq((100L, 100L, ts(0), rd("graph_boost", finalGenre = Some("big"), genre = "stale"), null),
          (101L, 101L, ts(0), rd("graph_boost", finalGenre = Some("big"), genre = "stale"), null),
          (102L, 102L, ts(0), rd("graph_boost", genre = "fallback"), null)) ++
        (0 until 25).map(i => (i.toLong, i.toLong, ts(0),
          rd("graph_boost", finalGenre = Some(f"t$i%02d")), null))
    val out = GenreVerification.genreDistributionOn(lr(rows: _*)).collect()
    assert(out.length == 20)
    assert(out.map(_.getString(0)).contains("big") && out.map(_.getString(0)).contains("fallback"),
      "final_genre wins where present; bare genre is the fallback")
    val singles = out.map(_.getString(0)).filter(_.startsWith("t")).sorted
    assert(singles.sameElements((0 until 18).map(i => f"t$i%02d")),
      "the 1-count tie at the cut resolves by genre asc — 25 t-genres minus the last 7")
    assert(out.find(_.getString(0) == "big").get.getDouble(2) ==
      math.round(100.0 * 2 * 100 / 28.0) / 100.0)
  }

  test("gv05: cumulative totals + windowed coverage in one header row (:422)") {
    val out = GenreVerification.learningTotalsOn(lr(
      (1L, 10L, ts(0), rd("graph_boost"), """{"top_tags": ["a"]}"""),
      (1L, 10L, ts(30), rd("graph_boost"), """{"top_tags": ["a"]}"""),  // outside window, in totals
      (2L, 11L, ts(2), null, null))).collect().head
    assert(out.getLong(0) == 3 && out.getLong(1) == 2 && out.getLong(2) == 2)
    assert(out.getTimestamp(3) == ts(30) && out.getTimestamp(4) == ts(0))
    assert(out.getLong(5) == 2 && out.getLong(6) == 1 && out.getDouble(7) == 50.0,
      "coverage is over the 24h window only")
  }

  test("composition exercises every JSON path at sf0.001") {
    val out = GenreVerification.gv01(spark, sfDir)
    assert(out.select("strategy").collect().map(_.getString(0)).toSet ==
      GenreVerification.strategies.toSet)
    val dist = GenreVerification.gv04(spark, sfDir)
    assert(dist.count() == 20, "26 composed genres force a real top-20 cut")
    val totals = GenreVerification.gv05(spark, sfDir).collect().head
    assert(totals.getLong(0) > totals.getLong(5),
      "the 24h window is a strict subset of the cumulative totals")
  }

  test("gv07: the no-decision skip, the empty-strategy → refined default, the 0.7 split (:88-130)") {
    // (id, has_decision, strategy, confidence)
    val frame = Seq(
      (1L, false, "llm_refine", 0.9),   // no decision: coarse, NO conf bucket
      (2L, true, "coarse_only", 0.9),   // coarse + high
      (3L, true, "coarse_high_confidence", 0.69), // coarse + low (strict >= 0.7)
      (4L, true, "", 0.7),              // .get default '' → REFINED; exactly 0.7 → high
      (5L, true, "llm_refine", 0.0))    // missing-confidence default → low
      .toDF("article_id", "has_decision", "strategy", "confidence")
    val r = GenreVerification.gv07On(frame).collect().head
    assert(r.getAs[Long]("total_articles") == 5)
    assert(r.getAs[Long]("coarse_only_count") == 3)
    assert(r.getAs[Long]("refined_count") == 2)
    // confidence buckets exclude the no-decision row: 2 high + 2 low ≠ total
    assert(r.getAs[Long]("high_confidence_count") == 2)
    assert(r.getAs[Long]("low_confidence_count") == 2)
    assert(r.getAs[Double]("coarse_only_rate") == 0.6)
    assert(r.getAs[Double]("high_confidence_rate") == 0.4)
  }
}
