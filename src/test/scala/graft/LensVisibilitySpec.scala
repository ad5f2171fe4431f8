package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.LensVisibility

/** Rule-per-case specs for kh01 — the sovereign lens-visibility read
  * (AreArticlesVisibleInLens): one planted row per gate, plus the
  * fail-closed output contract.
  */
class LensVisibilitySpec extends SparkSpec {
  import spark.implicits._

  private def t(day: Int) = new Timestamp(1700000000000L + day * 86400000L)

  private def items(rows: Seq[(Long, String, String, Seq[String], Timestamp, Option[Timestamp], Long)]) =
    rows.toDF("primary_ref_id", "title", "summary_excerpt", "tags",
      "published_at", "dismissed_at", "projection_version")

  test("every gate flips visibility independently; output is one explicit row per input") {
    val base = ("has data inside", "summary", Seq("en"), t(10), None: Option[Timestamp], 2L)
    val rows = Seq(
      (1L, base._1, base._2, base._3, base._4, base._5, base._6),  // visible
      (2L, base._1, base._2, base._3, base._4, Some(t(1)), 2L),     // dismissed
      (3L, base._1, base._2, base._3, base._4, None, 1L),           // stale projection
      (4L, "no hit here", "nor here", Seq("en"), t(10), None, 2L),  // text gate fails
      (5L, base._1, base._2, Seq("fr"), t(10), None, 2L),           // tag gate fails
      (6L, base._1, base._2, base._3, t(0), None, 2L))              // before the cutoff
    val out = LensVisibility.visibleIn(items(rows),
        cutoff = Some("2023-11-16 00:00:00"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false, 6L -> false))
  }

  test("the COALESCE and tag paths of the text gate are each sufficient") {
    val rows = Seq(
      // NULL summary, title hits — the COALESCE('') must not null the OR
      (1L, "data in the title", null, Seq("en"), t(10), None: Option[Timestamp], 2L),
      // neither title nor summary hit, but a TAG matches the query text
      (2L, "nothing", "nothing", Seq("en", "dataset"), t(10), None, 2L),
      // NULL summary and no hit anywhere → fail-closed false, not null
      (3L, "nothing", null, Seq("en"), t(10), None, 2L))
    val out = LensVisibility.visibleIn(items(rows),
        cutoff = Some("2023-11-16 00:00:00"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("omitted filters skip their gates (the reference's nil-filter branches)") {
    val rows = Seq(
      (1L, "nothing", "nothing", Seq("fr"), t(0), None: Option[Timestamp], 2L))
    val out = LensVisibility.visibleIn(items(rows),
        queryText = None, tagNames = Seq.empty, cutoff = None)
      .head()
    assert(out.getBoolean(1), "projection gates alone decide when no lens filter is set")
  }

  test("kh01 composes at sf0.001: one row per document, every gate cohort present") {
    val out = LensVisibility.kh01(spark, sfDir).collect()
    assert(out.length == Tables.documents(spark, sfDir).count())
    val vis = out.count(_.getBoolean(1))
    assert(vis > 0 && vis < out.length, s"both verdicts must occur, got $vis/${out.length}")
  }
}
