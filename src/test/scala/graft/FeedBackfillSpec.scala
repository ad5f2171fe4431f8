package graft

import graft.operators.FeedBackfill
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Article-feed backfill: one case per reference rule
  * (scripts/backfill_article_feed_ids.py:46).
  */
class FeedBackfillSpec extends SparkSpec {
  import spark.implicits._

  private def feeds(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("feed_id", "created_at", "link")
  private def arts(rows: (Long, String, java.lang.Long)*): DataFrame =
    rows.toSeq.toDF("article_id", "url", "old_feed_id")

  test("DISTINCT ON (link): the NEWEST feed wins, feed_id breaks created_at ties (:123)") {
    val out = FeedBackfill.backfillOn(
      arts((1L, "https://x.com/a", null)),
      feeds((10L, 5L, "https://x.com/a"), (11L, 9L, "https://x.com/a"),
        (12L, 9L, "https://x.com/a")))
      .collect().head
    assert(out.getLong(3) == 12L,
      "created_at DESC then id DESC — the tie at 9 resolves to the larger id")
    assert(out.getString(4) == "updated")
  }

  test("pre-assigned articles are untouched; unmatched urls stay null (:126-127)") {
    val out = FeedBackfill.backfillOn(
      arts((1L, "https://x.com/a", 99L), (2L, "https://gone.example/z", null)),
      feeds((10L, 1L, "https://x.com/a")))
      .collect().map(r => r.getLong(0) -> ((r.getString(4), Option(r.get(3))))).toMap
    assert(out(1L) == (("already_assigned", None)),
      "WHERE feed_id IS NULL keeps assigned rows out of the update")
    assert(out(2L) == (("no_match", None)))
  }

  test("matching is EXACT url = link equality — no normalization here (:128)") {
    val out = FeedBackfill.backfillOn(
      arts((1L, "https://x.com/a/", null)),
      feeds((10L, 1L, "https://x.com/a")))
      .collect().head
    assert(out.getString(4) == "no_match",
      "the trailing slash difference is ur01's job, not the backfill's")
  }

  test("composition: all three actions and real duplicate-link groups at sf0.001") {
    val out = FeedBackfill.bf01(spark, sfDir).cache()
    val actions = out.select("action").distinct().collect().map(_.getString(0)).toSet
    assert(actions == Set("updated", "already_assigned", "no_match"))
    // slug collisions make duplicate links: every matched article must
    // resolve to the newest feed of its link group
    val f = FeedBackfill.composeFeeds(spark, sfDir)
    val newest = f.groupBy("link").agg(max("feed_id").as("expect"))
    val bad = out.filter(col("action") === "updated")
      .join(newest, out("url") === newest("link"))
      .filter(col("matched_feed_id") =!= col("expect"))
    assert(bad.count() == 0,
      "created_at and feed_id are both doc_id-ordered here, so newest = max feed_id")
    out.unpersist()
  }
}
