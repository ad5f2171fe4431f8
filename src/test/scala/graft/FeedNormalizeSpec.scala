package graft

import graft.operators.FeedNormalize
import org.apache.spark.sql.functions._

/** URL canonicalization + keep-oldest dedup: one case per reference
  * rule (scripts/normalize_feed_urls.go).
  */
class FeedNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("link").select(FeedNormalize.normalizeUrl(col("link")))
      .collect().head.getString(0)

  test("tracking params strip by lowercase name; survivors sort by key (:52-64)") {
    assert(norm("https://x.com/p?utm_source=rss&UTM_Campaign=x&id=3") ==
      "https://x.com/p?id=3", "mixed-case tracking names still strip")
    assert(norm("https://x.com/p?zz=9&id=3&aa=1") == "https://x.com/p?aa=1&id=3&zz=9")
    assert(norm("https://x.com/p?k=2&k=1&a=0") == "https://x.com/p?a=0&k=2&k=1",
      "values of one key keep their original order (url.Values)")
  }

  test("bare params gain their '='; an all-tracking query drops the '?' (:67-76)") {
    assert(norm("https://x.com/p?flag&id=3") == "https://x.com/p?flag=&id=3")
    assert(norm("https://x.com/p?utm_source=a&gclid=b") == "https://x.com/p")
  }

  test("fragment strips; percent-encodings uppercase (:49,:94)") {
    assert(norm("https://x.com/p?id=3#section-2") == "https://x.com/p?id=3")
    assert(norm("https://x.com/p%2fsub%3a?id=3") == "https://x.com/p%2Fsub%3A?id=3")
  }

  test("trailing slash: stripped even at root, kept after '://' and '//' (:84-89)") {
    assert(norm("https://x.com/path/") == "https://x.com/path")
    assert(norm("https://x.com/") == "https://x.com",
      "the comment says 'except root' but the CODE strips it — code wins")
    assert(norm("https://") == "https://", "the '://' suffix guard")
    assert(norm("https://x.com/a//") == "https://x.com/a//",
      "a slash preceded by a slash survives")
  }

  test("dedup: keep-oldest resolution and the action taxonomy (:193-253)") {
    val out = FeedNormalize.dedupOn(Seq(
      (1L, 10L, "https://x.com/p?utm_source=a&id=1"),  // group A, oldest → keeper, updated
      (2L, 20L, "https://x.com/p?id=1"),               // group A, newer → deleted
      (3L, 30L, "https://x.com/p?id=1&utm_id=z"),      // group A → deleted
      (4L, 5L, "https://x.com/q?id=2"),                // singleton, already normal → skipped
      (5L, 6L, "https://x.com/r?id=3&fbclid=f"),       // singleton, differs → updated
      (6L, 1L, "https://x.com/s?id=4"),                // group B keeper, already normal → noop
      (7L, 2L, "https://x.com/s?id=4&gclid=g"))        // group B → deleted
      .toDF("feed_id", "created_at", "link"))
      .collect().map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
    assert(out(1L) == (("updated", 1L)))
    assert(out(2L) == (("deleted", 1L)) && out(3L) == (("deleted", 1L)))
    assert(out(4L) == (("skipped", 4L)))
    assert(out(5L) == (("updated", 5L)))
    assert(out(6L) == (("noop_keeper", 6L)),
      "a keeper whose link already matches increments nothing in the reference — distinct action")
    assert(out(7L) == (("deleted", 6L)))
  }

  test("st28: canonicalization at ingest — first arrival wins across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def at(m: Int) = java.sql.Timestamp.valueOf(s"2024-01-01 00:0$m:00")
    val out = graft.streaming.StreamOps.feedNormalizeStream(
      mem.toDF.toDF("feed_id", "event_time", "link"))
    val q = out.writeStream.format("memory").queryName("st28")
      .outputMode("append").start()
    try {
      mem.addData((1L, at(0), "https://x.com/p?utm_source=a&id=1"))
      q.processAllAvailable()
      // same canonical URL, different tracking garbage → dropped
      mem.addData((2L, at(1), "https://x.com/p?id=1&gclid=z"),
        (3L, at(2), "https://x.com/q?id=2"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT feed_id, normalized FROM st28").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kept == Set((1L, "https://x.com/p?id=1"), (3L, "https://x.com/q?id=2")),
        "the cross-batch duplicate registration is dropped; first arrival survives")
    } finally q.stop()
  }

  test("composition: duplicate groups, cross-encoding dedup and every action at sf0.001") {
    val out = FeedNormalize.ur01(spark, sfDir).cache()
    val actions = out.select("action").distinct().collect().map(_.getString(0)).toSet
    assert(actions.contains("deleted") && actions.contains("updated"))
    // the %2f / %2F residues normalize identically → cross-encoding groups exist
    val enc = out.filter(col("normalized").contains("%2F") && col("action") === "deleted")
    assert(enc.count() > 0, "dedup collapses the case-variant percent encodings")
    assert(out.filter(col("normalized").contains("%2f")).count() == 0,
      "no lowercase hex survives normalization")
    out.unpersist()
  }
}
