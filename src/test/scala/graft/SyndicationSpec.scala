package graft

import org.apache.spark.sql.functions._
import graft.operators.Syndication

/** Syndication-removal semantics: canonical grouping with fragment
  * normalization and fallback order, wire-host suffix matching, and
  * the stage-3 sequential leader clustering (order dependence,
  * first-original attribution, empty-title edge).
  */
class SyndicationSpec extends SparkSpec {
  import spark.implicits._

  test("stage 1+2: canonical-first grouping, og fallback, raw-source fallback, wire hosts") {
    val arts = Seq(
      // 1 and 2 share a canonical up to the #fragment → 2 removed
      (1L, 1L, "https://techcrunch.com/a/1", "https://c.ex/s/9#top", null),
      (2L, 2L, "https://www.nytimes.com/a/2", "https://c.ex/s/9#bottom", null),
      // 3 falls back to og_url, matching nobody
      (3L, 3L, "https://techcrunch.com/a/3", null, "https://og.ex/o/1"),
      // 4 has neither → RAW source key (not normalized)
      (4L, 4L, "https://techcrunch.com/a/4", null, null),
      // 5 survives stage 1 but sits on a wire subdomain
      (5L, 5L, "https://feeds.reuters.com:8080/x?y#z", null, null),
      // 6: wire host but a canonical DUP of 1 → canonical_match wins
      // (stage 1 runs before stage 2)
      (6L, 6L, "https://apnews.com/a/6", "https://c.ex/s/9", null))
      .toDF("id", "pos", "source_url", "canonical_url", "og_url")
    val out = Syndication.syndicationOn(arts)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(out(1L) == (("kept", None)))
    assert(out(2L) == (("canonical_match", Some(1L))), "fragment stripped → same group")
    assert(out(3L) == (("kept", None)))
    assert(out(4L) == (("kept", None)))
    assert(out(5L) == (("wire_source", None)), "subdomain + port + query still match")
    assert(out(6L) == (("canonical_match", Some(1L))), "stage order: canonical beats wire")
  }

  test("stage 3 leader clustering: sequential absorption, chain rule, first-original attribution") {
    val titled = Seq(
      // A(1) absorbs B(2); C(3) is similar to B but NOT to A → C
      // becomes its OWN original (B can't absorb once removed)
      (10L, 1L, 1L, "Apple releases new iPhone 15 Pro today"),
      (10L, 2L, 2L, "Apple releases new iPhone 15 Pro Max today maybe"),
      (10L, 3L, 3L, "Pro Max today maybe with extras and accessories pack"),
      // empty titles: both empty → similarity 1.0 → second absorbed
      (20L, 1L, 21L, ""),
      (20L, 2L, 22L, ""),
      // one empty vs non-empty → 0.0 → both originals
      (30L, 1L, 31L, ""),
      (30L, 2L, 32L, "real title here"))
      .toDF("cluster_id", "pos", "id", "title")
    val out = Syndication.titleLeaderClusters(titled, threshold = 0.4)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getLong(0), x.getLong(1)))))).toMap
    val (orig10, rem10) = out(10L)
    assert(orig10 == Seq(1L, 3L), s"A keeps, C re-emerges: $orig10")
    assert(rem10 == Seq((2L, 1L)), "B absorbed by the first original A")
    assert(out(20L)._1 == Seq(21L) && out(20L)._2 == Seq((22L, 21L)),
      "both-empty titles are identical (1.0)")
    assert(out(30L)._1 == Seq(31L, 32L) && out(30L)._2.isEmpty,
      "empty vs non-empty scores 0")
  }

  test("word bigrams: punctuation trimmed per word, case-folded, set semantics") {
    val one = Seq((1L, 1L, 1L, "Hello, World! hello WORLD again"))
      .toDF("cluster_id", "pos", "id", "title")
    // bigrams of [hello, world, hello, world, again]:
    // {hello world, world hello, world again} — duplicates collapse
    val bg = Syndication.titleLeaderClusters(one, threshold = 2.0)
      .select(explode(col("original_ids"))).count()
    assert(bg == 1) // smoke: pipeline runs; exact set checked via similarity below
    val pair = Seq(
      (9L, 1L, 1L, "Hello, World!"),
      (9L, 2L, 2L, "hello world"))
      .toDF("cluster_id", "pos", "id", "title")
    val r = Syndication.titleLeaderClusters(pair, threshold = 0.99).collect()(0)
    assert(r.getSeq[Long](1) == Seq(1L), "punctuation+case normalize to identical bigrams")
  }
}
