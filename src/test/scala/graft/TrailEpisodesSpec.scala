package graft

import org.apache.spark.sql.functions._
import graft.operators.Trail

/** Rule-per-case pins for es11 (knowledge-sovereign
  * usecase/trail_episodes/trail_episodes.go Derive :54-108 +
  * usecase/tagclean tagclean.go Normalize :31-44): stage-1
  * same-article folding, stage-2 tag chaining with its exact
  * 2-shared-tag and 14-day gates, tag cleaning, union-find
  * transitivity, episode key/wear/ordering.
  */
class TrailEpisodesSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L // microseconds

  /** (user, item, verb, firstUs, lastUs, key, wear, tags) → episodes. */
  private def run(rows: Seq[(Long, String, String, Long, Long, String, String, Seq[String])]) =
    Trail.episodesOn(
      rows.toDF("user_id", "item_key", "verb", "f_us", "l_us",
        "footprint_key", "wear", "tags")
        .select(col("user_id"), col("item_key"), col("verb"),
          lit(1L).as("contact_count"),
          timestamp_micros(col("f_us")).as("first_ts"),
          timestamp_micros(col("l_us")).as("last_ts"),
          col("footprint_key"), col("wear"), col("tags")))
      .collect()

  // output layout: user_id, episode_rank, episode_key, episode_wear,
  //                position, footprint_key, item_key, verb,
  //                contact_count, first_ts, last_ts, wear
  private def epKey(r: org.apache.spark.sql.Row) = r.getString(2)

  test("stage 1: same-article footprints join one episode " +
       "unconditionally — no tags, any time gap (:122's groupByItem)") {
    val out = run(Seq(
      (1L, "a", "walked", 0L, 0L, "fp-1", "thin", Seq.empty),
      (1L, "a", "asked", 100 * Day, 100 * Day, "fp-2", "thin", Seq.empty)))
    assert(out.map(epKey).distinct.length == 1)
    assert(out.forall(epKey(_) == "ep:fp-1"), "keyed by the oldest member")
  }

  test("stage 2: two shared CLEANED tags within the window chain; one " +
       "shared tag does not (minSharedTags = 2, :32)") {
    val t0 = 1000L * Day
    val out = run(Seq(
      (1L, "a", "walked", t0, t0, "fp-1", "thin", Seq("rust", "spark")),
      (1L, "b", "walked", t0 + Day, t0 + Day, "fp-2", "thin", Seq("rust", "spark")),
      (1L, "c", "walked", t0 + Day, t0 + Day, "fp-3", "thin", Seq("rust", "scala"))))
    val byItem = out.map(r => r.getString(6) -> epKey(r)).toMap
    assert(byItem("a") == byItem("b"), "2 shared tags chain")
    assert(byItem("c") != byItem("a"), "1 shared tag stays separate")
  }

  test("junk tags never chain: a shared case-variant junkword, a " +
       "digit-only tag and a sub-2-rune tag are cleaned to nothing " +
       "(tagclean.Normalize) even when every item carries them") {
    val t0 = 1000L * Day
    val out = run(Seq(
      (1L, "a", "walked", t0, t0, "fp-1", "thin", Seq("Also", "42", "x", "topicA")),
      (1L, "b", "walked", t0, t0, "fp-2", "thin", Seq("ALSO", "42", "x", "topicA"))))
    assert(out.map(epKey).distinct.length == 2,
      "only topicA survives cleaning -> 1 shared tag -> no chain")
  }

  test("case and whitespace normalize before matching: 'Rust ' and " +
       "'rust' are the same cleaned tag") {
    val t0 = 1000L * Day
    val out = run(Seq(
      (1L, "a", "walked", t0, t0, "fp-1", "thin", Seq("Rust ", "Spark")),
      (1L, "b", "walked", t0, t0, "fp-2", "thin", Seq("rust", " spark"))))
    assert(out.map(epKey).distinct.length == 1)
  }

  test("the 14-day gap gate is INCLUSIVE on nearest contacts " +
       "(:170 gap <= tagChainWindow): exactly 14d chains, 14d+1us does " +
       "not; overlapping spans gap to zero (:186-197)") {
    val t0 = 1000L * Day
    val tags = Seq("rust", "spark")
    def pair(gapUs: Long) = run(Seq(
      (1L, "a", "walked", t0 - Day, t0, "fp-1", "thin", tags),
      (1L, "b", "walked", t0 + gapUs, t0 + gapUs + Day, "fp-2", "thin", tags)))
    assert(pair(14 * Day).map(epKey).distinct.length == 1, "exactly 14d chains")
    assert(pair(14 * Day + 1).map(epKey).distinct.length == 2, "14d+1us separates")
    // overlapping spans: b starts before a ends -> gap 0 regardless
    val out = run(Seq(
      (1L, "a", "walked", t0, t0 + 30 * Day, "fp-1", "thin", tags),
      (1L, "b", "walked", t0 + Day, t0 + 40 * Day, "fp-2", "thin", tags)))
    assert(out.map(epKey).distinct.length == 1)
  }

  test("union-find transitivity (:63-66): A~B and B~C merge all three " +
       "even when A and C alone are outside the window") {
    val t0 = 1000L * Day
    val tags = Seq("rust", "spark")
    val out = run(Seq(
      (1L, "a", "walked", t0, t0, "fp-1", "thin", tags),
      (1L, "b", "walked", t0 + 10 * Day, t0 + 10 * Day, "fp-2", "thin", tags),
      (1L, "c", "walked", t0 + 20 * Day, t0 + 20 * Day, "fp-3", "thin", tags)))
    assert(out.map(epKey).distinct.length == 1,
      "a-c gap is 20d > 14d, but the b bridge chains the component")
  }

  test("episode key = the OLDEST member by (effectiveFirst, " +
       "footprint_key) — :219-226's strict-replacement min; wear " +
       "escalates to the deepest member band (:228-235)") {
    val t0 = 1000L * Day
    val tags = Seq("rust", "spark")
    val out = run(Seq(
      (1L, "a", "walked", t0 + Day, t0 + 5 * Day, "fp-9", "worn", tags),
      (1L, "b", "walked", t0, t0 + 6 * Day, "fp-2", "deep", tags),
      (1L, "c", "walked", t0, t0 + 7 * Day, "fp-1", "thin", tags)))
    assert(out.forall(epKey(_) == "ep:fp-1"),
      "c and b tie on effectiveFirst; fp-1 < fp-2 wins the tie ASC")
    assert(out.forall(_.getString(3) == "deep"), "deepest band wins")
  }

  test("ordering: episodes rank newest-lead-first per user (:99-106), " +
       "footprints newest-first inside an episode (:205-210), ties by " +
       "key DESC") {
    val t0 = 1000L * Day
    val out = run(Seq(
      (1L, "a", "walked", t0, t0 + 2 * Day, "fp-1", "thin", Seq("solo1a", "solo1b")),
      (1L, "b", "walked", t0, t0 + 9 * Day, "fp-2", "thin", Seq("solo2a", "solo2b")),
      (1L, "b", "asked", t0, t0 + 8 * Day, "fp-3", "thin", Seq("solo2a", "solo2b"))))
    val first = out.filter(_.getInt(1) == 1)
    assert(first.forall(_.getString(6) == "b"),
      "b's episode leads at t0+9d and ranks 1")
    val bPos = out.filter(_.getString(6) == "b").map(r => r.getString(5) -> r.getInt(4)).toMap
    assert(bPos("fp-2") == 1 && bPos("fp-3") == 2, "newest contact first")
    assert(out.filter(_.getString(6) == "a").forall(_.getInt(1) == 2))
  }

  test("per-user isolation: identical tags on different users never " +
       "chain across users (the batch form computes every user in one " +
       "pass without cross-talk)") {
    val t0 = 1000L * Day
    val tags = Seq("rust", "spark")
    val out = run(Seq(
      (1L, "a", "walked", t0, t0, "fp-1", "thin", tags),
      (2L, "b", "walked", t0, t0, "fp-2", "thin", tags)))
    assert(out.map(epKey).distinct.length == 2)
  }

  test("es11 over the corpus: every es09 footprint appears exactly once, " +
       "episode ranks are dense per user, and chained multi-item " +
       "episodes exist (the composed mod-15 tag pairs)") {
    val fps = Trail.trailWear(spark, sfDir)
    val out = Trail.trailEpisodes(spark, sfDir)
    assert(out.count() == fps.count(), "one output row per footprint")
    val multiItem = out.groupBy("user_id", "episode_key")
      .agg(countDistinct("item_key").as("ni")).filter(col("ni") >= 2)
    assert(multiItem.count() > 0, "stage-2 chains fire on the corpus")
    val ranks = out.select("user_id", "episode_rank").distinct()
      .groupBy("user_id").agg(max("episode_rank").as("mx"), count(lit(1)).as("n"))
    assert(ranks.filter(col("mx") =!= col("n")).count() == 0, "dense ranks")
  }

  test("enforced premise: the 20-bit item-ordinal width of the node " +
       "encoding RAISES past the catalog bound instead of silently " +
       "colliding (user,item) nodes (episodeWindowRows bounds it in the " +
       "reference; here it is asserted)") {
    import spark.implicits._
    val ords = Seq((1L << 20) - 1, 1L << 20).toDF("ord")
    // the last in-width ordinal passes through unchanged
    assert(ords.filter(col("ord") < (1L << 20))
      .select(Trail.encodedOrd(col("ord"))).as[Long].head() == (1L << 20) - 1)
    val ex = intercept[Exception] {
      ords.select(Trail.encodedOrd(col("ord"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("es11 node encoding overflow")), ex.toString)
  }
}
