package graft

import graft.operators.TagVote
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Tag-vote labeler replay: decide_genre (collect_data.py:160) on
  * hand tag lists — majority, the ≥ 0.5 acceptance edge, the
  * Counter first-insertion tie order, unmapped-tag dilution, and the
  * (None, 0.0) no-votes row.
  */
class TagVoteSpec extends SparkSpec {
  import spark.implicits._

  private def tags(rows: (Long, Int, String)*): DataFrame =
    rows.toSeq.toDF("item_id", "pos", "tag")

  private def one(df: DataFrame): (Option[String], Double) = {
    val r = df.collect().head
    (Option(r.getString(1)), r.getDouble(2))
  }

  test("majority vote with confidence = top share of MAPPED votes (:179)") {
    // python+rust vote software_dev, music votes music_audio → 2/3
    val r = one(TagVote.decideGenresOn(tags(
      (1L, 0, "python"), (1L, 1, "rust"), (1L, 2, "music"))))
    assert(r == ((Some("software_dev"), 0.666667)))
    // unmapped tags cast no vote and do NOT dilute (:172)
    val r2 = one(TagVote.decideGenresOn(tags(
      (2L, 0, "python"), (2L, 1, "zz-unknown"), (2L, 2, "also-unknown"))))
    assert(r2 == ((Some("software_dev"), 1.0)))
  }

  test("exactly 0.5 ACCEPTS, with the Counter first-insertion tie order (:183-189)") {
    // 1-1 split: the genre whose vote came FIRST wins at 0.5
    val a = one(TagVote.decideGenresOn(tags((1L, 0, "python"), (1L, 1, "music"))))
    assert(a == ((Some("software_dev"), 0.5)))
    val b = one(TagVote.decideGenresOn(tags((2L, 0, "music"), (2L, 1, "python"))))
    assert(b == ((Some("music_audio"), 0.5)))
  }

  test("below 0.5 returns None but KEEPS the top confidence (:191)") {
    val r = one(TagVote.decideGenresOn(tags(
      (1L, 0, "python"), (1L, 1, "music"), (1L, 2, "sports"))))
    assert(r == ((None, 0.333333)))
  }

  test("tags lowercase before the lookup (:172 tag.lower())") {
    assert(one(TagVote.decideGenresOn(tags((1L, 0, "PYTHON")))) ==
      ((Some("software_dev"), 1.0)))
  }

  test("composed run: vote-less items emit (None, 0.0); everything else labels or abstains") {
    val out = TagVote.td02(spark, sfDir).persist()
    val novote = out.filter(pmod(col("item_id"), lit(19)) === 0)
    assert(novote.count() > 0)
    assert(novote.filter(col("genre").isNotNull || col("confidence") =!= 0.0).count() == 0,
      "all-unmapped items keep the (None, 0.0) early return (:168)")
    assert(out.count() ==
      TagVote.composeTags(spark, sfDir).select("item_id").distinct().count(),
      "one row per item — the labeler never drops items")
    assert(out.filter(col("genre").isNotNull).count() > 0)
  }
}
