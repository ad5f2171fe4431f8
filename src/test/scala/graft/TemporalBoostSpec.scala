package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalBoost

/** Rule-per-case pins for rag12 (rag-orchestrator
  * morning_letter_usecase.go applyTemporalBoost :252-271 +
  * temporal_boost_config.go GetBoostFactor :31-43).
  */
class TemporalBoostSpec extends SparkSpec {
  import spark.implicits._

  private val Now = 1767225600000000L
  private def at(hours: Double): String = {
    val us = Now - (hours * 3600 * 1000000L).toLong
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(us / 1000000L))
  }

  private def run(rows: Seq[(Long, Long, String, Double)]) =
    TemporalBoost.boostOn(
      rows.toDF("query_id", "chunk_id", "published_at", "score"), Now)
      .collect().map(r => r.getLong(2) -> r).toMap

  // layout: query_id, position, chunk_id, hours_since, boost, boosted_score

  test("band boundaries are INCLUSIVE (:33-41): exactly 6h takes the " +
       "1.3 boost, 6.5h drops to 1.15; likewise at 12 and 18") {
    val out = run(Seq(
      (1L, 1L, at(6.0), 0.5), (1L, 2L, at(6.5), 0.5),
      (1L, 3L, at(12.0), 0.5), (1L, 4L, at(12.5), 0.5),
      (1L, 5L, at(18.0), 0.5), (1L, 6L, at(18.5), 0.5)))
    assert(out(1L).getDouble(4) == 1.3 && out(2L).getDouble(4) == 1.15)
    assert(out(3L).getDouble(4) == 1.15 && out(4L).getDouble(4) == 1.05)
    assert(out(5L).getDouble(4) == 1.05 && out(6L).getDouble(4) == 1.0)
  }

  test("an unparsable PublishedAt SKIPS the boost (:255-257) — score " +
       "untouched, hours null, the row still re-sorts") {
    val out = run(Seq(
      (1L, 1L, "not a timestamp", 0.6), (1L, 2L, at(3.0), 0.5)))
    assert(out(1L).isNullAt(3) && out(1L).getDouble(4) == 1.0 &&
      out(1L).getDouble(5) == 0.6)
    // 0.5 * 1.3 = 0.65 > 0.6: the boosted row overtakes
    assert(out(2L).getInt(1) == 1 && out(1L).getInt(1) == 2)
  }

  test("re-sort is by BOOSTED score (:266-269): a fresher lower-scored " +
       "context overtakes a stale higher one when the boost flips them") {
    val out = run(Seq(
      (1L, 1L, at(30.0), 0.62), (1L, 2L, at(1.0), 0.5)))
    assert(out(2L).getInt(1) == 1, "0.5*1.3=0.65 beats 0.62*1.0")
  }

  test("rag12 over the corpus: dense positions, boosts only from the " +
       "band set, the %17 class unboosted with null hours") {
    val out = TemporalBoost.rag12(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set(1.0, 1.05, 1.15, 1.3)(r.getDouble(4))))
    assert(out.filter(_.getLong(2) % 17 == 0).forall(r =>
      r.isNullAt(3) && r.getDouble(4) == 1.0))
  }
}
