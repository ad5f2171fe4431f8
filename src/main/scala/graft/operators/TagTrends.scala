package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** tt01 — trending-tag surge detection (alt-backend orchestrator/
  * gateway/trending_tags_gateway/gateway.go:58 compute — "All trending
  * logic lives here in Go; SQL only fetches raw counts"):
  *
  *  - recent = per-tag DISTINCT article count over the last 7 days,
  *    baseline = the same count over the last 30 days (both windows
  *    anchored at now — the baseline INCLUDES the recent week, as the
  *    reference's two `since` fetches do);
  *  - tags under minRecentCount=3 drop (:80);
  *  - weekly average = baseline / 4.0 (:18 baselineWeeks — "30 days ≈
  *    4 weeks"), surge = recent / weeklyAvg with the zero-baseline
  *    branch surge = recent (:86 — dead when baseline ⊇ recent, live
  *    when history is purged; spec plants it);
  *  - gate surge ≥ 1.5 (:92), rank by surge (ties → tag ascending —
  *    the reference's sort.Slice is unstable on ties), top 20 (:17).
  *
  * The division chain mirrors the Go exactly — recent / (baseline/4.0),
  * two IEEE divisions, not the algebraic recent·4/baseline — so both
  * engines produce the identical double.
  *
  * The composed article-tag view: kh01's published-hour ramp over the
  * documents table, tags = (lang, source). "now" is the corpus max
  * (the es08 batch convention).
  *
  * Scale: two conditional distinct-counts out of ONE grouped
  * aggregation over one scan (the reference issues two queries; the
  * 7-day window is a subset predicate, so one pass computes both) —
  * the time predicates partition-prune at 100 TB; the surge
  * projection and TakeOrdered run on the |tags| frame.
  */
object TagTrends {

  /** The composed (article, tag, created_at) view: the kh01 hour ramp
    * plus a burst cohort (half the articles of two sources publish
    * inside the corpus' final week). A PURE uniform ramp never clears
    * a 1.5× weekly surge by construction (168h/(720h/4) ≈ 0.93); the
    * burst mass skews the recent/baseline mix so some tags genuinely
    * clear the gate at every SF (which tags varies with the SF's
    * doc_id spread — the oracle recomputes per SF).
    */
  def articleTags(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val ramp = lit(1700000000L) + pmod(d, lit(50000)) * 3600
    val burst = lit(1700000000L + 50000L * 3600) - pmod(d, lit(150)) * 3600
    Tables.documents(s, dir).select(
      d,
      explode(array(col("lang"), col("source"))).as("tag_name"),
      timestamp_seconds(
        when(col("source").isin("src1", "src5") && pmod(d, lit(2)) === 0, burst)
          .otherwise(ramp)).as("created_at"))
  }

  def trendingOn(tags: DataFrame, minRecentCount: Long = 3,
                 minSurgeRatio: Double = 1.5, limit: Int = 20): DataFrame = {
    val now = broadcast(tags.agg(max("created_at").as("now_ts")))
    val counted = tags.crossJoin(now)
      .withColumn("age_s", unix_timestamp(col("now_ts")) - unix_timestamp(col("created_at")))
      .filter(col("age_s") <= 30L * 86400)
      .groupBy("tag_name")
      .agg(
        count_distinct(when(col("age_s") <= 7L * 86400, col("doc_id"))).as("recent_count"),
        count_distinct(col("doc_id")).as("baseline_count"))
      .filter(col("recent_count") >= minRecentCount)
    counted
      .withColumn("surge_ratio",
        when(col("baseline_count") > 0,
          col("recent_count").cast("double") / (col("baseline_count").cast("double") / 4.0))
          .otherwise(col("recent_count").cast("double")))
      .filter(col("surge_ratio") >= minSurgeRatio)
      .select(col("tag_name"), col("recent_count"), col("surge_ratio"))
      .orderBy(col("surge_ratio").desc, col("tag_name").asc)
      .limit(limit)
  }

  def tt01(s: SparkSession, dir: String): DataFrame =
    trendingOn(articleTags(s, dir))
}
