package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.{microRatio, microRound}

/** Pulse topic selection — recap-worker's role-driven pick of the day's
  * publishable topics (recap-worker/recap-worker/src/pipeline/pulse/
  * selection.rs):
  *
  *  - three ROLES in priority order — NeedToKnow, Trend, Serendipity —
  *    each with its own weight vector over (impact, burst, novelty,
  *    recency) (types.rs:149/:161/:173 — impact-heavy, burst-heavy,
  *    novelty-heavy), a shared min-score threshold (0.3,
  *    config.rs:221), and NO cluster reuse across roles (:191's
  *    used_cluster_ids);
  *  - the quality-tier fallback LADDER (:100
  *    select_topics_with_fallback): Ok-only first; if that can't fill
  *    the target, admit Caution (level 1); then all tiers (level 2,
  *    accepted at ≥ 2 topics); a single topic is Quiet Day Mode
  *    (level 4); none is level 5, an empty cluster set level 6.
  *    (The reference's level-3 branch re-tests the level-2 condition
  *    after it already returned — dead code, preserved here only in
  *    the level numbering.)
  *
  * The reference's greedy argmax runs over a Vec in input order; ties
  * here break by cluster_id — the documented determinization. The
  * per-role greedy is expressed DECLARATIVELY: three chained
  * argmax-with-anti-join steps over the cluster-stats frame, which is
  * already an aggregate (≪ corpus) — no driver loop, no collect.
  *
  * Scale: everything downstream of km07's cluster frame runs on
  * |clusters| rows; the level choice is a one-row scalar frame
  * broadcast into the tagged union of the three candidate pick sets.
  */
object PulseSelect {

  /** (impact, burst, novelty, recency) weights per role. */
  val Roles: Seq[(String, (Double, Double, Double, Double))] = Seq(
    "need_to_know" -> ((0.50, 0.15, 0.10, 0.25)),
    "trend"        -> ((0.20, 0.50, 0.10, 0.20)),
    "serendipity"  -> ((0.15, 0.15, 0.50, 0.20)))

  val MinScoreThreshold = 0.3
  val MaxTopics = 3

  /** Composed cluster scores over the km07 quality frame: impact =
    * size share of the largest cluster, burst = entity consistency,
    * novelty = 1 − cohesion, recency = a deterministic id-derived
    * phase (the composition stand-in for article timestamps).
    */
  def scoredClusters(quality: DataFrame): DataFrame = {
    val maxN = quality.agg(max("n").as("max_n"))
    quality.crossJoin(broadcast(maxN))
      .select(col("cluster_id"), col("tier"),
        microRatio(col("n"), col("max_n"), 4).as("impact"),
        col("entity_consistency").as("burst"),
        microRound(lit(1.0) - col("cohesion"), 4).as("novelty"),
        microRatio(pmod(col("cluster_id") * 37, lit(100)), lit(100), 4).as("recency"))
  }

  private def roleScore(w: (Double, Double, Double, Double)): Column =
    col("impact") * w._1 + col("burst") * w._2 +
      col("novelty") * w._3 + col("recency") * w._4

  /** One level of select_topics: role-sequenced greedy argmax with
    * exclusion over the tier-eligible clusters.
    */
  private def picksAtTier(clusters: DataFrame, tiers: Seq[String]): DataFrame = {
    val elig = clusters.filter(col("tier").isin(tiers: _*))
    val (selected, _) = Roles.foldLeft((Seq.empty[DataFrame], elig)) {
      case ((acc, remaining), (role, w)) =>
        val pick = remaining
          .withColumn("score", roleScore(w))
          .filter(col("score") >= MinScoreThreshold)
          .orderBy(col("score").desc, col("cluster_id").asc)
          .limit(1)
          .select(col("cluster_id"), lit(role).as("role"), col("score"),
            (col("impact") * w._1).as("impact_score"),
            (col("burst") * w._2).as("burst_score"),
            (col("novelty") * w._3).as("novelty_score"),
            (col("recency") * w._4).as("recency_score"))
        val rest = remaining.join(pick.select("cluster_id"), Seq("cluster_id"), "left_anti")
        (acc :+ pick, rest)
    }
    selected.reduce(_ unionByName _)
  }

  /** The fallback ladder over the three tier levels, as one plan.
    *
    * The scored cluster frame MATERIALIZES first (the centroid-collect
    * pattern — it is a bounded aggregate, ≤ |clusters| rows): the
    * ladder reads it from nine argmax/anti-join branches plus the
    * level counts, and without materialization each branch re-ran the
    * upstream quality DAG — the first cut re-computed km07's pairwise
    * joins ~15× and benched 14.7 s where the quality frame itself
    * costs 0.9 s.
    */
  def selectTopicsOn(quality0: DataFrame): DataFrame = {
    // quality materializes FIRST (scoredClusters reads it from the
    // max-n branch AND the scan), then the scored frame once more
    val qRows = quality0.collect()
    val quality = quality0.sparkSession.createDataFrame(
      java.util.Arrays.asList(qRows: _*), quality0.schema)
    val scored0 = scoredClusters(quality)
    val rows = scored0.collect()
    val clusters = scored0.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), scored0.schema)
    val l0 = picksAtTier(clusters, Seq("Ok")).withColumn("lvl", lit(0))
    val l1 = picksAtTier(clusters, Seq("Ok", "Caution")).withColumn("lvl", lit(1))
    val l2 = picksAtTier(clusters, Seq("Ok", "Caution", "Ng")).withColumn("lvl", lit(2))
    val counts = l0.agg(count(lit(1)).as("n0"))
      .crossJoin(broadcast(l1.agg(count(lit(1)).as("n1"))))
      .crossJoin(broadcast(l2.agg(count(lit(1)).as("n2"))))
      .crossJoin(broadcast(clusters.agg(count(lit(1)).as("n_clusters"))))
      .select(
        when(col("n0") >= MaxTopics, 0)
          .when(col("n1") >= MaxTopics, 1)
          .when(col("n2") >= 2, 2)
          .when(col("n2") === 1, 4)
          .when(col("n_clusters") === 0, 6)
          .otherwise(5).as("fallback_level"))
    l0.unionByName(l1).unionByName(l2)
      .crossJoin(broadcast(counts))
      // level 4 (Quiet Day) emits the all-tier pick set
      .filter(col("lvl") === col("fallback_level") ||
        (col("lvl") === 2 && col("fallback_level") === 4))
      .drop("lvl")
  }

  def pulse01(s: SparkSession, dir: String): DataFrame =
    selectTopicsOn(ClusterQuality.km07(s, dir))
}
