package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ka01: the projection-audit drift verdict — alt-backend
  * orchestrator/usecase/knowledge_audit_usecase/usecase.go
  * RunProjectionAudit (:47-85) + verifyProjection (:88-147), the RPC
  * behind `altctl home audit` (the compute the round-15 altctl ledger
  * naming initially under-described as "renders read-model rows" —
  * corrected here: the drift gates are real server-side compute), over
  * knowledge-sovereign read_infra.go CompareProjections (:368-385) +
  * queryVersionStats (:393-402).
  *
  * Per audited projection version, against the HARDCODED "v1" baseline
  * (:90 — the reference always compares v1 → the requested version,
  * including v1 → v1 itself when v1 is audited):
  *
  *  - version stats (:394-396): COUNT(*), COALESCE(AVG(score), 0) and
  *    the empty-summary count — where "empty" is the TWO-state test
  *    summary_state = 'missing' OR summary_state = '' (:395), not a
  *    NULL check.
  *  - gate 1, item-count drift (:100-110): fires when from_count > 0
  *    and |to − from| / from > 0.05.
  *  - gate 2, score drift (:113-123): fires when from_avg > 0 and
  *    |to_avg − from_avg| / from_avg > 0.1.
  *  - gate 3, empty-rate drift (:126-137): fires when BOTH counts > 0
  *    and |to_empty/to_count − from_empty/from_count| > 0.05.
  *  - mismatch_count = fired gates (0-3). audit_id (uuid.New) and
  *    checked_at (wall clock) are omitted — nondeterministic by
  *    construction; details_json flattens to the drift columns the
  *    reference marshals into it (drift values surface ONLY when their
  *    gate evaluated, mirroring the guarded blocks).
  *
  * Cross-engine float safety: the composed scores are quarter-integers
  * (k/4 — dyadic rationals far below 2^53), so SUM/AVG are exact in
  * ANY summation order and the drift doubles are bit-identical in both
  * engines; the gates never depend on engine-specific rounding.
  *
  * Scale: one groupBy over the items scan (bounded version
  * cardinality), the v1 baseline row broadcast back — no window, no
  * join on the corpus.
  */
object KnowledgeAudit {

  /** Composed knowledge_home_items: (item id, projection_version,
    * score, summary_state). Versions split 3/7 + 3/7 + 1/7 so v2
    * matches v1 on count and score but drifts on empty rate (the %5
    * extra 'missing' class), while v3 drifts on count (1/7 vs 3/7)
    * and score (+30 shift); v3 shares v1's %11/%13 empty classes so
    * its rate difference stays whatever the subset sampling gives —
    * engine-identical either way, since every gate input is an exact
    * integer or dyadic double.
    */
  def composeItems(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val id = col("doc_id")
    val v = when(id % 7 <= 2, 1).when(id % 7 <= 5, 2).otherwise(3)
    val score = (id % 400).cast("double") / lit(4.0) +
      when(v === 3, lit(30.0)).otherwise(lit(0.0))
    val state =
      when(id % 11 === 0, "missing")
        .when(id % 13 === 0, "")
        .when(v === 2 && id % 5 === 0, "missing")
        .otherwise("ready")
    d.select(id.as("item_id"), v.as("projection_version"),
      score.as("score"), state.as("summary_state"))
  }

  /** The audit over any (projection_version, score, summary_state)
    * items frame: one verdict row per version present, each against
    * the v1 baseline.
    */
  def auditOn(items: DataFrame): DataFrame = {
    val stats = items.groupBy("projection_version")
      .agg(count(lit(1)).as("cnt"),
        coalesce(avg(col("score")), lit(0.0)).as("avg_score"),
        sum(when(col("summary_state") === "missing" ||
                 col("summary_state") === "", 1L).otherwise(0L)).as("empty_cnt"))
    val from = stats.filter(col("projection_version") === 1)
      .select(col("cnt").as("from_count"), col("avg_score").as("from_avg_score"),
        col("empty_cnt").as("from_empty_count"))
    val both = stats
      .select(col("projection_version").as("to_version"), col("cnt").as("to_count"),
        col("avg_score").as("to_avg_score"), col("empty_cnt").as("to_empty_count"))
      .crossJoin(broadcast(from))
    val countDrift = when(col("from_count") > 0,
      abs((col("to_count") - col("from_count")).cast("double")) / col("from_count"))
    val scoreDrift = when(col("from_avg_score") > 0,
      abs(col("to_avg_score") - col("from_avg_score")) / col("from_avg_score"))
    val fromRate = col("from_empty_count").cast("double") / col("from_count")
    val toRate = col("to_empty_count").cast("double") / col("to_count")
    val rateGateOn = col("from_count") > 0 && col("to_count") > 0
    val g1 = coalesce(countDrift > 0.05, lit(false))
    val g2 = coalesce(scoreDrift > 0.1, lit(false))
    val g3 = rateGateOn && abs(toRate - fromRate) > 0.05
    both.select(
      col("to_version"),
      col("from_count"), col("to_count"),
      col("from_avg_score"), col("to_avg_score"),
      col("from_empty_count"), col("to_empty_count"),
      countDrift.as("count_drift"),
      scoreDrift.as("score_drift"),
      when(rateGateOn, fromRate).as("from_empty_rate"),
      when(rateGateOn, toRate).as("to_empty_rate"),
      g1.cast("int").as("count_drift_fired"),
      g2.cast("int").as("score_drift_fired"),
      g3.cast("int").as("empty_rate_drift_fired"),
      (g1.cast("long") + g2.cast("long") + g3.cast("long")).as("mismatch_count"))
      .orderBy("to_version")
  }

  def ka01(s: SparkSession, dir: String): DataFrame =
    auditOn(composeItems(s, dir))

  val ka01OracleSql: String =
    """WITH items AS (
  SELECT doc_id AS item_id,
    CASE WHEN doc_id % 7 <= 2 THEN 1 WHEN doc_id % 7 <= 5 THEN 2 ELSE 3 END AS projection_version,
    CAST(doc_id % 400 AS DOUBLE) / 4.0 +
      CASE WHEN doc_id % 7 > 5 THEN 30.0 ELSE 0.0 END AS score,
    CASE WHEN doc_id % 11 = 0 THEN 'missing'
         WHEN doc_id % 13 = 0 THEN ''
         WHEN doc_id % 7 BETWEEN 3 AND 5 AND doc_id % 5 = 0 THEN 'missing'
         ELSE 'ready' END AS summary_state
  FROM documents),
stats AS (
  SELECT projection_version, count(*) AS cnt,
         coalesce(avg(score), 0) AS avg_score,
         CAST(sum(CASE WHEN summary_state = 'missing' OR summary_state = '' THEN 1 ELSE 0 END) AS BIGINT) AS empty_cnt
  FROM items GROUP BY 1),
f AS (SELECT cnt AS from_count, avg_score AS from_avg_score, empty_cnt AS from_empty_count
      FROM stats WHERE projection_version = 1),
b AS (SELECT s.projection_version AS to_version, s.cnt AS to_count,
             s.avg_score AS to_avg_score, s.empty_cnt AS to_empty_count,
             f.from_count, f.from_avg_score, f.from_empty_count
      FROM stats s CROSS JOIN f),
d AS (SELECT *,
        CASE WHEN from_count > 0 THEN abs(CAST(to_count - from_count AS DOUBLE)) / from_count END AS count_drift,
        CASE WHEN from_avg_score > 0 THEN abs(to_avg_score - from_avg_score) / from_avg_score END AS score_drift,
        CASE WHEN from_count > 0 AND to_count > 0 THEN CAST(from_empty_count AS DOUBLE) / from_count END AS from_empty_rate,
        CASE WHEN from_count > 0 AND to_count > 0 THEN CAST(to_empty_count AS DOUBLE) / to_count END AS to_empty_rate
      FROM b)
SELECT to_version, from_count, to_count, from_avg_score, to_avg_score,
       from_empty_count, to_empty_count, count_drift, score_drift,
       from_empty_rate, to_empty_rate,
       CAST(coalesce(count_drift > 0.05, false) AS INTEGER) AS count_drift_fired,
       CAST(coalesce(score_drift > 0.1, false) AS INTEGER) AS score_drift_fired,
       CAST(coalesce(abs(to_empty_rate - from_empty_rate) > 0.05, false) AS INTEGER) AS empty_rate_drift_fired,
       CAST(coalesce(count_drift > 0.05, false) AS BIGINT)
         + CAST(coalesce(score_drift > 0.1, false) AS BIGINT)
         + CAST(coalesce(abs(to_empty_rate - from_empty_rate) > 0.05, false) AS BIGINT) AS mismatch_count
FROM d ORDER BY to_version"""
}
