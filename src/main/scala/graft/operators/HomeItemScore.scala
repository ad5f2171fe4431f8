package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** es12: the Knowledge Home item-score FOLD — knowledge-sovereign
  * usecase/knowledge_home_projector/projector.go, the score_op merge
  * semantics (:52-68 + the homeItemWrite doc :262-268) applied across
  * the per-item event sequence:
  *
  *  - ArticleCreated (:446-481) writes the time-invariant
  *    baseQualityScore 0.5 with scoreOpMax (the doc records WHY it is
  *    flat: the old (occurredAt−publishedAt) decay froze staleness
  *    into the GREATEST merge forever);
  *  - SummaryVersionCreated (:565-592) writes 0.8 max ("boost for
  *    having a summary");
  *  - TagSetVersionCreated (:623-642) writes 0.7 max;
  *  - HomeItemOpened (:670-690) writes 0.1 with scoreOpSet —
  *    AUTHORITATIVE overwrite, because "a floor merge could never
  *    lower the score" (the suppressed-resurfacing bug the :265-267
  *    comment documents);
  *  - folds that never touch score (supersede/dismiss) leave it
  *    untouched (the "" op).
  *
  * The stored score therefore evolves as: max-ops ratchet upward,
  * a set-op overwrites, later max-ops ratchet from the overwritten
  * value. Re-expressed ORDER-FREE: final = max(score of the LAST
  * set-op event, every max-op score AFTER it) — or max over all
  * max-ops when no set-op exists; event order is the projector's
  * feed order, (occurred_at, event_id).
  *
  * Composition maps the test event types onto the folds: view →
  * ArticleCreated, click → SummaryVersionCreated, signup →
  * TagSetVersionCreated, purchase → HomeItemOpened (the set-op),
  * error → a no-score fold (present in the stream, ignored by the
  * score — rows with zero score events emit nothing, exactly as an
  * item no fold ever wrote does not exist).
  *
  * Scale: one conditional agg finds each key's last set-op event
  * (struct-max), one map-side-combined max over the post-set max-ops
  * joins back on the bounded key frame — no window, no sequential
  * fold.
  */
object HomeItemScore {

  val BaseQualityScore = 0.5
  val SummaryScore = 0.8
  val TagSetScore = 0.7
  val OpenedScore = 0.1

  /** The fold over any (user_id, item_key, ts, event_id, score, op)
    * frame where op ∈ {'max', 'set'} (other rows must be pre-filtered
    * — the "" op never reaches the score).
    */
  def scoreFoldOn(ev: DataFrame): DataFrame = {
    val keyed = ev.withColumn("ord", struct(col("ts"), col("event_id")))
    // last set-op per key (with its score riding the struct-max; ts +
    // event_id are unique so the score never decides the max)
    val agg1 = keyed.groupBy("user_id", "item_key")
      .agg(
        max(when(col("op") === "set",
          struct(col("ts"), col("event_id"), col("score")))).as("ls"),
        count(lit(1)).as("n_score_events"),
        max(col("ord")).as("last_ord"))
    // max-ops after the last set (all of them when no set exists)
    val mAfter = keyed.filter(col("op") === "max")
      .join(agg1.select(col("user_id"), col("item_key"),
        col("ls.ts").as("ls_ts"), col("ls.event_id").as("ls_eid")),
        Seq("user_id", "item_key"))
      .filter(col("ls_ts").isNull ||
        struct(col("ts"), col("event_id")) > struct(col("ls_ts"), col("ls_eid")))
      .groupBy("user_id", "item_key")
      .agg(max(col("score")).as("m_after"))
    agg1.join(mAfter, Seq("user_id", "item_key"), "left")
      .select(col("user_id"), col("item_key"),
        greatest(coalesce(col("ls.score"), lit(Double.MinValue)),
          coalesce(col("m_after"), lit(Double.MinValue))).as("score"),
        col("ls.score").isNotNull.cast("int").as("suppressed"),
        col("n_score_events"),
        col("last_ord.ts").as("last_event_at"))
      .orderBy("user_id", "item_key")
  }

  def es12(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val k = coalesce(
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"), lit(0))
    val base = e.select(
      coalesce(col("user_id"), lit(0L)).as("user_id"),
      concat(lit("item-"), pmod(k, lit(20))).as("item_key"),
      col("ts"), col("event_id"),
      when(col("event_type") === "view", BaseQualityScore)
        .when(col("event_type") === "click", SummaryScore)
        .when(col("event_type") === "signup", TagSetScore)
        .when(col("event_type") === "purchase", OpenedScore).as("score"),
      when(col("event_type") === "purchase", "set")
        .when(col("event_type").isin("view", "click", "signup"), "max")
        .as("op"))
      .filter(col("op").isNotNull)
    scoreFoldOn(base)
  }

  val es12OracleSql: String =
    """WITH e AS (
  SELECT coalesce(user_id, 0) AS user_id,
    'item-' || (coalesce(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER), 0) % 20) AS item_key,
    CAST(ts AS TIMESTAMP) AS ts, event_id,
    CASE event_type WHEN 'view' THEN 0.5 WHEN 'click' THEN 0.8
         WHEN 'signup' THEN 0.7 WHEN 'purchase' THEN 0.1 END AS score,
    CASE WHEN event_type = 'purchase' THEN 'set'
         WHEN event_type IN ('view', 'click', 'signup') THEN 'max' END AS op
  FROM events
  WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
a1 AS (
  SELECT user_id, item_key,
    max(CASE WHEN op = 'set' THEN struct_pack(ts := ts, eid := event_id, sc := score) END) AS ls,
    CAST(count(*) AS BIGINT) AS n_score_events,
    max(struct_pack(ts := ts, eid := event_id)) AS last_ord
  FROM e GROUP BY 1, 2),
ma AS (
  SELECT e.user_id, e.item_key, max(e.score) AS m_after
  FROM e JOIN a1 ON a1.user_id = e.user_id AND a1.item_key = e.item_key
  WHERE e.op = 'max'
    AND (a1.ls IS NULL OR struct_pack(ts := e.ts, eid := e.event_id)
         > struct_pack(ts := a1.ls.ts, eid := a1.ls.eid))
  GROUP BY 1, 2)
SELECT a1.user_id, a1.item_key,
  greatest(coalesce(a1.ls.sc, -1e308), coalesce(ma.m_after, -1e308)) AS score,
  CAST(a1.ls IS NOT NULL AS INTEGER) AS suppressed,
  a1.n_score_events,
  a1.last_ord.ts AS last_event_at
FROM a1 LEFT JOIN ma ON ma.user_id = a1.user_id AND ma.item_key = a1.item_key
ORDER BY a1.user_id, a1.item_key"""
}
