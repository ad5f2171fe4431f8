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

  // ---- kh02: the ranked Knowledge Home read (read_projections.go) ----

  /** kh02: GetKnowledgeHomeItems' ranked list —
    * sovereign_db/read_projections.go (:93-193) over
    * sql_fragments.go homeItemRankScoreSQL (:37-39), the read model
    * kh01's lens visibility feeds. Quirks, each pinned:
    *
    *  - rank_score = score / (1 + GREATEST(age/86400, 0)) — the
    *    READ-TIME hyperbolic day-decay of the STORED time-invariant
    *    score (es12's fold output); deliberately not a stored column
    *    (sql_fragments.go:11-19 records the frozen-ranking bug:
    *    baking the decay into the projector's GREATEST-merged write
    *    froze staleness forever). Age falls back to generated_at when
    *    published_at is unknown (:18-19); the GREATEST floor keeps
    *    future-dated publishes at decay 0. The reference's
    *    bare-integer-literal discipline (:31-36, numeric-vs-float8
    *    Postgres typing) becomes exact integer microseconds over
    *    86400e6 here.
    *  - ORDER BY rank_score DESC, COALESCE(published_at,
    *    '-infinity') DESC, item_key DESC (:192) — undated rows sort
    *    LAST within a rank tie.
    *  - keyset pagination anchors "now" ONCE per pagination session
    *    (:96-105: decay strictly shrinks, so a continuation page that
    *    re-evaluated now() would watch the boundary row's rank drop
    *    below its own cursor value and re-emit it forever — the
    *    each_key_duplicate bug). The batch form holds one asOf for
    *    the whole frame BY CONSTRUCTION, which is exactly the
    *    invariant; pages are then the keyset-equivalent
    *    row_number/pageSize split. The spec demonstrates the quirk:
    *    a drifted anchor re-admits the boundary row.
    *  - dismissed rows are excluded at read (:141 dismissed_at IS
    *    NULL; the composed %13 class), matching kh01's gate.
    *
    * Scale: es12's fold + one scalar asOf broadcast + one
    * user-partitioned rank window; the decayed score is a scalar
    * projection (never stored, computed in the scan).
    */
  def rankedHomeOn(items: DataFrame, asOfMicros: Long,
                   pageSize: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val age = (lit(asOfMicros) -
      coalesce(col("pub_us"), col("gen_us"))).cast("double") / 86400e6
    val ranked = items
      .filter(!col("dismissed"))
      .withColumn("rank_score", col("score") / (lit(1.0) + greatest(age, lit(0.0))))
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("rank_score").desc,
          coalesce(col("pub_us"), lit(Long.MinValue)).desc, col("item_key").desc)))
    ranked.select(col("user_id"), col("item_key"), col("score"),
      col("rank_score"),
      (col("pub_us").isNull).cast("int").as("undated"),
      (((col("rn") - 1) / pageSize) + 1).cast("int").as("page"),
      (((col("rn") - 1) % pageSize) + 1).cast("int").as("pos_in_page"))
      .orderBy("user_id", "page", "pos_in_page")
  }

  def kh02(s: SparkSession, dir: String): DataFrame = {
    val scores = es12(s, dir)
    val n = regexp_extract(col("item_key"), "([0-9]+)$", 1).cast("int")
    val genUs = unix_micros(col("last_event_at"))
    val items = scores.select(col("user_id"), col("item_key"), col("score"),
      genUs.as("gen_us"),
      when(n % 7 === 3, lit(null).cast("long"))
        .otherwise(genUs - (n * 7 % 50).cast("long") * 3600000000L).as("pub_us"),
      (pmod(col("user_id") + n, lit(13)) === 0).as("dismissed"))
    // deterministic anchor: one hour past the corpus tip (es08's
    // deterministic-now convention), broadcast as a literal via the
    // scalar agg
    val asOf = items.agg(max(col("gen_us"))).head().getLong(0) + 3600000000L
    rankedHomeOn(items, asOf)
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

  /** kh02 mirror over the es12 chain. */
  val kh02OracleSql: String =
    s"""WITH base AS ($es12OracleSql),
items AS (
  SELECT user_id, item_key, score,
    epoch_us(last_event_at) AS gen_us,
    CASE WHEN CAST(regexp_extract(item_key, '([0-9]+)$$', 1) AS INTEGER) % 7 = 3 THEN NULL
         ELSE epoch_us(last_event_at)
              - CAST((CAST(regexp_extract(item_key, '([0-9]+)$$', 1) AS INTEGER) * 7 % 50) AS BIGINT) * 3600000000 END AS pub_us,
    ((user_id + CAST(regexp_extract(item_key, '([0-9]+)$$', 1) AS INTEGER)) % 13 = 0) AS dismissed
  FROM base),
anchor AS (SELECT max(gen_us) + 3600000000 AS as_of FROM items),
ranked AS (
  SELECT i.user_id, i.item_key, i.score,
    i.score / (1.0 + greatest(CAST(a.as_of - coalesce(i.pub_us, i.gen_us) AS DOUBLE) / 86400e6, 0.0)) AS rank_score,
    CAST(i.pub_us IS NULL AS INTEGER) AS undated,
    row_number() OVER (PARTITION BY i.user_id
      ORDER BY i.score / (1.0 + greatest(CAST(a.as_of - coalesce(i.pub_us, i.gen_us) AS DOUBLE) / 86400e6, 0.0)) DESC,
               coalesce(i.pub_us, -9223372036854775808) DESC, i.item_key DESC) AS rn
  FROM items i CROSS JOIN anchor a
  WHERE NOT i.dismissed)
SELECT user_id, item_key, score, rank_score, undated,
       CAST((rn - 1) // 5 + 1 AS INTEGER) AS page,
       CAST((rn - 1) % 5 + 1 AS INTEGER) AS pos_in_page
FROM ranked ORDER BY user_id, page, pos_in_page"""

}
