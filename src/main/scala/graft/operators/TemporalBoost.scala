package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** rag12: the morning-letter temporal boost —
  * rag-orchestrator/internal/usecase/morning_letter_usecase.go
  * applyTemporalBoost (:252-271) with temporal_boost_config.go
  * GetBoostFactor (:31-43), the recency re-rank the morning-letter
  * flow applies to retrieved contexts before topic synthesis
  * (Execute :97 calls it on every run). ev18 maps the recap-worker
  * DECAY ranking; this is the rag-orchestrator BANDED variant with
  * its own empirically-pinned constants:
  *
  *  - bands on hours-since-publication, boundaries INCLUSIVE (:33-41
  *    `<=`): ≤ 6h → ×1.3, ≤ 12h → ×1.15, ≤ 18h → ×1.05, else ×1.0.
  *  - the context's PublishedAt is an RFC3339 STRING (allocate.go
  *    formats it); a parse failure SKIPS the boost entirely (:255-257
  *    `continue` — score untouched, row still re-sorted). Composed
  *    here as the empty-string class.
  *  - scores multiply in place and the list re-sorts by boosted score
  *    (Go's unstable sort.Slice — ties pinned to chunk_id ASC, the
  *    hd01 convention).
  *
  * hours = (now − published)/3600 in exact double arithmetic off
  * integer microseconds; composed offsets are half-hours so the ≤ 6
  * boundary lands exactly. The reference multiplies float32 by
  * float32; both engines here run the identical double product (the
  * standing fz01 float32-in-double convention).
  *
  * Scale: a stateless banded projection + one query-partitioned rank
  * window.
  */
object TemporalBoost {

  val Boost6h = 1.3
  val Boost12h = 1.15
  val Boost18h = 1.05

  /** GetBoostFactor (:31-43) over an hours column (null = unparsable
    * PublishedAt → the :255 skip, factor 1 with hours surfaced null).
    */
  def boostFactor(hours: Column): Column =
    when(hours.isNull, 1.0)
      .when(hours <= 6.0, Boost6h)
      .when(hours <= 12.0, Boost12h)
      .when(hours <= 18.0, Boost18h)
      .otherwise(1.0)

  /** The boost + re-sort over (query_id, chunk_id, published_at
    * [string, RFC3339 or unparsable], score) with `now` as an epoch-
    * microsecond literal.
    */
  def boostOn(contexts: DataFrame, nowMicros: Long): DataFrame = {
    // try_to_timestamp: a parse failure is DATA here (the :255 skip),
    // not an error
    val pubTs = expr(
      "try_to_timestamp(published_at, \"yyyy-MM-dd'T'HH:mm:ssXXX\")")
    val hours = (lit(nowMicros) - unix_micros(pubTs)).cast("double") / 3.6e9
    contexts
      .withColumn("hours_since", hours)
      .withColumn("boost", boostFactor(col("hours_since")))
      .withColumn("boosted_score", col("score") * col("boost"))
      .withColumn("position", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("boosted_score").desc, col("chunk_id"))))
      .select(col("query_id"), col("position"), col("chunk_id"),
        col("hours_since"), col("boost"), col("boosted_score"))
      .orderBy("query_id", "position")
  }

  /** Composed contexts: the %100 queries over 6 id-neighbors;
    * published half-hour offsets sweep the bands (offset 12 lands
    * exactly on the 6h boundary), the %17 neighbors carry an
    * unparsable PublishedAt (the skip class), scores are 64ths.
    */
  def rag12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val NowMicros = 1767225600000000L // the FixedEpoch convention
    val d = Tables.documents(s, dir).select("doc_id")
    val contexts = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"))
      .crossJoin((1 to 6).toDF("rank0"))
      .select(col("query_id"),
        (col("query_id") + col("rank0")).as("chunk_id"), col("rank0"))
      .withColumn("published_at",
        when(col("chunk_id") % 17 === 0, lit("not-a-timestamp"))
          .otherwise(date_format(
            timestamp_micros(lit(NowMicros) - (col("chunk_id") % 40) * 1800000000L),
            "yyyy-MM-dd'T'HH:mm:ssXXX")))
      .withColumn("score",
        ((lit(64) - col("rank0") * 3).cast("double") / 64.0))
    boostOn(contexts.select("query_id", "chunk_id", "published_at", "score"),
      NowMicros)
  }

  val rag12OracleSql: String =
    """WITH d AS (SELECT doc_id FROM documents),
ctx AS (
  SELECT query_id, query_id + rank0 AS chunk_id, rank0,
         CASE WHEN (query_id + rank0) % 17 = 0 THEN 'not-a-timestamp'
              ELSE strftime(make_timestamp(1767225600000000 - ((query_id + rank0) % 40) * 1800000000),
                            '%Y-%m-%dT%H:%M:%S+00:00') END AS published_at,
         CAST(64 - rank0 * 3 AS DOUBLE) / 64.0 AS score
  FROM (SELECT doc_id AS query_id, unnest(range(1, 7)) AS rank0
        FROM d WHERE doc_id % 100 = 0)),
b AS (
  SELECT query_id, chunk_id,
    CASE WHEN published_at = 'not-a-timestamp' THEN NULL
         ELSE CAST(1767225600000000 - epoch_us(strptime(published_at, '%Y-%m-%dT%H:%M:%S+00:00')) AS DOUBLE) / 3.6e9
    END AS hours_since,
    score
  FROM ctx),
bb AS (
  SELECT *,
    CASE WHEN hours_since IS NULL THEN CAST(1.0 AS DOUBLE)
         WHEN hours_since <= 6.0 THEN CAST(1.3 AS DOUBLE)
         WHEN hours_since <= 12.0 THEN CAST(1.15 AS DOUBLE)
         WHEN hours_since <= 18.0 THEN CAST(1.05 AS DOUBLE)
         ELSE CAST(1.0 AS DOUBLE) END AS boost
  FROM b)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score * boost DESC, chunk_id) AS position,
       chunk_id, hours_since, boost, score * boost AS boosted_score
FROM bb ORDER BY query_id, position"""
}
