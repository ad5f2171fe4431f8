package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** rag10: RAG context-quota allocation —
  * rag-orchestrator/internal/usecase/retrieval/allocate.go Allocate
  * (:19-50), the stage that merges original-query and expanded-query
  * hits into the final context list (retrieve_context_usecase.go:137
  * wires the config quotas, default 5/5 per retrieval_config.go:137).
  * BOTH paths emitted under a `path` column:
  *
  *  - 'dynamic' (the default — config.go:54): SelectContextsDynamic
  *    (:53-96) appends ALL original hits (no per-source quota),
  *    then expanded hits not already seen by chunk id, sorts by score
  *    DESC and truncates to quotaOriginal+quotaExpanded. The
  *    reference's sort.Slice is UNSTABLE, so score ties are
  *    nondeterministic there; pinned here to (score DESC, chunk_id
  *    ASC) — the hd01 pin-where-nondeterministic convention (the
  *    composed scores are tie-free anyway).
  *  - 'legacy' (:98-144): original hits IN RANK ORDER up to
  *    quotaOriginal, then expanded in two passes — pass 1 takes
  *    non-Japanese titles (IsJapanese :157-167, the three ranges with
  *    the reference's own kanji END at U+9FAF, not U+9FFF) in rank
  *    order, pass 2 fills the remaining quota with anything unseen.
  *    The two passes collapse to ORDER BY (is_ja, rank): pass 1
  *    exhausts non-JA before any JA enters, both in rank order.
  *    QUIRK, pinned in spec: the seen set holds only SELECTED
  *    originals (:129 marks seen when added, and the quota break
  *    skips the add), so an original hit beyond quotaOriginal can
  *    re-enter through its expanded duplicate.
  *
  * Scale: both paths are rank windows partitioned by query over the
  * |queries|·k candidate frame (rag02's shape) — the anti-join
  * excluding seen originals is the only join, on (query, chunk_id).
  */
object ContextAllocate {

  val QuotaOriginal = 5
  val QuotaExpanded = 5

  /** IsJapanese (:157-167): hiragana / katakana / kanji ending at
    * U+9FAF — the reference's own truncated kanji range, kept.
    */
  def isJapanese(c: Column): Column =
    c.rlike("[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FAF]")

  /** Both allocation paths over (query_id, rank, chunk_id, title,
    * score) original and expanded frames.
    */
  def allocateOn(orig: DataFrame, exp: DataFrame,
                 quotaOriginal: Int = QuotaOriginal,
                 quotaExpanded: Int = QuotaExpanded): DataFrame = {
    // first occurrence wins within each source (the seen-map append)
    def dedup(df: DataFrame) = df.withColumn("_dd", row_number().over(
      Window.partitionBy("query_id", "chunk_id").orderBy("rank")))
      .filter(col("_dd") === 1).drop("_dd")
    val o = dedup(orig).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = dedup(exp)

    // dynamic: all originals + unseen expanded, score-desc cap
    val eNew = e.join(o.select("query_id", "chunk_id"), Seq("query_id", "chunk_id"),
      "left_anti")
    val cand = o.select(col("query_id"), col("chunk_id"), col("title"),
        col("score"), lit("original").as("source"))
      .unionByName(eNew.select(col("query_id"), col("chunk_id"), col("title"),
        col("score"), lit("expanded").as("source")))
    val dyn = cand.withColumn("position", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("chunk_id"))))
      .filter(col("position") <= quotaOriginal + quotaExpanded)
      .withColumn("path", lit("dynamic"))

    // legacy: rank-ordered originals up to quota...
    val oSel = o.withColumn("position", row_number().over(
        Window.partitionBy("query_id").orderBy("rank")))
      .filter(col("position") <= quotaOriginal)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oCnt = oSel.groupBy("query_id").agg(count(lit(1)).as("n_orig"))
    // ...then expanded excluding ONLY the selected originals (:129's
    // seen-on-add), non-JA pass before JA pass, both in rank order
    val eSel = e.join(oSel.select("query_id", "chunk_id"), Seq("query_id", "chunk_id"),
        "left_anti")
      .withColumn("ja", isJapanese(col("title")))
      .withColumn("_ern", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ja"), col("rank"))))
      .filter(col("_ern") <= quotaExpanded)
      .join(oCnt, Seq("query_id"), "left")
      .withColumn("position", coalesce(col("n_orig"), lit(0L)) + col("_ern"))
    val legacy = oSel.select(col("query_id"), col("chunk_id"), col("title"),
        col("score"), lit("original").as("source"),
        col("position").cast("long").as("position"))
      .unionByName(eSel.select(col("query_id"), col("chunk_id"), col("title"),
        col("score"), lit("expanded").as("source"),
        col("position").cast("long").as("position")))
      .withColumn("path", lit("legacy"))

    dyn.select(col("query_id"), col("path"), col("position").cast("long").as("position"),
        col("chunk_id"), col("source"), isJapanese(col("title")).cast("int").as("is_ja"),
        col("score"))
      .unionByName(legacy.select(col("query_id"), col("path"),
        col("position").cast("long").as("position"), col("chunk_id"), col("source"),
        isJapanese(col("title")).cast("int").as("is_ja"), col("score")))
      .orderBy("query_id", "path", "position")
  }

  /** Composed hits: originals = neighbors +1..+6 (one beyond quota —
    * the seen-on-add quirk's bait), expanded = +4..+11 (three overlap
    * the originals); every %6 neighbor gets a Japanese title marker;
    * scores are distinct 64ths so the dynamic sort is tie-free.
    */
  def rag10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val q = d.filter(col("doc_id") % 100 === 0).select(col("doc_id").as("query_id"))
    def hits(ranks: Seq[Int], offBase: Int, scoreNum: Column => Column) =
      q.crossJoin(ranks.toDF("rank"))
        .select(col("query_id"), col("rank"),
          (col("query_id") + col("rank") + (offBase - 1)).as("doc_id"))
        .join(d, Seq("doc_id"))
        .select(col("query_id"), col("rank"), col("doc_id").as("chunk_id"),
          when(col("doc_id") % 6 === 0,
            concat(lit("記事 "), substring(col("text"), 1, 36)))
            .otherwise(substring(col("text"), 1, 40)).as("title"),
          (scoreNum(col("rank")).cast("double") / 64.0).as("score"))
    val orig = hits(1 to 6, 1, r => lit(64) - r * 2)
    val exp = hits(1 to 8, 4, r => lit(63) - r * 2)
    allocateOn(orig, exp)
  }

  val rag10OracleSql: String =
    """WITH d AS (SELECT doc_id, text FROM documents),
q AS (SELECT doc_id AS query_id FROM d WHERE doc_id % 100 = 0),
orig AS (
  SELECT query_id, rank, dd.doc_id AS chunk_id,
    CASE WHEN dd.doc_id % 6 = 0 THEN '記事 ' || substr(dd.text, 1, 36)
         ELSE substr(dd.text, 1, 40) END AS title,
    CAST(64 - rank * 2 AS DOUBLE) / 64.0 AS score
  FROM (SELECT query_id, unnest(range(1, 7)) AS rank FROM q) r
  JOIN d dd ON dd.doc_id = r.query_id + r.rank),
exp AS (
  SELECT query_id, rank, dd.doc_id AS chunk_id,
    CASE WHEN dd.doc_id % 6 = 0 THEN '記事 ' || substr(dd.text, 1, 36)
         ELSE substr(dd.text, 1, 40) END AS title,
    CAST(63 - rank * 2 AS DOUBLE) / 64.0 AS score
  FROM (SELECT query_id, unnest(range(1, 9)) AS rank FROM q) r
  JOIN d dd ON dd.doc_id = r.query_id + r.rank + 3),
enew AS (
  SELECT e.* FROM exp e
  WHERE NOT EXISTS (SELECT 1 FROM orig o
                    WHERE o.query_id = e.query_id AND o.chunk_id = e.chunk_id)),
cand AS (
  SELECT query_id, chunk_id, title, score, 'original' AS source FROM orig
  UNION ALL
  SELECT query_id, chunk_id, title, score, 'expanded' AS source FROM enew),
dyn AS (
  SELECT query_id, 'dynamic' AS path,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, chunk_id) AS position,
         chunk_id, source, title, score
  FROM cand
  QUALIFY position <= 10),
osel AS (
  SELECT query_id, chunk_id, title, score,
         row_number() OVER (PARTITION BY query_id ORDER BY rank) AS position
  FROM orig QUALIFY position <= 5),
ocnt AS (SELECT query_id, count(*) AS n_orig FROM osel GROUP BY 1),
esel AS (
  SELECT e.query_id, e.chunk_id, e.title, e.score,
         regexp_matches(e.title, '[\x{3040}-\x{309F}\x{30A0}-\x{30FF}\x{4E00}-\x{9FAF}]') AS ja,
         row_number() OVER (PARTITION BY e.query_id
           ORDER BY regexp_matches(e.title, '[\x{3040}-\x{309F}\x{30A0}-\x{30FF}\x{4E00}-\x{9FAF}]'), e.rank) AS ern
  FROM exp e
  WHERE NOT EXISTS (SELECT 1 FROM osel o
                    WHERE o.query_id = e.query_id AND o.chunk_id = e.chunk_id)
  QUALIFY ern <= 5),
legacy AS (
  SELECT query_id, 'legacy' AS path, CAST(position AS BIGINT) AS position,
         chunk_id, 'original' AS source, title, score
  FROM osel
  UNION ALL
  SELECT e.query_id, 'legacy', c.n_orig + e.ern, e.chunk_id, 'expanded', e.title, e.score
  FROM esel e JOIN ocnt c ON c.query_id = e.query_id)
SELECT query_id, path, CAST(position AS BIGINT) AS position, chunk_id, source,
       CAST(regexp_matches(title, '[\x{3040}-\x{309F}\x{30A0}-\x{30FF}\x{4E00}-\x{9FAF}]') AS INTEGER) AS is_ja,
       score
FROM (SELECT query_id, path, position, chunk_id, source, title, score FROM dyn
      UNION ALL
      SELECT query_id, path, position, chunk_id, source, title, score FROM legacy)
ORDER BY query_id, path, position"""
}
