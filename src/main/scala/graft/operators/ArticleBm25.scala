package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric

/** rag11: the article-scoped in-memory BM25 rerank —
  * rag-orchestrator/internal/usecase/strategy_article_scoped.go
  * bm25RerankContexts (:159-233) + tokenize (:235-272), the
  * no-embedder rerank the article_scoped strategy applies to a single
  * article's chunks (:46-105; production-wired through selectStrategy
  * :274). NOT tx18's token-equality BM25 — this variant's quirks:
  *
  *  - tokenize (:235-272): lowercased ASCII letter RUNS of ≥2 chars
  *    (single letters dropped) plus every CJK character as its own
  *    term (Han/Hiragana/Katakana), first-seen deduplicated. The scan
  *    order only matters for float summation in the reference;
  *    contributions are integer-quantized here (the tx18 discipline),
  *    so a DISTINCT term set is exact. CORPUS-CONDITIONAL PREMISE
  *    (pinned): the reference's letter test is `unicode.IsLetter(r)
  *    && r < 0x3000`, which also admits ACCENTED Latin into a run
  *    ('café' is one term there, 'caf' under the [a-z] runs both
  *    engines use here); the corpus carries no accented Latin
  *    (grep-verified at all three SFs), and the oracle mirrors the
  *    same token regex, so the divergence is both unreachable and
  *    oracle-invisible.
  *  - df and tf are SUBSTRING-based, not token-based (:189
  *    strings.Contains, :216 strings.Count — both byte-level,
  *    non-overlapping): the term "ai" matches inside "maintain".
  *    Document length is BYTES (:200 Go len), kept via octet_length /
  *    strlen.
  *  - idf = ln((n − df + 0.5)/(df + 0.5) + 1) (:219), k1 = 1.2,
  *    b = 0.75 (:195-196); terms with df = 0 are skipped (:213).
  *  - normalization (:232-252): when NO term matched anywhere
  *    (maxScore 0), every chunk restores to score 1.0 and the
  *    ORIGINAL order is kept (no sort); otherwise sort by score DESC
  *    (Go's unstable sort.Slice — ties pinned to chunk_id ASC, the
  *    hd01 convention) and divide by the max, so the top chunk reads
  *    exactly 1.0.
  *
  * Cross-engine float discipline (tx18's): idf quantized to 1e-6,
  * per-(chunk, term) contributions to integer 1e-6 units (order-free
  * sums), avgdl to 1e-6, the final normalization a microRatio.
  *
  * Scale: terms explode per query (bounded by query length); df and
  * tf ride ONE (query)-keyed join of the term frame against the
  * chunk frame (per-article chunk counts are bounded — "typically
  * < 100 chunks", :158); the rank window partitions by query.
  */
object ArticleBm25 {

  val K1 = 1.2
  val B = 0.75
  private val TokenRegex = "[a-z]{2,}|[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF]"

  /** The rerank over (query_id, query) × (query_id, chunk_id, rank0,
    * chunk_text) frames.
    */
  def rerankOn(queries: DataFrame, chunks: DataFrame): DataFrame = {
    val terms = queries
      .select(col("query_id"),
        explode(expr(s"regexp_extract_all(lower(query), '$TokenRegex', 0)")).as("term"))
      .distinct()
    val ch = chunks.select(col("query_id"), col("chunk_id"), col("rank0"),
      lower(col("chunk_text")).as("ltext"),
      octet_length(col("chunk_text")).cast("double").as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = ch.groupBy("query_id")
      .agg(count(lit(1)).as("n"),
        Numeric.microRatio(sum(col("dl")), count(lit(1)), 6).as("avgdl"))

    // df over the (query)-keyed term × chunk join, substring containment
    val tc = terms.join(ch, Seq("query_id"))
      .withColumn("hit", col("ltext").contains(col("term")))
    val df = tc.filter(col("hit")).groupBy("query_id", "term")
      .agg(count(lit(1)).as("df"))

    // per-(chunk, term) contribution in exact 1e-6 units; df = 0 terms
    // are absent from `df` and drop out of the inner join (:213)
    val contrib = tc.join(df, Seq("query_id", "term"))
      .join(stats, Seq("query_id"))
      .withColumn("tf",
        ((octet_length(col("ltext")) -
          octet_length(expr("replace(ltext, term, '')"))) /
          octet_length(col("term"))).cast("double"))
      .withColumn("idf6", Numeric.microRound(
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6))
      .withColumn("tfnorm",
        col("tf") * (K1 + 1) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .withColumn("contrib_u", Numeric.units(col("idf6") * col("tfnorm"), 6))
    val scored = ch.join(
      contrib.groupBy("query_id", "chunk_id").agg(sum("contrib_u").as("score_u")),
      Seq("query_id", "chunk_id"), "left")
      .withColumn("score_u", coalesce(col("score_u"), lit(0L)))
    val mx = scored.groupBy("query_id").agg(max("score_u").as("max_u"))

    scored.join(mx, Seq("query_id"))
      .withColumn("no_match", (col("max_u") === 0).cast("int"))
      .withColumn("position",
        when(col("max_u") === 0, col("rank0").cast("int"))
          .otherwise(row_number().over(Window.partitionBy("query_id")
            .orderBy(col("score_u").desc, col("chunk_id")))))
      .select(col("query_id"), col("position"), col("chunk_id"),
        when(col("max_u") === 0, lit(1.0))
          .otherwise(Numeric.microUnits(col("score_u"), col("max_u"), 6) / 1e6)
          .as("score"),
        col("no_match"))
      .orderBy("query_id", "position")
  }

  /** Composed article chunks: the %100 docs are queries over their 8
    * id-neighbor chunks; %9 queries match nothing (the restore path),
    * %11 queries are CJK (char-level terms).
    */
  def rag11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val q = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"),
        when(col("doc_id") % 9 === 0, lit("zxqjv quux"))
          .when(col("doc_id") % 11 === 0, lit("最適化モデルの分散処理"))
          .otherwise(substring(col("text"), 1, 50)).as("query"))
    val chunks = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"))
      .crossJoin((1 to 8).toDF("rank0"))
      .select(col("query_id"), col("rank0"),
        (col("query_id") + col("rank0")).as("doc_id"))
      .join(d, Seq("doc_id"))
      .select(col("query_id"), col("doc_id").as("chunk_id"), col("rank0"),
        substring(col("text"), 1, 300).as("chunk_text"))
    rerankOn(q, chunks)
  }

  val rag11OracleSql: String = {
    val tok = "[a-z]{2,}|[\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{4E00}-\\x{9FFF}]"
    s"""WITH d AS (SELECT doc_id, text FROM documents),
q AS (SELECT doc_id AS query_id,
        CASE WHEN doc_id % 9 = 0 THEN 'zxqjv quux'
             WHEN doc_id % 11 = 0 THEN '最適化モデルの分散処理'
             ELSE substr(text, 1, 50) END AS query
      FROM d WHERE doc_id % 100 = 0),
terms AS (
  SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(query), '$tok', 0)) AS term
  FROM q),
ch AS (
  SELECT query_id, dd.doc_id AS chunk_id, rank0,
         lower(substr(dd.text, 1, 300)) AS ltext,
         CAST(strlen(substr(dd.text, 1, 300)) AS DOUBLE) AS dl
  FROM (SELECT doc_id AS query_id, unnest(range(1, 9)) AS rank0 FROM d WHERE doc_id % 100 = 0) r
  JOIN d dd ON dd.doc_id = r.query_id + r.rank0),
stats AS (
  SELECT query_id, count(*) AS n,
         CAST(round(sum(dl) * 1e6 / count(*)) AS BIGINT) / 1e6 AS avgdl
  FROM ch GROUP BY 1),
tc AS (
  SELECT t.query_id, t.term, c.chunk_id, c.ltext, c.dl,
         contains(c.ltext, t.term) AS hit
  FROM terms t JOIN ch c ON c.query_id = t.query_id),
df AS (SELECT query_id, term, count(*) AS df FROM tc WHERE hit GROUP BY 1, 2),
contrib AS (
  SELECT tc.query_id, tc.chunk_id,
    CAST(round(
      (CAST(round(ln((CAST(s.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0) * 1e6) AS BIGINT) / 1e6)
      * ((CAST(strlen(tc.ltext) - strlen(replace(tc.ltext, tc.term, '')) AS DOUBLE) / strlen(tc.term))
         * ${K1 + 1} /
         ((CAST(strlen(tc.ltext) - strlen(replace(tc.ltext, tc.term, '')) AS DOUBLE) / strlen(tc.term))
          + $K1 * (1 - $B + $B * tc.dl / s.avgdl)))
      * 1e6) AS BIGINT) AS contrib_u
  FROM tc
  JOIN df ON df.query_id = tc.query_id AND df.term = tc.term
  JOIN stats s ON s.query_id = tc.query_id),
scored AS (
  SELECT ch.query_id, ch.chunk_id, ch.rank0,
         coalesce(sc.score_u, 0) AS score_u
  FROM ch LEFT JOIN (
    SELECT query_id, chunk_id, CAST(sum(contrib_u) AS BIGINT) AS score_u
    FROM contrib GROUP BY 1, 2) sc
  ON sc.query_id = ch.query_id AND sc.chunk_id = ch.chunk_id),
mx AS (SELECT query_id, max(score_u) AS max_u FROM scored GROUP BY 1)
SELECT s.query_id,
  CASE WHEN m.max_u = 0 THEN s.rank0
       ELSE row_number() OVER (PARTITION BY s.query_id
                               ORDER BY s.score_u DESC, s.chunk_id) END AS position,
  s.chunk_id,
  CASE WHEN m.max_u = 0 THEN 1.0
       ELSE CAST(round(s.score_u * 1e6 / m.max_u) AS BIGINT) / 1e6 END AS score,
  CAST(m.max_u = 0 AS INTEGER) AS no_match
FROM scored s JOIN mx m ON m.query_id = s.query_id
ORDER BY s.query_id, position"""
  }
}
