package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** rag09: the serving-side retrieval QUALITY GATE —
  * rag-orchestrator/internal/usecase/retrieval_quality.go
  * AssessWithIntent (:102-160), the verdict that decides whether the
  * RAG answer path proceeds, retries with expansion, or refuses
  * (answer_with_rag_usecase.go:1103/:1137/:1552, strategy_causal.go:72
  * — production-wired wherever the quality gate is enabled,
  * config.go:380's default true). DISTINCT from the eval-side
  * relevance_gate.go that rag06 maps: this is the runtime assessor.
  *
  * The verdict ladder, quirk for quirk:
  *
  *  - fewer than minContexts (config default 3, :383) → insufficient
  *    outright (:104-106).
  *  - intent-aware thresholds (:86-100): causal_explanation /
  *    synthesis / topic_deep_dive queries assess at 0.30/0.15
  *    (cross-encoders score abstract queries lower — the reference's
  *    own CRAG citation); everything else at the configured 0.5/0.25.
  *  - the score is the average of the top-3 effective scores
  *    (RerankScore when RerankApplied, else Score, :116-127); ≥ good
  *    → good, ≥ marginal → marginal, else insufficient.
  *  - downgrade heuristics cap at marginal, NEVER insufficient
  *    (:139-146): topic incoherence (:162-196 — ≥2 titled contexts
  *    and NO pair of titles shares a significant word, where
  *    significant = lowercased whitespace-split tokens of ≥3 runes,
  *    :211-220 — no punctuation stripping HERE, unlike the query
  *    keywords) and high score variance (:224-231 — top/second ratio
  *    STRICTLY > 5, with second == 0 short-circuiting to top > 0).
  *  - the ONLY path from marginal to insufficient is query-context
  *    mismatch (:148-156, evaluated only when the verdict is marginal
  *    and the query is non-empty): NONE of the top contexts'
  *    lowercased title+chunk text contains ANY query keyword, where
  *    keywords (:262-290) are CJK katakana/kanji runs of ≥2 runes
  *    (hiragana = particle boundary, :293-297) plus Latin
  *    whitespace-split words of ≥3 runes after trimming the exact
  *    punctuation cutset "?？!！.,;:()（）「」", excluding the verbatim
  *    25-word stop list (:322-328) and any CJK-containing token.
  *
  * Composed scores are sixteenths (dyadic), so the top-3 average and
  * the variance ratio are bit-identical doubles in both engines (the
  * reference's float32 algebra runs in double here — the standing
  * fz01 convention). mismatch surfaces as a column only when the
  * gate evaluated it (the ka01 guarded-block convention).
  *
  * Scale: contexts pivot to flat rank-1..3 columns in ONE conditional
  * agg keyed by query (top-3 by contract); every ladder rule is then
  * a scalar projection — no window, no join, no explode.
  */
object RetrievalQuality {

  val GoodThreshold = 0.5
  val MarginalThreshold = 0.25
  val MinContexts = 3
  /** Lowered thresholds for abstract intents (:96-98). */
  val AbstractIntents: Seq[String] =
    Seq("causal_explanation", "synthesis", "topic_deep_dive")

  /** stopWords (:322-328), verbatim. */
  val StopWords: Seq[String] = Seq(
    "the", "and", "for", "are", "was", "were", "been", "has", "have",
    "had", "not", "but", "with", "this", "that", "from", "they",
    "what", "why", "how", "who", "which", "when", "where")

  /** All eight IntentType values (query_intent.go:15-24). */
  val Intents: Seq[String] = Seq("general", "article_scoped", "comparison",
    "temporal", "topic_deep_dive", "fact_check", "causal_explanation",
    "synthesis")

  private val CjkKeywordClass = "[\\u30A0-\\u30FF\\u4E00-\\u9FFF\\u3400-\\u4DBF]"
  private val CjkAnyClass =
    "[\\u3040-\\u309F\\u30A0-\\u30FF\\u4E00-\\u9FFF\\u3400-\\u4DBF]"
  private val PunctCutset = "?？!！.,;:()（）「」"

  /** The assessor over (query_id, intent_type, query) × context rows
    * (query_id, rank, title, chunk_text, score, rerank_score,
    * rerank_applied). Contexts beyond rank 3 are ignored by contract.
    */
  def assessOn(queries: DataFrame, contexts: DataFrame,
               goodThreshold: Double = GoodThreshold,
               marginalThreshold: Double = MarginalThreshold,
               minContexts: Int = MinContexts): DataFrame = {
    val eff = when(col("rerank_applied"), col("rerank_score")).otherwise(col("score"))
    def at(i: Int)(c: Column): Column =
      first(when(col("rank") === i, c), ignoreNulls = true)
    val piv = contexts.filter(col("rank") <= 3)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n"),
        at(1)(eff).as("e1"), at(2)(eff).as("e2"), at(3)(eff).as("e3"),
        at(1)(col("title")).as("t1"), at(2)(col("title")).as("t2"),
        at(3)(col("title")).as("t3"),
        at(1)(col("chunk_text")).as("c1"), at(2)(col("chunk_text")).as("c2"),
        at(3)(col("chunk_text")).as("c3"))

    val f = queries.join(piv, Seq("query_id"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val topn = least(col("n"), lit(3L))
    val avg = (coalesce(col("e1"), lit(0.0)) + coalesce(col("e2"), lit(0.0)) +
      coalesce(col("e3"), lit(0.0))) / topn
    val lowered = col("intent_type").isInCollection(AbstractIntents)
    val good = when(lowered, 0.30).otherwise(goodThreshold)
    val marginal = when(lowered, 0.15).otherwise(marginalThreshold)

    // significant title words (:211-220): lowercase Fields split, >=3
    // runes, NO punctuation trim
    def words(t: Column): Column = array_distinct(filter(
      split(lower(coalesce(t, lit(""))), "\\s+"),
      w => w =!= "" && length(w) >= 3))
    def titled(t: Column): Column = trim(coalesce(t, lit(""))) =!= ""
    def pairPresent(i: Int, j: Int): Column = topn >= j && titled(col(s"t$i")) && titled(col(s"t$j"))
    def share(i: Int, j: Int): Column =
      arrays_overlap(words(col(s"t$i")), words(col(s"t$j")))
    val totalPairs = pairPresent(1, 2).cast("int") + pairPresent(1, 3).cast("int") +
      pairPresent(2, 3).cast("int")
    val sharedPairs = (pairPresent(1, 2) && share(1, 2)).cast("int") +
      (pairPresent(1, 3) && share(1, 3)).cast("int") +
      (pairPresent(2, 3) && share(2, 3)).cast("int")
    val incoherent = topn >= 2 && totalPairs > 0 && sharedPairs === 0

    // one-hit-plus-noise (:224-231): strict > 5, zero-second special
    val highVariance = topn >= 2 &&
      when(col("e2") === 0.0, col("e1") > 0.0).otherwise(col("e1") / col("e2") > 5.0)

    // query keywords (:262-290)
    val cjkKeywords = expr(
      s"regexp_extract_all(query, '$CjkKeywordClass{2,}', 0)")
    val latinKeywords = filter(
      transform(split(lower(col("query")), "\\s+"),
        w => trim(w, PunctCutset)),
      w => length(w) >= 3 && !w.rlike(CjkAnyClass) &&
        !w.isInCollection(StopWords))
    val keywords = concat(cjkKeywords, latinKeywords)
    def combined(i: Int): Column =
      lower(concat(coalesce(col(s"t$i"), lit("")), lit(" "),
        coalesce(col(s"c$i"), lit(""))))
    val anyMatch = exists(keywords, kw =>
      combined(1).contains(kw) ||
      (topn >= 2 && combined(2).contains(kw)) ||
      (topn >= 3 && combined(3).contains(kw)))
    val mismatch = size(keywords) > 0 && !anyMatch

    val band = when(avg >= good, "good")
      .when(avg >= marginal, "marginal").otherwise("insufficient")
    val afterDowngrade = when(band === "good" && (incoherent || highVariance),
      "marginal").otherwise(band)
    val verdict = when(col("n") < minContexts, "insufficient")
      .when(afterDowngrade === "marginal" && col("query") =!= "" && mismatch,
        "insufficient")
      .otherwise(afterDowngrade)

    val evaluated = col("n") >= minContexts
    f.select(col("query_id"), col("intent_type"), col("n").as("n_contexts"),
      when(evaluated, avg).as("avg_score"),
      when(evaluated, incoherent).cast("int").as("incoherent"),
      when(evaluated, highVariance).cast("int").as("high_variance"),
      when(evaluated && afterDowngrade === "marginal" && col("query") =!= "",
        mismatch).cast("int").as("mismatch"),
      verdict.as("verdict"))
      .orderBy("query_id")
  }

  /** Composed queries + contexts: queries are the %100 docs, contexts
    * their id-neighbors (the rag06 golden convention); sixteenth-valued
    * score formulas span all three bands; %13 plants the
    * too-few-contexts class, %7 the variance downgrade, %9 the
    * guaranteed-mismatch query, %11 the CJK-segmentation query.
    */
  def rag09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val q = d.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val qn = (col("query_id") / 100).cast("long")
    val queries = q.select(
      col("query_id"),
      element_at(typedLit(Intents), (qn % 8).cast("int") + 1).as("intent_type"),
      when(col("query_id") % 9 === 0, lit("zxqjv quuxflib xyzzt"))
        .when(col("query_id") % 11 === 0, lit("分散処理の最適化モデル"))
        .otherwise(substring(col("qtext"), 1, 60)).as("query"))
    // contexts: ranks 1..3 from id-neighbors; the %13 class keeps 2
    val ranked = q.crossJoin(Seq(1, 2, 3).toDF("rank"))
      .filter(!(col("query_id") % 13 === 0 && col("rank") === 3))
      .select(col("query_id"), col("rank"),
        (col("query_id") + col("rank")).as("doc_id"),
        (col("query_id") / 100).cast("long").as("q"))
    val contexts = ranked.join(d, Seq("doc_id"))
      .select(col("query_id"), col("rank"),
        substring(col("text"), 1, 40).as("title"),
        substring(col("text"), 41, 280).as("chunk_text"),
        (((col("q") + lit(5) * col("rank")) % 16).cast("double") / 16.0).as("score"),
        when(col("query_id") % 7 === 0,
          element_at(typedLit(Seq(15.0 / 16, 2.0 / 16, 8.0 / 16)), col("rank")))
          .when(col("query_id") % 9 === 0,
            element_at(typedLit(Seq(6.0 / 16, 6.0 / 16, 7.0 / 16)), col("rank")))
          .otherwise(((col("q") + lit(3) * col("rank")) % 16).cast("double") / 16.0)
          .as("rerank_score"),
        (col("query_id") % 3 =!= 0 || col("query_id") % 7 === 0 ||
          col("query_id") % 9 === 0).as("rerank_applied"))
    assessOn(queries, contexts)
  }

  val rag09OracleSql: String = {
    val stops = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    val intents = Intents.map(i => s"'$i'").mkString("[", ", ", "]")
    val cjkKw = "[\\x{30A0}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]"
    val cjkAny = "[\\x{3040}-\\x{309F}\\x{30A0}-\\x{30FF}\\x{4E00}-\\x{9FFF}\\x{3400}-\\x{4DBF}]"
    s"""WITH d AS (SELECT doc_id, text FROM documents),
q AS (SELECT doc_id AS query_id, text AS qtext, doc_id // 100 AS qn
      FROM d WHERE doc_id % 100 = 0),
queries AS (
  SELECT query_id, ($intents)[CAST(qn % 8 AS INTEGER) + 1] AS intent_type,
    CASE WHEN query_id % 9 = 0 THEN 'zxqjv quuxflib xyzzt'
         WHEN query_id % 11 = 0 THEN '分散処理の最適化モデル'
         ELSE substr(qtext, 1, 60) END AS query
  FROM q),
ctx AS (
  SELECT query_id, rank, qn,
    substr(dd.text, 1, 40) AS title, substr(dd.text, 41, 280) AS chunk_text,
    CAST((qn + 5 * rank) % 16 AS DOUBLE) / 16.0 AS score,
    CASE WHEN query_id % 7 = 0 THEN ([15.0/16, 2.0/16, 8.0/16])[rank]
         WHEN query_id % 9 = 0 THEN ([6.0/16, 6.0/16, 7.0/16])[rank]
         ELSE CAST((qn + 3 * rank) % 16 AS DOUBLE) / 16.0 END AS rerank_score,
    (query_id % 3 <> 0 OR query_id % 7 = 0 OR query_id % 9 = 0) AS rerank_applied
  FROM (SELECT query_id, qn, unnest([1, 2, 3]) AS rank FROM q) r
  JOIN d dd ON dd.doc_id = r.query_id + r.rank
  WHERE NOT (query_id % 13 = 0 AND rank = 3)),
piv AS (
  SELECT query_id, count(*) AS n,
    max(CASE WHEN rank=1 THEN CASE WHEN rerank_applied THEN rerank_score ELSE score END END) AS e1,
    max(CASE WHEN rank=2 THEN CASE WHEN rerank_applied THEN rerank_score ELSE score END END) AS e2,
    max(CASE WHEN rank=3 THEN CASE WHEN rerank_applied THEN rerank_score ELSE score END END) AS e3,
    max(CASE WHEN rank=1 THEN title END) AS t1,
    max(CASE WHEN rank=2 THEN title END) AS t2,
    max(CASE WHEN rank=3 THEN title END) AS t3,
    max(CASE WHEN rank=1 THEN chunk_text END) AS c1,
    max(CASE WHEN rank=2 THEN chunk_text END) AS c2,
    max(CASE WHEN rank=3 THEN chunk_text END) AS c3
  FROM ctx GROUP BY 1),
calc AS (
  SELECT queries.query_id, intent_type, query, coalesce(n, 0) AS n,
    e1, e2, e3, t1, t2, t3, c1, c2, c3,
    least(coalesce(n, 0), 3) AS topn,
    (coalesce(e1, 0) + coalesce(e2, 0) + coalesce(e3, 0)) / least(coalesce(n, 0), 3) AS avgs,
    CASE WHEN list_contains(['causal_explanation','synthesis','topic_deep_dive'], intent_type)
         THEN 0.30 ELSE 0.5 END AS goodt,
    CASE WHEN list_contains(['causal_explanation','synthesis','topic_deep_dive'], intent_type)
         THEN 0.15 ELSE 0.25 END AS margt
  FROM queries LEFT JOIN piv ON piv.query_id = queries.query_id),
feats AS (
  SELECT *,
    list_distinct(list_filter(string_split_regex(lower(coalesce(t1,'')), '\\s+'), w -> w <> '' AND length(w) >= 3)) AS w1,
    list_distinct(list_filter(string_split_regex(lower(coalesce(t2,'')), '\\s+'), w -> w <> '' AND length(w) >= 3)) AS w2,
    list_distinct(list_filter(string_split_regex(lower(coalesce(t3,'')), '\\s+'), w -> w <> '' AND length(w) >= 3)) AS w3,
    trim(coalesce(t1,'')) <> '' AS ti1, trim(coalesce(t2,'')) <> '' AS ti2, trim(coalesce(t3,'')) <> '' AS ti3,
    list_concat(
      regexp_extract_all(query, '$cjkKw{2,}', 0),
      list_filter(list_transform(string_split_regex(lower(query), '\\s+'), w -> trim(w, '?？!！.,;:()（）「」')),
        w -> length(w) >= 3 AND NOT regexp_matches(w, '$cjkAny') AND NOT list_contains($stops, w))) AS kws,
    lower(coalesce(t1,'') || ' ' || coalesce(c1,'')) AS comb1,
    lower(coalesce(t2,'') || ' ' || coalesce(c2,'')) AS comb2,
    lower(coalesce(t3,'') || ' ' || coalesce(c3,'')) AS comb3
  FROM calc),
gates AS (
  SELECT *,
    (CAST(topn >= 2 AND ti1 AND ti2 AS INTEGER) + CAST(topn >= 3 AND ti1 AND ti3 AS INTEGER)
     + CAST(topn >= 3 AND ti2 AND ti3 AS INTEGER)) AS total_pairs,
    (CAST(topn >= 2 AND ti1 AND ti2 AND list_has_any(w1, w2) AS INTEGER)
     + CAST(topn >= 3 AND ti1 AND ti3 AND list_has_any(w1, w3) AS INTEGER)
     + CAST(topn >= 3 AND ti2 AND ti3 AND list_has_any(w2, w3) AS INTEGER)) AS shared_pairs,
    (topn >= 2 AND CASE WHEN e2 = 0 THEN e1 > 0 ELSE e1 / e2 > 5.0 END) AS high_var,
    (len(kws) > 0 AND NOT len(list_filter(kws, kw ->
        contains(comb1, kw) OR (topn >= 2 AND contains(comb2, kw))
        OR (topn >= 3 AND contains(comb3, kw)))) > 0) AS mism
  FROM feats),
verd AS (
  SELECT *,
    (topn >= 2 AND total_pairs > 0 AND shared_pairs = 0) AS incoh,
    CASE WHEN avgs >= goodt THEN 'good' WHEN avgs >= margt THEN 'marginal'
         ELSE 'insufficient' END AS band
  FROM gates),
verd2 AS (
  SELECT *,
    CASE WHEN band = 'good' AND (incoh OR high_var) THEN 'marginal' ELSE band END AS after_dg
  FROM verd)
SELECT query_id, intent_type, CAST(n AS BIGINT) AS n_contexts,
  CASE WHEN n >= 3 THEN avgs END AS avg_score,
  CASE WHEN n >= 3 THEN CAST(incoh AS INTEGER) END AS incoherent,
  CASE WHEN n >= 3 THEN CAST(high_var AS INTEGER) END AS high_variance,
  CASE WHEN n >= 3 AND after_dg = 'marginal' AND query <> '' THEN CAST(mism AS INTEGER) END AS mismatch,
  CASE WHEN n < 3 THEN 'insufficient'
       WHEN after_dg = 'marginal' AND query <> '' AND mism THEN 'insufficient'
       ELSE after_dg END AS verdict
FROM verd2 ORDER BY query_id"""
  }
}
