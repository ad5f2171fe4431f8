package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** gc02: the production genre classifier's BLEND + decision layer —
  * recap-worker's `GenreClassifier::predict`
  * (recap-worker/recap-worker/src/classification.rs:166-252 +
  * threshold_for :254-287 + default_thresholds :290-306), the
  * fast-pass classifier classifier/workflow.rs:360 routes every
  * article through before the gp01/gp02 rescue. The three score
  * CHANNELS are already mapped operators — keyword presence scores
  * (kw02's class, the `keyword_map` whose value is also
  * `keyword_support`), the Aho-Corasick weighted occurrence boost
  * (kw01: find_matches + accumulate_scores), and the hybrid model
  * probabilities (hm02) — so, per the gc01/pl01 composed-input
  * precedent, this operator takes the channel table as input and owns
  * everything the reference does AFTER the channels:
  *
  *  - the blend (:180-197): combined = keyword_map + boost +
  *    0.4 · model_score, per genre (f32 adds re-expressed as exact
  *    1e-6-unit integers — model scores are composed in 1e-2 steps so
  *    0.4·m is exact; the ml08 exact-arithmetic convention).
  *  - `threshold_for` (:254-287): base = per-genre table
  *    (default_thresholds — ai .68, tech .65, business .74, science
  *    .7, entertainment .72, sports .65, politics .72, health .7,
  *    world .74, security .7, society_justice .75, art_culture .75,
  *    other .6) else the 0.75 default (RECAP_GENRE_MODEL_THRESHOLD's
  *    fallback, :87); keyword_support == 0 → +0.08, ≥ 3 → −0.05;
  *    bm25_peak > 1.6 → −0.05, < 0.45 → +0.04; tfidf_sum < 0.4 →
  *    +0.05, > 1.4 → −0.03; clamp [0.5, 0.9]. All bands STRICT
  *    comparisons — boundary values (0.45, 1.6, 0.4, 1.4) adjust
  *    nothing, spec-pinned.
  *  - the decision walk (:215-243): genres ranked by score descending
  *    (unstable sort_by — ties pinned to genre ASC), accepted while
  *    score ≥ threshold EXCEPT world with keyword_support < 2 and
  *    business/entertainment with support == 0 (the false-positive
  *    gates), stopping after top_k = 3 acceptances; when NOTHING
  *    passes, the best-ranked genre is taken regardless (:246-250,
  *    fallback flag here; the "other" branch is unreachable — the
  *    blend map is never empty).
  *
  * Output: (doc_id, pick_ord, genre, score, fallback) — the ordered
  * top_genres list with the blend score in 1e-6-exact units.
  *
  * Scale: channels × genres is a |docs|·14 frame (genre dim
  * broadcast); the decision is one per-doc window over ≤14 rows —
  * one shuffle keyed by doc.
  */
object GenreBlend {

  /** default_thresholds (:290-306), verbatim; base 0.75 (:87). */
  val GenreThresholds: Seq[(String, Double)] = Seq(
    "ai" -> 0.68, "tech" -> 0.65, "business" -> 0.74, "science" -> 0.7,
    "entertainment" -> 0.72, "sports" -> 0.65, "politics" -> 0.72,
    "health" -> 0.7, "world" -> 0.74, "security" -> 0.7,
    "society_justice" -> 0.75, "art_culture" -> 0.75, "other" -> 0.6)
  val DefaultThreshold = 0.75
  val TopK = 3

  /** The decision over a channel frame with (doc_id, genre,
    * kw_support, boost, model_u [1e-6 units], bm25_peak_u, tfidf_sum_u
    * [both 1e-2 units]) columns.
    */
  def decide(channels: DataFrame): DataFrame = {
    val baseU = GenreThresholds.foldLeft(
      lit((DefaultThreshold * 1e6).toLong)) { case (acc, (g, t)) =>
      when(col("genre") === g, lit((t * 1e6).toLong)).otherwise(acc)
    }
    // model_u is composed in 1e4-unit steps so ·2/5 is exact; the cast
    // keeps the unit integral (DuckDB mirrors with //)
    val scoreU = (col("kw_support") + col("boost")) * 1000000L +
      (col("model_u") * 2L / 5L).cast("long")
    val adj = when(col("kw_support") === 0, 80000L)
      .when(col("kw_support") >= 3, -50000L).otherwise(0L) +
      when(col("bm25_peak_u") > 160, -50000L)
        .when(col("bm25_peak_u") < 45, 40000L).otherwise(0L) +
      when(col("tfidf_sum_u") < 40, 50000L)
        .when(col("tfidf_sum_u") > 140, -30000L).otherwise(0L)
    val thrU = least(greatest(baseU + adj, lit(500000L)), lit(900000L))
    val gated = !(col("genre") === "world" && col("kw_support") < 2) &&
      !(col("genre").isin("business", "entertainment") && col("kw_support") === 0)
    val scored = channels
      .withColumn("score_u", scoreU)
      .withColumn("passes", col("score_u") >= thrU && gated)
    val rankAll = row_number().over(
      Window.partitionBy("doc_id").orderBy(col("score_u").desc, col("genre").asc))
    val withRank = scored.withColumn("rk_all", rankAll)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val accepted = withRank.filter(col("passes"))
      .withColumn("pick_ord", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score_u").desc, col("genre").asc)))
      .filter(col("pick_ord") <= TopK)
      .select(col("doc_id"), col("pick_ord"), col("genre"),
        (col("score_u") / 1e6).as("score"), lit(0).as("fallback"))
    val fallback = withRank.filter(col("rk_all") === 1)
      .join(accepted.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1).as("pick_ord"), col("genre"),
        (col("score_u") / 1e6).as("score"), lit(1).as("fallback"))
    accepted.union(fallback)
  }

  /** gc02 adapter: composed channel table — kw/boost/model channels and
    * the per-doc feature stats cycle through every threshold branch.
    */
  def gc02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val genreDim = GenreThresholds.map(_._1).zipWithIndex.map { case (g, i) => (g, i.toLong) }
    val dim = broadcast((genreDim :+ ("quantum", 13L)).toDF("genre", "gidx"))
    val channels = Tables.documents(s, dir).select(col("doc_id"))
      .crossJoin(dim)
      .select(col("doc_id"), col("genre"),
        ((col("doc_id") + col("gidx")) % 5).as("kw_support"),
        ((col("doc_id") * 3 + col("gidx")) % 4).as("boost"),
        (((col("doc_id") * 7 + col("gidx") * 13) % 101) * 10000L).as("model_u"),
        // per-doc stats in 1e-2 units: 30/45/100/160/170 cycle the
        // bm25 bands incl. both no-op boundaries; 20/40/100/140/150
        // plus two fillers cycle the tfidf bands
        when(col("doc_id") % 5 === 0, 30L).when(col("doc_id") % 5 === 1, 45L)
          .when(col("doc_id") % 5 === 2, 100L).when(col("doc_id") % 5 === 3, 160L)
          .otherwise(170L).as("bm25_peak_u"),
        when(col("doc_id") % 7 === 0, 20L).when(col("doc_id") % 7 === 1, 40L)
          .when(col("doc_id") % 7 === 2, 100L).when(col("doc_id") % 7 === 3, 140L)
          .when(col("doc_id") % 7 === 4, 150L).when(col("doc_id") % 7 === 5, 35L)
          .otherwise(145L).as("tfidf_sum_u"))
    decide(channels)
  }

  /** DuckDB twin of [[gc02]]. */
  val gc02OracleSql: String = {
    val thrCase = GenreThresholds.map { case (g, t) =>
      s"WHEN '$g' THEN ${(t * 1e6).toLong}" }.mkString(" ")
    s"""WITH dim AS (SELECT * FROM (VALUES
           ${(GenreThresholds.map(_._1) :+ "quantum").zipWithIndex
             .map { case (g, i) => s"('$g', $i)" }.mkString(", ")}) d(genre, gidx)),
       ch AS (SELECT doc_id, genre,
           (doc_id + gidx) % 5 AS kw_support,
           (doc_id * 3 + gidx) % 4 AS boost,
           ((doc_id * 7 + gidx * 13) % 101) * 10000 AS model_u,
           CASE doc_id % 5 WHEN 0 THEN 30 WHEN 1 THEN 45 WHEN 2 THEN 100
                WHEN 3 THEN 160 ELSE 170 END AS bm25_peak_u,
           CASE doc_id % 7 WHEN 0 THEN 20 WHEN 1 THEN 40 WHEN 2 THEN 100
                WHEN 3 THEN 140 WHEN 4 THEN 150 WHEN 5 THEN 35 ELSE 145 END AS tfidf_sum_u
         FROM documents CROSS JOIN dim),
       sc AS (SELECT *,
           (kw_support + boost) * 1000000 + model_u * 2 // 5 AS score_u,
           least(greatest(
             (CASE genre $thrCase ELSE ${(DefaultThreshold * 1e6).toLong} END)
             + (CASE WHEN kw_support = 0 THEN 80000 WHEN kw_support >= 3 THEN -50000 ELSE 0 END)
             + (CASE WHEN bm25_peak_u > 160 THEN -50000 WHEN bm25_peak_u < 45 THEN 40000 ELSE 0 END)
             + (CASE WHEN tfidf_sum_u < 40 THEN 50000 WHEN tfidf_sum_u > 140 THEN -30000 ELSE 0 END),
             500000), 900000) AS thr_u
         FROM ch),
       ps AS (SELECT *,
           (score_u >= thr_u
            AND NOT (genre = 'world' AND kw_support < 2)
            AND NOT (genre IN ('business', 'entertainment') AND kw_support = 0)) AS passes,
           row_number() OVER (PARTITION BY doc_id ORDER BY score_u DESC, genre ASC) AS rk_all
         FROM sc),
       acc AS (SELECT doc_id, genre, score_u,
           row_number() OVER (PARTITION BY doc_id ORDER BY score_u DESC, genre ASC) AS pick_ord
         FROM ps WHERE passes),
       acck AS (SELECT doc_id, pick_ord, genre, score_u / 1e6 AS score, 0 AS fallback
         FROM acc WHERE pick_ord <= $TopK),
       fb AS (SELECT doc_id, 1 AS pick_ord, genre, score_u / 1e6 AS score, 1 AS fallback
         FROM ps WHERE rk_all = 1
           AND doc_id NOT IN (SELECT DISTINCT doc_id FROM acck))
       SELECT * FROM acck UNION ALL SELECT * FROM fb"""
  }
}
