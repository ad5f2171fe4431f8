package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}

/** Deterministic sampling operators for training-data curation.
  *
  * Mirrors the sampling the reference's LLM pipelines imply (news-creator
  * / acolyte-orchestrator pick bounded article subsets per run;
  * recap-worker caps cluster inputs) — done the way a 100 TB pipeline
  * must: a content-independent hash threshold per row instead of
  * `rand()`. Hash sampling is a stateless per-row filter (no shuffle,
  * pushes the projection to the scan), reproducible across reruns, and
  * retry-safe under task re-execution — a `rand()` sample is none of
  * those, and a `TABLESAMPLE` block sample is biased by file layout.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the md5 of the key — both
    * engines (and any other system that needs to reproduce the sample)
    * agree on md5 of the decimal string; the first 8 hex chars give 32
    * uniform bits, plenty for per-mille thresholds.
    */
  def hashBucket(key: Column, buckets: Int = 1000): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
         lit(buckets.toLong))

  /** Stratified Bernoulli sample: per-stratum per-mille rates, rows kept
    * when their hash bucket falls under the stratum's threshold. The
    * rate lookup is a literal when-chain baked into the plan — no join,
    * no shuffle; sampling 100 TB is exactly one scan.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       permille: Map[String, Int], defaultPermille: Int,
                       buckets: Int = 1000): DataFrame = {
    val rate = permille.foldLeft(lit(defaultPermille): Column) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol), buckets))
      .filter(col("bucket") < rate)
  }

  /** smp02: domain-mixture rebalancing weights — per-source acceptance
    * rates that flatten the token distribution to a uniform target
    * mixture (the Pile-style domain weighting step: compute how hard
    * each source must be downsampled so no domain dominates the
    * training token budget). Downsample-only: rates normalize so the
    * scarcest source keeps 100% of its tokens. One aggregation over
    * the corpus; the share/normalize windows run on the per-source
    * frame (|sources| rows at any data scale).
    */
  def mixtureWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    val bySource = Tables.documents(s, dir)
      .select(col("source"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
    bySource
      .withColumn("cur_share", col("tokens") / sum("tokens").over())
      .withColumn("raw_w", (lit(1.0) / count(lit(1)).over()) / col("cur_share"))
      .withColumn("accept_rate", microRatio(col("raw_w"), max("raw_w").over(), 4))
      .select(col("source"), col("n_docs"), col("tokens"),
              microRound(col("cur_share"), 4).as("cur_share"), col("accept_rate"))
  }

  /** smp01: language-stratified document sample — oversample the rare
    * strata, downsample the dominant one (the class-balance step ahead
    * of fine-tuning / evaluation set builds).
    */
  def smp01(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Tables.documents(s, dir).select("doc_id", "lang"),
      "doc_id", "lang",
      permille = Map("en" -> 200, "es" -> 500, "de" -> 800),
      defaultPermille = 100)
      .select("doc_id", "lang", "bucket")

  /** smp03: deterministic weighted sample without replacement
    * (Efraimidis–Spirakis 2006, public): score each row
    * skey = ln(u)/w with u a uniform (0,1] hash of the id and w the
    * weight — here n_chars, a token-budget-proportional pick — and
    * keep the top-k rows by skey. Exactly the reservoir-sampling
    * weighting, but with the hash AS the randomness: reproducible,
    * retry-safe, and mirrorable by any engine (the object doc's case
    * against rand()). One scan + TakeOrdered top-k — the per-row score
    * never shuffles the corpus.
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
               .cast("double") + lit(1.0)) / lit(4294967297.0)
    Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .withColumn("skey", log(u) / col("n_chars"))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("source"), col("n_chars"),
              (microRound(col("skey"), 9)).as("skey"))
  }

  /** smp06: dedup-weighted sampling — Efraimidis–Spirakis with weight
    * 1 / near-dup-cluster-size, composing dd01's connected components
    * into smp03's deterministic weighted draw (the DataComp-style
    * counterweight to duplication: smp04 hard-caps clusters, this
    * SOFT-downweights them — content that appears in an n-member
    * near-dup cluster gets 1/n the selection mass, so the SAMPLE's
    * content distribution approximates the deduplicated corpus without
    * actually deleting anything). skey = ln(u)·size: ln(u) < 0, so a
    * bigger cluster pushes the key further down — exactly w = 1/size
    * in the E–S formulation, hash-deterministic and retry-safe like
    * every sampler here.
    *
    * Scale: the cluster-size frame is bounded by the DUPLICATE
    * population (≪ corpus) and broadcast-joins into one corpus scan;
    * unclustered docs default to size 1 with no join hit. Top-k is
    * TakeOrdered on the scored scan — no window, no shuffle.
    */
  def dedupWeightedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val labels = Dedup.connectedComponents(
      TextOps.tokenJaccard(s, dir).select("doc_a", "doc_b"), "doc_a", "doc_b")
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("csize"))
    val perDoc = labels.join(sizes, "label")
      .select(col("node").as("doc_id"), col("csize"))
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
               .cast("double") + lit(1.0)) / lit(4294967297.0)
    val out = Tables.documents(s, dir)
      .filter(col("doc_id") < 1000)
      .join(broadcast(perDoc), Seq("doc_id"), "left")
      .withColumn("cluster_size", coalesce(col("csize"), lit(1L)))
      .withColumn("skey", log(u) * col("cluster_size"))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("source"), col("cluster_size"),
              microRound(col("skey"), 9).as("skey"))
    Dedup.materialized(out) { labels.unpersist() }
  }

  /** smp04: cluster-balanced curation — cap every embedding cluster at
    * m members, ranked by a deterministic per-row hash (the diversity
    * counterweight to frequency: a dominant cluster contributes m
    * vectors, a rare one keeps everything — the cluster-cap step of
    * SemDeDup/DataComp-style curation, and recap-worker's per-cluster
    * input cap). Cells here are the stored labels for oracle parity;
    * at scale they are sim06's k-means cells (⌈√N⌉ of them), so the
    * per-cell window input shrinks relative to the corpus as it grows.
    *
    * The rank hash is the same md5 trick as smp01/smp03: reproducible,
    * retry-safe, engine-mirrorable — never rand().
    */
  def clusterBalanced(s: SparkSession, dir: String, m: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label")
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"))
      .withColumn("samp_rank", row_number().over(w))
      .filter(col("samp_rank") <= m)
  }

  /** smp05: temperature-scaled mixture shares — the multilingual /
    * multi-source upsampling rule q_s ∝ p_s^α (α < 1 flattens the
    * head, α = 1 is proportional, α → 0 is uniform; the exponent-
    * smoothed sampling introduced for cross-lingual pretraining and
    * standard for training-mix design since). Where smp02 flattens to
    * an exactly uniform target by downsampling only, smp05 keeps a
    * tunable interpolation between natural and uniform and reports the
    * per-source boost factor q_s / p_s that a sampler must apply.
    *
    * Scale: one map-side-combined aggregation over the corpus produces
    * the |sources|-row frame; every window below runs on that frame,
    * so cost is independent of corpus size beyond the single scan.
    */
  def temperatureMixture(s: SparkSession, dir: String,
                         alpha: Double = 0.3): DataFrame = {
    import graft.functions.TextFunctions.tokenCount
    val bySource = Tables.documents(s, dir)
      .select(col("source"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
    bySource
      .withColumn("cur_share", col("tokens") / sum("tokens").over())
      .withColumn("pa", pow(col("cur_share"), lit(alpha)))
      .withColumn("temp_share", col("pa") / sum("pa").over())
      .select(col("source"), col("n_docs"), col("tokens"),
              microRound(col("cur_share"), 6).as("cur_share"),
              microRound(col("temp_share"), 6).as("temp_share"),
              microRatio(col("temp_share"), col("cur_share"), 4).as("boost"))
  }

  /** smp07: round-robin fair capping across groups — acolyte's
    * fact-cap (acolyte-orchestrator/.../fact_normalizer_node.py:64
    * `_cap_round_robin`): when the total exceeds the cap, interleave
    * one item from each section in section-first-appearance order
    * until the cap fills, so one overloaded section can't starve the
    * others.
    *
    * The loop is set-expressible: selection order = (per-section rank
    * by insertion order, section first-appearance) — the i-th pass of
    * the round picks every section's i-th item. So the cap is a
    * window rank + ONE TakeOrdered; no iteration, no driver loop.
    * Under the cap the input passes through untouched (:70).
    */
  def roundRobinCapOn(items: DataFrame, maxTotal: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySection = Window.partitionBy("section_key")
      .orderBy(col("pos").asc)
    val sectionFirst = Window.partitionBy("section_key")
    val ranked = items
      .withColumn("rn", row_number().over(bySection))
      .withColumn("section_first", min("pos").over(sectionFirst))
    val total = items.count()
    if (total <= maxTotal) items
    else ranked
      .orderBy(col("rn").asc, col("section_first").asc)
      .limit(maxTotal)
      .drop("rn", "section_first")
  }

  /** smp07 adapter: documents as quotes, source as the section,
    * doc_id as insertion order, cap 100.
    */
  def smp07(s: SparkSession, dir: String): DataFrame =
    roundRobinCapOn(
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source").as("section_key"),
          col("doc_id").as("pos"), col("n_chars")),
      maxTotal = 100)

  /** smp08: genre-balanced, source-fair assignment trimming —
    * recap-worker's select-stage cap (recap-worker/recap-worker/src/
    * pipeline/select/trimming.rs:10 trim_assignments):
    *
    *  - per genre, candidates rank by the select score
    *    (select/scoring.rs:9 calculate_score — max(classifier,
    *    keyword) confidence ×0.5 + exp(−0.005·age_hours) freshness
    *    ×0.3 + min(tag_overlap/5, 1) ×0.2);
    *  - the cap is DYNAMIC: effective_min = max(per-genre threshold,
    *    ceil(10% of the genre's candidates)), adjusted_max =
    *    max(max_articles, 2·effective_min) — a big genre keeps more
    *    so trimming can't flatten real signal (:39-55);
    *  - selection is per-SOURCE round-robin in source-name order,
    *    each source's queue in score order (:57-109) — the smp07
    *    fairness discipline: selection order = (per-source rank,
    *    source name), truncated at adjusted_max.
    *
    * Everything is three windows partitioned by genre / (genre,
    * source) — no iteration; reference ties follow the stable sort's
    * input order, determinized here by id.
    */
  def genreTrimOn(assignments: DataFrame,
                  maxArticlesPerGenre: Int = 12,
                  minDocumentsPerGenre: Int = 3,
                  thresholds: Map[String, Int] = Map.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySource = Window.partitionBy("genre", "source")
      .orderBy(col("score").desc, col("id").asc)
    val byGenre = Window.partitionBy("genre")
    val bySelection = Window.partitionBy("genre")
      .orderBy(col("rn_source").asc, col("source").asc)
    val thresholdCol = thresholds.foldLeft(lit(minDocumentsPerGenre)) {
      case (acc, (g, v)) => when(col("genre") === g, v).otherwise(acc)
    }
    assignments
      .withColumn("rn_source", row_number().over(bySource))
      .withColumn("n_genre", count(lit(1)).over(byGenre))
      .withColumn("sel_rank", row_number().over(bySelection))
      .withColumn("effective_min",
        greatest(thresholdCol.cast("long"), ceil(col("n_genre") * 0.1)))
      .withColumn("adjusted_max",
        greatest(lit(maxArticlesPerGenre.toLong), col("effective_min") * 2))
      .filter(col("sel_rank") <= col("adjusted_max"))
      .select("genre", "id", "source", "score", "sel_rank")
  }

  /** smp08 adapter: genre = the document language, the select score
    * composed from deterministic confidence/freshness/tag signals
    * ("now" anchors at the id horizon — batch has no wall clock; the
    * exp-derived component rounds to 6-dp exact units before ranking
    * so order can't flip on a ulp).
    */
  def smp08(s: SparkSession, dir: String): DataFrame = {
    val keywordConf = pmod(col("doc_id") * 13, lit(100)) / 100.0
    val classifierConf = when(pmod(col("doc_id"), lit(3)) === 0, lit(null))
      .otherwise(pmod(col("doc_id") * 29, lit(100)) / 100.0)
    val base = greatest(coalesce(classifierConf, keywordConf), keywordConf)
    val ageHours = pmod(col("doc_id"), lit(168)).cast("double")
    val fresh = exp(ageHours * -0.005)
    val tagScore = least(pmod(col("doc_id"), lit(7)) / 5.0, lit(1.0))
    genreTrimOn(
      Tables.documents(s, dir).select(
        col("lang").as("genre"), col("doc_id").as("id"), col("source"),
        microRound(base * 0.5 + fresh * 0.3 + tagScore * 0.2, 6).as("score")),
      thresholds = Map("en" -> 5))
  }
}
