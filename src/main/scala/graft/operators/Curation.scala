package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end corpus curation — the gates a pretraining data pipeline
  * actually chains, composed from the library's own operators into ONE
  * auditable verdict table: quality rules (tx39), exact dedup (tx06
  * semantics), near-dup clusters (tx07/dd02 semantics), and benchmark
  * decontamination (tx26), with a per-document flag for every gate.
  * Emitting the full flag lineage instead of just the survivor list is
  * the operational form: data audits ask "WHY was this dropped", and
  * ablations re-weight individual gates without re-running the corpus.
  *
  * Scale: each gate keeps its own audited plan (stateless rule
  * projection; hash-window exact groups; banded LSH + size-gated
  * components; eval shingles broadcast into the scan). The composition
  * itself adds only two BROADCAST joins over the corpus — near-dup
  * victims and contaminated ids are both ≪ corpus by construction —
  * so the pipeline costs its most expensive gate, not the sum of full
  * passes. Callers chaining several gates over the same corpus should
  * persist `docs` (pp01 does); curateOn leaves caching to the caller.
  */
object Curation {

  /** Verdict table over any (doc_id, source, text) corpus: one row per
    * non-eval document, one boolean per gate, `keep` = conjunction.
    * `isEval` marks held-out benchmark docs — they are the
    * contamination reference, not training candidates, so they carry
    * no verdict row.
    */
  def curateOn(docs: DataFrame, isEval: org.apache.spark.sql.Column,
               minhashThreshold: Double = 0.5,
               contamShingle: Int = 8): DataFrame = {
    val corpus = docs.filter(!isEval)
      .select(col("doc_id"), col("source"), col("text"))

    // gate 1: quality rule battery — stateless projection
    val quality = TextOps.gopherRulesOn(corpus)
      .select(col("doc_id"), col("source"), col("keep").as("quality_keep"))

    // gate 2: exact dedup — the min doc_id per text hash survives.
    // groupBy + keeper-list join, NOT min().over(partitionBy(h)): a
    // window buffers each hash group on one task, and a crawl's
    // degenerate exact-dup group (same boilerplate × millions) is
    // exactly the group that must not single-task; the aggregate form
    // map-side combines it away (the dd04 lesson). The keeper LIST
    // (one doc_id per distinct text) joins back on doc_id — the md5
    // projection over the corpus evaluates exactly once, and the join
    // lands on the same doc_id partitioning the final assembly uses,
    // instead of a second hash-keyed probe of the corpus.
    val keepers = corpus.select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select(col("doc_id"), lit(true).as("__keeper"))

    // gate 3: near-dup clusters — banded LSH pairs, connected
    // components, min-id representative survives (dd02's decision);
    // the victim list is bounded by the duplicate population and is
    // materialized so the component labels release before the big join
    val labels = Dedup.connectedComponents(
      Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = minhashThreshold),
      "doc_a", "doc_b")
    val victims = Dedup.materialized(
      labels.filter(col("node") =!= col("label"))
        .select(col("node").as("doc_id"), lit(true).as("__victim"))) {
      labels.unpersist()
    }

    // gate 4: decontamination — any shared n-gram with the eval set
    val contaminated = TextOps.decontaminationOn(docs, isEval, contamShingle)
      .select(col("doc_id"), lit(false).as("decontam_keep"))

    quality
      .join(keepers, Seq("doc_id"), "left")
      .withColumn("exact_keep", col("__keeper").isNotNull)
      .drop("__keeper")
      .join(broadcast(victims), Seq("doc_id"), "left")
      .withColumn("neardup_keep", col("__victim").isNull)
      .drop("__victim")
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .withColumn("decontam_keep", coalesce(col("decontam_keep"), lit(true)))
      .withColumn("keep",
        col("quality_keep") && col("exact_keep") &&
        col("neardup_keep") && col("decontam_keep"))
  }

  /** pp01 adapter: flag-combination survival counts — the
    * corpus-size-independent audit summary (the per-doc verdict frame
    * is `curateOn` itself). Eval split follows tx26's convention.
    */
  def pp01(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = curateOn(docs, col("doc_id") % 100 === 0)
      .groupBy("keep", "quality_keep", "exact_keep", "neardup_keep", "decontam_keep")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("keep", "quality_keep", "exact_keep", "neardup_keep", "decontam_keep")
    Dedup.materialized(out) { docs.unpersist(blocking = false) }
  }

  /** pp02: the post-curation soft language quota (acolyte-orchestrator/
    * acolyte/domain/language_quota.py:38 `rebalance_by_language`): a
    * relevance-ranked top-K per section can squeeze out an
    * under-represented language even when the pool has strong
    * candidates (the module's own BM25-on-Japanese-topics rationale),
    * so after ranking, each quota language is topped up to
    * ceil(K·share) slots by swapping its best unselected pool
    * candidates in for the weakest non-protected curated items —
    * unknown-language (`und`, :52) items displaced FIRST, then by
    * ascending score with list order breaking ties (:101).
    *
    * The swap loop is set-expressible for a single quota language:
    * deficit d = min(required − current, |candidates|, |displaceable|);
    * the d best candidates (score desc, pool order asc) replace the d
    * weakest non-protected items (und first, score asc, slot asc),
    * each inheriting its victim's SLOT (:92 — order preservation is
    * part of the contract). Three bounded windows per section — the
    * curated frame is K·|sections| rows, never the corpus.
    *
    * Output: the rebalanced per-section selection with slot, language,
    * score, and a swapped_in flag.
    */
  def languageQuotaOn(curated: DataFrame, pool: DataFrame,
                      quotaLang: String, share: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = Window.partitionBy("section_key")
    val isQuota = col("language") === quotaLang
    val cur = curated
      .withColumn("slots", count(lit(1)).over(k))
      .withColumn("required", ceil(col("slots") * share))
      .withColumn("current", sum(isQuota.cast("int")).over(k))
    // weakest displaceable curated items: und first, then score asc,
    // then slot asc (the stable-sort tie rule)
    val wWeak = Window.partitionBy("section_key").orderBy(
      (col("language") =!= "und").asc, col("score").asc, col("slot").asc)
    val weak = cur.filter(!isQuota)
      .withColumn("wrank", row_number().over(wWeak))
    // best unselected pool candidates of the quota language:
    // score desc, pool order asc (Python's stable sort)
    val wCand = Window.partitionBy("section_key").orderBy(
      col("score").desc, col("pos").asc)
    val cand = pool.filter(isQuota)
      .join(curated.select(col("section_key"), col("id")), Seq("section_key", "id"),
        "left_anti")
      .withColumn("crank", row_number().over(wCand))
    // deficit per section, capped by both availabilities
    val nCand = cand.groupBy("section_key").agg(count(lit(1)).as("n_cand"))
    val nWeak = weak.groupBy("section_key").agg(count(lit(1)).as("n_weak"))
    val d = cur.select("section_key", "required", "current").distinct()
      .join(nCand, Seq("section_key"), "left")
      .join(nWeak, Seq("section_key"), "left")
      .select(col("section_key"),
        greatest(lit(0L),
          least(col("required") - col("current"),
            coalesce(col("n_cand"), lit(0L)),
            coalesce(col("n_weak"), lit(0L)))).as("d"))
    val keptQuota = cur.filter(isQuota)
      .select(col("section_key"), col("id"), col("language"), col("score"),
        col("slot"), lit(false).as("swapped_in"))
    val keptOther = weak.join(broadcast(d), "section_key")
      .filter(col("wrank") > col("d"))
      .select(col("section_key"), col("id"), col("language"), col("score"),
        col("slot"), lit(false).as("swapped_in"))
    val victims = weak.select(col("section_key").as("w_sk"),
      col("wrank"), col("slot").as("victim_slot"))
    val swapped = cand.join(broadcast(d), "section_key")
      .filter(col("crank") <= col("d"))
      .join(victims,
        col("crank") === col("wrank") && col("section_key") === col("w_sk"))
    keptQuota.unionByName(keptOther).unionByName(
      swapped.select(col("section_key"), col("id"), col("language"),
        col("score"), col("victim_slot").as("slot"), lit(true).as("swapped_in")))
  }

  /** pp03: evidence-corpus scoring with the domain-diversity penalty
    * (recap-worker pipeline/evidence.rs:242 calculate_score): score =
    * 0.5·confidence + 0.3·info + 0.2·freshness, where info is the
    * MIDPOINT of the keyword factor (tag_overlap·0.1 capped 1) and
    * the length factor (tokens/2000 capped 1), freshness decays
    * exp(−age_days/7) with 0.5 for unknown dates — minus a flat 0.2
    * penalty when the article's DOMAIN appears more than 3 times in
    * the genre's assignment set (:283 — the anti-monoculture guard),
    * floored at 0.
    *
    * The reference recomputes the domain count per article with a
    * linear scan (O(n²) per genre); here it is ONE (genre, domain)
    * aggregation broadcast back onto the scan — same numbers, linear.
    */
  def evidenceScoresOn(assignments: DataFrame): DataFrame = {
    import graft.functions.Numeric.microRound
    val counts = assignments.groupBy("genre", "domain")
      .agg(count(lit(1)).as("domain_count"))
    val kwFactor = least(col("tag_overlap") * 0.1, lit(1.0))
    val lenFactor = least(col("token_count") / 2000.0, lit(1.0))
    val info = (kwFactor + lenFactor) / 2
    val fresh = when(col("age_days").isNull, 0.5)
      .otherwise(exp(col("age_days") / -7.0))
    assignments.join(broadcast(counts), Seq("genre", "domain"))
      .select(col("genre"), col("id"), col("domain"), col("domain_count"),
        microRound(
          greatest(
            col("confidence") * 0.5 + info * 0.3 + fresh * 0.2 -
              when(col("domain_count") > 3, 0.2).otherwise(0.0),
            lit(0.0)), 6).as("score"))
  }

  def pp03(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{pmod => pm}
    val d = Tables.documents(s, dir)
    evidenceScoresOn(d.select(
      col("lang").as("genre"), col("doc_id").as("id"), col("source").as("domain"),
      (pm(col("doc_id") * 31, lit(100)) / 100.0).as("confidence"),
      pm(col("doc_id"), lit(15)).as("tag_overlap"),
      col("n_chars").as("token_count"),
      when(pm(col("doc_id"), lit(9)) === 0, lit(null))
        .otherwise(pm(col("doc_id"), lit(30)).cast("double")).as("age_days")))
  }

  /** pp02 adapter: per-source top-10 by a deterministic relevance
    * score (n_chars as the stand-in, doc order breaking ties), pool =
    * the whole source, quota en ≥ 20%; a doc slice reads as `und` to
    * exercise the displaced-first rule.
    */
  def pp02(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(
      col("source").as("section_key"), col("doc_id").as("id"),
      when(col("doc_id") % 23 === 0, "und").otherwise(col("lang")).as("language"),
      col("n_chars").cast("double").as("score"), col("doc_id").as("pos"))
    val wTop = Window.partitionBy("section_key")
      .orderBy(col("score").desc, col("pos").asc)
    val curated = docs.withColumn("slot", row_number().over(wTop))
      .filter(col("slot") <= 10)
    languageQuotaOn(curated, docs, "en", 0.2)
  }
}
