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
}
