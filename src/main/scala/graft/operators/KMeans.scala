package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables

/** Spherical k-means (cosine Lloyd iterations) over an embedding
  * corpus.
  *
  * Mirrors recap-worker's clustering step
  * (recap-worker/recap-worker/src/util/kmeans.rs:22 KMeans::new — k-means over
  * sentence embeddings for recap grouping), as iterated DataFrame
  * plans: each iteration is one broadcast-assign (no shuffle of the
  * corpus) plus one posexplode aggregation (one shuffle keyed by
  * (cluster, dim) — bounded by k×dim groups). Centroids stay tiny and
  * broadcast; the corpus is persisted once and never re-shuffled, so
  * iteration cost is linear scans — the plan a 100 TB run needs.
  */
object KMeans {

  /** Run `iters` Lloyd iterations from label-seeded clusters; returns
    * (vec_id, cluster, cc) assignments of the final iteration. Uses
    * the shared Similarity.centroidsFor / assignToCentroids building
    * blocks; each iteration's cache is dropped once the next one
    * materializes (only the corpus + the live assignment stay cached).
    */
  def fit(e: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val corpus = e.select("vec_id", "embedding").persist(StorageLevel.MEMORY_AND_DISK)
    var assigned = e.select(col("vec_id"), col("embedding"), col("label").as("cell"))
      .withColumn("cc", lit(null).cast("double"))
    var i = 0
    while (i < iters) {
      // assignToCentroids collects the k centroids to the driver and
      // bakes them into the next plan as literals, so each iteration's
      // lineage is exactly (corpus cache scan → one projection) — no
      // chained lineage, no per-iteration persist, no corpus fan-out.
      val cents = Similarity.centroidsFor(assigned, "cell")
      assigned = Similarity.assignToCentroids(corpus, cents)
      i += 1
    }
    corpus.unpersist(blocking = false)
    assigned.withColumnRenamed("cell", "cluster")
  }

  /** Mean cosine of vectors to their assigned centroid — the
    * monotonicity witness (must not decrease across iterations).
    */
  def cost(assigned: DataFrame): Double =
    assigned.agg(avg("cc")).head.getDouble(0)

  /** km01 adapter: cluster sizes + rounded mean in-cluster cosine
    * after 3 iterations (rows-only: iterative FP has no SQL oracle).
    */
  def km01(s: SparkSession, dir: String): DataFrame =
    fit(Tables.embeddings(s, dir), 3)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"), round(avg("cc"), 4).as("mean_cos"))
      .orderBy("cluster")
}
