package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.VectorFunctions.cosineSim

/** Spherical k-means (cosine Lloyd iterations) over an embedding
  * corpus.
  *
  * Mirrors recap-worker's clustering step
  * (recap-worker/recap-worker/src/util/kmeans.rs — k-means over
  * sentence embeddings for recap grouping), as iterated DataFrame
  * plans: each iteration is one broadcast-assign (no shuffle of the
  * corpus) plus one posexplode aggregation (one shuffle keyed by
  * (cluster, dim) — bounded by k×dim groups). Centroids stay tiny and
  * broadcast; the corpus is persisted once and never re-shuffled, so
  * iteration cost is linear scans — the plan a 100 TB run needs.
  */
object KMeans {

  private def centroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(avg(col("v").cast("double")).as("c"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pairs"))
      .select(col("cluster"), transform(col("pairs"), p => p.getField("c")).as("centroid"))

  private def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cc").desc, col("cluster").asc)
    e.join(broadcast(centroids))
      .withColumn("cc", cosineSim(col("embedding"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cluster"), col("cc"))
  }

  /** Run `iters` Lloyd iterations from label-seeded clusters; returns
    * (vec_id, cluster, cc) assignments of the final iteration.
    */
  def fit(e: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    val corpus = e.select("vec_id", "embedding").persist(StorageLevel.MEMORY_AND_DISK)
    var assigned = e.select(col("vec_id"), col("embedding"), col("label").as("cluster"))
      .withColumn("cc", lit(null).cast("double"))
    var i = 0
    while (i < iters) {
      val cents = centroidsOf(assigned)
      assigned = assign(corpus, cents).persist(StorageLevel.MEMORY_AND_DISK)
      i += 1
    }
    assigned
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
