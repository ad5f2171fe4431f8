package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Graph-shaped operators: label propagation over a document graph.
  *
  * Mirrors recap-worker's genre categorization — "genre categorizations
  * are solved using sprs-based sparse matrix graph label propagation"
  * (reference README; recap-worker/recap-worker/src/evaluation/genre.rs)
  * — re-expressed as one DataFrame join-aggregate per iteration: the
  * adjacency is an equi-join on the blocking key, the propagation step a
  * per-node majority vote. Iterations chain by re-invoking `propagate`
  * (each is one shuffle keyed by node; at 100 TB the edge list would be
  * bucketed by node id so iterations reuse the partitioning).
  */
object Graph {

  /** One label-propagation step over an edge list (src, dst) and node
    * labels (node, label): each node takes the majority label among its
    * neighbors, ties broken by smallest label; isolated nodes keep
    * their own label.
    */
  def propagate(edges: DataFrame, labels: DataFrame): DataFrame = {
    val votes = edges
      .join(labels.withColumnRenamed("node", "dst"), "dst")
      .groupBy(col("src").as("node"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("node").orderBy(col("votes").desc, col("label").asc)
    val winners = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("node"), col("label").as("new_label"))
    labels.join(winners, Seq("node"), "left")
      .select(col("node"), coalesce(col("new_label"), col("label")).as("label"))
  }

  /** lp01 adapter: document graph with edges between docs sharing a
    * source (bounded to doc_id < 500), seeded with the lang column;
    * output = label distribution after one propagation step.
    *
    * The shared-source graph is a union of cliques, so the vote never
    * needs the doc×doc adjacency (m² edges per source — one hub source
    * with a million docs would materialize 10¹² edges): a node's
    * neighbor votes are exactly the per-source label histogram minus
    * itself. Two bounded shuffles — histogram keyed by (source, label),
    * then an equi-join of docs to their source's histogram — and the
    * per-doc winner is an arithmetic scan of a ≤|labels| array:
    * `array_min` over struct(-votes, label) encodes the (votes desc,
    * label asc) tie-break. Empty vote set (singleton source) keeps the
    * doc's own label, matching `propagate` on isolated nodes.
    */
  /** Weighted PageRank over a directed edge list (src, dst, w):
    * r ← (1-d)/N + d · Σ_{(j,i)∈E} (w_ji / W_j) · r_j, fixed iteration
    * count (the power method; Page et al. 1999, public). Per iteration:
    * ONE shuffle — contributions equi-joined edge⋈rank on src, summed
    * by dst; the (small) rank table rides the edge partitioning. Edge
    * shares and the node list are computed once and persisted; at
    * 100 TB the edge list is the big side and would be bucketed by src
    * so every iteration reuses its partitioning (the lp01 note).
    *
    * No dangling-mass redistribution: callers with dangling nodes
    * (out-degree 0) get the leaked-mass variant; symmetrized graphs
    * (every node has out-edges) conserve Σr = 1 exactly.
    *
    * The result is materialized DISTRIBUTED (persist + count) so the
    * internal caches can be released here; callers that keep the
    * session alive should unpersist() the returned (node, rank) frame.
    */
  def weightedPagerank(edges: DataFrame, damping: Double = 0.85,
                       iters: Int = 3): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
    val outW = e.groupBy("src").agg(sum("w").as("wout"))
    val share = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("wout")).as("share"))
      .persist(lvl)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(lvl)
    val n = nodes.count() // one scalar for the teleport constant
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = share.join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share") * col("rank")).as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
           lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
    }
    val out = ranks.persist(lvl)
    out.count()
    share.unpersist(); nodes.unpersist()
    out
  }

  def lp01(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(col("doc_id") < 500)
      .select(col("doc_id"), col("source"), col("lang"))
    val hist = d.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(collect_list(struct(col("lang"), col("cnt"))).as("hist"))
    d.join(hist, "source")
      .withColumn("winner",
        array_min(filter(
          transform(col("hist"), h => struct(
            // null-SAFE equality: a null-lang doc must still subtract
            // its own vote from the null bucket, like the edge-join did
            (when(h.getField("lang") <=> col("lang"), 1).otherwise(0) - h.getField("cnt")).as("nv"),
            h.getField("lang").as("label"))),
          x => x.getField("nv") < 0)).getField("label"))
      .select(coalesce(col("winner"), col("lang")).as("label"))
      .groupBy("label").agg(count(lit(1)).as("n_nodes"))
  }
}
