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
    */
  def lp01(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(col("doc_id") < 500)
    val nodes = d.select(col("doc_id").as("node"), col("lang").as("label"))
    val byarc = d.select(col("doc_id"), col("source"))
    val edges = byarc.as("a").join(byarc.as("b"), "source")
      .filter(col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    propagate(edges, nodes)
      .groupBy("label").agg(count(lit(1)).as("n_nodes"))
  }
}
