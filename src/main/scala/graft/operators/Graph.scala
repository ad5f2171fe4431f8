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

  /** lp02: iterated label propagation to a fixpoint — the reference
    * does not stop at one vote: recap-worker's genre refinement
    * (recap-worker/recap-worker/src/pipeline/genre_refine/engine.rs)
    * re-propagates until labels stabilize. Monotone semi-supervised
    * variant: seeds are clamped to their ground-truth label, and an
    * unlabeled node takes the majority label among its LABELED
    * neighbors at the round it is first reached (ties → smallest
    * label), then freezes. Freezing is what makes "until stable"
    * well-defined on arbitrary graphs — synchronous re-vote LP
    * 2-cycles on bipartite structures and never reaches a fixpoint,
    * whereas the monotone frontier terminates in ≤ eccentricity(seeds)
    * rounds, guaranteed (`maxIters` is a backstop, not the stopping
    * rule). The loop stops on the first round that labels nothing new.
    * Returns the converged (node, label) frame (null = unreachable
    * from every seed) and the number of rounds run.
    *
    * Scale: the symmetrized edge list is persisted ONCE and every
    * round reuses it — per round one equi-join keyed by src (the
    * labeled frontier rides the edge partitioning), one vote hash
    * aggregate keyed by node (map-side partials — no per-round window
    * sort), and one `changed` count over the just-checkpointed state;
    * at 100 TB the edge list would be bucketed by src so no round ever
    * re-shuffles it (same discipline as weightedPagerank above and the
    * dedup CC loop). Votes are computed only for still-unlabeled
    * TARGETS, so per-round join volume shrinks with the frontier.
    * Label state is per-node (|V|, not |E|), localCheckpoint'd per
    * round so lineage stays round-sized (un-truncated it grows
    * exponentially and the analyzer/explain OOM long before the data
    * hurts), and released as soon as the next round materializes.
    */
  def propagateToConvergence(edges: DataFrame, seeds: DataFrame,
                             maxIters: Int = 20): (DataFrame, Int) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(lvl)
    val nodes = und.select(col("src").as("node"))
      .union(seeds.select(col("node"))).distinct()
    var labels = nodes
      .join(seeds.withColumnRenamed("label", "seed_label"), Seq("node"), "left")
      .select(col("node"), col("seed_label").as("label"))
      .persist(lvl)
    labels.count()
    var iters = 0
    var changed = 1L
    while (changed > 0 && iters < maxIters) {
      val votes = und
        .join(labels.filter(col("label").isNull).select(col("node").as("dst")), "dst")
        .join(labels.filter(col("label").isNotNull)
          .select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("votes"))
      // winner = (votes desc, label asc) — encoded as min over a
      // (-votes, label) struct so the election is a hash aggregate with
      // map-side partials, not a per-round window sort (lp01's trick)
      val winners = votes
        .groupBy("node")
        .agg(min(struct((-col("votes")).as("nv"), col("label").as("l"))).as("w"))
        .select(col("node"), col("w.l").as("new_label"))
      val next = labels.join(winners, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("new_label")).as("label"),
          col("label").as("prev_label"))
        .localCheckpoint(true)
      changed = next.filter(!(col("label") <=> col("prev_label"))).count()
      labels.unpersist()
      labels = next.drop("prev_label")
      iters += 1
    }
    und.unpersist()
    (labels, iters)
  }

  /** lp02 adapter: semi-supervised genre recovery over the embedding
    * near-dup graph — edges are sim05's RP-banded cosine ≥ 0.3 pairs
    * (hash-deterministic), seeds are the true labels of every third
    * vector, and propagation runs to the fixpoint. Output: converged
    * label histogram (-1 = never reached by any labeled component)
    * plus the round count. Rows-only (iterative — not SQL-expressible);
    * GraphSpec pins exact convergence on a planted two-community graph.
    */
  def lp02(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val edges = Similarity.rpNearDupOn(e, threshold = 0.3, bands = 16, rowsPerBand = 6)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val seeds = e.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("node"), col("label").cast("int").as("label"))
    val (labels, iters) = propagateToConvergence(edges, seeds, maxIters = 10)
    labels.groupBy(coalesce(col("label"), lit(-1)).as("label"))
      .agg(count(lit(1)).as("n_nodes"))
      .withColumn("n_iters", lit(iters))
      .orderBy("label")
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
                       iters: Int = 3,
                       smallGraphMax: Long = 2000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col("src"), col("dst"), col("w").cast("double").as("w"))
    // adaptive path (connectedComponents' discipline): the edge list
    // here is a post-aggregation residue bounded by the vocabulary/
    // catalog, orders smaller than the corpus — when it fits the
    // driver comfortably, the power iterations run there instead of
    // paying ~7 shuffle stages per chained plan on a few hundred rows
    // (measured on tx30: 435 edges, 2.8-11 s of pure stage overhead at
    // sf0.1). Same math, same fixed iteration count; the spec pins the
    // two paths to equal ranks. Only the edge COUNT is probed up
    // front; the distributed path below stays the 100 TB form.
    val nEdges0 = e0.persist(lvl).count()
    if (nEdges0 <= smallGraphMax) {
      val spark = edges.sparkSession
      val rows = e0.collect()
      e0.unpersist()
      // deterministic accumulation order: sorted by (src, dst) — the
      // addends are identical to the distributed sums, only the merge
      // order differs (both round stably through the callers' 1e-6
      // presentation units)
      val byKey = rows.map(r => (r.get(0), r.get(1), r.getDouble(2)))
        .sortBy(t => (t._1.toString, t._2.toString))
      val wout = scala.collection.mutable.HashMap.empty[Any, Double]
      byKey.foreach { case (s, _, w) => wout(s) = wout.getOrElse(s, 0.0) + w }
      val nodeSet = scala.collection.mutable.LinkedHashSet.empty[Any]
      byKey.foreach { case (s, d, _) => nodeSet += s; nodeSet += d }
      val n = nodeSet.size
      var rank: Map[Any, Double] = nodeSet.iterator.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.HashMap.empty[Any, Double]
        byKey.foreach { case (s, d, w) =>
          contrib(d) = contrib.getOrElse(d, 0.0) + (w / wout(s)) * rank(s)
        }
        rank = nodeSet.iterator.map(nd =>
          nd -> ((1.0 - damping) / n + damping * contrib.getOrElse(nd, 0.0))).toMap
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          e0.schema("src").dataType, nullable = true),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val out = nodeSet.iterator.map(nd =>
        org.apache.spark.sql.Row(nd, rank(nd))).toSeq
      return spark.createDataFrame(
        java.util.Arrays.asList(out: _*), schema)
    }
    val e = e0
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
    share.unpersist(); nodes.unpersist(); e0.unpersist()
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
