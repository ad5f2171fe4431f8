package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.{microRound, units}
import graft.functions.VectorFunctions.cosineSim

/** gp01/gp02: the production rescue-pass label propagation of
  * recap-worker's `classifier/graph.rs` — NOT the majority-vote LP of
  * evaluation/genre.rs that lp01/lp02 map. `GraphPropagator` is wired
  * at classifier/workflow.rs:309 (startup build, threshold 0.5, empty
  * candidate set) and :600-601/:662 (the rescue pass proper).
  *
  * Reference semantics, per function:
  *
  *  - `combine_feature_vector` (graph.rs:212-223) concatenates the
  *    tfidf / bm25 / embedding blocks — a pure concat, no compute; the
  *    entries here feed the embedding block (the tfidf/bm25 halves are
  *    hm01/hm03's features — block concatenation is data plumbing).
  *  - `normalize_vector` (:226-232): L2-normalize; a ZERO vector stays
  *    zero, so its cosine to everything is 0 and it never clears any
  *    threshold — the graft `cosineSim` expression returns NULL on a
  *    zero norm, which fails every `>=` the same way (spec-pinned).
  *  - `build_graph` (:52-174): one node per article WITH a feature
  *    vector; edges between pairs with cosine ≥ `similarity_threshold`,
  *    EXCEPT labeled–labeled pairs (:129-131), and gated by the
  *    centroid-candidate set: the i<j loop `continue`s when the
  *    EARLIER node is unlabeled and not a candidate (:117-119), so a
  *    non-candidate unlabeled node can still receive an edge from an
  *    earlier labeled node but not from a later one — an
  *    insertion-order asymmetry [[buildEdges]] reproduces exactly
  *    (insertion order pinned to ascending id; the reference's order
  *    is the upstream articles Vec, not pinned there). The rescue-pass
  *    wiring (workflow.rs:560-567) puts EVERY article in the candidate
  *    set, which collapses the gate to "all pairs except
  *    labeled–labeled" — the oracled entry's shape.
  *  - `propagate_labels` (:180-211): ONE hop from each labeled node to
  *    its unlabeled neighbors, no vote — `propagated_labels.insert`
  *    overwrites, so a contested neighbor takes whichever labeled
  *    source the node iteration visits LAST. petgraph `node_indices()`
  *    iterates in insertion order, so the winner is the
  *    greatest-insertion-ordinal labeled neighbor; with insertion
  *    order pinned to ascending id the winner is the MAX-id labeled
  *    neighbor (the hd01 pin-where-nondeterministic precedent — the
  *    reference's article order itself is an upstream artifact).
  *  - `predict_by_neighbors` (:394-477, wired at workflow.rs:662 with
  *    k=5): cosine against every LABELED node, per-label threshold
  *    from the `thresholds` map with 0.3 as the fallback (:420).
  *    QUIRK, pinned: the wiring builds `{"default": 0.5}` — a key that
  *    is never a genre label — so the lookup `thresholds.get(label)`
  *    always misses and the EFFECTIVE threshold is 0.3 for every
  *    genre; the 0.5 is dead config. Candidates sort by similarity
  *    descending (unstable `sort_by` — ties pinned here to ascending
  *    node id), the top k=5 vote with their similarity as weight
  *    (`votes[label] += score`, an f32 accumulation re-expressed as an
  *    exact 1e-6-unit integer sum, tx18's discipline), and the winner
  *    is the max summed score (`max_by` on HashMap iteration — ties
  *    pinned to ascending genre).
  *  - `random_walk_with_restart` (:258-352) has ZERO non-test callers
  *    (the minhash.rs caller-less precedent) — ledgered, not built.
  *  - `graph_stats` (:247) is a debug accessor; the CSR plumbing
  *    (:355-390) is petgraph-to-sprs marshalling.
  *
  * Thresholds: `GraphPropagator::default()` is 0.85 (graph.rs:480-485)
  * and the startup build uses 0.5 (workflow.rs:309). On the synthetic
  * embedding corpus no labeled–unlabeled pair reaches either (measured:
  * zero pairs ≥ 0.5 at sf0.01), so the oracled entries run at the 0.3
  * operating point — the same corpus-matched choice sim03 made, and
  * exactly the effective `predict_by_neighbors` threshold; the 0.85 /
  * 0.5 wiring constants are spec-pinned on planted vectors instead.
  *
  * Scale: the reference materializes the whole batch as an in-RAM
  * petgraph — the rescue pass is a PER-RUN bounded batch (one
  * classification job's articles), not a corpus scan; that premise is
  * kept here by broadcasting the labeled (golden) side and streaming
  * the unlabeled side through one BroadcastNestedLoopJoin (the sim01
  * brute-force shape — the labeled side is the small dimension). The
  * propagation winner and the kNN vote are single map-side-combinable
  * aggregations; the only window ranks ≤k candidates per target. At
  * 100 TB the unlabeled side partitions freely; the labeled golden set
  * stays broadcast-sized by construction.
  */
object GraphRescue {

  /** Labeled (id, genre, vec) + unlabeled (id, vec) node frames from
    * the embeddings table: every third vector is golden-labeled.
    */
  private def nodes(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(s, dir)
    val lab = e.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").as("src_id"),
        concat(lit("g"), col("label").cast("string")).as("genre"),
        col("embedding").as("emb_l"))
    val unl = e.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding").as("emb_u"))
    (lab, unl)
  }

  /** build_graph's labeled→unlabeled edge residue under the candidate
    * gate: `candidates` NULL-joined means all-candidates (the rescue
    * wiring); otherwise an unlabeled node not in the set only keeps
    * edges from labeled nodes with a SMALLER id (insertion-order pin).
    * Unlabeled–unlabeled edges exist in the reference graph but carry
    * no labels — propagation never reads them, so they are not
    * materialized (plan hygiene, same semantics).
    */
  def buildEdges(lab: DataFrame, unl: DataFrame, threshold: Double,
                 candidates: Option[DataFrame] = None): DataFrame = {
    val pairs = unl.join(broadcast(lab),
      microRound(cosineSim(col("emb_u"), col("emb_l")), 6) >= threshold)
    candidates match {
      case None => pairs
      case Some(c) =>
        val cand = broadcast(c.select(col("id").as("cand_id"), lit(1).as("is_cand")))
        pairs.join(cand, col("vec_id") === col("cand_id"), "left")
          .filter(col("is_cand").isNotNull || col("src_id") < col("vec_id"))
          .drop("cand_id", "is_cand")
    }
  }

  /** propagate_labels over an edge residue: per unlabeled node, the
    * last-writer labeled source = max src_id (pin), plus the labeled
    * in-degree as a diagnostic.
    */
  def propagateOneHop(edges: DataFrame): DataFrame =
    edges.groupBy("vec_id")
      .agg(max(struct(col("src_id"), col("genre"))).as("w"),
        count(lit(1)).as("n_sources"))
      .select(col("vec_id"), col("w.genre").as("genre"),
        col("w.src_id").as("src_vec_id"), col("n_sources"))

  /** gp01 entry: the rescue wiring — all articles candidates, one-hop
    * propagation at the corpus operating point.
    */
  def gp01(s: SparkSession, dir: String): DataFrame = {
    val (lab, unl) = nodes(s, dir)
    propagateOneHop(buildEdges(lab, unl, 0.3))
  }

  /** predict_by_neighbors over labeled nodes: per-target top-k
    * threshold-gated similarity vote. `thresholds` is the reference's
    * per-label map; a missing label falls back to 0.3 (:420).
    */
  def predictByNeighbors(lab: DataFrame, targets: DataFrame, k: Int,
                         thresholds: Map[String, Double]): DataFrame = {
    val thr =
      if (thresholds.isEmpty) lit(0.3)
      else coalesce(element_at(typedLit(thresholds), col("genre")), lit(0.3))
    val cand = targets.join(broadcast(lab), lit(true))
      .withColumn("cu", units(cosineSim(col("emb_u"), col("emb_l")), 6))
      .filter(col("cu") >= round(thr * 1e6, 0).cast("long"))
    val topK = cand
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cu").desc, col("src_id").asc)))
      .filter(col("rk") <= k)
    topK.groupBy("vec_id", "genre")
      .agg(sum("cu").as("score_u"))
      .groupBy("vec_id")
      .agg(min(struct((-col("score_u")).as("ns"), col("genre").as("g"))).as("w"))
      .select(col("vec_id"), col("w.g").as("genre"),
        ((-col("w.ns")).cast("long") / 1e6).as("score"))
  }

  /** gp02 entry: the workflow.rs:662 wiring — k=5, the dead
    * `{"default": 0.5}` thresholds map (effective 0.3 everywhere).
    */
  def gp02(s: SparkSession, dir: String): DataFrame = {
    val (lab, unl) = nodes(s, dir)
    predictByNeighbors(lab, unl, 5, Map("default" -> 0.5))
  }

  /** sim03's DuckDB cosine (double promotion per element, like the
    * Spark expression).
    */
  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
        (sqrt(list_sum(list_transform(list_zip($a, $a), x -> CAST(x[1] AS DOUBLE) * CAST(x[1] AS DOUBLE)))) *
         sqrt(list_sum(list_transform(list_zip($b, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[1] AS DOUBLE))))))"""

  private val nodesSql: String =
    s"""lab AS (SELECT vec_id AS src_id, 'g' || label AS genre, embedding AS el
                FROM embeddings WHERE vec_id % 3 = 0),
        unl AS (SELECT vec_id, embedding AS eu
                FROM embeddings WHERE vec_id % 3 <> 0)"""

  /** DuckDB twin of [[gp01]]: labeled→unlabeled cosine edges at the
    * operating point, last-writer = max src_id.
    */
  val gp01OracleSql: String =
    s"""WITH $nodesSql,
        p AS (SELECT u.vec_id, l.src_id, l.genre
              FROM unl u JOIN lab l
                ON CAST(round(${duckCos("u.eu", "l.el")} * 1e6) AS BIGINT) / 1e6 >= 0.3)
        SELECT vec_id, genre, src_id AS src_vec_id, n_sources FROM (
          SELECT vec_id, genre, src_id,
                 count(*) OVER (PARTITION BY vec_id) AS n_sources,
                 row_number() OVER (PARTITION BY vec_id ORDER BY src_id DESC) AS rn
          FROM p) WHERE rn = 1"""

  /** DuckDB twin of [[gp02]]: threshold-gated candidates in exact 1e-6
    * units, top-5 (sim desc, src asc), per-genre unit sum, winner
    * (score desc, genre asc).
    */
  val gp02OracleSql: String =
    s"""WITH $nodesSql,
        cand AS (SELECT u.vec_id, l.src_id, l.genre,
                        CAST(round(${duckCos("u.eu", "l.el")} * 1e6) AS BIGINT) AS cu
                 FROM unl u JOIN lab l ON TRUE),
        gated AS (SELECT * FROM cand WHERE cu >= 300000),
        topk AS (SELECT * FROM (
                   SELECT *, row_number() OVER (PARTITION BY vec_id
                             ORDER BY cu DESC, src_id ASC) AS rk
                   FROM gated) WHERE rk <= 5),
        votes AS (SELECT vec_id, genre, CAST(sum(cu) AS BIGINT) AS score_u
                  FROM topk GROUP BY vec_id, genre)
        SELECT vec_id, genre, score_u / 1e6 AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY score_u DESC, genre ASC) AS rn
          FROM votes) WHERE rn = 1"""
}
