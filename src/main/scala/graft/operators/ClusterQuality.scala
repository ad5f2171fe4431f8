package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.{microRatio, microRound}
import graft.functions.TextFunctions.{jaccard, tokens}
import graft.functions.VectorFunctions.cosineSim

/** Pulse cluster-quality diagnosis — recap-worker's pre-publication
  * gate on article clusters (recap-worker/recap-worker/src/pipeline/
  * pulse/cluster_quality.rs):
  *
  *  - cohesion (:104): mean pairwise word-Jaccard of member TITLES
  *    (< 2 members → 1.0);
  *  - ambiguity (:141): share of member-embedding pairs whose cosine
  *    falls below the similarity threshold (default 0.5; < 2 members
  *    → 0.0) — higher means the cluster straddles topics;
  *  - entity consistency (:179): share of members containing the
  *    MODAL entity — counted once per member (the HashSet per
  *    article), while top_entities (:211) ranks by TOTAL mentions;
  *    the two denominators differing is reference semantics;
  *  - the three-tier diagnosis (:240): Ok = all thresholds pass,
  *    Caution = exactly one miss, Ng = two or more (defaults
  *    cohesion ≥ 0.3, ambiguity ≤ 0.5, consistency ≥ 0.4 —
  *    pulse/config.rs:108).
  *
  * The reference's top-entity tie order inherits Rust HashMap
  * iteration (nondeterministic); here ties break by entity name — a
  * deliberate, documented determinization.
  *
  * Scale: members join on the cluster key, so the pair frame is
  * Σ n_c² over CLUSTER sizes — pulse clusters are small by
  * construction (a topic's articles), never the corpus; both pair
  * metrics ride ONE self-equi-join, entity counts one exploded
  * aggregation. Boundary gates compare 6-dp-rounded exact units (the
  * sim03 discipline), so a tier can never flip on an unrounded
  * double.
  */
object ClusterQuality {

  /** Cluster members composed from the embeddings ⋈ documents id
    * space: EVEN ids cluster within their planted label (embedding-
    * coherent groups — ambiguity low, the Caution band since titles
    * stay lexically mixed), ODD ids cluster by a raw id bucket
    * (label-mixed — ambiguity high, the Ng band); title = the first
    * 8 tokens, entities = tokens of length ≥ 6 (the composed
    * stand-in for NER output; multiset kept for top_entities, set
    * semantics applied in the consistency count).
    */
  def membersFromTables(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"), col("label"))
      .join(Tables.documents(s, dir).select(col("doc_id").as("vec_id"), col("text")),
        "vec_id")
      .select(
        when(pmod(col("vec_id"), lit(2)) === 0,
          lit(1000) + col("label") * 100 + pmod(col("vec_id"), lit(20)))
          .otherwise(pmod(col("vec_id"), lit(50))).as("cluster_id"),
        col("vec_id").as("id"), col("embedding"),
        array_distinct(slice(tokens(col("text")), 1, 8)).as("title"),
        filter(tokens(col("text")), t => length(t) >= 6).as("ents"))

  def clusterQualityOn(members: DataFrame,
                       simThreshold: Double = 0.5,
                       cohesionMin: Double = 0.3,
                       ambiguityMax: Double = 0.5,
                       consistencyMin: Double = 0.4): DataFrame = {
    val a = members.select(col("cluster_id"), col("id").as("id_a"),
      col("title").as("title_a"), col("embedding").as("emb_a"))
    val b = members.select(col("cluster_id"), col("id").as("id_b"),
      col("title").as("title_b"), col("embedding").as("emb_b"))
    val pairs = a.join(b, "cluster_id").filter(col("id_a") < col("id_b"))
      .select(col("cluster_id"),
        round(jaccard(col("title_a"), col("title_b")) * 1e6, 0).cast("long").as("jac_u"),
        microRound(cosineSim(col("emb_a"), col("emb_b")), 6).as("cos6"))
    val pairAgg = pairs.groupBy("cluster_id").agg(
      count(lit(1)).as("npairs"),
      round(sum("jac_u") / count(lit(1)), 0).cast("long").as("coh_u"),
      count(when(col("cos6") < simThreshold, 1)).as("n_low"))
    val ents = members.select(col("cluster_id"), col("id"),
        explode(col("ents")).as("ent"))
      .groupBy("cluster_id", "ent")
      .agg(countDistinct("id").as("n_docs"), count(lit(1)).as("mentions"))
    val consistency = ents.groupBy("cluster_id").agg(max("n_docs").as("max_docs"))
    val wTop = Window.partitionBy("cluster_id")
      .orderBy(col("mentions").desc, col("ent").asc)
    val topEnts = ents.withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 3)
      .groupBy("cluster_id")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("ent")))),
          p => p.getField("ent")), ",").as("top_entities"))
    val sizes = members.groupBy("cluster_id").agg(count(lit(1)).as("n"))
    val scored = sizes
      .join(pairAgg, Seq("cluster_id"), "left")
      .join(consistency, Seq("cluster_id"), "left")
      .join(topEnts, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n"),
        when(col("n") < 2, 1.0).otherwise(col("coh_u") / 1e6).as("cohesion"),
        when(col("n") < 2, 0.0)
          .otherwise(microRatio(col("n_low"), col("npairs"), 6)).as("ambiguity"),
        microRatio(coalesce(col("max_docs"), lit(0L)), col("n"), 6)
          .as("entity_consistency"),
        coalesce(col("top_entities"), lit("")).as("top_entities"))
    val issues =
      when(col("cohesion") < cohesionMin, 1).otherwise(0) +
      when(col("ambiguity") > ambiguityMax, 1).otherwise(0) +
      when(col("entity_consistency") < consistencyMin, 1).otherwise(0)
    scored.withColumn("tier",
      when(issues === 0, "Ok").when(issues === 1, "Caution").otherwise("Ng"))
  }

  def km07(s: SparkSession, dir: String): DataFrame =
    clusterQualityOn(membersFromTables(s, dir))
}
