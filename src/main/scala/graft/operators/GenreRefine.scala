package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.microRound

/** The genre-refine decision engine — recap-worker's strategy router
  * for final genre assignment (recap-worker/recap-worker/src/pipeline/
  * genre_refine/engine.rs:199 DefaultRefineEngine::refine +
  * scoring.rs), the consumer of tg01's tag-label graph:
  *
  *  1. require_tags gate (engine.rs:218): an article with no tags
  *     falls back to its FIRST candidate (CoarseOnly), or the
  *     configured fallback genre when it has no candidates at all.
  *  2. candidate EXPANSION from tags (scoring.rs:103): per tag the
  *     graph's genre edges contribute weight·confidence; genres
  *     totalling ≥ 0.3 (CANDIDATE_EXPANSION_MIN_WEIGHT) that aren't
  *     already candidates join with confidence min(total, 1), score
  *     0, keyword_support 0. Both empty → FallbackOther (:270).
  *  3. tag-consistency winner (scoring.rs:166): tags at or above the
  *     0.6 confidence gate whose normalized label EQUALS a candidate
  *     name; exactly ONE distinct matched genre wins outright
  *     (TagConsistency) with confidence max(best matching tag conf,
  *     that candidate's classifier conf), clamped.
  *  4. graph boosts (scoring.rs:39): per candidate Σ_tags
  *     weight(genre, tag)·tag_conf; candidates rank by score + boost.
  *  5. the GraphBoost gate (engine.rs:349): top-vs-second margin ≥
  *     0.15 ∧ top boost ≥ 0.1 ∧ tag count ≥ threshold ∧ top
  *     classifier conf ≥ 0.15 → GraphBoost, confidence
  *     clamp(0.6·classifier + 0.4·boost).
  *  6. the weighted tie-break (engine.rs:365, |margin| < 0.05): over
  *     the ORIGINAL candidates only — keyword/10·0.2 +
  *     classifier·0.4 + boost·0.2 + tag-consistency·0.2
  *     (scoring.rs:247; consistency adds 0.5·conf for substring
  *     partial matches, :208) → WeightedScore.
  *  7. otherwise the top candidate, attributed GraphBoost only when
  *     its boost is active AND the classifier is confident
  *     (engine.rs:402), else CoarseOnly.
  *
  * Every GATE compares exact integer lattices: graph weights and
  * confidences carry 1e-6 units, so boosts are exact Σ k·m longs in
  * 1e-12 units, ranking scores 1e-12, the tie-break blend 1e-13 —
  * margins and thresholds never ride an accumulated double. Output
  * confidences round to 6 dp. The reference's expansion order
  * follows HashMap iteration — determinized by genre name; scored
  * ties (Rust's stable sort) break by candidate rank.
  *
  * Scale: tags ⋈ graph is an equi-join on the tag key (the graph is
  * a bounded |genres|×|tags| frame, broadcast); every window
  * partitions by article; the whole cascade is projections and
  * per-article aggregates — nothing corpus-squared.
  */
object GenreRefine {

  val TagConfidenceGateU6 = 600000L       // 0.60
  val GraphMarginU12 = 150000000000L      // 0.15
  val BoostThresholdU12 = 100000000000L   // 0.10
  val TieBreakMarginU12 = 50000000000L    // 0.05
  val MinClassifierConfU6 = 150000L       // 0.15
  val ExpansionMinWeightU12 = 300000000000L // 0.30
  val FallbackGenre = "other"

  /** Composed per-article candidate lists (confidence/score in 1e-6
    * units): most docs carry a primary (their language) and a
    * distinct secondary; a residue class has NONE (the FallbackOther
    * path).
    */
  def candidatesFromDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(23)) =!= 0)
    val second = element_at(
      typedlit(Seq("es", "de", "fr", "zh", "en")),
      (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
    val c1 = d.select(col("doc_id"), col("lang").as("name"),
      (pmod(col("doc_id") * 41, lit(100)) * 10000L).as("conf_u6"),
      (pmod(col("doc_id") * 41, lit(100)) * 10000L).as("score_u6"),
      pmod(col("doc_id"), lit(12)).as("keyword_support"),
      lit(0).as("cand_rank"))
    val c2 = d.filter(second =!= col("lang"))
      .select(col("doc_id"), second.as("name"),
        (pmod(col("doc_id") * 17, lit(80)) * 10000L).as("conf_u6"),
        (pmod(col("doc_id") * 17, lit(80)) * 10000L).as("score_u6"),
        pmod(col("doc_id"), lit(5)).as("keyword_support"),
        lit(1).as("cand_rank"))
    c1.unionByName(c2)
  }

  /** Composed per-article tag signals (confidence in 1e-6 units):
    * first tokens of the doc; slot 0 becomes the article's OWN genre
    * name on a residue class (the tag-consistency path); a residue
    * class carries no tags at all (the require_tags path).
    */
  def tagsFromDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).filter(pmod(col("doc_id"), lit(19)) =!= 0)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val tags = transform(sequence(lit(0), lit(3)), i =>
      struct(
        when(i === 0 && pmod(col("doc_id"), lit(6)) === 0, col("lang"))
          .otherwise(element_at(col("toks"), i + 1)).as("label"),
        (pmod(col("doc_id") + i * 7, lit(101)) * 10000L).as("conf_u6")))
    d.select(col("doc_id"), explode(tags).as("t"))
      .select(col("doc_id"), lower(trim(col("t.label"))).as("label"),
        col("t.conf_u6").cast("long").as("conf_u6"))
      .filter(col("label").isNotNull && col("label") =!= "")
  }

  /** The full refine cascade. `cands`: (doc_id, name, conf_u6,
    * score_u6, keyword_support, cand_rank); `tags`: (doc_id, label,
    * conf_u6); `graph`: tg01's (genre, tag, weight [6 dp], …);
    * `docs`: the article universe. Output: (doc_id, genre,
    * confidence, strategy).
    */
  def refineOn(cands0: DataFrame, tags0: DataFrame, graph: DataFrame,
               docs: DataFrame): DataFrame = {
    // the cascade reads candidates/tags from five branches each —
    // persist both (the rpNearDupOn precedent: Verify/Bench clear the
    // cache between queries; long-lived sessions manage their own),
    // and materialize the graph (a bounded |genres|×|tags| aggregate)
    // so tg01's DAG runs once, not per join
    val cands = cands0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tags = tags0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g0 = graph.select(col("genre"), col("tag"),
      round(col("weight") * 1e6, 0).cast("long").as("w_u6"))
    val gRows = g0.collect()
    val g = g0.sparkSession.createDataFrame(
      java.util.Arrays.asList(gRows: _*), g0.schema)

    // step 2: expansion — per (doc, genre) Σ w·conf in 1e-12 units
    val expansionAll = tags.join(broadcast(g), col("label") === col("tag"))
      .groupBy(col("doc_id"), col("genre").as("name"))
      .agg(sum(col("w_u6") * col("conf_u6")).as("exp_u12"))
      .filter(col("exp_u12") >= ExpansionMinWeightU12)
    val expanded = expansionAll
      .join(cands.select(col("doc_id"), col("name")), Seq("doc_id", "name"), "left_anti")
      .select(col("doc_id"), col("name"),
        least(round(col("exp_u12") / 1e6, 0).cast("long"), lit(1000000L)).as("conf_u6"),
        lit(0L).as("score_u6"), lit(0).as("keyword_support"),
        (row_number().over(Window.partitionBy("doc_id").orderBy(col("name").asc)) + 99)
          .as("cand_rank"))
    val allCands = cands
      .select(col("doc_id"), col("name"), col("conf_u6").cast("long"),
        col("score_u6").cast("long"), col("keyword_support").cast("int"),
        col("cand_rank").cast("int"))
      .unionByName(expanded.select(col("doc_id"), col("name"),
        col("conf_u6").cast("long"), col("score_u6").cast("long"),
        col("keyword_support").cast("int"), col("cand_rank").cast("int")))

    // step 4: boosts per (doc, candidate) in 1e-12 units
    val boosts = allCands.select(col("doc_id"), col("name"))
      .join(tags, "doc_id")
      .join(broadcast(g), col("name") === col("genre") && col("label") === col("tag"))
      .groupBy("doc_id", "name")
      .agg(sum(col("w_u6") * col("conf_u6")).as("boost_u12"))
    // persisted: the rank chain AND the tie-break branch read it —
    // unpersisted, the allCands∪expanded union and the boost join
    // re-executed once per referencing branch (guide §2.4)
    val withBoost = allCands.join(boosts, Seq("doc_id", "name"), "left")
      .withColumn("boost_u12", coalesce(col("boost_u12"), lit(0L)))
      .withColumn("scored_u12", col("score_u6") * 1000000L + col("boost_u12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // step 3: tag-consistency winner
    val gated = tags.filter(col("conf_u6") >= TagConfidenceGateU6)
    val candNames = allCands.select(col("doc_id").as("c_doc"), col("name"),
      col("conf_u6").as("cl_u6"))
    val matched = gated.join(candNames,
        col("doc_id") === col("c_doc") && col("label") === col("name"))
      .select(col("doc_id"), col("name"), col("conf_u6"), col("cl_u6"))
    val winner = matched.groupBy("doc_id")
      .agg(countDistinct("name").as("n_winners"),
        max(col("conf_u6")).as("w_tag_u6"),
        max(col("cl_u6")).as("w_cl_u6"),
        min(col("name")).as("w_name"))
      .filter(col("n_winners") === 1)
      .select(col("doc_id"), col("w_name"),
        least(greatest(col("w_tag_u6"), col("w_cl_u6")), lit(1000000L)).as("w_conf_u6"))

    // step 5: rank by scored (ties by candidate rank — the stable
    // sort). Top-1 and runner-up come out of ONE window pass + one
    // aggregation — the two-filter form executed the window twice and
    // joined the halves back (one join fewer in the final chain)
    val wRank = Window.partitionBy("doc_id")
      .orderBy(col("scored_u12").desc, col("cand_rank").asc)
    val topTwo = withBoost.withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= 2)
      .groupBy("doc_id")
      .agg(
        max(when(col("rn") === 1, struct(
          col("name").as("t_name"), col("conf_u6").as("t_conf_u6"),
          col("boost_u12").as("t_boost_u12"),
          col("scored_u12").as("t_scored_u12")))).as("t"),
        max(when(col("rn") === 2, col("scored_u12"))).as("s2_scored_u12"))
      .select(col("doc_id"), col("t.t_name").as("t_name"),
        col("t.t_conf_u6").as("t_conf_u6"),
        col("t.t_boost_u12").as("t_boost_u12"),
        col("t.t_scored_u12").as("t_scored_u12"), col("s2_scored_u12"))

    // step 6: weighted tie-break over the ORIGINAL candidates.
    // Blend in exact 1e-13 units: min(kw,10)/10·0.2 → ·2e11;
    // conf·0.4 → conf_u6·4e6; clamp(boost,1)·0.2 → min(b_u12,1e12)·2;
    // consistency·0.2 → tcx2·1e6 (tcx2 is the ×2 lattice below).
    val tcScores = cands.select(col("doc_id"), col("name"), col("cand_rank"))
      .join(gated.select(col("doc_id").as("t_doc"), col("label"), col("conf_u6")),
        col("doc_id") === col("t_doc") &&
          (col("label") === col("name") ||
           col("name").contains(col("label")) || col("label").contains(col("name"))),
        "left")
      // exact match adds conf, partial adds conf/2 → accumulate ×2
      .groupBy("doc_id", "name", "cand_rank")
      .agg(least(coalesce(sum(
          when(col("label") === col("name"), col("conf_u6") * 2)
            .otherwise(col("conf_u6"))), lit(0L)), lit(2000000L)).as("tc_x2"))
    // the inner tcScores join restricts withBoost to the ORIGINAL
    // candidates (expanded (doc, name) keys are anti-joined disjoint),
    // so the boost join need not run a second time here
    val tieScored = withBoost
      .select(col("doc_id"), col("name"), col("conf_u6").cast("long").as("conf_u6"),
        col("keyword_support").cast("long").as("kw"), col("cand_rank").cast("int").as("cand_rank"),
        col("boost_u12"))
      .join(tcScores.select(col("doc_id"), col("name"), col("tc_x2")),
        Seq("doc_id", "name"))
      .withColumn("wt_u13",
        least(col("kw"), lit(10L)) * 200000000000L +
        col("conf_u6") * 4000000L +
        least(col("boost_u12"), lit(1000000000000L)) * 2L +
        col("tc_x2") * 1000000L)
    val wTie = Window.partitionBy("doc_id")
      .orderBy(col("wt_u13").desc, col("cand_rank").asc)
    val tieWinner = tieScored.withColumn("trn", row_number().over(wTie))
      .filter(col("trn") === 1)
      .select(col("doc_id"), col("name").as("tie_name"), col("wt_u13"))

    // step 1 inputs: per-doc tag presence + the first original candidate
    val hasTags = tags.groupBy("doc_id").agg(count(lit(1)).as("n_tags"))
    val firstCand = cands.withColumn("crn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("cand_rank").asc)))
      .filter(col("crn") === 1)
      .select(col("doc_id"), col("name").as("f_name"), col("conf_u6").as("f_conf_u6"))

    val graphBoostGate = col("s2_scored_u12").isNotNull &&
      col("margin_u12") >= GraphMarginU12 &&
      col("t_boost_u12") >= BoostThresholdU12 &&
      col("t_conf_u6") >= MinClassifierConfU6
    val tieGate = col("s2_scored_u12").isNotNull &&
      abs(col("margin_u12")) < TieBreakMarginU12 && col("tie_name").isNotNull
    val noTags = coalesce(col("n_tags"), lit(0L)) === 0
    val u6 = (c: Column) => c / 1e6

    val out = docs.select(col("doc_id"))
      .join(hasTags, Seq("doc_id"), "left")
      .join(firstCand, Seq("doc_id"), "left")
      .join(winner, Seq("doc_id"), "left")
      .join(topTwo, Seq("doc_id"), "left")
      .join(tieWinner, Seq("doc_id"), "left")
      .withColumn("margin_u12", col("t_scored_u12") - col("s2_scored_u12"))
      .select(col("doc_id"),
        when(noTags, coalesce(col("f_name"), lit(FallbackGenre)))
          .when(col("t_name").isNull, FallbackGenre)
          .when(col("w_name").isNotNull, col("w_name"))
          .when(graphBoostGate, col("t_name"))
          .when(tieGate, col("tie_name"))
          .otherwise(col("t_name")).as("genre"),
        when(noTags, u6(coalesce(col("f_conf_u6"), lit(0L))))
          .when(col("t_name").isNull, lit(0.0))
          .when(col("w_name").isNotNull, u6(col("w_conf_u6")))
          .when(graphBoostGate,
            microRound(least(
              col("t_conf_u6") / 1e6 * 0.6 + col("t_boost_u12") / 1e12 * 0.4,
              lit(1.0)), 6))
          .when(tieGate, microRound(least(col("wt_u13") / 1e13, lit(1.0)), 6))
          .otherwise(u6(col("t_conf_u6"))).as("confidence"),
        when(noTags, "coarse_only")
          .when(col("t_name").isNull, "fallback_other")
          .when(col("w_name").isNotNull, "tag_consistency")
          .when(graphBoostGate, "graph_boost")
          .when(tieGate, "weighted_score")
          .when(col("t_boost_u12") > 0 && col("t_conf_u6") >= MinClassifierConfU6,
            "graph_boost")
          .otherwise("coarse_only").as("strategy"))
    // materialize the verdicts and release all three caches eagerly
    // (gd01's idiom) — previously withBoost/cands/tags pinned the
    // cache LRU until the harness's clearCache. A 100 TB production
    // run would instead release after the sink write; the verdict
    // frame itself is the presentation output either way.
    Dedup.materialized(out) {
      withBoost.unpersist(); cands.unpersist(); tags.unpersist()
    }
  }

  def tg04(s: SparkSession, dir: String): DataFrame =
    refineOn(candidatesFromDocs(s, dir), tagsFromDocs(s, dir),
      TagGraph.tg01(s, dir), Tables.documents(s, dir))
}
