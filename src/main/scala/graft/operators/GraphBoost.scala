package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.microRound

/** Graph-boost learning-snapshot extraction — the step that builds
  * the genre-learning TRAINING DATASET from classification runs
  * (recap-subworker services/genre_learning.py:93
  * `build_graph_boost_snapshot_entries` over `_compute_boosted_scores`
  * :70): per article, candidates rank by score + graph_boost
  * (descending, PYTHON-STABLE — equal boosted scores keep input
  * order, so the top candidate of a tie is the EARLIEST, pinned),
  * margin = top − second boosted score (0 for a single candidate),
  * top_boost = the boost of that top candidate, and
  * graph_boost_available = margin ≥ 0.15 AND top_boost > 0 — the
  * label the downstream Bayesian parameter optimization trains
  * against (run_bayes_optimization itself is scipy machinery on this
  * frame, env-blocked like the other model runtimes; the snapshot is
  * the data-processing surface).
  *
  * margins/boosts round to 6 dp exactly as the reference does;
  * missing score/boost coerce to 0.0 (:73-74).
  *
  * Scale: the rank/margin is an in-row array_sort over each
  * article's ≤|genres| candidate structs — a stateless scan
  * projection, no window, no shuffle, no join.
  */
object GraphBoost {

  val GraphMargin = 0.15

  /** Composed classification-run rows: (job_id, candidates
    * array<struct<score,boost>>, tag_count, confidence).
    */
  def composeRuns(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id").as("job_id"))
    // scores in exact hundredths; boosts zero on the %4 residue so
    // the availability flag exercises both conjuncts
    def score(i: Int): Column =
      pmod(col("job_id") * (i + 3) + i * 7, lit(50)).cast("double") / 100
    def boost(i: Int): Column =
      when(col("job_id") % 4 === i, 0.0)
        .otherwise(pmod(col("job_id") + i * 11, lit(20)).cast("double") / 100)
    def cand(i: Int): Column =
      struct(score(i).as("score"), boost(i).as("boost"))
    // every 9th job plants an EXACT boosted-score tie at input index
    // 1 (same total, zero boost) — the Python-stable first-wins pin
    val tie = struct((score(0) + boost(0)).as("score"), lit(0.0).as("boost"))
    val cands = when(col("job_id") % 17 === 0,
        array().cast("array<struct<score:double,boost:double>>"))
      .when(col("job_id") % 9 === 0, array(cand(0), tie, cand(2)))
      .otherwise(array(cand(0), cand(1), cand(2)))
    d.select(col("job_id"), cands.as("candidates"),
      pmod(col("job_id"), lit(7)).cast("int").as("tag_count"),
      (pmod(col("job_id"), lit(100)).cast("double") / 100).as("confidence"))
  }

  /** The snapshot battery over any (job_id, candidates, …) frame. */
  def snapshotOn(runs: DataFrame): DataFrame = {
    // stable descending sort: (−boosted in exact 1e-6 units, input
    // index) — Python's reverse=True stable sort keeps input order
    // among equal keys
    val indexed = transform(col("candidates"), (c, i) => struct(
      (-round((c.getField("score") + c.getField("boost")) * 1e6, 0).cast("long"))
        .as("nb"),
      i.as("idx"),
      c.getField("boost").as("boost")))
    val sorted = array_sort(indexed)
    val n = size(col("candidates"))
    val topU = -element_at(sorted, 1).getField("nb")
    val secondU = when(n > 1, -element_at(sorted, 2).getField("nb")).otherwise(topU)
    val marginU = topU - secondU
    val topBoost = element_at(sorted, 1).getField("boost")
    runs.select(col("job_id"),
      when(n === 0, 0.0).otherwise(marginU / 1e6).as("margin"),
      when(n === 0, 0.0).otherwise(microRound(topBoost, 6)).as("top_boost"),
      n.as("candidate_count"),
      when(n === 0, false)
        .otherwise(marginU >= math.round(GraphMargin * 1e6) &&
          topBoost > 0.0).as("graph_boost_available"),
      col("tag_count"), col("confidence"))
  }

  def gb01(s: SparkSession, dir: String): DataFrame =
    snapshotOn(composeRuns(s, dir))

  /** gb02's parameter grid — the deterministic evaluation lattice
    * standing in for gp_minimize's acquisition choices (the skopt GP
    * loop is the env-blocked part; the OBJECTIVE it queries is this
    * evaluation, verbatim from scripts/graph_boost_utils.py, over
    * the Real(0.05,0.25)/Real(0,5)/Integer(0,10) space).
    */
  val paramGrid: Seq[(Double, Double, Int)] =
    for {
      gm <- Seq(0.05, 0.10, 0.15, 0.20, 0.25)
      bt <- Seq(0.0, 0.05, 0.10)
      tc <- Seq(0, 2, 4)
    } yield (gm, bt, tc)

  /** Composed optimizer snapshot: gb01 plus the strategy labels the
    * tuner trains against, with null-field rows for the dropna path
    * and a mislabel residue so no grid point is perfectly separable.
    */
  def composeSnapshot(s: SparkSession, dir: String): DataFrame = {
    val snap = gb01(s, dir)
    val aligned = when(col("graph_boost_available"), "graph_boost")
      .otherwise("weighted_score")
    val flipped = when(col("graph_boost_available"), "weighted_score")
      .otherwise("graph_boost")
    snap.select(col("job_id"),
      when(col("job_id") % 31 === 0, lit(null).cast("double"))
        .otherwise(col("margin")).as("margin"),
      col("top_boost"), col("tag_count"),
      when(col("job_id") % 23 === 0, lit(null).cast("string"))
        .when(col("job_id") % 5 === 0, "coarse_only")
        .when(col("job_id") % 13 === 0, flipped)
        .otherwise(aligned).as("strategy"))
  }

  /** gb02: the Bayes-tuner objective evaluated on the grid —
    * graph_boost_utils.py `prepare_dataframe` (:61 — dropna over the
    * four fields, strategy ∈ {graph_boost, weighted_score}, label =
    * strategy == graph_boost) + `_objective` (:75 — preds =
    * margin ≥ gm ∧ top_boost ≥ bt ∧ tag_count ≥ round(tc), with the
    * boost conjunct SKIPPED when no prepared row has a positive
    * top_boost), accuracy = share of label-matching predictions.
    * One broadcast grid cross-product + a |grid|-key map-side agg.
    */
  def gridAccuracyOn(snapshot: DataFrame): DataFrame = {
    val s = snapshot.sparkSession
    import s.implicits._
    val prep = snapshot
      .filter(col("margin").isNotNull && col("top_boost").isNotNull &&
        col("tag_count").isNotNull && col("strategy").isNotNull &&
        col("strategy").isin("graph_boost", "weighted_score"))
      .withColumn("label", col("strategy") === "graph_boost")
    val hasBoost = prep.agg(
      (sum(when(col("top_boost") > 0, 1L).otherwise(0L)) > 0).as("has_boost"))
    val grid = paramGrid
      .toDF("graph_margin", "boost_threshold", "tag_count_threshold")
    val pred = col("margin") >= col("graph_margin") &&
      (!col("has_boost") || col("top_boost") >= col("boost_threshold")) &&
      col("tag_count") >= col("tag_count_threshold")
    prep.crossJoin(broadcast(hasBoost)).crossJoin(broadcast(grid))
      .groupBy("graph_margin", "boost_threshold", "tag_count_threshold")
      .agg(count(lit(1)).as("n_samples"),
        (round(sum(when(pred === col("label"), 1L).otherwise(0L)) * lit(1e6) /
          count(lit(1)), 0).cast("long") / 1e6).as("accuracy"))
  }

  def gb02(s: SparkSession, dir: String): DataFrame =
    gridAccuracyOn(composeSnapshot(s, dir))
}
