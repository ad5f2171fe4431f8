package graft

import graft.operators.GraphBoost
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bayes-tuner objective replay: prepare_dataframe + _objective
  * (scripts/graph_boost_utils.py) on a deterministic grid.
  */
class GraphBoostGridSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (java.lang.Double, Double, Int, String)*): DataFrame =
    rows.toSeq.zipWithIndex
      .map { case ((m, b, t, s), i) => (i.toLong, m, b, t, s) }
      .toDF("job_id", "margin", "top_boost", "tag_count", "strategy")

  private def acc(df: DataFrame, gm: Double, bt: Double, tc: Int): Double =
    GraphBoost.gridAccuracyOn(df)
      .filter(col("graph_margin") === gm && col("boost_threshold") === bt &&
        col("tag_count_threshold") === tc)
      .collect().head.getDouble(4)

  test("prepare: dropna over the four fields and the strategy whitelist (:64-65)") {
    val df = snap(
      (0.2, 0.1, 3, "graph_boost"),
      (null, 0.1, 3, "graph_boost"),   // null margin → dropped
      (0.2, 0.1, 3, null),             // null strategy → dropped
      (0.2, 0.1, 3, "coarse_only"))    // not in the whitelist → dropped
    val out = GraphBoost.gridAccuracyOn(df).collect()
    assert(out.forall(_.getLong(3) == 1), "one surviving sample everywhere")
  }

  test("objective: preds vs label accuracy on a hand case (:75)") {
    val df = snap(
      (0.20, 0.10, 5, "graph_boost"),    // pred true at (0.15, 0.05, 4) → match
      (0.05, 0.10, 5, "graph_boost"),    // margin < 0.15 → pred false → miss
      (0.20, 0.10, 5, "weighted_score"), // pred true → miss
      (0.05, 0.00, 0, "weighted_score")) // pred false → match
    assert(acc(df, 0.15, 0.05, 4) == 0.5)
    assert(acc(df, 0.25, 0.0, 0) == 0.5,
      "only row 1 clears margin 0.25 — matches 1 and 4")
  }

  test("boundaries are >= on all three thresholds (:81-83)") {
    val df = snap((0.15, 0.05, 4, "graph_boost"))
    assert(acc(df, 0.15, 0.05, 4) == 1.0, "exact equality predicts true")
  }

  test("an all-zero top_boost frame skips the boost conjunct entirely (:77-86)") {
    val df = snap(
      (0.20, 0.0, 5, "graph_boost"),
      (0.05, 0.0, 5, "weighted_score"))
    assert(acc(df, 0.15, 0.10, 0) == 1.0,
      "boost_threshold 0.10 would fail every zero-boost row; with no positive boosts it is IGNORED")
    val withBoost = snap(
      (0.20, 0.0, 5, "graph_boost"),
      (0.05, 0.01, 5, "weighted_score"))  // one positive boost re-arms the conjunct
    assert(acc(withBoost, 0.15, 0.10, 0) == 0.5,
      "one positive boost re-arms the conjunct: the graph_boost row now fails the boost gate (miss); the weighted row still fails margin and matches")
  }

  test("composition: the full grid emits with a real prepared cohort at sf0.001") {
    val out = GraphBoost.gb02(spark, sfDir).cache()
    assert(out.count() == GraphBoost.paramGrid.size)
    val n = out.select("n_samples").distinct().collect().map(_.getLong(0)).toSet
    assert(n.size == 1 && n.head > 0)
    assert(out.filter(col("accuracy") > 0 && col("accuracy") < 1).count() > 0,
      "the mislabel residue keeps every grid point imperfect")
    out.unpersist()
  }
}
