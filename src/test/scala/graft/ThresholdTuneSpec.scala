package graft

import graft.operators.ThresholdTune
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Threshold-tuner replay: compute_metrics_at_threshold /
  * find_optimal_threshold / analyze_thresholds
  * (recap-subworker/scripts/tune_thresholds.py) on hand grids.
  */
class ThresholdTuneSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (String, Double, Boolean)*): DataFrame =
    rows.toSeq.toDF("genre", "score", "label")

  private def rowFor(df: DataFrame, genre: String): Row =
    ThresholdTune.tuneOn(df).filter(col("genre") === genre).collect().head

  test("hand grid: argmax F1 with the lowest-threshold tie-break (:113 strict >)") {
    // positives at .8/.6, negative at .4: every t in (0.4, 0.6] yields
    // P=1 R=1 F1=1; the tie must resolve to the FIRST qualifying
    // lattice point, 0.41
    val df = pairs(("a", 0.8, true), ("a", 0.6, true), ("a", 0.4, false))
    val r = rowFor(df, "a")
    assert(r.getAs[Double]("optimal_threshold") == 0.41)
    assert(r.getAs[Double]("precision_at_optimal") == 1.0)
    assert(r.getAs[Double]("recall_at_optimal") == 1.0)
    assert(r.getAs[Double]("f1_at_optimal") == 1.0)
  }

  test("pred is score >= t: a score exactly ON the lattice point predicts true (:58)") {
    // single positive at 0.5 exactly: at t=0.50 pred is TRUE, so
    // P=R=F1=1 holds through t=0.50 and the argmax stays at the first
    // full-separation point 0.31 (negative at 0.3 still caught at 0.31)
    val df = pairs(("a", 0.5, true), ("a", 0.30, false))
    val r = rowFor(df, "a")
    assert(r.getAs[Double]("optimal_threshold") == 0.31)
  }

  test("min-recall floor skips high-precision/low-recall thresholds (:103)") {
    // 3 positives (.9, .2, .2) + 1 negative (.85). t>=0.21 catches only
    // 1/3 positives → recall 0.333 ≥ 0.3 ok until t>0.9; BUT at
    // t in (0.21..0.85] precision=1/2, at t in (0.85, 0.9] precision=1.
    // Max F1 among qualifying: t=0.86.. recall=1/3, P=1 → F1=0.5;
    // lower t=0.01..0.20: recall 1.0, P=3/4 → F1=6/7≈0.857 wins.
    val df = pairs(("a", 0.9, true), ("a", 0.2, true), ("a", 0.2, true),
      ("a", 0.85, false))
    val r = rowFor(df, "a")
    assert(r.getAs[Double]("optimal_threshold") == 0.01)
    assert(r.getAs[Double]("f1_at_optimal") == 0.857143)
    // now force every threshold below the floor: single positive at
    // 0.005 — every lattice point misses it (recall 0) → fallback
    val low = pairs(("b", 0.005, true), ("b", 0.9, false))
    val rb = rowFor(low, "b")
    assert(rb.getAs[Double]("optimal_threshold") == 0.5,
      "all-below-recall genres keep the 0.5 seed (:93)")
    assert(rb.getAs[Double]("precision_at_optimal") == 0.0)
    assert(rb.getAs[Double]("recall_at_optimal") == 0.0)
    assert(rb.getAs[Double]("f1_at_optimal") == 0.0,
      "the fallback reports ZEROS, not the metrics at 0.5 (:94-97)")
  }

  test("current threshold: mapped genres use their entry, others 0.5 (:166)") {
    // g0 has current 0.35; an unmapped genre defaults to 0.5
    val df = pairs(
      ("g0", 0.4, true), ("g0", 0.3, false),
      ("zz", 0.6, true), ("zz", 0.4, true))
    val g0 = rowFor(df, "g0")
    assert(g0.getAs[Double]("current_threshold") == 0.35)
    assert(g0.getAs[Double]("precision_at_current") == 1.0,
      "0.4 >= 0.35 catches the positive, 0.3 < 0.35 excludes the negative")
    val zz = rowFor(df, "zz")
    assert(zz.getAs[Double]("current_threshold") == 0.5)
    assert(zz.getAs[Double]("recall_at_current") == 0.5,
      "only the 0.6 positive clears the 0.5 default")
  }

  test("P/R guards: empty prediction or positive sets report 0.0 (:64-66)") {
    // all-negative genre: tp+fn = 0 → recall 0, and with no positive
    // preds below .99... tp+fp>0 at low t but tp=0 → precision 0
    val df = pairs(("n", 0.7, false), ("n", 0.2, false))
    val r = rowFor(df, "n")
    assert(r.getAs[Double]("optimal_threshold") == 0.5, "recall never reaches the floor")
    assert(r.getAs[Double]("f1_at_current") == 0.0)
    assert(r.getAs[Double]("precision_at_current") == 0.0)
  }

  test("delta_f1 orders the report by improvement potential (:186)") {
    val df = pairs(
      ("g0", 0.9, true), ("g0", 0.1, false),   // current 0.35 already perfect → delta 0
      ("zz", 0.45, true), ("zz", 0.44, false)) // current 0.5 misses the positive → big delta
    val out = ThresholdTune.tuneOn(df).collect()
    assert(out.head.getAs[String]("genre") == "zz", "largest improvement first")
    assert(out.head.getAs[Double]("delta_f1") == 1.0)
    assert(out.last.getAs[Double]("delta_f1") == 0.0)
  }

  test("composed pairs: skipped items, sparse score maps, label alignment") {
    val df = ThresholdTune.composePairs(spark, sfDir)
    assert(df.filter(col("genre").isNull || col("score").isNull).count() == 0)
    val genres = df.select("genre").distinct().as[String].collect().sorted
    assert(genres.sameElements((0 until 6).map(i => s"g$i")))
    // every genre has both positive and negative pairs
    val byLabel = df.groupBy("genre", "label").count().count()
    assert(byLabel == 12)
    val out = ThresholdTune.tt02(spark, sfDir)
    assert(out.count() == 6)
  }
}
