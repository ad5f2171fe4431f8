package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultiLabel, OutlierFilter}

/** Rule-per-case pins for fo01 (recap select outlier filtering,
  * filtering.rs:12-170) and ml08 (Wilson accuracy CI,
  * evaluation.py:360-372 + analysis/stats.py:10).
  */
class OutlierFilterSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Seq[Float])],
                  thresholds: Map[String, Int] = Map.empty) =
    OutlierFilter.filterOutliersOn(
      rows.toDF("genre", "vec_id", "embedding"), thresholds, 3)
      .select("genre", "vec_id", "cos_sim", "backfilled")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
      .toSeq

  /** 8 tight vectors + a mid outlier + a far outlier: the n=10 shape
    * where sorted_distances[floor(8.0)] = the mid outlier's distance,
    * so exactly the far outlier filters.
    */
  private def tenWithTwoOutliers(genre: String): Seq[(String, Long, Seq[Float])] =
    (1L to 8L).map(i => (genre, i, Seq(1.0f, 0.001f * i))) ++
      Seq((genre, 9L, Seq(0.0f, 1.0f)), (genre, 10L, Seq(-1.0f, 0.1f)))

  test("fo01: p80 is an INDEX, not a percentile — n=5 keeps even the far outlier") {
    // floor(5·0.8) = 4 = the 0-based maximum ⇒ cutoff = max distance
    val out = run((1L to 4L).map(i => ("g5", i, Seq(1.0f, 0.001f * i))) :+
      (("g5", 5L, Seq(0.0f, 1.0f))))
    assert(out.size == 5)
    assert(out.forall(!_._4), "small-n groups must keep everything unfiltered")
  }

  test("fo01: n=10 cuts at sorted[8] — far outlier filtered, mid outlier kept") {
    val out = run(tenWithTwoOutliers("g10"))
    assert(out.map(_._2).sorted == (1L to 9L), s"kept ${out.map(_._2).sorted}")
    assert(out.forall(!_._4))
  }

  test("fo01: threshold-map backfill readmits the filtered item, flagged") {
    val out = run(tenWithTwoOutliers("g10"), Map("g10" -> 10))
    assert(out.size == 10)
    val (bf, kept) = out.partition(_._4)
    assert(bf.map(_._2) == Seq(10L), "exactly the far outlier backfills")
    assert(kept.map(_._2).sorted == (1L to 9L))
  }

  test("fo01: backfill take(needed) exhausts gracefully when the pool is short") {
    // eff_min 100 ≫ n: needed = 91 but only one filtered item exists
    val out = run(tenWithTwoOutliers("g10"), Map("g10" -> 100))
    assert(out.size == 10)
    assert(out.count(_._4) == 1)
  }

  test("fo01: 'other' and n<3 genres pass through with null cos_sim") {
    val out = run(
      (1L to 5L).map(i => ("other", i, Seq(1.0f, 0.001f * i))) ++
        Seq(("tiny", 6L, Seq(1.0f, 0.0f)), ("tiny", 7L, Seq(0.0f, 1.0f))))
    assert(out.size == 7)
    assert(out.forall(r => r._3.isEmpty && !r._4),
      "skipped genres must not be scored or filtered")
  }

  test("fo01: ties AT the cutoff are all kept — the kept share may exceed 80%") {
    // 8 identical + 2 identical outliers: sorted[8] = the outlier
    // distance, and distance ≤ cutoff admits BOTH outliers (10/10 kept)
    val out = run(
      (1L to 8L).map(i => ("gt", i, Seq(1.0f, 0.0f))) ++
        Seq(("gt", 9L, Seq(0.0f, 1.0f)), ("gt", 10L, Seq(0.0f, 1.0f))))
    assert(out.size == 10)
    assert(out.forall(!_._4))
  }

  test("fo01: backfill readmits in similarity-DESC order") {
    // n=12 ⇒ cutoff at sorted[floor(9.6)] = position 10 ⇒ two filtered;
    // eff_min 11 ⇒ needed 1 ⇒ the HIGHER-similarity outlier returns
    val rows = (1L to 10L).map(i => ("go", i, Seq(1.0f, 0.001f * i))) ++
      Seq(("go", 11L, Seq(0.5f, 0.866f)), ("go", 12L, Seq(-1.0f, 0.0f)))
    val out = run(rows, Map("go" -> 11))
    assert(out.size == 11)
    assert(out.filter(_._4).map(_._2) == Seq(11L),
      "the nearer outlier backfills first; the far one stays filtered")
    assert(!out.exists(_._2 == 12L))
  }

  test("fo01: without a threshold-map entry, backfill is unreachable (invariant)") {
    // survivors ≥ floor(0.8n)+1 ≥ max(3, ceil(0.1n)) for every n ≥ 3,
    // so only min_docs_thresholds can trigger the backfill loop
    for (n <- 3 to 200) {
      val survivors = math.floor(n * 0.8).toLong + 1
      val effMin = math.max(3L, math.ceil(n * 0.1).toLong)
      assert(survivors >= effMin, s"n=$n")
    }
  }

  private def wilson(rows: Seq[(Long, String, Boolean, Boolean)]) =
    MultiLabel.wilsonOn(rows.toDF("doc_id", "genre", "y_true", "y_pred"))
      .collect().head

  /** n docs, k of them agreeing on all four genre slots. */
  private def pairsOf(k: Int, n: Int): Seq[(Long, String, Boolean, Boolean)] =
    (1 to n).flatMap { d =>
      MultiLabel.Genres.zipWithIndex.map { case (g, i) =>
        (d.toLong, g, true, i != 0 || d <= k)
      }
    }

  test("ml08: int(accuracy·n) truncates — 15 exact of 22 reports count_correct 14") {
    val r = wilson(pairsOf(15, 22))
    assert(r.getLong(0) == 22 && r.getLong(1) == 15)
    assert(r.getLong(2) == 14, "the float round-trip must truncate below the true count")
    assert(r.getDouble(3) == 0.681818) // point = metrics.accuracy, NOT cc/n
    assert(r.getDouble(4) == 0.429517)
    assert(r.getDouble(5) == 0.802668)
    assert(r.getDouble(6) == 0.373151)
  }

  test("ml08: exact case 10/20 — hand-computed Wilson bounds") {
    val r = wilson(pairsOf(10, 20))
    assert(r.getLong(2) == 10)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 0.299298)
    assert(r.getDouble(5) == 0.700702)
    assert(r.getDouble(6) == 0.401404)
  }
}
