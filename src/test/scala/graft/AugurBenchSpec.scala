package graft

import graft.operators.AugurBench
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark statistics battery: the index-based percentile
  * convention (knowledge-augur/scripts/benchmark_augur.py:107).
  */
class AugurBenchSpec extends SparkSpec {
  import spark.implicits._

  private def stats(values: Double*): org.apache.spark.sql.Row =
    AugurBench.statsOn(values.toSeq.map(v => ("q", v)).toDF("query_type", "value"))
      .collect().head

  test("p50 is an INDEX pick, median interpolates — they differ for even n (:118)") {
    val r = stats(1.0, 2.0, 3.0, 4.0)
    assert(r.getDouble(3) == 2.5, "statistics.median of even n is the two-middle mean")
    assert(r.getDouble(4) == 3.0, "p50 = sorted[int(4·0.5)] = sorted[2] (0-based) = 3.0")
  }

  test("p95 clamps to the last element (:120)") {
    val r = stats(1.0, 2.0, 3.0)
    assert(r.getDouble(5) == 3.0, "int(3·0.95) = 2 → sorted[2]; min(…, n−1) guards")
    val r20 = stats((1 to 20).map(_.toDouble): _*)
    assert(r20.getDouble(5) == 20.0, "int(20·0.95) = 19 → the max — the convention's own tail bias")
  }

  test("odd-n median is the middle element; single sample has std 0 (:116,:122)") {
    val r = stats(5.0, 1.0, 3.0)
    assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 3.0)
    val one = stats(7.0)
    assert(one.getDouble(8) == 0.0 && one.getDouble(2) == 7.0)
  }

  test("mean and SAMPLE std match the hand case (:115,:122)") {
    val r = stats(2.0, 4.0, 4.0, 4.0, 6.0)
    assert(r.getDouble(2) == 4.0)
    // sample variance = ((2-4)²+0+0+0+(6-4)²)/4 = 2 → std = √2
    assert(r.getDouble(8) == math.round(math.sqrt(2.0) * 1e6) / 1e6)
    assert(r.getDouble(6) == 2.0 && r.getDouble(7) == 6.0)
  }

  test("composition groups by query type at sf0.001") {
    val out = AugurBench.pf05(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSet == AugurBench.queryTypes.toSet)
    assert(out.forall(r => r.getDouble(4) <= r.getDouble(5) &&
      r.getDouble(5) <= r.getDouble(7)), "p50 ≤ p95 ≤ max everywhere")
  }
}
