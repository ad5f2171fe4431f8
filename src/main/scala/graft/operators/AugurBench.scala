package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Numeric.{cents, microRound}

/** pf05: the knowledge-augur benchmark statistics battery —
  * reference knowledge-augur/scripts/benchmark_augur.py
  * `calculate_statistics` (:107): per query type over raw latencies,
  *
  *  - mean (statistics.mean) and SAMPLE std (statistics.stdev,
  *    n−1 denominator, 0 for a single sample);
  *  - median = statistics.median — lower/upper MEAN for even n;
  *  - p50 = sorted[int(n·0.50)] and p95 = sorted[min(int(n·0.95),
  *    n−1)] — INDEX-based picks, a deliberately different convention
  *    from pf01's interpolated percentile AND from this file's own
  *    median (p50 ≠ median for even n — pinned);
  *  - min / max.
  *
  * Latencies quantize to exact cents at the scan (the ev03
  * discipline), so element picks are exact, the even-n median is a
  * half-exact two-element mean, and mean/std derive from
  * order-independent integer moments
  * (σ = √((n·Σu² − (Σu)²)/(n·(n−1)))).
  *
  * Scale: one rank window per query type (the exact-percentile sort
  * ev03 also accepts at test SF — ev11's sketch is the 100 TB path)
  * feeding ONE aggregation; group count is |query types|.
  */
object AugurBench {

  val queryTypes: Seq[String] = Seq("summarize", "extract", "classify")

  def composeLatencies(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      element_at(typedLit(queryTypes), (col("event_id") % 3).cast("int") + 1)
        .as("query_type"),
      col("event_id"), col("value"))

  /** The battery over any (query_type, value) frame. */
  def statsOn(lat: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy("query_type").orderBy("c")
    val wp = Window.partitionBy("query_type")
    val ranked = lat
      .select(col("query_type"), cents(col("value")).as("c"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wp))
    val medianPos = (col("n") % 2 === 1 && col("rn") === (col("n") + 1) / 2) ||
      (col("n") % 2 === 0 &&
        (col("rn") === col("n") / 2 || col("rn") === col("n") / 2 + 1))
    ranked.groupBy("query_type").agg(
      max("n").as("n"),
      (microRound(sum("c") * lit(1e4) / max("n"), 0) / 1e6).as("mean"),
      (when(max("n") % 2 === 1, sum(when(medianPos, col("c"))).cast("double"))
        .otherwise(sum(when(medianPos, col("c"))) / 2.0) / 1e2).as("median"),
      (max(when(col("rn") === floor(col("n") * 0.5) + 1, col("c"))) / 1e2).as("p50"),
      (max(when(col("rn") ===
        least(floor(col("n") * 0.95), col("n") - 1) + 1, col("c"))) / 1e2).as("p95"),
      (min("c") / 1e2).as("min_latency"),
      (max("c") / 1e2).as("max_latency"),
      when(max("n") > 1, microRound(
        sqrt((sum(col("c").cast(dec) * col("c")) * max("n") -
          sum("c").cast(dec) * sum("c")).cast("double") /
          (max("n").cast("double") * (max("n") - 1).cast("double"))) / 1e2, 6))
        .otherwise(0.0).as("std"))
  }

  def pf05(s: SparkSession, dir: String): DataFrame =
    statsOn(composeLatencies(s, dir))
}
