package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: points joined to the intervals containing
  * them, without a cross product.
  *
  * The naive plan for `point BETWEEN start AND end` is a broadcast
  * nested-loop or cartesian join — quadratic. This is the bucketed
  * formulation: quantize time into fixed buckets, explode each
  * interval to the buckets it spans, equi-join point-bucket to
  * interval-bucket, then refine with the exact predicate. Cost is
  * linear in points + interval-spans; bucket width trades explode
  * fan-out against candidate precision (pick ≈ median interval
  * length). The reference shape: correlating a log line with the
  * deployment/incident window that covers it.
  */
object RangeJoin {

  /** Join points (with `ptsCol` epoch-seconds) to intervals (with
    * `startCol`/`endCol` epoch-seconds, end exclusive) on containment.
    * All other columns from both sides are kept.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptsCol: String, startCol: String, endCol: String,
                      bucketSec: Long): DataFrame = {
    require(bucketSec > 0)
    require(!points.columns.contains("__rj_bucket") && !intervals.columns.contains("__rj_bucket"),
      "__rj_bucket is reserved by pointInInterval")
    val p = points.withColumn("__rj_bucket", (col(ptsCol) / bucketSec).cast("long")).alias("__rj_p")
    val iv = intervals
      // a malformed end <= start interval matches nothing — and must not
      // reach sequence(), where start > stop generates a huge DESCENDING
      // bucket array and kills the job
      .filter(col(endCol) > col(startCol))
      .withColumn("__rj_bucket",
        explode(sequence((col(startCol) / bucketSec).cast("long"),
                         ((col(endCol) - 1) / bucketSec).cast("long"))))
      .alias("__rj_iv")
    // qualified refs: points and intervals may legitimately share column
    // names (ts, service, …) — the join must not become ambiguous
    p.join(iv, col("__rj_p.__rj_bucket") === col("__rj_iv.__rj_bucket"))
      .filter(col(s"__rj_p.$ptsCol") >= col(s"__rj_iv.$startCol") &&
              col(s"__rj_p.$ptsCol") < col(s"__rj_iv.$endCol"))
      .drop("__rj_bucket")
  }
}
