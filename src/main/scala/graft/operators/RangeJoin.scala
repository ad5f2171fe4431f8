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
    val p = points.withColumn("__bucket", (col(ptsCol) / bucketSec).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence((col(startCol) / bucketSec).cast("long"),
                       ((col(endCol) - 1) / bucketSec).cast("long"))))
    p.join(iv, "__bucket")
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) < col(endCol))
      .drop("__bucket")
  }
}
