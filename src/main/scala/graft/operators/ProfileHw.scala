package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round-16 optimization): decompose hw01's report chain
  * (guide §1 — measure before touching).
  */
object ProfileHw {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(work: => T): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        work
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[profile] $name%-28s min=${times.min}%8.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("q01 control")(noop(graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)))
    time("composeOtelLogs")(noop(OtelLogs.composeOtelLogs(spark, sfDir)))
    time("composeOtelTraces")(noop(OtelLogs.composeOtelTraces(spark, sfDir)))
    time("serviceHealth (hs01)")(noop(HealthScore.serviceHealthOn(OtelLogs.composeOtelLogs(spark, sfDir))))
    time("sloViolations")(noop(HealthScore.sloViolationsOn(OtelLogs.composeOtelLogs(spark, sfDir))))
    time("spanBottlenecks")(noop(OtelLogs.spanBottlenecksOn(OtelLogs.composeOtelTraces(spark, sfDir))))
    time("httpStatusDist")(noop(Collectors.httpStatusDistributionOn(
      OtelLogs.httpRequests(OtelLogs.composeOtelLogs(spark, sfDir)))))
    time("logVolumeTrends")(noop(Collectors.logVolumeTrendsOn(OtelLogs.composeOtelLogs(spark, sfDir))))
    time("errorSpans")(noop(Collectors.errorSpansOn(OtelLogs.composeOtelTraces(spark, sfDir))))
    time("serviceDeps")(noop(Collectors.serviceDependenciesOn(OtelLogs.composeOtelTraces(spark, sfDir))))
    time("apiPerformance")(noop(OtelLogs.apiPerformanceOn(OtelLogs.composeOtelTraces(spark, sfDir))))
    time("errorTypes")(noop(OtelLogs.errorTypesOn(OtelLogs.composeOtelLogs(spark, sfDir))))
    time("hw01 full")(noop(graft.SparkEntry.queries("hw01_health_warnings")(spark, sfDir)))
    spark.stop()
  }
}
