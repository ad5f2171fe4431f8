package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Dev tool (round-16 optimization): time the ex01/cc01 pipeline
  * stage-by-stage through the noop sink so the expensive segment is
  * identified by measurement, not guesswork (guide §1).
  */
object ProfileEx {
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

    def time(name: String)(mk: => DataFrame): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[profile] $name%-28s min=${times.min}%8.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    val raw = TagExtract.composeRaw(spark, sfDir)
    time("composeRaw")(raw)
    time("truncateOn")(TagExtract.truncateOn(raw))
    val truncated = TagExtract.truncateOn(raw).withColumn("url", lit(null).cast("string"))
    time("sanitizeStaged")(InputSanitize.sanitizeStaged(truncated))
    time("ex01 full")(TagExtract.extractOn(raw))
    time("ex01 no-sort")(TagExtract.extractOn(raw).limit(2000000))
    time("cc01 full")(TagExtract.cascadeOn(TagExtract.extractOn(raw)))
    spark.stop()
  }
}
