package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev tool: isolate named queries under the EXACT Bench methodology
  * (same session confs, same warmup, best-of-two through the noop
  * sink) so an optimization's before/after numbers are comparable to
  * the driver's bench. Optionally dumps `.explain("formatted")` per
  * query.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.Probe [-plans <dir> <suffix>] q1 q2 ..."
  *
  * Always runs q01_pricing_summary first as the ambient-load control.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (planDir, planSuffix, names0) = args.toSeq match {
      case Seq("-plans", dir, suffix, rest @ _*) => (Some(dir), suffix, rest)
      case other => (None, "", other)
    }
    // -rows: ALSO print every result row (sorted) for value-level A/Bs
    val dumpRows = names0.contains("-rows")
    val names = names0.filterNot(_ == "-rows")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loaders: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      Seq("region" -> Tables.region, "nation" -> Tables.nation,
          "customer" -> Tables.customer, "supplier" -> Tables.supplier,
          "part" -> Tables.part, "orders" -> Tables.orders,
          "lineitem" -> Tables.lineitem, "events" -> Tables.events,
          "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    loaders.foreach { case (t, load) =>
      try load(spark, sfDir).limit(1).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[probe] warmup $t: ${e.getMessage}") }
    }
    val run = ("q01_pricing_summary" +: names).distinct
    run.foreach { name =>
      val fn = SparkEntry.queries(name)
      planDir.foreach { dir =>
        val plan = fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        Files.createDirectories(Paths.get(dir))
        Files.writeString(Paths.get(dir, s"${name}_$planSuffix.txt"), plan)
      }
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[probe] $name failed: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[probe] $name%-32s min=${times.min}%8.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
      if (dumpRows) {
        fn(spark, sfDir).collect().map(_.toString).sorted
          .foreach(r => println(s"[row:$name] $r"))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
