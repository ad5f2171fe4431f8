package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool (round-16 optimization): stage-decompose es11 so its cost
  * is attributed by measurement (guide §1). Mirrors episodesOn's
  * internal stages.
  */
object ProfileTrail {
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
    time("trailWear")(noop(Trail.trailWear(spark, sfDir)))
    // the fps frame episodesOn starts from
    def fps0 = {
      val fps = Trail.trailWear(spark, sfDir)
      val n = regexp_extract(col("item_key"), "([0-9]+)$", 1).cast("int")
      val tags = array(
        concat(lit("Topic-"), (n % 5).cast("string")),
        concat(lit("genre-"), (n % 3).cast("string")),
        concat(lit(" spotlight-"), n.cast("string"), lit(" ")),
        lit("Also"), lit("42"), lit("x"))
      fps
        .withColumn("footprint_key",
          concat(lit("fp-"), lpad(col("last_event_id").cast("string"), 12, "0")))
        .withColumn("tags", tags)
    }
    time("fps compose (no episode)")(noop(fps0))
    // groups stage only
    time("groups agg")(noop {
      fps0
        .withColumn("eff_first_us", unix_micros(coalesce(col("first_ts"), col("last_ts"))))
        .withColumn("last_us", unix_micros(col("last_ts")))
        .withColumn("ctags", array_distinct(filter(
          transform(col("tags"), t => Trail.tagNormalize(t)), t => t =!= "")))
        .groupBy("user_id", "item_key")
        .agg(min(col("eff_first_us")).as("earliest"),
          max(col("last_us")).as("latest"),
          array_distinct(flatten(collect_list(col("ctags")))).as("gtags"))
    })
    time("es11 full (materialized)")(noop(graft.SparkEntry.queries("es11_trail_episodes")(spark, sfDir)))
    // same JVM, same plan: the lazy frame sunk through noop (no driver
    // roundtrip) vs collect-materialization — attributes the release
    // idiom's cost exactly
    time("es11 lazy noop") {
      val (out, release) = Trail.episodesPlan(fps0)
      noop(out); release()
    }
    time("es11 lazy collect") {
      val (out, release) = Trail.episodesPlan(fps0)
      out.collect(); release()
    }
    spark.stop()
  }
}
