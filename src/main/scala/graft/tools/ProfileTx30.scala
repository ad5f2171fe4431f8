package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev tool (round-17 optimization): stage-decompose tx30 so the pair
  * stage's cost is attributed by measurement (guide §1).
  */
object ProfileTx30 {
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
      println(f"[profile] $name%-34s min=${times.min}%8.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.functions.TextFunctions.tokens
    val window = 15
    def toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .filter(length(col("term")) >= 3)
    def joined = {
      val a = toks.select(col("doc_id"), col("pos"), col("term").as("ta"))
        .withColumn("b", floor(col("pos") / window))
      val bSide = toks.select(col("doc_id"), col("pos").as("pos_b"), col("term").as("tb"))
        .withColumn("b", explode(array(floor(col("pos_b") / window),
                                       floor(col("pos_b") / window) - 1)))
      a.join(bSide, Seq("doc_id", "b"))
        .filter(col("pos_b") > col("pos") && col("pos_b") <= col("pos") + window)
        .filter(col("ta") =!= col("tb"))
        .select(col("doc_id"),
                least(col("ta"), col("tb")).as("ta"),
                greatest(col("ta"), col("tb")).as("tb"))
    }

    // the pre-dictionary (string-term) variant, inlined so both
    // implementations can be interleaved in ONE JVM — ambient noise on
    // this box swamps cross-process A/Bs
    def tx30StringVariant(): Unit = {
      import graft.operators.{TextOps, Graph}
      import graft.functions.Numeric.microRound
      val pe = TextOps.windowCooccurrenceEdges(toks, window).filter(col("w") >= 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = pe.select(col("ta").as("src"), col("tb").as("dst"), col("w"))
        .union(pe.select(col("tb").as("src"), col("ta").as("dst"), col("w")))
      val ranks = Graph.weightedPagerank(edges, damping = 0.85, iters = 3)
      pe.unpersist()
      val top = ranks
        .orderBy(col("rank").desc, col("node").asc).limit(20)
        .select(col("node").as("term"), (microRound(col("rank"), 6)).as("rank"))
      top.collect()
      ranks.unpersist()
    }

    time("q01 control")(noop(graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)))
    println(s"[profile] n_toks=${toks.count()} n_pairs=${joined.count()}")

    // internal-pipeline plan dumps (tx30's declared query materializes
    // at construction, so its formatted plan is a LocalTableScan): the
    // edge aggregation over string terms (before) vs over the
    // order-isomorphic int dictionary (after)
    if (args.contains("--plans")) {
      def dumpPlan(df: DataFrame, path: String): Unit =
        java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
          df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      dumpPlan(graft.operators.TextOps.windowCooccurrenceEdges(toks, window)
          .filter(col("w") >= 5),
        "plans/r17/tx30_internal_edges_before.txt")
      val vocab = toks.select("term").distinct()
        .withColumn("tid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("term")))
      val toksInt = toks.join(broadcast(vocab), "term")
        .select(col("doc_id"), col("pos"), col("tid").as("term"))
      dumpPlan(graft.operators.TextOps.windowCooccurrenceEdges(toksInt, window)
          .filter(col("w") >= 5),
        "plans/r17/tx30_internal_edges_after.txt")
    }
    for (rep <- 1 to 2) {
      time(s"tx30 string-term rep$rep")(tx30StringVariant())
      time(s"tx30 current rep$rep")(noop(graft.SparkEntry.queries("tx30_textrank_keywords")(spark, sfDir)))
      // split: pair stage materialization vs pagerank-and-after
      val pe = graft.operators.TextOps.windowCooccurrenceEdges(toks, window)
        .filter(col("w") >= 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t0 = System.nanoTime()
      val nEdges = pe.count()
      val t1 = System.nanoTime()
      val edges = pe.select(col("ta").as("src"), col("tb").as("dst"), col("w"))
        .union(pe.select(col("tb").as("src"), col("ta").as("dst"), col("w")))
      val ranks = graft.operators.Graph.weightedPagerank(edges, damping = 0.85, iters = 3)
      val t2 = System.nanoTime()
      ranks.orderBy(col("rank").desc, col("node").asc).limit(20).collect()
      val t3 = System.nanoTime()
      ranks.unpersist(); pe.unpersist(); spark.catalog.clearCache()
      println(f"[profile] rep$rep nEdges=$nEdges pairStage=${(t1-t0)/1e9}%.3f pagerank=${(t2-t1)/1e9}%.3f topk=${(t3-t2)/1e9}%.3f")
    }
    // value dump for A/B equivalence checks
    graft.SparkEntry.queries("tx30_textrank_keywords")(spark, sfDir)
      .collect().foreach(r => println(s"[tx30row] $r"))
    spark.stop()
  }
}
