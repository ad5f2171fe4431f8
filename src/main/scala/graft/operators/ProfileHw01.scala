package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round-17): attribute hw01's cost — compose/parse vs the
  * eleven rule legs vs plan overhead (guide §1).
  */
object ProfileHw01 {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t("control q01")(noop(graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)))
    (1 to 2).foreach { round =>
      println(s"--- hw01 round $round ---")
      val logsRaw = OtelLogs.composeOtelLogs(spark, sfDir)
      t("composeOtelLogs noop")(noop(logsRaw))
      val tracesRaw = OtelLogs.composeOtelTraces(spark, sfDir)
      t("composeOtelTraces noop")(noop(tracesRaw))
      println(s"[prof] n_logs=${logsRaw.count()} n_traces=${tracesRaw.count()}")
      val a = (k: String) => element_at(col("attrs"), k)
      val narrow = logsRaw.select(col("service_name"), col("severity_text"),
        col("severity_number"), col("ts"), col("body"),
        col("trace_id"), col("span_id"),
        a("http.method").as("m_"), a("http.route").as("r_"),
        a("http.status_code").as("s_"), a("http.request.duration").as("d_"),
        a("http.response.body.size").as("b_"),
        a("user.id").as("u_"), a("http.client_ip").as("ip_"),
        a("http.user_agent").as("ua_"),
        a("exception.type").as("et_"), a("exception.message").as("em_"))
        .persist()
      t("narrow persist materialize")(noop(narrow))
      val logs = narrow.withColumn("attrs", map(
        lit("http.method"), col("m_"), lit("http.route"), col("r_"),
        lit("http.status_code"), col("s_"), lit("http.request.duration"), col("d_"),
        lit("http.response.body.size"), col("b_"),
        lit("user.id"), col("u_"), lit("http.client_ip"), col("ip_"),
        lit("http.user_agent"), col("ua_"),
        lit("exception.type"), col("et_"), lit("exception.message"), col("em_")))
      val traces = tracesRaw.persist()
      t("traces persist materialize")(noop(traces))
      t("leg: serviceHealthOn")(noop(HealthScore.serviceHealthOn(logs)))
      t("leg: sloViolationsOn")(noop(HealthScore.sloViolationsOn(logs)))
      t("leg: httpStatusDistribution")(noop(
        Collectors.httpStatusDistributionOn(OtelLogs.httpRequests(logs))))
      t("leg: logVolumeTrends")(noop(Collectors.logVolumeTrendsOn(logs)))
      t("leg: errorTypes")(noop(OtelLogs.errorTypesOn(logs)))
      t("leg: spanBottlenecks")(noop(OtelLogs.spanBottlenecksOn(traces)))
      t("leg: errorSpans")(noop(Collectors.errorSpansOn(traces)))
      t("leg: serviceDependencies")(noop(Collectors.serviceDependenciesOn(traces)))
      t("leg: apiPerformance")(noop(OtelLogs.apiPerformanceOn(traces)))
      narrow.unpersist(); traces.unpersist()
      spark.catalog.clearCache()
      t("hw01 full query")(noop(graft.SparkEntry.queries("hw01_health_warnings")(spark, sfDir)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
