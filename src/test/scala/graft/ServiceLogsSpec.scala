package graft

import org.apache.spark.sql.functions._
import graft.sources.ServiceLogs

/** src08: per-service log parser dispatch — one planted line per
  * producer format the reference forwarder parses
  * (rask-log-forwarder/app/src/parser/services/), plus quarantine and
  * batch/stream parity.
  */
class ServiceLogsSpec extends SparkSpec {
  import spark.implicits._

  private val nginxAccess =
    "10.0.0.7 - - [05/Jan/2026:10:00:00 +0000] \"GET /v1/feeds?page=2 HTTP/1.1\" 200 5120 \"-\" \"curl/8.5.0\""
  private val nginxError =
    "2026/01/05 10:00:01 [error] 41#0: *77 connect() failed (111: Connection refused) while connecting to upstream"
  private val goSlog =
    """{"time":"2026-01-05T10:00:02.5Z","level":"info","msg":"articles fetched","service":"alt-backend","count":42}"""
  private val goWithDockerPrefix =
    "2026-01-05T10:00:02.700001Z " + goSlog
  private val structlog =
    """{"event":"quality gate passed","level":"warning","timestamp":"2026-01-05T10:00:03Z","service":"pre-processor","doc":"d-9"}"""
  private val rustTracing =
    """{"timestamp":"2026-01-05T10:00:04Z","level":"INFO","fields":{"message":"job started","job.id":"j-1"},"target":"recap_worker"}"""
  private val postgres =
    "2026-01-05 10:00:05.123 UTC [321] LOG:  statement: SELECT 1"
  private val meili =
    "[2m2026-01-05T10:00:06.5Z[0m [32m INFO[0m actix: HTTP request route=/indexes"
  private val junk = "completely unstructured noise"

  private def allLines = Seq(nginxAccess, nginxError, goSlog, goWithDockerPrefix,
    structlog, rustTracing, postgres, meili, junk)

  test("src08: every producer format detects, extracts, and normalizes") {
    val p = ServiceLogs.parse(allLines.toDF("value")).collect()
      .map(r => r.getAs[String]("raw") -> r).toMap

    val acc = p(nginxAccess)
    assert(acc.getAs[String]("service_type") == "nginx")
    assert(acc.getAs[String]("log_type") == "access")
    assert(acc.getAs[String]("method") == "GET")
    assert(acc.getAs[String]("path") == "/v1/feeds?page=2")
    assert(acc.getAs[Int]("status_code") == 200)
    assert(acc.getAs[Long]("response_size") == 5120L)
    assert(acc.getAs[String]("ip_address") == "10.0.0.7")
    assert(acc.getAs[String]("user_agent") == "curl/8.5.0")
    assert(acc.getAs[java.sql.Timestamp]("ts") != null)

    val err = p(nginxError)
    assert(err.getAs[String]("service_type") == "nginx")
    assert(err.getAs[String]("log_type") == "error")
    assert(err.getAs[String]("level") == "error")
    assert(err.getAs[String]("message").contains("Connection refused"))

    for (l <- Seq(goSlog, goWithDockerPrefix)) {
      val g = p(l)
      assert(g.getAs[String]("service_type") == "go", l)
      assert(g.getAs[String]("level") == "info")
      assert(g.getAs[String]("message") == "articles fetched")
      val f = g.getAs[Map[String, String]]("fields")
      assert(f("service") == "alt-backend")
      assert(f("count") == "42")
      assert(!f.contains("msg") && !f.contains("level"))
    }

    val sl = p(structlog)
    assert(sl.getAs[String]("service_type") == "python_structlog")
    assert(sl.getAs[String]("level") == "warn") // warning normalized
    assert(sl.getAs[String]("message") == "quality gate passed")
    assert(sl.getAs[Map[String, String]]("fields")("doc") == "d-9")

    val rt = p(rustTracing)
    assert(rt.getAs[String]("service_type") == "rust_tracing")
    assert(rt.getAs[String]("level") == "info") // UPPERCASE normalized
    assert(rt.getAs[String]("message") == "job started")
    val rf = rt.getAs[Map[String, String]]("fields")
    assert(rf("job.id") == "j-1" && !rf.contains("message"))

    val pg = p(postgres)
    assert(pg.getAs[String]("service_type") == "postgres")
    assert(pg.getAs[String]("level") == "info") // LOG → info
    assert(pg.getAs[String]("message").contains("SELECT 1"))
    assert(pg.getAs[java.sql.Timestamp]("ts") != null)

    val ms = p(meili)
    assert(ms.getAs[String]("service_type") == "meilisearch")
    assert(ms.getAs[String]("level") == "info")
    assert(!ms.getAs[String]("message").contains(""))
    assert(ms.getAs[String]("message").contains("HTTP request"))

    assert(p(junk).isNullAt(p(junk).fieldIndex("service_type")))
  }

  test("src08: quarantine keeps raw lines and dispatch stats count them") {
    val parsed = ServiceLogs.parse(allLines.toDF("value"))
    val q = ServiceLogs.quarantine(parsed).as[String].collect()
    assert(q.toSeq == Seq(junk))
    val stats = ServiceLogs.dispatchStats(parsed).collect()
      .groupBy(r => Option(r.getAs[String]("service_type")).getOrElse("<q>"))
      .view.mapValues(_.map(_.getAs[Long]("n_lines")).sum).toMap
    assert(stats("nginx") == 2L)
    assert(stats("go") == 2L)
    assert(stats("<q>") == 1L)
    // parsed rows with a level are counted; quarantined rows have none
    assert(parsed.filter(col("service_type").isNotNull).count() == 8L)
  }

  test("src08: stateless body runs unchanged under structured streaming") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val q = ServiceLogs.parse(mem.toDF())
      .writeStream.format("memory").queryName("src08_stream").outputMode("append").start()
    try {
      mem.addData(allLines: _*)
      q.processAllAvailable()
      val streamed = spark.table("src08_stream")
        .select("service_type", "log_type", "level", "message").collect().toSet
      val batch = ServiceLogs.parse(allLines.toDF("value"))
        .select("service_type", "log_type", "level", "message").collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("src08: normalized messages feed lt01 template mining") {
    val parsed = ServiceLogs.parse(Seq(
      "2026/01/05 10:00:01 [error] 41#0: *77 upstream timed out after 30 ms",
      "2026/01/05 10:00:09 [error] 41#0: *91 upstream timed out after 450 ms").toDF("value"))
    val templated = parsed
      .withColumn("template", graft.operators.LogMining.template(col("message")))
      .groupBy("template").count().collect()
    assert(templated.length == 1) // digit-bearing tokens masked to one code site
    assert(templated.head.getAs[Long]("count") == 2L)
  }
}
