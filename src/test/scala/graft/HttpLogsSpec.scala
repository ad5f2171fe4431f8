package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.HttpLogs

/** ev31: the 003_create_http_logs_mv.sql producer-gating semantics —
  * each branch requires its producer's service_name AND its full field
  * shape; a third producer with a matching bare shape, and a
  * shape-stripped row from a known producer, must both be excluded
  * (the reference documents a 4-week silent SLO corruption from
  * getting exactly this wrong).
  */
class HttpLogsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("ev31: producer-gated normalization maps both shapes, rejects impostors") {
    val rows = Seq(
      // legit nginx: http_-prefixed keys
      (ts(0), "nginx", Map(
        "http_method" -> "GET", "http_path" -> "/a", "http_status" -> "200",
        "http_size" -> "123", "http_ip" -> "10.0.0.1", "http_ua" -> "curl")),
      // legit plecto-proxy: bare keys + duration
      (ts(1), "plecto-proxy", Map(
        "method" -> "POST", "path" -> "/b", "status" -> "503",
        "client" -> "10.0.0.2", "duration_ms" -> "42.5")),
      // THIRD producer with the full bare shape — must NOT be admitted
      (ts(2), "rogue-proxy", Map(
        "method" -> "GET", "path" -> "/c", "status" -> "200", "client" -> "x")),
      // nginx row missing the method/path/status keys — gate drops it
      (ts(3), "nginx", Map("http_ip" -> "10.0.0.3")),
      // nginx name but the OTHER producer's shape — shape gate drops it
      (ts(4), "nginx", Map("method" -> "GET", "path" -> "/d", "status" -> "200")),
      // plecto name with empty method — the != '' gate drops it
      (ts(5), "plecto-proxy", Map("method" -> "", "path" -> "/e", "status" -> "200"))
    ).toDF("ts", "service_name", "fields")

    val out = HttpLogs.normalize(rows).collect()
    assert(out.length == 2)
    val byService = out.map(r => r.getAs[String]("service_name") -> r).toMap
    val ng = byService("nginx")
    assert(ng.getAs[String]("method") == "GET")
    assert(ng.getAs[String]("path") == "/a")
    assert(ng.getAs[Int]("status_code") == 200)
    assert(ng.getAs[Long]("response_size") == 123L)
    assert(ng.getAs[String]("user_agent") == "curl")
    assert(ng.getAs[Double]("duration_ms") == 0.0) // nginx never has latency
    val pl = byService("plecto-proxy")
    assert(pl.getAs[String]("method") == "POST")
    assert(pl.getAs[Int]("status_code") == 503)
    assert(pl.getAs[Long]("response_size") == 0L) // plecto never has size
    assert(pl.getAs[String]("user_agent") == "")
    assert(pl.getAs[Double]("duration_ms") == 42.5)
  }

  test("ev31: golden signals roll up the normalized fact with exact ratios") {
    val rows = Seq(
      (ts(0), "plecto-proxy", Map("method" -> "GET", "path" -> "/a", "status" -> "200",
        "client" -> "c", "duration_ms" -> "10.0")),
      (ts(0), "plecto-proxy", Map("method" -> "GET", "path" -> "/a", "status" -> "500",
        "client" -> "c", "duration_ms" -> "30.0")),
      (ts(0), "nginx", Map("http_method" -> "GET", "http_path" -> "/a", "http_status" -> "200",
        "http_size" -> "100", "http_ip" -> "i", "http_ua" -> "u"))
    ).toDF("ts", "service_name", "fields")
    val gs = HttpLogs.goldenSignals(HttpLogs.normalize(rows)).collect()
    assert(gs.length == 1)
    val r = gs.head
    assert(r.getAs[Long]("n_requests") == 3L)
    assert(r.getAs[Long]("n_errors") == 1L)
    assert(r.getAs[Double]("error_rate") == 0.3333)
    assert(r.getAs[Long]("total_bytes") == 100L)
    // p95 over centi-ms {1000, 3000, 0} — exact percentile interpolation
    assert(r.getAs[Double]("p95_latency_ms") > 25.0)
  }

  test("ev31: the composed events view plants all three producers and corrupt rows") {
    val logs = HttpLogs.httpLogsFromEvents(spark, sfDir)
    val svcs = logs.select("service_name").distinct().as[String].collect().toSet
    assert(svcs == Set("nginx", "plecto-proxy", "other-svc"))
    val norm = HttpLogs.normalize(logs)
    // the third producer must never pass the gate
    assert(norm.filter(col("service_name") === "other-svc").count() == 0)
    // shape-stripped nginx 'click' rows must be excluded, other nginx kept
    val nginxAll = logs.filter(col("service_name") === "nginx").count()
    val nginxKept = norm.filter(col("service_name") === "nginx").count()
    assert(nginxKept < nginxAll && nginxKept > 0)
  }
}
