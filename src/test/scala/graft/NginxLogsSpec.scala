package graft

import graft.operators.NginxLogs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nginx access-log battery: parse fields and awk-stat quirks
  * (scripts/analyze-nginx-logs.sh).
  */
class NginxLogsSpec extends SparkSpec {
  import spark.implicits._

  private def line(path: String, status: String, rt: String,
                   uct: String = "0.001", uht: String = "0.010", urt: String = "0.020") =
    s"""198.51.100.7 - - [10/Jun/2024:12:00:00 +0000] "GET $path HTTP/1.1" $status 512 "-" "agent" rt=$rt uct=$uct uht=$uht urt=$urt"""

  private def lines(ls: String*): DataFrame =
    ls.toSeq.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("line_id", "line")

  test("parse: quoted-request path, field-9 status, standalone rt (urt never bleeds in) (:62-74)") {
    val p = NginxLogs.parseOn(lines(line("/api/x?q=1", "404", "0.123", urt = "0.999")))
      .collect().head
    assert(p.getString(2) == "/api/x?q=1" && p.getString(3) == "404")
    assert(p.getLong(4) == 123L, "rt reads its own field, not urt's suffix")
    assert(p.getLong(7) == 999L)
    assert(p.getString(1) == "10/Jun/2024:12:00:00 +0000")
  }

  test("ng01: median is the two-middle mean; min skips zeros; max keeps the FIRST max line (:99-115)") {
    val r = NginxLogs.requestStatsOn(lines(
      line("/a", "200", "0.000"),
      line("/b", "200", "0.100"),
      line("/c", "500", "0.300"),
      line("/d", "200", "0.300"))).collect().head
    assert(r.getDouble(2) == 0.2, "median of 0,100,300,300 millis = 200")
    assert(r.getDouble(4) == 0.1, "min ignores the zero rt (the awk min=999 guard)")
    assert(r.getDouble(3) == 0.3 && r.getString(8) == "/c" && r.getString(9) == "500",
      "the first line holding the max wins (head -1)")
    assert(r.getLong(7) == 0L)
  }

  test("ng01: the min=999 initialization leaks when every rt is zero (:116)") {
    val r = NginxLogs.requestStatsOn(lines(line("/a", "200", "0.000"))).collect().head
    assert(r.getDouble(4) == 999.0)
  }

  test("ng02/ng03: shares at 1 dp; endpoints strip the query string (:147,:163)") {
    val r = NginxLogs.statusStatsOn(lines(
      line("/a", "200", "0.1"), line("/b", "200", "0.1"), line("/c", "500", "0.1")))
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("200") == 66.7 && r("500") == 33.3)
    val e = NginxLogs.endpointStatsOn(lines(
      line("/api/items?id=1", "200", "1.000"),
      line("/api/items?id=2", "200", "0.500"),
      line("/api/feeds", "200", "0.600"))).collect()
    assert(e.head.getString(0) == "/api/items" && e.head.getDouble(2) == 0.75,
      "query variants collapse into one endpoint")
    assert(e.head.getLong(1) == 2)
  }

  test("slow threshold is >= 1.0 s (:131)") {
    val r = NginxLogs.requestStatsOn(lines(
      line("/a", "200", "1.000"), line("/b", "200", "0.999"))).collect().head
    assert(r.getLong(7) == 1L, "exactly 1.000 counts (awk >=)")
  }

  test("composition round-trips at sf0.001 with every status and the top-10 cut shape") {
    val r = NginxLogs.ng01(spark, sfDir).collect().head
    assert(r.getLong(0) > 0 && r.getLong(7) > 0)
    assert(NginxLogs.ng02(spark, sfDir).count() == 4, "200/404/500/301 all compose")
    val e = NginxLogs.ng03(spark, sfDir).collect()
    assert(e.length == 4 && e.forall(_.getString(0).startsWith("/api/")),
      "4 endpoints after query stripping")
  }
}
