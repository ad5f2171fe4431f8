package graft

import org.apache.spark.sql.functions._
import graft.operators.Perf

/** alt-perf measurement-analysis semantics, pinned on planted frames:
  * the statistics battery's interpolated percentiles / sample variance
  * / t-CI / IQR outlier gate, the load report's exact 1%-error pass
  * gate and empty-success zeros, the vitals rating ladder (incl. CLS
  * zeroIsValid and not-measured score exclusion), and the multi-run
  * collector's discard-then-summarize order.
  */
class PerfSpec extends SparkSpec {
  import spark.implicits._

  private def J(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
  private val N: java.lang.Long = null

  test("pf01 statistics battery: percentile interpolation, sample variance, t-CI, IQR outliers") {
    // group a: values 1,2,3,4,100 (cents 100..10000) — every statistic
    // hand-computable; group b: a single run; group c: n=3 with an
    // extreme value that must NOT count as an outlier (n < 4 gate)
    val vals =
      Seq(100L, 200L, 300L, 400L, 10000L).map(("a", _)) ++
      Seq(("b", 700L)) ++
      Seq(500L, 500L, 5000L).map(("c", _))
    val out = Perf.runStatsOn(vals.toDF("grp", "c"), Seq("grp"))
      .collect().map(r => r.getString(0) -> r).toMap

    val a = out("a")
    assert(a.getLong(1) == 5) // n
    assert(a.getDouble(2) == 22.0, "mean")
    assert(a.getDouble(3) == 3.0, "median")
    assert(a.getDouble(4) == 1.0 && a.getDouble(5) == 100.0, "min/max")
    val varC2 = 76100000.0 / 4 // Σ(dev²) over cents, n−1
    assert(a.getDouble(7) == math.round(varC2 / 1e4 * 1e4) / 1e4, "variance")
    val sd = math.sqrt(varC2) / 100
    assert(a.getDouble(6) == math.round(sd * 1e4) / 1e4, "std_dev")
    assert(a.getDouble(8) == 4.0, "p75")      // idx 3
    assert(a.getDouble(9) == 61.60, "p90")    // 400 + .6·9600 = 6160c
    assert(a.getDouble(10) == 80.80, "p95")
    assert(a.getDouble(11) == 96.16, "p99")
    // df=4 → t=2.776
    val margin = 2.776 * sd / math.sqrt(5)
    assert(a.getDouble(12) == math.round((22.0 - margin) * 1e4) / 1e4, "ci_lower")
    assert(a.getDouble(13) == math.round((22.0 + margin) * 1e4) / 1e4, "ci_upper")
    assert(!a.getBoolean(14), "cv >> 0.15 → not stable")
    // q1=200 q3=400 → bounds [-100, 700] → only 10000 outside
    assert(a.getLong(15) == 1, "n_outliers")

    val b = out("b")
    assert(b.getLong(1) == 1 && b.getDouble(2) == 7.0)
    assert(b.getDouble(6) == 0.0 && b.getDouble(7) == 0.0, "n=1 → zero spread")
    assert(b.getDouble(12) == 7.0 && b.getDouble(13) == 7.0, "n=1 → CI = mean")
    assert(b.getBoolean(14), "n=1 → stable")
    assert(b.getLong(15) == 0)

    assert(out("c").getLong(15) == 0, "n=3 < 4 → outlier detection disabled")
  }

  test("pf01 t-critical lookup uses the closest table df at or below") {
    val cases = Seq(
      1L -> 12.706, 2L -> 4.303, 3L -> 3.182, 4L -> 2.776, 5L -> 2.571,
      6L -> 2.447, 7L -> 2.365, 8L -> 2.306, 9L -> 2.262, 10L -> 2.228,
      14L -> 2.228, 15L -> 2.131, 19L -> 2.131, 20L -> 2.086,
      24L -> 2.086, 25L -> 2.060, 29L -> 2.060, 30L -> 2.042,
      39L -> 2.042, 40L -> 2.021, 49L -> 2.021, 50L -> 2.009,
      99L -> 2.009, 100L -> 1.984, 999L -> 1.984, 1000L -> 1.962,
      5000L -> 1.962)
    val got = cases.map(_._1).toDF("df")
      .select(col("df"), Perf.tCritical95(col("df")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (df, t) => assert(got(df) == t, s"df=$df") }
  }

  test("pf02 load report: exact 1%-gate boundary, empty-success zeros, network-error bucket") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(plusSec: Int) = new java.sql.Timestamp(base.getTime + plusSec * 1000L)
    val rows =
      // /a: 99 ok @10ms + 1 failed of 100 → errorRate exactly 0.01 → NOT passed
      (1 to 99).map(i => ("/a", 200, 1000L, t(i % 10))) ++ Seq(("/a", 500, 0L, t(0))) ++
      // /b: 999 ok + 1 failed → 0.001 → passed; span max−min = 9 s
      (1 to 999).map(i => ("/b", 200, 2000L, t(i % 10))) ++ Seq(("/b", 0, 0L, t(0))) ++
      // /c: all network errors → every rt stat is 0, not null
      (1 to 5).map(_ => ("/c", 0, 0L, t(0)))
    val out = Perf.loadReportOn(rows.toDF("url", "status", "rt_c", "ts"))
      .collect().map(r => r.getString(0) -> r).toMap

    val a = out("/a")
    assert(a.getLong(1) == 100 && a.getLong(2) == 99 && a.getLong(3) == 1)
    assert(a.getDouble(4) == 0.01, "error_rate")
    assert(!a.getBoolean(14), "errorRate < 0.01 is strict — exactly 1% fails")
    assert(a.getDouble(8) == 10.0 && a.getDouble(9) == 10.0, "median/p95 of constant 10ms")

    val b = out("/b")
    assert(b.getBoolean(14), "0.1% error rate passes")
    assert(b.getDouble(11) == 111.11, "1000 requests over a 9s span → round(1000·100/9)/100")

    val c = out("/c")
    assert(c.getLong(2) == 0 && c.getLong(12) == 5, "all requests in the status-0 bucket")
    assert(c.getDouble(4) == 1.0)
    Seq(5, 6, 7, 8, 9, 10).foreach(i =>
      assert(c.getDouble(i) == 0.0, s"empty-success stat col $i is 0, not null"))
  }

  test("pf03 vitals: rating ladder, CLS zeroIsValid, not-measured excluded from the score") {
    val runs = Seq(
      // all good → 100
      ("d", "r1", J(100000L), J(10000L), J(500L), J(100000L), J(50000L)),
      // lcp missing, inp poor, cls 0 (valid good), fcp NI, ttfb good
      ("d", "r2", N, J(60000L), J(0L), J(200000L), J(50000L)),
      // nothing measured → score 0
      ("d", "r3", N, N, N, N, N),
      // zero lcp → not-measured (zeroIsValid only for CLS)
      ("d", "r4", J(0L), J(10000L), J(500L), J(100000L), J(50000L)))
      .toDF("device", "day", "lcp_c", "inp_c", "cls_u", "fcp_c", "ttfb_c")
    val out = Perf.vitalsScoreOn(runs)
      .collect().map(r => r.getString(1) -> r).toMap

    val r1 = out("r1")
    assert(r1.getLong(12) == 100 && r1.getInt(13) == 0)
    Seq(7, 8, 9, 10, 11).foreach(i => assert(r1.getString(i) == "good"))

    val r2 = out("r2")
    assert(r2.getString(7) == "not-measured", "null lcp")
    assert(r2.getString(8) == "poor")
    assert(r2.getString(9) == "good", "CLS 0 is a valid perfect score")
    assert(r2.getString(10) == "needs-improvement")
    // num = 0·25 + 100·15 + 50·15 + 100·20 = 4250; den = 75 → 56.67 → 57
    assert(r2.getLong(12) == 57, s"weighted score excl. not-measured, got ${r2.getLong(12)}")
    assert(r2.getInt(13) == 1)

    assert(out("r3").getLong(12) == 0 && out("r3").getString(7) == "not-measured")
    assert(out("r4").getString(7) == "not-measured", "zero lcp is not-measured")
  }

  test("pf04 multi-run: IQR outliers discarded before summarizing, only when n ≥ 4") {
    def run(dev: String, day: String, lcp: java.lang.Long): (String, String, java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Long, java.lang.Long) =
      (dev, day, lcp, N, N, N, N)
    val runs = (
      // d1: 4 stable runs + 1 extreme → discarded (q1=q3=100, iqr 0)
      (1 to 4).map(i => run("d1", s"a$i", J(100L))) :+ run("d1", "a5", J(10000L))) ++
      // d2: 3 runs incl. the same extreme → kept (n < 4)
      ((1 to 2).map(i => run("d2", s"b$i", J(100L))) :+ run("d2", "b3", J(10000L)))
    val out = Perf.multiRunVitalsOn(
      runs.toDF("device", "day", "lcp_c", "inp_c", "cls_u", "fcp_c", "ttfb_c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    val d1 = out(("d1", "lcp"))
    assert(d1.getLong(2) == 4, "outlier discarded from the summary count")
    assert(d1.getDouble(3) == 1.0 && d1.getDouble(7) == 0.0, "mean 1ms, sd 0")
    assert(d1.getBoolean(9), "stable after discard")

    val d2 = out(("d2", "lcp"))
    assert(d2.getLong(2) == 3, "n < 4 → no discard")
    assert(d2.getDouble(6) == 100.0, "extreme survives in max")
    assert(!d2.getBoolean(9))
  }
}
