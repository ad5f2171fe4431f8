package graft

import graft.operators.PseudoLabel
import graft.operators.PseudoLabel._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pseudo-label selection + report replay: the deterministic
  * post-inference half of learning_machine/scripts/pseudo_label.py on
  * hand frames — the selection methods (:316-340), the per-class cap
  * order quirk (:343), the default branch's max(1,…) (:337), and the
  * detect_language_simple ladder (:190).
  */
class PseudoLabelSpec extends SparkSpec {
  import spark.implicits._

  private def cand(rows: (Long, String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("doc_id", "pred_label", "conf_m", "margin_m")

  private def det(s: String): String =
    Seq(s).toDF("t").select(detectLang(col("t")).as("l"))
      .collect().head.getString(0)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("detect_language_simple: the :190 ladder, rule by rule") {
    // under min_chars 50 → unknown regardless of content
    assert(det("short english text") == "unknown")
    // no letter/digit chars at all → unknown (the total==0 guard)
    assert(det("!?.,;: -- ... " * 5) == "unknown")
    // jp ratio > 0.1 wins even with MORE ascii letters present
    assert(det("こんにちは世界" + "x" * 48) == "ja")
    // en ratio > 0.3, no jp
    assert(det("x" * 20 + "0" * 40) == "en")
    // jp fallback: jp present but ratio ≤ 0.1 and en ratio ≤ 0.3
    assert(det("あ" + "x" * 10 + "0" * 89) == "ja")
    // en fallback: en present, ratio ≤ 0.3, no jp
    assert(det("x" * 10 + "0" * 90) == "en")
    // digits only: alnum total > 0 but neither jp nor en → unknown
    assert(det("0" * 60) == "unknown")
  }

  test("top-percent: exactly ⌊N·P/100⌋ rows, boundary ties by lowest id") {
    // 10 rows, P=30 → n_accept=3. One row above the boundary, THREE
    // tied AT it (ids 9, 5, 2) — the quota takes the two lowest ids.
    val df = cand(
      (1L, "g0", 900000L, 0L), (2L, "g0", 800000L, 0L),
      (5L, "g1", 800000L, 0L), (9L, "g2", 800000L, 0L),
      (3L, "g1", 700000L, 0L), (4L, "g2", 600000L, 0L),
      (6L, "g0", 500000L, 0L), (7L, "g1", 400000L, 0L),
      (8L, "g2", 300000L, 0L), (10L, "g0", 200000L, 0L))
    assert(ids(selectTopPercent(df, 30, atLeastOne = false)) == Set(1L, 2L, 5L))
  }

  test("int(N·P/100) truncates; max(1,…) exists ONLY on the default branch (:320 vs :337)") {
    val five = cand((1 to 5).map(i =>
      (i.toLong, "g0", 100000L * i, 0L)): _*)
    // N=5, P=10 → ⌊0.5⌋ = 0: the explicit path selects NOTHING
    assert(selectTopPercent(five, 10, atLeastOne = false).count() == 0)
    // the default branch floors at 1: the single most-confident row
    assert(ids(selectTopPercent(five, 10, atLeastOne = true)) == Set(5L))
    // N=25, P=10 → ⌊2.5⌋ = 2, not 3
    val many = cand((1 to 25).map(i =>
      (i.toLong, "g0", 10000L * i, 0L)): _*)
    assert(selectTopPercent(many, 10, atLeastOne = false).count() == 2)
  }

  test("per-class cap order: most-confident under top-percent, first-seen under threshold/margin (:343)") {
    val df = cand(
      (1L, "g0", 710000L, 200000L), (2L, "g0", 720000L, 200000L),
      (3L, "g0", 730000L, 200000L), (4L, "g0", 740000L, 200000L))
    // threshold/margin: np.where is index-ascending → cap keeps the
    // LOWEST ids even though they are the least confident
    assert(ids(capPerClass(df, byConfidence = false, cap = 2)) == Set(1L, 2L))
    // top-percent: argsort-desc order → cap keeps the most confident
    assert(ids(capPerClass(df, byConfidence = true, cap = 2)) == Set(4L, 3L))
  }

  test("pl01: the four methods select their own sets; an unmet threshold yields zero rows") {
    val df = cand(
      (1L, "g0", 690000L, 150000L), (2L, "g1", 650000L, 50000L),
      (3L, "g0", 600000L, 120000L), (4L, "g1", 550000L, 90000L))
    val out = pl01On(df).persist()
    // threshold 0.7: nothing reaches it
    assert(out.filter(col("method") === "threshold").count() == 0)
    // margin ≥ 0.1: ids 1 and 3
    assert(ids(out.filter(col("method") === "margin")) == Set(1L, 3L))
    // top 10% of 4 → ⌊0.4⌋ = 0 rows; default 5% → max(1,0) = 1 row
    assert(out.filter(col("method") === "top_percent").count() == 0)
    assert(ids(out.filter(col("method") === "default")) == Set(1L))
    val r = out.filter(col("method") === "default").collect().head
    assert(r.getAs[Double]("confidence") == 0.69)
    assert(r.getAs[Double]("margin") == 0.15)
  }

  test("pl02: hand-computed moments, interpolated percentiles, lattices, class_dist") {
    val df = cand(
      (1L, "g1", 100000L, 50000L), (2L, "g0", 200000L, 100000L),
      (3L, "g0", 300000L, 150000L), (4L, "g2", 400000L, 200000L))
    val out = pl02On(df).persist()
    def v(sec: String, met: String): Double =
      out.filter(col("section") === sec && col("metric") === met)
        .collect().head.getAs[Double]("value")
    assert(v("confidence", "mean") == 0.25)
    assert(v("confidence", "median") == 0.25)
    // σ = √(n·Σu²−(Σu)²)/(n·1e6) = √(4·3e11 − 1e12)/4e6 = 0.111803
    assert(v("confidence", "std") == 0.111803)
    assert(v("confidence", "min") == 0.1)
    assert(v("confidence", "max") == 0.4)
    // p75: index 0.75·3 = 2.25 → 300000 + 0.25·100000 = 325000
    assert(v("confidence", "p75") == 0.325)
    assert(v("margin", "mean") == 0.125)
    assert(v("margin", "max") == 0.2)
    // lattice counts: conf ≥ 0.3 → 2 rows; margin ≥ 0.15 → 2 rows
    assert(v("threshold_est", "ge_0.30") == 2.0)
    assert(v("margin_est", "ge_0.15") == 2.0)
    // top20 of 4: n_est = max(1, ⌊0.8⌋) = 1; thresh = pctl(0.8) = 0.34
    assert(v("top_pct_est", "top20_n") == 1.0)
    assert(v("top_pct_est", "top20_thresh") == 0.34)
    // class_dist over the default top-5% pick (1 row: id 4, class g2)
    assert(v("class_dist", "g2") == 1.0)
    assert(out.filter(col("section") === "class_dist").count() == 1)
  }

  test("top-percent histogram selection ≡ a global rank on every composed profile (ties, skew, tiny N)") {
    // the scalable histogram+boundary plan must select EXACTLY the set
    // a naive global row_number over (conf desc, id asc) would — across
    // distinct confidences, heavy boundary ties, one-value degenerate
    // frames, and N smaller than 100/P
    import org.apache.spark.sql.expressions.Window
    val profiles = Seq(
      // (n, conf generator) — distinct, mod-heavy ties, all-equal, tiny
      (200, (i: Int) => 1000L * i),
      (200, (i: Int) => 10000L * (i % 7)),
      (50, (i: Int) => 42000L),
      (7, (i: Int) => 5000L * (i % 2)),
      (100, (i: Int) => if (i < 90) 100000L else 900000L))
    for (((n, f), pi) <- profiles.zipWithIndex; pct <- Seq(5, 10, 30)) {
      val df = cand((1 to n).map(i => (i.toLong, s"g${i % 3}", f(i), 0L)): _*)
      val got = ids(selectTopPercent(df, pct, atLeastOne = false))
      val w = Window.orderBy(col("conf_m").desc, col("doc_id").asc)
      val nAcc = n * pct / 100
      val want = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= nAcc).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"profile $pi pct $pct: got ${got.size}, want ${want.size}")
    }
  }

  test("composed candidates: lang-less doc_id%5=0 rows route through detection, the rest keep labels") {
    val c = composeCandidates(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val joined = c.join(docs, "doc_id")
    // labeled path: every doc_id%5≠0 candidate carries lang='en'
    assert(joined.filter(pmod(col("doc_id"), lit(5)) =!= 0 &&
      col("lang") =!= "en").count() == 0)
    // detected path admits non-'en'-labeled docs whose TEXT reads en
    assert(joined.filter(pmod(col("doc_id"), lit(5)) === 0 &&
      col("lang") =!= "en").count() > 0)
    // argmax invariant: the class index is the conf's mod-1000 residue
    assert(c.filter(col("pred_label") =!=
      concat(lit("g"), pmod(col("conf_m"), lit(1000)))).count() == 0)
    assert(c.filter(col("margin_m") <= 0).count() == 0)
  }
}
