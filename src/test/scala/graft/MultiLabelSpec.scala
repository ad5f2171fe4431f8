package graft

import graft.operators.MultiLabel

/** Multi-label evaluation semantics (recap-subworker
  * evaluate_classification) pinned on planted frames: the
  * twice-vs-truncated-once indicator thresholds, subset accuracy's
  * all-labels-agree rule, Hamming loss, zero_division=0, and
  * macro-vs-micro averaging.
  */
class MultiLabelSpec extends SparkSpec {
  import spark.implicits._

  test("indicator thresholds: y_true needs two occurrences, y_pred one in the first half") {
    // 4 tokens → half = first 2; 'join' twice with one early → TP;
    // 'stream' twice but both LATE → FN; 'sort' once early → FP
    // (true needs ≥2); 'filter' absent → TN
    val docs = Seq((1L, "join sort join stream stream x")).toDF("doc_id", "text")
    val got = MultiLabel.indicatorFrameOn(docs)
      .collect().map(r => r.getString(1) -> (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(got("join") == (true, true), "TP")
    assert(got("stream") == (true, false), "both occurrences past the half → FN")
    assert(got("sort") == (false, true), "single early occurrence → FP")
    assert(got("filter") == (false, false), "TN")
  }

  test("summary + report: subset accuracy, Hamming loss, macro vs micro, zero_division") {
    // doc1 agrees on every label (one TP + three TN); doc2 has one
    // FP, one FN, one TP, one TN → agree = 2
    val pairs = Seq(
      (1L, "join", true, true), (1L, "stream", false, false),
      (1L, "sort", false, false), (1L, "filter", false, false),
      (2L, "join", false, true), (2L, "stream", true, false),
      (2L, "sort", true, true), (2L, "filter", false, false))
      .toDF("doc_id", "genre", "y_true", "y_pred")

    val rep = MultiLabel.genreReportOn(pairs)
      .collect().map(r => r.getString(0) -> r).toMap
    val j = rep("join") // tp=1 fp=1 fn=0 support=1
    assert(j.getLong(1) == 1 && j.getLong(2) == 1 && j.getLong(3) == 1 && j.getLong(4) == 0)
    assert(j.getDouble(5) == 0.5 && j.getDouble(6) == 1.0 && j.getDouble(7) == 0.6667)
    val st = rep("stream") // only an FN → everything zero_division=0
    assert(st.getDouble(5) == 0.0 && st.getDouble(6) == 0.0 && st.getDouble(7) == 0.0)
    assert(rep("sort").getDouble(7) == 1.0)
    val f = rep("filter") // never true, never predicted
    assert(f.getLong(1) == 0 && f.getDouble(5) == 0.0 && f.getDouble(7) == 0.0)

    val s = MultiLabel.summaryOn(pairs).collect()(0)
    assert(s.getLong(0) == 2 && s.getInt(1) == 4)
    assert(s.getDouble(2) == 0.5, "subset accuracy: only doc1 agrees on ALL labels")
    assert(s.getDouble(3) == 0.25, "Hamming: 2 of 8 slots disagree")
    assert(s.getDouble(4) == 0.375, "macro_p = mean(0.5, 0, 1, 0)")
    assert(s.getDouble(5) == 0.5, "macro_r = mean(1, 0, 1, 0)")
    assert(s.getDouble(6) == 0.4167, "macro_f1 = round(mean(6667, 0, 10000, 0))/1e4")
    assert(s.getDouble(7) == 0.6667 && s.getDouble(8) == 0.6667, "micro pools tp=2 fp=1 fn=1")
    assert(s.getDouble(9) == 0.6667, "micro_f1 of equal P,R is P")
  }

  test("ml09 top-1 projection: first-≥2 truth, argmax-half prediction, ties and 'other'") {
    val docs = Seq(
      // toks 6 → half 3 = [join,sort,join]: true = join (first ≥2),
      // pred = join (argmax count 2)
      (1L, "join sort join stream stream x"),
      // no genre twice → true 'other'; half [x,y] has no genre → pred 'other'
      (2L, "x y sort filter"),
      // half [stream,sort] ties 1-1 → pred = stream (earliest in genre order)
      (3L, "stream sort filter filter")).toDF("doc_id", "text")
    val got = MultiLabel.topOneOn(docs)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L) == ("join", "join"))
    assert(got(2L) == ("other", "other"))
    assert(got(3L) == ("filter", "stream"), "true = first genre with two uses; pred tie → earliest")
  }

  test("ml09 Cramér's V: hand-computed 2×2 with Yates continuity") {
    // cells: (a,a)=10 (a,b)=2 (b,a)=3 (b,b)=5 → n=20, rsums 12/8,
    // csums 13/7, e = [7.8 4.2 5.2 2.8]; every |o−e| = 2.2, Yates
    // shrinks to 1.7; terms(1e-6) = 370513+688095+555769+1032143
    // = 2646520 → chi2 2.64652, v = √(2.64652/20) → 0.363766
    val singles = (Seq.fill(10)(("a", "a")) ++ Seq.fill(2)(("a", "b")) ++
      Seq.fill(3)(("b", "a")) ++ Seq.fill(5)(("b", "b")))
      .zipWithIndex.map { case ((t, p), i) => (i.toLong, t, p) }
      .toDF("doc_id", "y_true", "y_pred")
    val rows = MultiLabel.cramersOn(singles).collect()
    assert(rows.length == 4)
    val byCell = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byCell(("a", "a")).getLong(2) == 10 && byCell(("a", "a")).getDouble(3) == 7.8)
    assert(byCell(("a", "b")).getDouble(3) == 4.2)
    assert(byCell(("b", "a")).getDouble(3) == 5.2)
    assert(byCell(("b", "b")).getDouble(3) == 2.8)
    val r0 = rows(0)
    assert(r0.getLong(4) == 20 && r0.getLong(5) == 1)
    assert(r0.getBoolean(6), "2x2 after filtering → Yates applied")
    assert(r0.getDouble(7) == 2.64652, "chi2 from 1e-6-quantized Yates terms")
    assert(r0.getDouble(8) == 0.363766)
  }

  test("ml09 min_dim early-out: a single predicted class yields v = 0 (and chi2 is identically 0)") {
    val singles = (Seq.fill(3)(("a", "x")) ++ Seq.fill(2)(("b", "x")))
      .zipWithIndex.map { case ((t, p), i) => (i.toLong, t, p) }
      .toDF("doc_id", "y_true", "y_pred")
    val rows = MultiLabel.cramersOn(singles).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(5) == 0L), "min_dim = min(2,1) − 1 = 0")
    assert(rows.forall(r => !r.getBoolean(6)), "1 column → no Yates")
    assert(rows.forall(r => r.getDouble(7) == 0.0), "one column: every o = e")
    assert(rows.forall(r => r.getDouble(8) == 0.0), "the :371 early-out pinned")
  }
}
