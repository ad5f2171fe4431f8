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
}
