package graft

import graft.operators.ClassifierDecision

/** Rule-per-case pins for gc01 (classifier.py predict_batch
  * :484-567): the ≥-threshold gate, score-desc stable (alphabetical
  * on ties) candidate order, top_k truncation, the argmax-over-ALL
  * fallback (alphabetically-first on exact ties) with its
  * multi-label-injected vs single-label-empty candidate difference,
  * and the case where the global argmax is NOT the top candidate.
  */
class ClassifierDecisionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)],
                  topK: Int = 5, multiLabel: Boolean = true) =
    ClassifierDecision.decideOn(
      rows.toDF("doc_id", "genre", "score_u", "thr_u"), topK, multiLabel)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getString(5)),
        r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toSeq

  test("the top candidate is the best PASSING class, not the global argmax") {
    // sort scores highest but sits under its 0.5 default threshold;
    // join and filter clear their own; filter passes AT the boundary
    // (>= per :494's `score >= threshold`)
    val out = run(Seq(
      (1L, "sort", 400000L, 500000L), (1L, "join", 50000L, 20000L),
      (1L, "stream", 10000L, 30000L), (1L, "filter", 10000L, 10000L)))
    assert(out.size == 2)
    assert(out.map(t => (t._2, t._3)) == Seq((Some(1), Some("join")), (Some(2), Some("filter"))))
    assert(out.forall(t => t._4 == "join" && t._5 == 0.05 && !t._6),
      "top = candidates[0] = join, NOT the higher-scored-but-gated sort")
  }

  test("nothing passes: multi-label injects the argmax candidate; single-label injects none") {
    val rows = Seq(
      (2L, "sort", 400000L, 500000L), (2L, "join", 10000L, 20000L),
      (2L, "stream", 20000L, 30000L), (2L, "filter", 5000L, 10000L))
    val ml = run(rows)
    assert(ml == Seq((2L, Some(1), Some("sort"), "sort", 0.4, true)),
      "multi-label fallback: ONE injected candidate = the argmax, below flagged")
    val sl = run(rows, multiLabel = false)
    assert(sl == Seq((2L, None, None, "sort", 0.4, true)),
      "single-label fallback: candidates stay empty (:565 slices the empty list)")
  }

  test("argmax ties resolve to the alphabetically-first class (np.argmax first index)") {
    val out = run(Seq(
      (3L, "join", 10000L, 500000L), (3L, "filter", 10000L, 500000L),
      (3L, "sort", 5000L, 500000L), (3L, "stream", 5000L, 500000L)))
    assert(out.map(_._4).distinct == Seq("filter"))
    assert(out.head._6, "below_threshold")
  }

  test("top_k truncates the candidate list; passing ties keep alphabetical order") {
    val out = run(Seq(
      (4L, "join", 50000L, 10000L), (4L, "stream", 50000L, 10000L),
      (4L, "filter", 30000L, 10000L), (4L, "sort", 20000L, 10000L)), topK = 2)
    assert(out.map(t => (t._2, t._3)) == Seq((Some(1), Some("join")), (Some(2), Some("stream"))),
      "equal 0.05 scores order join before stream; filter/sort cut by top_k=2")
    assert(out.forall(t => t._4 == "join" && !t._6))
  }
}
