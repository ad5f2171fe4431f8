package graft

import org.apache.spark.sql.functions._
import graft.operators.HierarchicalChunks

/** Specs for hc01 — the overlap chunk planner: a hand-computed case
  * per rule, the backward-walk BREAK pin, and a random-input property
  * test against the independent Scala transcription of the Python
  * loop (the oracle stand-in — DuckDB 1.0's list folds corrupt
  * list-typed accumulators).
  */
class HierarchicalChunksSpec extends SparkSpec {
  import spark.implicits._

  private def plan(rows: Seq[(String, Long, Int)], maxChars: Int = 1000, ov: Int = 150) =
    HierarchicalChunks.chunkPlanOn(
      rows.toDF("job_id", "doc_id", "cluster_len"), maxChars, ov)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq

  test("greedy close, overlap carry, and the oversized-first-cluster pack") {
    // budget 1000, overlap 150: [400, 500, 120, 600]
    //  c0(400)+c1(500)=900; +c2(120)=1020 > 1000 → close chunk0=[0,1];
    //  overlap walk backward: 500 > 150 → break immediately → no carry;
    //  chunk1 = [2], +c3(600)=720 ≤ 1000 → chunk1=[2,3]
    assert(plan(Seq(("j", 0L, 400), ("j", 1L, 500), ("j", 2L, 120), ("j", 3L, 600))) ==
      Seq(("j", 0, 0L), ("j", 0, 1L), ("j", 1, 2L), ("j", 1, 3L)))
    // overlap carries: [400, 100, 600] → chunk0=[0,1]; backward walk:
    // 100 ≤ 150 carries, then 400 stops (100+400 > 150) → chunk1=[1,2]
    assert(plan(Seq(("j", 0L, 400), ("j", 1L, 100), ("j", 2L, 600))) ==
      Seq(("j", 0, 0L), ("j", 0, 1L), ("j", 1, 1L), ("j", 1, 2L)))
    // an oversized FIRST cluster still packs alone (the cur-empty guard)
    assert(plan(Seq(("j", 0L, 5000), ("j", 1L, 100))) ==
      Seq(("j", 0, 0L), ("j", 1, 1L)))
  }

  test("the backward walk BREAKS on the first non-fitting cluster (not a filter)") {
    // cur = [50, 500, 60]; overlap budget 150: walking backward 60 fits,
    // 500 breaks — the EARLIER 50 must NOT be carried even though
    // 60+50=110 ≤ 150 (python's `else: break`, :946)
    val out = plan(Seq(("j", 0L, 50), ("j", 1L, 500), ("j", 2L, 60),
      ("j", 3L, 700)), maxChars = 700, ov = 150)
    val chunk1 = out.filter(_._2 == 1).map(_._3)
    assert(chunk1 == Seq(2L, 3L), s"only the trailing 60 carries; got $chunk1")
  }

  test("property: the HOF fold matches the Python-loop transcription on random inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 30).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val lens = (0 until n).map(i => (i.toLong, 1 + rnd.nextInt(1500)))
      val expected = HierarchicalChunks.referenceFold(lens, 2000, 300)
        .map { case (id, len, ci) => (ci, id) }.sorted
      val got = plan(lens.map { case (id, len) => ("j", id, len) }, 2000, 300)
        .map { case (_, ci, id) => (ci, id) }.sorted
      assert(got == expected, s"trial $trial: n=$n")
    }
  }

  test("hc01 composes at sf0.001: memberships cover every doc, chunks under budget (oversized singletons aside), repeat-run identical") {
    val out1 = HierarchicalChunks.hc01(spark, sfDir).collect()
    val out2 = HierarchicalChunks.hc01(spark, sfDir).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    val nDocs = Tables.documents(spark, sfDir).count()
    val memberships = out1.map(r => (r.getString(0), r.getLong(2))).distinct
    assert(memberships.length == nDocs, "every cluster appears in at least one chunk")
    // budget invariant, provable from the fold: a chunk's total is
    // curlen at close, which only exceeds MaxChars when the member
    // that re-opened it was itself oversized (len > MaxChars − overlap)
    val byChunk = out1.groupBy(r => (r.getString(0), r.getInt(1))).values
    byChunk.foreach { rows =>
      val total = rows.map(_.getInt(3)).sum
      val maxMember = rows.map(_.getInt(3)).max
      assert(total <= HierarchicalChunks.MaxChars ||
        maxMember > HierarchicalChunks.MaxChars - HierarchicalChunks.OverlapChars,
        s"over-budget chunk without an oversized member: total=$total max=$maxMember")
    }
  }
}
