package graft

import org.apache.spark.sql.execution.FormattedMode
import graft.operators._

/** Plan pins for the round-16 additions (the PlanSpec discipline):
  * no cartesian products; stateless projections stay exchange-free;
  * bounded dims broadcast; gp's brute shape is a BroadcastNestedLoop
  * over the golden side, never a shuffled product.
  */
class Round16PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("no CartesianProduct in any round-16 operator plan") {
    val plans = Seq(
      CitationReconcile.cb01(spark, sfDir),
      GraphRescue.gp01(spark, sfDir),
      GraphRescue.gp02(spark, sfDir),
      QualityJudge.qj01(spark, sfDir),
      CitationFormat.cf01(spark, sfDir),
      QueryFilters.rag13(spark, sfDir),
      AnswerValidate.rag14(spark, sfDir),
      AnswerQuality.rag15(spark, sfDir),
      GenreBlend.gc02(spark, sfDir),
      ParagraphChunks.rag16(spark, sfDir),
      ChunkDiff.rag17(spark, sfDir)).map(plan)
    assert(plans.forall(!_.contains("CartesianProduct")))
  }

  test("the chunker and the chunk diff are exchange-free in-row folds (rag16, rag17)") {
    Seq("rag16" -> plan(ParagraphChunks.rag16(spark, sfDir)),
      "rag17" -> plan(ChunkDiff.rag17(spark, sfDir))).foreach { case (n, p) =>
      assert(!p.contains("Exchange"), s"$n must be a pure scan projection")
    }
  }

  test("the stateless ladders are exchange-free scans: qj01, cf01, rag14, rag15 (tx39/tx46's shape)") {
    Seq("qj01" -> plan(QualityJudge.qj01(spark, sfDir)),
      "cf01" -> plan(CitationFormat.cf01(spark, sfDir)),
      "rag14" -> plan(AnswerValidate.rag14(spark, sfDir)),
      "rag15" -> plan(AnswerQuality.rag15(spark, sfDir))).foreach { case (n, p) =>
      assert(!p.contains("Exchange"), s"$n must be a pure scan projection")
      assert(!p.contains("Window"), s"$n must be window-free")
    }
  }

  test("gp01/gp02 run the bounded-batch brute shape: the labeled golden side broadcasts through a BroadcastNestedLoopJoin (sim01's class), never a shuffle join on the pair product") {
    Seq(plan(GraphRescue.gp01(spark, sfDir)),
      plan(GraphRescue.gp02(spark, sfDir))).foreach { p =>
      assert(p.contains("BroadcastNestedLoopJoin"))
      assert(!p.contains("SortMergeJoin"), "pair generation must not shuffle both sides")
    }
  }

  test("cb01's per-group dims (refs / url map / host map / ref counts) all broadcast — the corpus never shuffles for resolution") {
    val p = plan(CitationReconcile.cb01(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "resolution joins stay broadcast")
  }

  test("gc02's genre dimension broadcasts and the decision window partitions by doc — never a single-partition funnel") {
    val p = plan(GenreBlend.gc02(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("Exchange SinglePartition"))
  }

  test("rag13's dedup/cap windows partition by the response set — never a corpus-global window") {
    assert(!plan(QueryFilters.rag13(spark, sfDir)).contains("Exchange SinglePartition"))
  }
}
