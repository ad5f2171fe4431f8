package graft

import org.apache.spark.sql.execution.FormattedMode
import graft.operators._

/** Plan pins for the round-15 additions (the PlanSpec discipline):
  * no cartesian products anywhere; the agg-only operators stay
  * window-free; bounded frames broadcast.
  */
class Round15PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("no CartesianProduct in any round-15 operator plan") {
    val plans = Seq(
      KnowledgeAudit.ka01(spark, sfDir),
      RetrievalQuality.rag09(spark, sfDir),
      ContextAllocate.rag10(spark, sfDir),
      ArticleBm25.rag11(spark, sfDir),
      TemporalBoost.rag12(spark, sfDir),
      HomeItemScore.es12(spark, sfDir),
      Trail.trailEpisodes(spark, sfDir)).map(plan)
    assert(plans.forall(!_.contains("CartesianProduct")))
  }

  test("the agg-only operators have NO window exec: ka01 (bounded " +
       "groupBy + broadcast baseline), rag09 (pivot agg + scalar " +
       "ladder), es12 (struct-max agg + bounded join)") {
    Seq("ka01" -> plan(KnowledgeAudit.ka01(spark, sfDir)),
      "rag09" -> plan(RetrievalQuality.rag09(spark, sfDir)),
      "es12" -> plan(HomeItemScore.es12(spark, sfDir))).foreach { case (n, p) =>
      assert(!p.contains("Window"), s"$n must be window-free")
    }
  }

  test("ka01's v1 baseline row broadcasts into the per-version frame") {
    assert(plan(KnowledgeAudit.ka01(spark, sfDir)).contains("Broadcast"))
  }

  test("rag10/rag11/rag12 windows partition by query_id — never a " +
       "corpus-global window (the single-partition spec covers only " +
       "es11's bounded item-catalog ordinal)") {
    Seq(plan(ContextAllocate.rag10(spark, sfDir)),
      plan(ArticleBm25.rag11(spark, sfDir)),
      plan(TemporalBoost.rag12(spark, sfDir))).foreach { p =>
      assert(!p.contains("Exchange SinglePartition"),
        "a query-partitioned window never funnels to one partition")
    }
  }
}
