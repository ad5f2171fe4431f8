package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Batch operator specs on the sf0.001 tables — shape and invariant
  * checks (value-level equivalence is covered by the DuckDB oracle
  * gate, tools/check.py).
  */
class OperatorsSpec extends SparkSpec {

  test("q01 pricing summary groups by flag/status") {
    val r = Relational.pricingSummary(spark, sfDir).collect()
    assert(r.length >= 4 && r.length <= 9)
    assert(r.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q03 flagship join covers all nations with revenue") {
    val r = Relational.joinNationRevenue(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q04 top-N is 10 rows sorted desc") {
    val r = Relational.topNCustomers(spark, sfDir).collect()
    assert(r.length == 10)
    val revs = r.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q05 latest-per-key emits one row per customer") {
    val r = Relational.latestOrderPerCustomer(spark, sfDir)
    assert(r.count() == r.select("o_custkey").distinct().count())
  }

  test("q07/q08 semi+anti partition the customer table") {
    val total = Tables.customer(spark, sfDir).count()
    val withO = Relational.customersWithOrders(spark, sfDir).count()
    val without = Relational.customersWithoutOrders(spark, sfDir).count()
    assert(withO + without == total)
  }

  test("ev04 sessionization: session counts bounded by event counts") {
    val r = Events.sessionize(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => row.getAs[Long]("n_sessions") >= 1 &&
      row.getAs[Long]("n_sessions") <= row.getAs[Long]("n_events")))
  }

  test("ev02 error rate within [0,1]") {
    val r = Events.errorRate(spark, sfDir).collect()
    assert(r.forall { row =>
      val er = row.getAs[Double]("error_rate"); er >= 0 && er <= 1
    })
  }

  test("asof join picks the latest right row at-or-before each left row") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val left = Seq((1L, t(10), 100L), (1L, t(30), 101L), (2L, t(5), 200L))
      .toDF("k", "ts", "id")
    val right = Seq((1L, t(10), 900L), (1L, t(9), 901L), (1L, t(29), 902L))
      .toDF("k", "ts", "id")
    val got = operators.AsOf.joinAsOf(left, right, "k", "ts", "id")
      .collect().map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got(100L).contains(900L)) // equal ts matches (<=), beats 9-min row
    assert(got(101L).contains(902L)) // latest before 30
    assert(got(200L).isEmpty)        // no right rows for key 2 → null
  }

  test("es01 projection has one state per user") {
    val r = Events.latestStateProjection(spark, sfDir)
    assert(r.count() == Tables.events(spark, sfDir).select("user_id").distinct().count())
  }
}
