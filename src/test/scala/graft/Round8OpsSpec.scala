package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Round-8 observability machinery checks (the oracle does the
  * end-to-end value verification; these pin cross-operator consistency
  * of the nested-array explode).
  */
class Round8OpsSpec extends SparkSpec {

  test("ot04 agrees with ot01: exception traces are exactly the error-bearing traces") {
    val ot04 = Events.spanEvents(spark, sfDir)
      .select("user_id", "trace_seq", "n_spans", "n_exceptions", "n_linked").collect()
    val errTraces = Events.traceSpans(spark, sfDir)
      .filter(col("n_errors") > 0)
      .select("user_id", "trace_seq", "n_spans", "n_errors").collect()
    assert(ot04.length == errTraces.length)
    val bySpanKey = errTraces.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("trace_seq")) -> r.getAs[Long]("n_spans")).toMap
    ot04.foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[Long]("trace_seq"))
      // the trace frame's span count must match ot01's for the same trace
      assert(bySpanKey(k) == r.getAs[Long]("n_spans"))
      // a span links at most its predecessor: linked exceptions never
      // exceed exception events
      assert(r.getAs[Long]("n_linked") <= r.getAs[Long]("n_exceptions"))
    }
    // n_exceptions totals the trace's error spans exactly
    val totalExc = ot04.map(_.getAs[Long]("n_exceptions")).sum
    val totalErr = errTraces.map(_.getAs[Long]("n_errors")).sum
    assert(totalExc == totalErr)
  }
}
