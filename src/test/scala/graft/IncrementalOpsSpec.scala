package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators._

/** Specs for the incremental/observability operator batch (ev24, ot02,
  * es05, dd03, lt01, tx31) on the sf0.001 tables — invariant checks;
  * value-level equivalence is the DuckDB oracle gate's job.
  */
class IncrementalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ev24 gap islands: disjoint within a day, separated by more than the gap, errors conserved") {
    val islands = Events.gapIslands(spark, sfDir).collect()
    assert(islands.nonEmpty)
    val totalErrors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(islands.map(_.getAs[Long]("n_errors")).sum == totalErrors)
    islands.foreach { r =>
      assert(r.getAs[Long]("duration_s") ==
        r.getAs[java.sql.Timestamp]("end_ts").getTime / 1000 -
        r.getAs[java.sql.Timestamp]("start_ts").getTime / 1000)
    }
    islands.groupBy(_.getAs[java.sql.Timestamp]("day")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("start_ts").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // the next island must start strictly more than gapS after this one ends
          assert(b.getAs[java.sql.Timestamp]("start_ts").getTime / 1000 -
                 a.getAs[java.sql.Timestamp]("end_ts").getTime / 1000 > 600)
        case _ =>
      }
    }
  }

  test("ot02 service graph: edge count equals events minus session starts") {
    val edges = Events.serviceGraph(spark, sfDir).collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      val share = r.getAs[Double]("out_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_calls") >= 1L)
    }
    // each caller's outgoing shares partition its calls
    edges.groupBy(_.getAs[String]("src_service")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("out_share")).sum - 1.0) < 0.01)
    }
    // every event except each trace's first is the target of exactly one edge
    val totalEvents = Tables.events(spark, sfDir).count()
    val totalTraces = Events.sessionize(spark, sfDir)
      .agg(sum("n_sessions")).head.getLong(0)
    assert(edges.map(_.getAs[Long]("n_calls")).sum == totalEvents - totalTraces)
  }

  test("es05 scd2: exactly one current state per user, dwell non-negative, versions conserved") {
    val iv = Events.scd2Intervals(spark, sfDir).collect()
    assert(iv.nonEmpty)
    iv.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("is_current")).sum == 1)
    }
    iv.foreach { r =>
      val dwell = r.getAs[java.lang.Long]("closed_dwell_s")
      if (dwell != null) assert(dwell >= 0L)
      assert(r.getAs[Long]("n_versions") >= 1L)
    }
  }

  test("dd03 incremental dedup: bloom-prefiltered result matches a direct containment computation") {
    val out = Dedup.dd03(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.nonEmpty)
    // recompute containment exactly, no bloom, driver-side
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        array_distinct(TextFunctions.shingles(col("text"), 8)).as("sh"))
      .collect()
    val hist = sh.filter(_.getAs[Long]("doc_id") % 5 != 0)
      .flatMap(_.getAs[scala.collection.Seq[String]]("sh")).toSet
    val batch = sh.filter(_.getAs[Long]("doc_id") % 5 == 0)
    val expected = batch.groupBy(_.getAs[String]("source")).map { case (src, docs) =>
      val verdicts = docs.map { d =>
        val ss = d.getAs[scala.collection.Seq[String]]("sh")
        if (ss.isEmpty) 0.0 else ss.count(hist.contains).toDouble / ss.size
      }
      src -> (docs.length.toLong, verdicts.count(_ >= 0.5).toLong)
    }
    assert(out.keySet == expected.keySet.toSet)
    expected.foreach { case (src, (n, dropped)) =>
      assert(out(src).getAs[Long]("n_new") == n)
      assert(out(src).getAs[Long]("n_dropped") == dropped)
      assert(out(src).getAs[Long]("n_kept") == n - dropped)
    }
  }

  test("lt01 log templates: no digits survive masking, lines conserved") {
    val t = LogMining.logTemplates(spark, sfDir).collect()
    assert(t.nonEmpty)
    t.foreach { r => assert(!r.getAs[String]("template").exists(_.isDigit)) }
    assert(t.map(_.getAs[Long]("n_lines")).sum == Tables.events(spark, sfDir).count())
    t.foreach { r => assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_lines")) }
  }

  test("tx31 phrase search: hit counts equal adjacent-token occurrences in the returned docs") {
    val hits = TextOps.phraseSearch(spark, sfDir).collect()
    assert(hits.nonEmpty)
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    hits.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.split("\\s+")
      val n = toks.sliding(2).count { case Array(a, b) => a == "table" && b == "scan"; case _ => false }
      assert(r.getAs[Long]("n_hits") == n && n > 0)
    }
  }
}
