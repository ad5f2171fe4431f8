package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the curation/monitoring batch (rag03, dq04, smp04, ev25)
  * on the sf0.001 tables — invariant checks; value-level equivalence
  * is the DuckDB oracle gate's job.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rag03 MMR: 3 distinct picks per query, rank-1 is the relevance argmax, diversity never raises a score") {
    val out = Rag.mmrRetrieval(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("mmr_rank")).sorted.toSeq == Seq(1, 2, 3))
      assert(rs.map(_.getAs[Long]("neighbor_id")).distinct.length == 3)
      val byRank = rs.map(r => r.getAs[Int]("mmr_rank") -> r).toMap
      // rank 1 carries no penalty: score = λ·cos exactly
      assert(math.abs(byRank(1).getAs[Double]("mmr_score") -
        BigDecimal(0.7 * byRank(1).getAs[Double]("cos")).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      // later picks shift by the (bounded) diversity term: |score − λ·cos| ≤ (1−λ)·1
      Seq(2, 3).foreach { k =>
        assert(math.abs(byRank(k).getAs[Double]("mmr_score") -
          0.7 * byRank(k).getAs[Double]("cos")) <= 0.3 + 1e-9)
      }
    }
  }

  test("rag03 MMR: rank-2 pick maximizes the penalized score among remaining candidates") {
    val e = Tables.embeddings(spark, sfDir)
    val hits = Similarity.knnBruteOn(e, col("vec_id") % 100 === 0, 10)
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .collect().groupBy(_.getAs[Long]("query_id"))
    val out = Rag.mmrRetrieval(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    out.foreach { case (qid, rs) =>
      val byRank = rs.map(r => r.getAs[Int]("mmr_rank") -> r).toMap
      val cands = hits(qid)
      val sel1 = byRank(1).getAs[Long]("neighbor_id")
      val emb = cands.map(c => c.getAs[Long]("neighbor_id") ->
        c.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
      def cosine(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      def rd(x: Double, sc: Int): Double = BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
      val best2 = cands.filter(_.getAs[Long]("neighbor_id") != sel1).map { c =>
        val nid = c.getAs[Long]("neighbor_id")
        val sim = rd(cosine(emb(nid), emb(sel1)), 6)
        (rd(0.7 * c.getAs[Double]("cos") - 0.3 * sim, 4), nid)
      }.maxBy { case (score, nid) => (score, -nid) }
      assert(byRank(2).getAs[Long]("neighbor_id") == best2._2)
    }
  }

  test("dq04 PSI: zero drift against itself, symmetric-ish sign structure, psi non-negative") {
    val out = DataQuality.distributionDrift(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // PSI is a sum of (p−q)ln(p/q) terms, each ≥ 0
      assert(r.getAs[Double]("psi") >= 0.0)
      assert(r.getAs[Long]("n_bins") >= 1L)
      assert((r.getAs[Int]("drifted") == 1) == (r.getAs[Double]("psi") > 0.2))
    }
  }

  test("smp04 cluster balance: per-cluster cap enforced, rare clusters fully kept, deterministic across runs") {
    val out = Sampling.clusterBalanced(spark, sfDir).collect()
    val counts = Tables.embeddings(spark, sfDir).groupBy("label").count()
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Long]("count")).toMap
    val kept = out.groupBy(_.getAs[Int]("label")).view.mapValues(_.length.toLong).toMap
    assert(kept.nonEmpty)
    kept.foreach { case (lbl, n) => assert(n == math.min(10L, counts(lbl))) }
    val again = Sampling.clusterBalanced(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("samp_rank"))).toSet
    assert(again == out.map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("samp_rank"))).toSet)
  }

  test("rag04 token chunks: stride arithmetic, overlap, and full coverage up to the cap") {
    val out = Rag.tokenChunks(spark, sfDir).collect()
    assert(out.nonEmpty)
    val toks = Tables.documents(spark, sfDir).filter(col("doc_id") < 100)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("t")).toMap
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val chunks = rs.sortBy(_.getAs[Int]("chunk_idx"))
      val t = toks(id)
      chunks.foreach { c =>
        val start = c.getAs[Int]("start_token")
        val words = c.getAs[String]("chunk_text").split(" ").toSeq
        assert(words == t.slice(start, start + 64), s"doc $id chunk at $start")
        assert(c.getAs[Int]("n_chunk_tokens") == words.length)
      }
      // chunks overlap by window − stride while both are full
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("start_token") - a.getAs[Int]("start_token") == 48)
        case _ =>
      }
      // uncapped docs are fully covered: last chunk reaches the end
      if (chunks.length < 8) {
        val last = chunks.last
        assert(last.getAs[Int]("start_token") + last.getAs[Int]("n_chunk_tokens") == t.length)
      }
    }
  }

  test("ev25 CUSUM: matches the direct max(0, S+d) recursion on the daily series") {
    val out = Events.cusumDrift(spark, sfDir).collect().sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(out.nonEmpty)
    // the operator runs the recursion over 1e-6-quantized daily rates
    // (exact integer pipeline) — mirror that quantization here, and
    // allow the final scale-0 output round (≤ 0.5e-6)
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(graft.functions.Numeric.microUnits(
        count(when(col("event_type") === "error", 1)), count(lit(1)), 6).as("rate_u"))
      .collect().sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
      .map(_.getAs[Long]("rate_u") / 1e6)
    val mu = daily.sum / daily.length
    var sRun = 0.0
    daily.zip(out).foreach { case (x, row) =>
      sRun = math.max(0.0, sRun + (x - mu - 0.002))
      assert(math.abs(row.getAs[Double]("cusum") - sRun) < 6e-7)
      assert((row.getAs[Int]("alarm") == 1) == (row.getAs[Double]("cusum") > 0.01))
    }
  }
}
