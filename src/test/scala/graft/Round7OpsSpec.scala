package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode
import graft.operators.{Graph, SearchIndex}

/** Round-7 operators: iterated label propagation (lp02) and the
  * search-index maintenance + filter-composed query pair (ix02).
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("lp02 convergence: planted two-community graph labels fully, multi-hop, unreachable stays null") {
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    // community A = clique{1,2,3} with a pendant path 3-9-10 (10 is two
    // hops past the clique); community B = clique{4..8} + path 8-11-12;
    // {20,21} is an edge with no seeded component anywhere near it
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(4L, 5L, 6L, 7L, 8L)) ++
      Seq((3L, 9L), (9L, 10L), (8L, 11L), (11L, 12L), (20L, 21L))).toDF("src", "dst")
    val seeds = Seq(1L -> 0, 2L -> 0, 4L -> 1, 5L -> 1).toDF("node", "label")
    val (labels, iters) = Graph.propagateToConvergence(edges, seeds, maxIters = 10)
    val got = labels.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(Seq(1L, 2L, 3L, 9L, 10L).forall(got(_) == 0), got.toString)
    assert(Seq(4L, 5L, 6L, 7L, 8L, 11L, 12L).forall(got(_) == 1), got.toString)
    assert(got(20L) == -1 && got(21L) == -1, "no labeled component can reach 20-21")
    // 10 and 12 are 3 hops from the nearest seed: three label-moving
    // rounds plus the no-change round that detects the fixpoint
    assert(iters == 4, s"iters=$iters")
  }

  test("lp02 seeds stay clamped even against a unanimous neighborhood") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L -> 0, 2L -> 1, 3L -> 1).toDF("node", "label")
    val (labels, _) = Graph.propagateToConvergence(edges, seeds, maxIters = 5)
    val got = labels.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1), got.toString)
  }

  test("mm03 recall harness: chunk-blocked candidates find exactly the brute-force pair set at hamming <= 3") {
    import graft.multimodal.BinaryMeta
    val rnd = new scala.util.Random(42)
    // 400 random 64-bit signatures + 100 planted near-dups at hamming 0..3
    // (the pigeonhole guarantee says the 4×16-bit blocking is EXACT there)
    val base = (0L until 400L).map(i => (i, rnd.nextLong()))
    val planted = (0 until 100).map { i =>
      val (_, sig) = base(rnd.nextInt(base.size))
      var s = sig
      (0 until rnd.nextInt(4)).foreach(_ => s = s ^ (1L << rnd.nextInt(64)))
      (400L + i, s)
    }
    val all = base ++ planted
    val sigs = all.toDF("media_id", "sig")
    val got = BinaryMeta.phashPairsFromSigs(sigs, maxHamming = 3)
      .select("media_a", "media_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      i <- all.indices
      j <- (i + 1) until all.size
      if java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) <= 3
    } yield (math.min(all(i)._1, all(j)._1), math.max(all(i)._1, all(j)._1))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.size >= 75, s"fixture too weak: only ${want.size} true pairs")
  }

  test("ix02: incremental refresh equals a full rebuild bit-exact, filtered queries prune without changing scores") {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(col("doc_id") < 400)
    // delta = 100 genuinely new docs + 50 re-indexed (modified) ones
    val delta = docs.filter(col("doc_id") >= 400)
      .unionByName(docs.filter(col("doc_id").between(350, 399))
        .withColumn("text", concat(col("text"), lit(" merge stream merge"))))
    val finalCorpus = docs.filter(col("doc_id") < 350).unionByName(delta)
    val q = Seq("merge", "join", "stream")
    try {
      SearchIndex.buildIndex(spark, base, "ixu", buckets = 4)
      SearchIndex.updateIndex(spark, delta, "ixu", buckets = 4)
      SearchIndex.buildIndex(spark, finalCorpus, "ixf", buckets = 4)
      // the refreshed index IS the rebuilt index, positions included
      for (t <- Seq("postings", "docstats", "termstats")) {
        val a = spark.table(s"ixu_$t")
        val b = spark.table(s"ixf_$t")
        assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
          s"ixu_$t diverged from the rebuilt ixf_$t")
      }
      // query parity end-to-end (ranking, not just storage)
      val fromUpd = SearchIndex.bm25Query(spark, "ixu", q)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toSeq
      val fromFull = SearchIndex.bm25Query(spark, "ixf", q)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toSeq
      assert(fromUpd == fromFull)
      // filter-composed query: candidates prune, scores are invariant
      // (index-wide stats — a doc scores the same with and without the
      // filter, exactly how an engine ranks a filtered query)
      val filt = col("lang") === "en" && col("n_chars").between(100, 400)
      val filtered = SearchIndex.bm25QueryFiltered(spark, "ixu", q, filt, k = 1000)
      val filteredMap = filtered.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
      val unfilteredMap = SearchIndex.bm25Query(spark, "ixu", q, k = 1000)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
      val allowed = spark.table("ixu_docstats").filter(filt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(filteredMap.keySet == unfilteredMap.keySet.intersect(allowed),
        "filtered result set must be exactly the filter-passing scorers")
      filteredMap.foreach { case (d, s) =>
        assert(unfilteredMap(d) == s, s"doc $d rescored under filter: $s vs ${unfilteredMap(d)}")
      }
      // the attribute predicate reaches the docstats parquet scan
      val f = filtered.queryExecution.explainString(FormattedMode)
      assert(f.contains("EqualTo(lang,en)") &&
        f.contains("GreaterThanOrEqual(n_chars,100)") && f.contains("LessThanOrEqual(n_chars,400)"),
        f.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
    } finally {
      Seq("ixu", "ixf").foreach { p =>
        Seq("postings", "docstats", "termstats").foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS ${p}_$t")
          spark.sql(s"DROP TABLE IF EXISTS ${p}_${t}_stage")
          spark.sql(s"DROP TABLE IF EXISTS ${p}_${t}_old")
        }
      }
    }
  }
}
