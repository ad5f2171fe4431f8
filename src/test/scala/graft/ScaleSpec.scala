package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("ix01 materialized search index: query parity with inline operators, co-located joins") {
    import graft.operators.{SearchIndex, TextOps}
    SearchIndex.buildIndex(spark, Tables.documents(spark, sfDir), "ix", buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // BM25 over the index == tx18 over the raw corpus, score for score
      val fromIndex = SearchIndex.bm25Query(spark, "ix", Seq("merge", "join", "stream"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
      val inline = TextOps.bm25Search(spark, sfDir)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
      assert(fromIndex == inline, s"index=$fromIndex inline=$inline")
      // phrase hits over the index == tx31 over the raw corpus
      val phr = SearchIndex.phraseQuery(spark, "ix", "table", "scan")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_phrase_hits")).toMap
      val inlinePhr = TextOps.phraseSearch(spark, sfDir)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
      inlinePhr.foreach { case (d, n) => assert(phr.get(d).map(_.toLong).contains(n), s"doc $d") }
      if (inlinePhr.size < 20) assert(phr.keySet == inlinePhr.keySet)
      // the phrase join is bucket-co-located: force the SMJ path and
      // demand ZERO exchanges anywhere in the plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = SearchIndex.phraseQuery(spark, "ix", "table", "scan")
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.collect { case s: ShuffleExchangeExec => s }.isEmpty,
        s"expected shuffle-free bucketed phrase join:\n$plan")
      // BM25's only exchange is the single-row corpus-stats scalar
      val q2 = SearchIndex.bm25Query(spark, "ix", Seq("merge", "join", "stream"))
      q2.collect()
      val plan2 = q2.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val bigShuffles = plan2.collect {
        case s: ShuffleExchangeExec if s.outputPartitioning.numPartitions > 1 => s
      }
      assert(bigShuffles.isEmpty,
        s"expected only the scalar-stats exchange in bm25:\n$plan2")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("ix_postings", "ix_docstats", "ix_termstats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("z-order layout handles timestamp columns, empty frames, and all-null columns") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = (1 to 100).map(i =>
      (new java.sql.Timestamp(ts.getTime + i * 60000L), i.toDouble % 7))
      .toDF("t", "v")
    // timestamps band through their numeric image instead of throwing
    val out = Scale.zOrderedLayout(df, files = 2, "t", "v")
    assert(out.count() == 100 && out.columns.toSeq == Seq("t", "v"))
    // empty frame: no cut points -> single band, still writes
    assert(Scale.zOrderedLayout(df.filter(lit(false)), 2, "t", "v").count() == 0)
    // all-null column: same degenerate path
    val withNull = df.withColumn("v", lit(null).cast("double"))
    assert(Scale.zOrderedLayout(withNull, 2, "t", "v").count() == 100)
    // out-of-range bits and non-orderable types fail loudly, not silently
    intercept[IllegalArgumentException] { Scale.zOrderedLayout(df, 2, "t", "v", bits = 16) }
    intercept[IllegalArgumentException] {
      Scale.zOrderedLayout(df.withColumn("s", lit("x")), 2, "s", "v")
    }
  }

  test("salted join returns exactly the plain join result") {
    val left = (1 to 1000).map(i => (i % 7L, i)).toDF("k", "v")      // key 0..6, skewed-ish
    val right = (0 to 6).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = Scale.saltedJoin(left, right, "k", salts = 8)
    assert(salted.count() == plain.count())
    // exceptAll: except() deduplicates, which would hide a salting bug
    // that duplicates one matched row and drops another
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("compaction collapses a many-small-files layout, preserving rows") {
    val small = "/tmp/graft-compact-src"
    val dest = "/tmp/graft-compact-dst"
    val e = Tables.events(spark, sfDir)
    e.repartition(32).write.mode("overwrite").parquet(small) // streaming-ingest shape
    val src = spark.read.parquet(small)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(small) == 32)
    val total = src.count()
    Scale.compact(src, dest, rowsPerFile = total / 2 + 1) // expect ~2 files
    val out = spark.read.parquet(dest)
    assert(out.count() == total)
    val nOut = parquetFiles(dest)
    assert(nOut <= 3 && nOut >= 1, s"expected ~2 compacted files, got $nOut")
    // byte-identical content, not just counts
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
    // partitioned compaction keeps the directory layout (and with it,
    // planning-time pruning) instead of round-robin mixing days
    val destP = "/tmp/graft-compact-part"
    val byDay = src.withColumn("__day", date_format(col("ts"), "yyyy-MM-dd"))
    Scale.compact(byDay, destP, rowsPerFile = total, partitionCols = Seq("__day"))
    val dayDirs = new java.io.File(destP).listFiles().count(_.getName.startsWith("__day="))
    assert(dayDirs >= 2, s"expected day directories, got $dayDirs")
    assert(spark.read.parquet(destP).count() == total)
  }

  test("bloom pre-filter keeps every true match and the downstream join stays exact") {
    import graft.functions.BloomFunctions
    val orders = Tables.orders(spark, sfDir)
    val dim = Tables.customer(spark, sfDir).filter(col("c_custkey") % 10 === 0)
    val pre = BloomFunctions.bloomPreFilter(orders, "o_custkey", dim, "c_custkey", fpp = 0.01)
    val trueMatches = orders.join(dim, col("o_custkey") === col("c_custkey")).count()
    // superset of the semi-join…
    assert(pre.join(dim, col("o_custkey") === col("c_custkey")).count() == trueMatches)
    // …that actually prunes (90% of keys are absent; fpp 1%)
    val total = orders.count()
    val kept = pre.count()
    assert(kept < total / 2, s"kept $kept of $total — bloom pruned nothing")
    assert(kept >= trueMatches)
    // string keys go through the UTF8 binary path (different hash
    // input → different false positives, same guarantees)
    val dimS = dim.select(col("c_custkey").cast("string").as("k"))
    val preS = BloomFunctions.bloomPreFilter(
      orders.withColumn("ks", col("o_custkey").cast("string")), "ks", dimS, "k")
    assert(preS.join(dimS, col("ks") === col("k")).count() == trueMatches)
    assert(preS.count() < total / 2)
  }

  test("range-clustered writes yield disjoint per-file time ranges") {
    val dest = "/tmp/graft-range-clustered"
    val e = Tables.events(spark, sfDir).select("event_id", "ts")
    val total = e.count()
    Scale.writeRangeClustered(e, dest, files = 6, sortCols = Seq("ts"))
    val out = spark.read.parquet(dest)
    assert(out.count() == total)
    // each file must cover a narrow, non-overlapping ts interval —
    // that's what makes parquet min/max stats prune within a partition
    val files = new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 4, s"expected ~6 files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("ts").cast("long").as("lo"), max("ts").cast("long").as("hi")).head
      (r.getAs[Long]("lo"), r.getAs[Long]("hi"))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB, "file time ranges overlap")
      case _ =>
    }
  }

  test("day-partitioned writes prune partitions at planning time") {
    val path = "/tmp/graft-events-by-day"
    Scale.writePartitionedByDay(Tables.events(spark, sfDir), "ts", path)
    val pruned = spark.read.parquet(path).filter(col("__day") === "2024-01-05")
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("__day"),
      s"expected partition filter, got ${scan.metadata("PartitionFilters")}")
    // only the matching day's files are read
    assert(scan.selectedPartitions.partitionCount == 1)
    val expected = Tables.events(spark, sfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(pruned.count() == expected)
  }

  test("bucketed tables join without a shuffle exchange") {
    Scale.writeBucketed(Tables.orders(spark, sfDir), "b_orders", "o_orderkey", 4)
    Scale.writeBucketed(
      Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      joined.collect() // materialize to finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"expected bucketed join+agg with zero shuffles, got ${shuffles.size}:\n$plan")
      // sanity: same result as the unbucketed join
      val expected = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey").count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("AQE splits a skewed join partition at runtime — the non-salting skew path") {
    // Salting (saltedJoin) is the deliberate-plan remedy; AQE's
    // OptimizeSkewedJoin is the runtime one. This pins that with skew
    // detection thresholds scaled to test data, a hot-key join
    // actually gets its skewed partition SPLIT (isSkewJoin on the
    // SMJ) — the claim "AQE handles residual skew" is measured, not
    // assumed.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 50k rows on ONE hot key vs 5k spread over 100 keys, joined to
      // a 200-row build side (too big to broadcast at -1 threshold)
      val left = ((1 to 50000).map(i => (0L, s"payload-$i-${"x" * 32}")) ++
        (1 to 5000).map(i => ((i % 100).toLong + 1L, s"p-$i"))).toDF("k", "v")
      val right = (0 to 200).map(i => (i.toLong, s"dim-$i")).toDF("k", "d")
      val joined = left.join(right, "k")
      // finalize THIS dataframe's adaptive plan (a count() would
      // finalize a different query execution)
      assert(joined.collect().length == 55000)
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(all)) ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => all(q.plan)
          case _ => Seq.empty
        })
      val smjSkew = all(plan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.isSkewJoin
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.isSkewJoin
      }
      assert(smjSkew.contains(true),
        s"expected AQE to mark the join skew-optimized; plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
