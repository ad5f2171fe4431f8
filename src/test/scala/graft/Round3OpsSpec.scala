package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators._

/** Round-3 operator specs on the sf0.001 tables — shape/invariant
  * checks (value-level equivalence is the DuckDB oracle gate's job).
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  test("q22 market share: shares in [0,1] and nation revenue bounded by total") {
    val r = Relational.marketShare(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val share = row.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(row.getAs[Double]("nation_revenue") <= row.getAs[Double]("total_revenue"))
    }
  }

  test("q23 set ops partition the union of both segments") {
    val r = Relational.segmentSetOps(spark, sfDir).collect()
      .map(row => row.getAs[String]("segment") -> row.getAs[Long]("n_customers")).toMap
    val hb = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 5000)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val bs = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000)
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(r.getOrElse("high_balance_and_big_spender", 0L) == (hb & bs).size)
    assert(r.getOrElse("high_balance_only", 0L) == (hb -- bs).size)
    assert(r.getOrElse("big_spender_only", 0L) == (bs -- hb).size)
  }

  test("q24 pivot matches the conditional-aggregation formulation") {
    val piv = Relational.priorityStatusPivot(spark, sfDir).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    val cond = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(round(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))), 2).as("rev_f"))
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r.getAs[java.lang.Double]("rev_f")).toMap
    assert(piv.nonEmpty && piv.keySet == cond.keySet)
    piv.foreach { case (k, row) => assert(row.getAs[java.lang.Double]("rev_f") == cond(k)) }
  }

  test("ev21 SLO burn: alert only when BOTH windows burn >= 2x budget") {
    val r = Events.sloBurn(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_errors") <= row.getAs[Long]("n_total"))
      val alert = row.getAs[Int]("alert")
      val both = row.getAs[Double]("burn_1h") >= 2 && row.getAs[Double]("burn_6h") >= 2
      assert((alert == 1) == both)
    }
  }

  test("tx23 sequence packing: partitions the corpus, preserves tokens, seqs are contiguous doc ranges") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect()
    val r = TextOps.sequencePacking(spark, sfDir).collect().sortBy(_.getAs[Long]("seq_id"))
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs.length)
    assert(r.map(_.getAs[Long]("seq_tokens")).sum == docs.map(_.getAs[Long]("n")).sum)
    // seq ids start at 0; doc ranges are ordered and non-overlapping
    assert(r.head.getAs[Long]("seq_id") == 0L)
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("seq_id") < b.getAs[Long]("seq_id"))
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // the first doc of seq i+1 starts at the cumulative offset after
    // seq i, and lands in i+1 only if that offset has crossed the
    // budget boundary — so cum tokens through seq i >= (i+1)*budget
    val budget = 2048L
    r.dropRight(1).zipWithIndex.foreach { case (_, i) =>
      val endOfSeq = r.take(i + 1).map(_.getAs[Long]("seq_tokens")).sum
      assert(endOfSeq >= budget * (i + 1), s"seq $i ended before the budget boundary")
    }
  }

  test("tx23 packing at tiny budget: more sequences, same totals") {
    val coarse = TextOps.sequencePacking(spark, sfDir, budget = 4096).collect()
    val fine = TextOps.sequencePacking(spark, sfDir, budget = 256).collect()
    assert(fine.length > coarse.length)
    assert(fine.map(_.getAs[Long]("seq_tokens")).sum == coarse.map(_.getAs[Long]("seq_tokens")).sum)
  }

  test("tx25 unigram log-likelihood: negative scores, repeated-token docs score higher than rare-token docs") {
    val r = TextOps.unigramLogLik(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_tokens") > 0)
      assert(row.getAs[Double]("avg_log2_lik") < 0.0)
    }
    // every doc with at least one token is scored
    val nDocs = Tables.documents(spark, sfDir)
      .filter(TextFunctions.tokenCount(col("text")) > 0).count()
    assert(r.length == nDocs)
  }

  test("smp01 stratified sample: deterministic, subset, respects per-stratum thresholds") {
    val a = Sampling.smp01(spark, sfDir).collect()
    val b = Sampling.smp01(spark, sfDir).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.nonEmpty)
    val rates = Map("en" -> 200L, "es" -> 500L, "de" -> 800L).withDefaultValue(100L)
    a.foreach { row =>
      assert(row.getAs[Long]("bucket") < rates(row.getAs[String]("lang")))
    }
    // sampling rate lands near the configured per-mille on the dominant stratum
    val total = Tables.documents(spark, sfDir).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val sampled = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong)
    sampled.foreach { case (lang, n) =>
      assert(n <= total(lang))
    }
  }

  test("hashBucket is uniform-ish and stable across invocations") {
    val df = spark.range(0, 2000).select(Sampling.hashBucket(col("id")).as("b"))
    val buckets = df.collect().map(_.getAs[Long]("b"))
    assert(buckets.forall(b => b >= 0 && b < 1000))
    // ~2 rows/bucket expected; a max of 10+ would mean broken mixing
    val maxLoad = buckets.groupBy(identity).values.map(_.size).max
    assert(maxLoad <= 10, s"max bucket load $maxLoad")
  }

  test("scrubPii redacts emails, urls, and digit runs; leaves clean text alone") {
    val got = Seq(
      "contact bob@example.com or https://alt.example/feed?id=99 ref 12345 x7",
      "no pii here")
      .toDF("t").select(TextFunctions.scrubPii(col("t"))).as[String].collect()
    assert(got(0) == "contact <EMAIL> or <URL> ref <NUM> x7", got(0))
    assert(got(1) == "no pii here")
  }

  test("connectedComponents resolves transitive chains and keeps components apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L), got.toString)
  }

  test("dd01 dup clusters: reps are cluster minima, members cover exactly the paired docs") {
    val pairs = operators.TextOps.tokenJaccard(spark, sfDir).select("doc_a", "doc_b").collect()
    val nodes = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val r = Dedup.dd01(spark, sfDir).collect()
    assert(r.map(_.getAs[Long]("n_members")).sum == nodes.size)
    r.foreach(row => assert(row.getAs[Long]("n_members") >= 2))
    assert(r.map(_.getAs[Long]("cluster_rep")).toSet.subsetOf(nodes))
  }

  test("cosineSim reads int8 arrays natively and quantized cosine tracks the float cosine") {
    val df = Seq(
      (Seq(3.toByte, 4.toByte), Seq(3.toByte, 4.toByte)),
      (Seq(1.toByte, 0.toByte), Seq(0.toByte, 1.toByte)),
      (Seq(127.toByte, -127.toByte), Seq(127.toByte, -127.toByte)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosineSim(col("a"), col("b")).as("cos"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("sim07 quantized knn: recall@5 vs the float baseline stays high") {
    val exact = Similarity.knnBrute(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val quant = Similarity.quantizedKnn(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(quant.keySet == exact.keySet)
    val recalls = exact.map { case (q, nbrs) => (quant(q) & nbrs).size.toDouble / nbrs.size }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9, s"mean recall@5 $meanRecall")
    // quantized scores sit within rounding noise of the float scores
    val floatCos = Similarity.knnBrute(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cos")).toMap
    Similarity.quantizedKnn(spark, sfDir).collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      floatCos.get(key).foreach { fc =>
        assert(math.abs(fc - r.getAs[Double]("cos")) < 0.02, s"$key drifted")
      }
    }
  }

  test("quantize8 survives an all-zero embedding (ANSI NaN-cast regression)") {
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, -2.0f))).toDF("vec_id", "embedding")
    val q = Similarity.quantize8(df).orderBy("vec_id").select("q_emb").collect()
    assert(q(0).getSeq[Byte](0) == Seq(0.toByte, 0.toByte))
    assert(q(1).getSeq[Byte](0) == Seq(64.toByte, -127.toByte))
  }

  test("connectedComponents on an empty pair list terminates immediately and empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val t0 = System.nanoTime()
    assert(Dedup.connectedComponents(empty, "a", "b").collect().isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 60, "empty graph should not iterate to maxIter")
  }

  test("sim08 PQ candidates: exact top-k survives into the candidate set, codes are deterministic") {
    val exact = Similarity.knnBrute(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val pq = Similarity.pqCandidates(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(pq.keySet == exact.keySet)
    // candidate-recall: the 50 PQ candidates carry most of the exact top-5
    val recalls = exact.map { case (q, top) => (pq(q) & top).size.toDouble / top.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"candidate recall@50 $mean")
    // determinism: a second run yields identical candidates
    val pq2 = Similarity.pqCandidates(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(pq2 == pq.toMap)
  }

  test("quantize8 emits int8 in [-127,127] with the max element at full scale") {
    val q = Similarity.quantize8(Tables.embeddings(spark, sfDir)).select("q_emb").collect()
    q.foreach { row =>
      val arr = row.getSeq[Byte](0)
      assert(arr.forall(b => b >= -127 && b <= 127))
      assert(arr.exists(b => b == 127 || b == -127))
    }
  }

  test("tx26 decontamination flags exactly the train docs sharing an n-gram with the eval set") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),   // eval
      (1L, "intro words then the quick brown fox jumps over the lazy dog and more"), // contaminated
      (2L, "completely different text with no overlap at all here friend"),          // clean
      (3L, "the quick brown fox jumps over a sleepy dog today"))   // 7-gram overlap only → clean at n=8
      .toDF("doc_id", "text")
    val got = operators.TextOps.decontaminationOn(docs, col("doc_id") === 0, n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_shingles")).toMap
    assert(got.keySet == Set(1L), got.toString)
    assert(got(1L) >= 1)
  }

  test("tx26 over the corpus: flagged docs are train-side with positive overlap") {
    val r = operators.TextOps.decontamination(spark, sfDir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("doc_id") % 100 != 0)
      assert(row.getAs[Long]("n_shared_shingles") >= 1)
    }
  }

  test("tx27 repetition filter: templated text flagged, varied text passes") {
    val docs = Seq(
      (1L, "buy now click here buy now click here buy now click here buy now click here"),
      (2L, "each word in this sentence appears exactly once without any repeats whatsoever"))
      .toDF("doc_id", "text")
    val got = operators.TextOps.repetitionFilterOn(docs, n = 3, maxDupRatio = 0.2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("flagged")).toMap
    assert(got == Map(1L -> 1, 2L -> 0), got.toString)
  }

  test("smp02 mixture weights: scarcest source keeps everything, weighted shares flatten") {
    val r = Sampling.mixtureWeights(spark, sfDir).collect()
    assert(r.length >= 2)
    assert(r.forall(row => row.getAs[Double]("accept_rate") > 0 && row.getAs[Double]("accept_rate") <= 1.0))
    assert(r.exists(row => row.getAs[Double]("accept_rate") == 1.0))
    // after weighting, every source contributes ~the same token mass
    val weighted = r.map(row => row.getAs[Long]("tokens") * row.getAs[Double]("accept_rate"))
    val mean = weighted.sum / weighted.length
    weighted.foreach(wt => assert(math.abs(wt - mean) / mean < 0.01, s"$wt vs $mean"))
  }

  test("asof02 tolerance: matches within the hour survive, stale ones go null, base rows unchanged") {
    val base = AsOf.purchaseAfterView(spark, sfDir).collect()
      .map(r => r.getAs[Long]("purchase_id") -> r).toMap
    val tol = AsOf.purchaseAfterRecentView(spark, sfDir).collect()
    assert(tol.length == base.size)
    tol.foreach { r =>
      val b = base(r.getAs[Long]("purchase_id"))
      val vid = r.getAs[java.lang.Long]("view_id")
      if (vid != null) {
        assert(vid == b.getAs[java.lang.Long]("view_id"))
        val gap = r.getAs[java.sql.Timestamp]("purchase_ts").getTime / 1000 -
                  r.getAs[java.sql.Timestamp]("view_ts").getTime / 1000
        assert(gap >= 0 && gap <= 3600, s"gap $gap out of tolerance")
      } else if (b.getAs[java.lang.Long]("view_id") != null) {
        val gap = b.getAs[java.sql.Timestamp]("purchase_ts").getTime / 1000 -
                  b.getAs[java.sql.Timestamp]("view_ts").getTime / 1000
        assert(gap > 3600, "match nulled although within tolerance")
      }
    }
    assert(tol.exists(_.getAs[java.lang.Long]("view_id") != null))
  }

  test("dd02 dedup decision: kept + removed = corpus, removed = non-canonical members") {
    val labels = Dedup.connectedComponents(
      operators.TextOps.tokenJaccard(spark, sfDir).select("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect()
    val expectedRemoved = labels.count(r => r.getAs[Long]("node") != r.getAs[Long]("label"))
    val r = Dedup.dd02(spark, sfDir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") + row.getAs[Long]("n_removed") == row.getAs[Long]("n_docs"))
    }
    assert(r.map(_.getAs[Long]("n_removed")).sum == expectedRemoved)
    val corpus = Tables.documents(spark, sfDir).filter(col("doc_id") < 1000).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == corpus)
  }

  test("tx28 sentence dedup keeps first occurrences only, across and within docs") {
    val docs = Seq(
      (1L, "Alpha beta gamma. Shared sentence here. Alpha beta gamma."),
      (2L, "Shared sentence here. Unique to two."))
      .toDF("doc_id", "text")
    val r = operators.TextOps.sentenceDedupOn(docs).collect()
      .map(row => row.getAs[Long]("doc_id") ->
        (row.getAs[Long]("n_sentences"), row.getAs[Long]("n_kept"), row.getAs[Long]("n_dropped"))).toMap
    // doc 1: 3 sentences, its own repeat dropped; doc 2: shared one dropped
    assert(r(1L) == ((3L, 2L, 1L)), r.toString)
    assert(r(2L) == ((2L, 1L, 1L)), r.toString)
  }

  test("ev23 exponential buckets: values sit inside their power-of-two bin") {
    val r = operators.Events.latencyBuckets(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val b = row.getAs[Long]("bucket")
      assert(row.getAs[Double]("bucket_min") >= math.pow(2, b) - 0.01)
      assert(row.getAs[Double]("bucket_max") < math.pow(2, b + 1) + 0.01)
    }
  }

  test("ml02 distilled classifier reproduces the rule gate on held-out docs") {
    val r = MLClassifier.ml02(spark, sfDir).head()
    assert(r.getAs[Long]("n_scored") > 0)
    assert(r.getAs[Double]("accuracy") >= 0.9, s"accuracy ${r.getAs[Double]("accuracy")}")
  }

  test("km03 dbscan recovers planted dense clusters and drops isolated noise") {
    val rnd = new scala.util.Random(13)
    val planted = for (c <- 0 until 3; i <- 0 until 20) yield {
      val v = Array.tabulate(8)(j => (if (j == c) 1.0f else 0.0f) + rnd.nextFloat() * 0.1f)
      (c * 100L + i, v)
    }
    // isolated noise points: alternating-sign vectors nowhere near the axes
    val noise = for (i <- 0 until 3) yield
      (900L + i, Array.tabulate(8)(j => (if (j % 2 == 0) 1.0f else -1.0f) * (1.0f + i)))
    val e = (planted ++ noise).toDF("vec_id", "embedding")
    val labelsDf = Density.dbscan(e, eps = 0.9, minPts = 3)
    val got = labelsDf.collect()
    labelsDf.unpersist()
    val byCluster = got.groupBy(_.getAs[Long]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id") / 100).toSet).toMap
    // three clusters, each pure in one planted axis, no noise ids
    assert(byCluster.size == 3, s"expected 3 clusters, got ${byCluster.keySet}")
    assert(byCluster.values.forall(_.size == 1), "a cluster mixes planted axes")
    assert(!got.exists(_.getAs[Long]("vec_id") >= 900L), "noise was clustered")
    assert(got.count(_.getAs[Long]("vec_id") < 300L) == 60, "planted points went missing")
  }

  test("weightedPagerank: star center outranks leaves, symmetric graph conserves mass") {
    // undirected star: center 0 — leaves 1..5, symmetrized, unit weights
    val pe = (1L to 5L).map(l => (0L, l, 1L))
    val edges = (pe ++ pe.map { case (a, b, w) => (b, a, w) }).toDF("src", "dst", "w")
    val ranks = Graph.weightedPagerank(edges, damping = 0.85, iters = 3)
    val byNode = ranks.collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    ranks.unpersist()
    assert(byNode.size == 6)
    val leaves = (1L to 5L).map(byNode)
    assert(leaves.forall(l => byNode(0L) > l), s"center must outrank leaves: $byNode")
    assert(leaves.distinct.size == 1, "symmetric leaves must tie")
    // symmetrized graph has no dangling nodes: Σr = 1 each iteration
    assert(math.abs(byNode.values.sum - 1.0) < 1e-9)
  }

  test("tx30 textrank: topK rows, ranks positive and descending") {
    val r = operators.TextOps.textrankKeywords(spark, sfDir).collect()
    assert(r.nonEmpty && r.length <= 20)
    val ranks = r.map(_.getAs[Double]("rank")).toSeq
    assert(ranks.forall(_ > 0.0))
    assert(ranks == ranks.sorted.reverse, "rows must come out rank-descending")
    assert(r.map(_.getAs[String]("term")).distinct.length == r.length)
  }

  test("tx29 topic coherence: NPMI stays in [-1,1], pair counts match topK choose 2") {
    val r = operators.TextOps.topicCoherence(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_pairs") <= 10) // C(5,2)
      val c = row.getAs[Double]("coherence")
      assert(c >= -1.0001 && c <= 1.0001, s"coherence $c out of NPMI range")
    }
  }

  test("smp03 weighted sample: k rows, valid scores, sample biased toward heavy docs") {
    val r = Sampling.weightedSample(spark, sfDir).collect()
    assert(r.length == 50)
    assert(r.map(_.getAs[Long]("doc_id")).distinct.length == 50)
    assert(r.forall(_.getAs[Double]("skey") <= 0.0), "ln(u)/w must be non-positive")
    val sampleMean = r.map(_.getAs[Long]("n_chars")).sum.toDouble / r.length
    val corpusMean = Tables.documents(spark, sfDir).filter(col("n_chars") > 0)
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"n_chars-weighted sample must skew heavy: sample $sampleMean vs corpus $corpusMean")
  }

  test("dq03 join-key skew: internally consistent profile") {
    val r = DataQuality.joinKeySkew(spark, sfDir).head()
    val nRows = Tables.lineitem(spark, sfDir).count()
    assert(r.getAs[Long]("n_rows") == nRows)
    assert(r.getAs[Long]("max_rows") >= r.getAs[Double]("avg_rows").ceil.toLong - 1)
    assert(r.getAs[Double]("skew_factor") >= 1.0)
    val ts = r.getAs[Double]("top_share")
    assert(ts > 0.0 && ts <= 1.0)
    assert(r.getAs[Double]("p99_rows") <= r.getAs[Long]("max_rows").toDouble)
  }

  test("dq02 volume anomalies: early days unflagged (no baseline), flags only sub-half days") {
    val r = DataQuality.volumeAnomalies(spark, sfDir).collect().sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
    assert(r.nonEmpty)
    assert(r.head.getAs[Int]("flagged") == 0, "first day has no trailing baseline")
    r.foreach { row =>
      val ratio = row.getAs[java.lang.Double]("ratio")
      val flagged = row.getAs[Int]("flagged")
      if (ratio == null) assert(flagged == 0)
      else assert((flagged == 1) == (ratio < 0.5))
    }
  }

  test("ev22 heavy hitters: exact when capacity covers the key space") {
    import graft.functions.SpaceSavingAgg.spaceSavingTopK
    val exact = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .groupBy("event_type", "user_id").count()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("count").desc, col("user_id").cast("string").asc)))
      .filter(col("rank") <= 10)
      .select(col("event_type"), col("rank"), col("user_id").cast("string").as("user_id"),
              col("count").as("est_events"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getString(2), r.getLong(3))).toMap
    val got = operators.Events.heavyHitters(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("max_overcount") == 0L, "capacity covers keys — err must be 0")
      val key = (r.getAs[String]("event_type"), r.getAs[Int]("rank"))
      assert(exact(key) == (r.getAs[String]("user_id"), r.getAs[Long]("est_events")), s"$key")
    }
  }

  test("space saving under pressure: finds the heavy hitter, bounds hold, merge-stable") {
    import graft.functions.SpaceSavingAgg.spaceSavingTopK
    // zipf-ish stream: item "hot" appears 500 times, 100 rare items 1-2 times
    val rows = Seq.fill(500)("hot") ++ (1 to 100).flatMap(i => Seq.fill(1 + i % 2)(s"rare$i"))
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 16)) {
      val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("item").repartition(parts)
      val hh = df.agg(spaceSavingTopK(col("item"), 3, 8).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("est"), col("e.err").as("err"))
        .collect()
      assert(hh.head.getAs[String]("item") == "hot", s"parts=$parts: missed the heavy hitter")
      hh.foreach { r =>
        val t = trueCounts(r.getAs[String]("item"))
        assert(r.getAs[Long]("est") >= t, s"underestimate at parts=$parts")
        assert(r.getAs[Long]("est") - r.getAs[Long]("err") <= t, s"bound broken at parts=$parts")
      }
    }
  }

  test("tx24 pii scrub audit: scrubbed samples carry no digit runs, totals add up") {
    val r = TextOps.piiScrub(spark, sfDir).collect()
    assert(r.nonEmpty)
    val totalRows = Tables.events(spark, sfDir).count()
    assert(r.map(_.getAs[Long]("n_rows")).sum == totalRows)
    r.foreach { row =>
      assert(row.getAs[Long]("n_clean_rows") <= row.getAs[Long]("n_rows"))
      val sample = row.getAs[String]("sample_scrubbed")
      if (sample != null) assert(!sample.matches(".*\\d{2,}.*"), sample)
    }
  }
}
