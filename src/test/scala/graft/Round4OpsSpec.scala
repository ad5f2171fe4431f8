package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-4 operator specs: tx30's linear sliding-window co-occurrence
  * edge build (replacing the per-document all-pairs join).
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  private def planNodes(df: org.apache.spark.sql.DataFrame) = {
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(all)) ++ p.subqueries.flatMap(all)
    all(df.queryExecution.executedPlan)
  }

  test("window co-occurrence: exact doc-frequency weights on planted token sequences") {
    // doc1: a b c a (window 2 reaches ab, ac, bc, ba, ca — one doc-vote
    // each for {ab, ac, bc}); doc2: a b x → {ab, ax, bx}. d is at the
    // far end of doc1 only with window 2 from c — NOT reachable from a.
    val toks = Seq(
      (1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c"), (1L, 3, "a"),
      (2L, 0, "a"), (2L, 1, "b"), (2L, 2, "x"))
      .toDF("doc_id", "pos", "term")
    val got = TextOps.windowCooccurrenceEdges(toks, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 1L,
      ("a", "x") -> 1L, ("b", "x") -> 1L))
    // window 3 reaches pos0->pos3 in doc1: 'a'-'a' is a self-loop and
    // must NOT appear; 'a b' still counts doc1 ONCE despite both a's
    val w3 = TextOps.windowCooccurrenceEdges(toks, window = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(!w3.contains(("a", "a")) && w3(("a", "b")) == 2L && w3(("a", "c")) == 1L)
  }

  test("tx30 edge build is an equi-join — no nested-loop or cartesian pair generation") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.tokens(col("text"))).as(Seq("pos", "term")))
      .filter(length(col("term")) >= 3)
    val nodes = planNodes(TextOps.windowCooccurrenceEdges(toks, 10))
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]),
      "nested-loop join in window co-occurrence")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      "cartesian product in window co-occurrence")
  }

  test("es06 as-of replay: every state is frozen at T, and equals es01 on the truncated log") {
    val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val asOf = Events.stateAsOf(spark, sfDir).collect()
    assert(asOf.nonEmpty)
    asOf.foreach(r => assert(!r.getAs[java.sql.Timestamp]("last_ts").after(cut)))
    // replaying a pre-truncated log through the full projector must
    // give the identical read model (the backfill-equivalence contract)
    val truncated = Events.latestStateProjection(spark, sfDir)
      .filter(col("last_ts") <= lit("2024-01-15").cast("timestamp"))
    // es01 rows whose LATEST event is ≤ T are exactly the as-of states
    // of users with no post-T activity — they must agree row-for-row
    val agree = truncated.join(
      Events.stateAsOf(spark, sfDir).withColumnRenamed("last_event_type", "t2")
        .withColumnRenamed("last_value", "v2").withColumnRenamed("last_ts", "ts2"),
      "user_id")
    agree.collect().foreach { r =>
      assert(r.getAs[String]("last_event_type") == r.getAs[String]("t2"))
      assert(r.getAs[java.sql.Timestamp]("last_ts") == r.getAs[java.sql.Timestamp]("ts2"))
    }
    // and users WITH post-T activity still appear, with an older state
    val es01Users = Events.latestStateProjection(spark, sfDir).count()
    assert(asOf.length <= es01Users)
  }

  test("tx37 fuzzy search: a typo'd query still finds docs containing the intended token") {
    val out = TextOps.fuzzySearch(spark, sfDir, queries = Seq("sparc"), k = 10).collect()
    assert(out.nonEmpty, "typo'd query found nothing")
    // every doc the typo'd probe ranks must actually contain 'spark'
    // as its best fuzzy hit at this corpus (sim('sparc','spark')=0.5)
    val sparkDocs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .filter(array_contains(col("toks"), "spark"))
      .select("doc_id").as[Long].collect().toSet
    val top = out.filter(_.getAs[Double]("sim") >= 0.5).map(_.getAs[Long]("doc_id"))
    assert(top.nonEmpty && top.forall(sparkDocs.contains),
      s"docs ranked at sim>=0.5 must contain 'spark': ${top.toSeq}")
    // exact-match control: querying the true token ranks it at sim 1.0
    val exact = TextOps.fuzzySearch(spark, sfDir, queries = Seq("spark"), k = 5).collect()
    assert(exact.forall(_.getAs[Double]("sim") == 1.0))
  }

  test("sentences: CJK terminators split without whitespace, quote-closers glue, runs split once") {
    def seg(t: String): Seq[String] =
      Seq(t).toDF("text")
        .select(graft.functions.TextFunctions.sentences(col("text")).as("s"))
        .collect().head.getSeq[String](0)
    // Japanese: no whitespace after 。！ — must still split
    assert(seg("これは一文です。これは二文目です！最後の文。") ==
      Seq("これは一文です。", "これは二文目です！", "最後の文。"))
    // closing quote glues to its sentence (the UAX#29 break is AFTER 」)
    assert(seg("「引用です。」と言った。") == Seq("「引用です。」", "と言った。"))
    // a terminator run splits once at its end, never inside
    assert(seg("すごい！！本当？はい。") == Seq("すごい！！", "本当？", "はい。"))
    // ASCII behavior unchanged
    assert(seg("First one. Second two! Third?") ==
      Seq("First one.", "Second two!", "Third?"))
  }

  test("tx28 on a Japanese corpus dedups at SENTENCE granularity, not whole-doc") {
    // two docs share one sentence out of two — sentence-level dedup
    // must drop exactly the shared one from the later doc
    val docs = Seq(
      (1L, "共通の文です。固有の文イチ。"),
      (2L, "共通の文です。固有の文ニ。"))
      .toDF("doc_id", "text")
    val out = TextOps.sentenceDedupOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    assert(out(1L) == ((2L, 2L, 0L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((2L, 1L, 1L)), s"doc2: ${out(2L)}")
  }

  test("km04 ladder: dense-inside-sparse nested clusters resolve across two rungs") {
    val rnd = new scala.util.Random(29)
    def around(dir: Array[Double], id: Long, n: Int): Seq[(Long, Array[Float])] =
      (0 until n).map { i =>
        (id + i, dir.map(x => (x + rnd.nextGaussian() * 0.02).toFloat).toArray)
      }
    // A1 and A2: two TIGHT subclusters ~0.8 cosine apart (one loose
    // cluster); B: a third cluster orthogonal to both; no noise needed
    val a1 = around(Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 100L, 10)
    val a2 = around(Array(0.8, 0.6, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0), 200L, 10)
    val b  = around(Array(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0), 300L, 10)
    val e = (a1 ++ a2 ++ b).toDF("vec_id", "embedding")
    val out = Density.densityLadder(e, ladder = Seq(0.7, 0.95), minPts = 3,
      exactPairs = true)
    val got = out.collect()
    out.unpersist()
    def clustersAt(eps: Double): Map[Long, Set[Long]] =
      got.filter(_.getAs[Double]("eps") == eps)
        .groupBy(_.getAs[Long]("cluster"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val loose = clustersAt(0.7)
    assert(loose.size == 2, s"loose rung: expected A1+A2 merged and B, got ${loose.keySet}")
    val aMerged = loose.values.find(_.contains(100L)).get
    assert((100L until 110L).forall(aMerged) && (200L until 210L).forall(aMerged),
      "loose rung must blur A1 and A2 into one cluster")
    val tight = clustersAt(0.95)
    assert(tight.size == 3, s"tight rung: expected A1, A2, B separate, got ${tight.keySet}")
    val a1Tight = tight.values.find(_.contains(100L)).get
    assert((100L until 110L).forall(a1Tight) && !a1Tight.exists(_ >= 200L),
      "tight rung must separate A1 from A2")
  }

  test("tx38 dictionary tokens: compounds collapse, longest match wins, per-char is the fallback") {
    val out = TextOps.dictTokensJa(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // segmentation beats per-char on every compound-bearing sentence
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id).getAs[Long]("n_dict_tokens") < out(id).getAs[Long]("n_char_tokens"),
        s"doc $id: dictionary must beat per-char")
    }
    val toks1 = out(1L).getAs[String]("tokens").split("\\|").toSeq
    // longest match: 東京都 (not 東京+都), 自然言語処理 (not 自然+言語+処理)
    assert(toks1.contains("東京都") && !toks1.contains("東京"))
    assert(toks1.contains("自然言語処理") && !toks1.contains("言語"))
    assert(toks1.contains("機械学習"))
    // uncovered hiragana falls back to per-char, ASCII words survive
    assert(toks1.contains("で") && toks1.contains("を"))
    val toks5 = out(5L).getAs[String]("tokens").split("\\|").toSeq
    assert(toks5.contains("spark") && toks5.contains("日本語") && toks5.contains("テキスト"))
  }

  test("graft SQL functions raise a clean arity error, not IndexOutOfBounds") {
    graft.functions.VectorFunctions.register(spark)
    def rootMessages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
    val tooFew = intercept[Throwable] { spark.sql("SELECT graft_top_by(1)").collect() }
    assert(rootMessages(tooFew).exists(_.contains("graft_top_by expects")), s"got: $tooFew")
    assert(!Iterator.iterate(tooFew)(_.getCause).takeWhile(_ != null)
      .exists(_.isInstanceOf[IndexOutOfBoundsException]))
    val cosine = intercept[Throwable] { spark.sql("SELECT graft_cosine(array(1.0))").collect() }
    assert(rootMessages(cosine).exists(_.contains("graft_cosine expects")), s"got: $cosine")
  }

  test("tx30 window convention keeps >= 0.9 top-20 overlap with the doc-level convention") {
    // the previous (quadratic) document-level convention, reproduced
    // here as the reference ranking
    val dt = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("term"))
      .filter(length(col("term")) >= 3)
    val pe = dt.as("a").join(dt.as("b"), "doc_id")
      .filter(col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("ta"), col("b.term").as("tb"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 5)
    val edges = pe.select(col("ta").as("src"), col("tb").as("dst"), col("w"))
      .union(pe.select(col("tb").as("src"), col("ta").as("dst"), col("w")))
    val ranks = Graph.weightedPagerank(edges, damping = 0.85, iters = 3)
    val docLevel = ranks.orderBy(col("rank").desc, col("node").asc).limit(20)
      .collect().map(_.getAs[String]("node")).toSet
    ranks.unpersist()
    val windowed = TextOps.textrankKeywords(spark, sfDir)
      .collect().map(_.getAs[String]("term")).toSet
    val overlap = (docLevel intersect windowed).size.toDouble / 20
    assert(overlap >= 0.9, s"top-20 overlap $overlap: doc=$docLevel window=$windowed")
  }

  test("smp05 temperature mixture: shares normalize, alpha=1 is proportional, alpha<1 flattens") {
    val m = Sampling.temperatureMixture(spark, sfDir, alpha = 0.3).collect()
    assert(m.nonEmpty)
    val cur = m.map(_.getAs[Double]("cur_share"))
    val tmp = m.map(_.getAs[Double]("temp_share"))
    assert(math.abs(cur.sum - 1.0) < 1e-3 && math.abs(tmp.sum - 1.0) < 1e-3)
    // alpha < 1 compresses the spread toward uniform
    assert(tmp.max - tmp.min < cur.max - cur.min,
      s"temperature did not flatten: cur=${cur.toSeq} tmp=${tmp.toSeq}")
    // rare sources are boosted, dominant ones damped
    m.foreach { r =>
      val boost = r.getAs[Double]("boost")
      if (r.getAs[Double]("cur_share") < 1.0 / m.length) assert(boost >= 1.0)
    }
    // alpha = 1 must be the identity mixture
    Sampling.temperatureMixture(spark, sfDir, alpha = 1.0).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("boost") - 1.0) < 1e-3)
    }
  }

  test("tx40 prefix search: every hit extends its prefix, ranked by exact doc frequency") {
    val hits = TextOps.prefixSearch(spark, sfDir, Seq("sp", "th"), k = 5).collect()
    assert(hits.nonEmpty)
    hits.foreach(r => assert(r.getAs[String]("term").startsWith(r.getAs[String]("prefix"))))
    // df of a returned term must equal the direct count of documents
    // containing it as a whitespace token
    val byPrefix = hits.groupBy(_.getAs[String]("prefix"))
    byPrefix.values.foreach { rs =>
      val dfs = rs.map(_.getAs[Long]("df"))
      assert(dfs.sameElements(dfs.sortBy(-_)), "not ranked by df desc")
    }
    val some = hits.head
    val direct = Tables.documents(spark, sfDir)
      .select(explode(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).as("term"))
      .filter(col("term") === some.getAs[String]("term")).count()
    assert(direct == some.getAs[Long]("df"), s"df mismatch for ${some.getAs[String]("term")}")
  }

  test("tx39 gopher rules: planted documents hit exactly the rule each violates") {
    val good = (Seq("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy", "dog",
      "and", "that", "runs", "with", "great", "speed") ++
      (1 to 45).map(i => s"word$i")).mkString(" ")
    val bullets = (1 to 60).map(i => s"- item$i the of and that with be to have").mkString("\n")
    val symbols = (1 to 60).map(i => s"##tag$i the of and").mkString(" ")
    val short = "the small and that with doc"
    val docs = Seq((1L, "a", good), (2L, "a", bullets), (3L, "a", symbols), (4L, "a", short))
      .toDF("doc_id", "source", "text")
    val out = TextOps.gopherRulesOn(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"), s"good doc dropped: ${out(1L)}")
    assert(!out(2L).getAs[Boolean]("keep") && out(2L).getAs[Double]("bullet_frac") > 0.9)
    assert(!out(3L).getAs[Boolean]("keep") && out(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!out(4L).getAs[Boolean]("keep") && out(4L).getAs[Int]("n_words") < 50)
    // metric spot-check: the short doc's mean word length is exact
    assert(math.abs(out(4L).getAs[Double]("mean_word_len") - (22.0 / 6)) < 1e-3)
  }

  test("dq06 snapshot diff agrees with per-user event-time classification") {
    val t1 = "2024-01-10"; val t2 = "2024-01-20"
    val diff = DataQuality.snapshotDiff(spark, sfDir, t1, t2).collect()
    assert(diff.nonEmpty)
    val statuses = diff.map(r => r.getAs[Long]("user_id") -> r.getAs[String]("status")).toMap
    assert(statuses.values.toSet.subsetOf(Set("added", "changed", "unchanged")))
    // direct classification from the raw event log
    val firstLast = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min("ts").as("first_ts"), max("ts").as("last_ts"))
      .filter(col("first_ts") <= lit(t2).cast("timestamp"))
      .collect()
    assert(firstLast.length == diff.length, "one diff row per entity present at T2")
    firstLast.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val first = r.getAs[java.sql.Timestamp]("first_ts")
      val last = r.getAs[java.sql.Timestamp]("last_ts")
      val c1 = java.sql.Timestamp.valueOf(s"$t1 00:00:00")
      val expected =
        if (first.after(c1)) "added"
        else if (!last.after(c1)) "unchanged"
        else "changed"
      assert(statuses(uid) == expected, s"user $uid: got ${statuses(uid)}, want $expected")
    }
  }

  test("tx41 bigram LM: exact interpolated scores on a planted corpus, word salad scores lower") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextOps.bigramLogLikOn(docs, lambda = 0.9).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_log2_lik"))).toMap
    // corpus: bigrams (a,b)×2 (a,c)×1, cprev(a)=3; unigrams a:3 b:2 c:1, total 6
    // Spark's round(): BigDecimal.valueOf + HALF_UP; log-probs aggregate
    // as integer micro-units (see bigramLogLikOn)
    def r(x: Double, s: Int): Double =
      java.math.BigDecimal.valueOf(x).setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    def score(cbg: Double, cprev: Double, cuni: Double): Double = {
      val u = r((math.log(0.9 * cbg / cprev + (1.0 - 0.9) * cuni / 6) / math.log(2.0)) * 1e6, 0)
      r(u / 100, 0) / 1e4
    }
    assert(out(1L) == (1L, score(2, 3, 2)) && out(2L) == out(1L))
    assert(out(3L) == (1L, score(1, 3, 1)))
    // the frequent continuation scores strictly higher than the rare one
    assert(out(1L)._2 > out(3L)._2)
    // order-2 discrimination: same unigrams, scrambled order — the
    // shuffled doc's bigrams are rarer, so the bigram LM ranks it
    // below the natural doc (tx25's unigram LM cannot see this)
    val natural = (1 to 20).map(_ => "the cat sat on the mat").mkString(" ")
    val salad = (1 to 20).map(_ => "mat the on sat cat the").mkString(" ")
    val pair = Seq((10L, natural), (11L, salad), (12L, natural), (13L, natural))
      .toDF("doc_id", "text")
    val scored = TextOps.bigramLogLikOn(pair).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_log2_lik")).toMap
    assert(scored(10L) > scored(11L),
      s"bigram LM did not separate word salad: $scored")
  }

  test("sim10 recall harness: brute is exactly 1.0, every serving path clears its floor") {
    val r = Similarity.annRecall(spark, sfDir).collect()
      .map(x => x.getAs[String]("method") -> x.getAs[Double]("recall")).toMap
    assert(r.keySet == Set("brute", "ivf_label", "ivf_kmeans", "sq8", "pq_candidates", "binary"))
    assert(r("brute") == 1.0, s"self-recall must be exact: $r")
    // floors match the per-method recall specs elsewhere in the suite
    assert(r("sq8") >= 0.9, s"sq8 recall ${r("sq8")}")
    assert(r("pq_candidates") >= 0.5, s"pq candidate recall ${r("pq_candidates")}")
    assert(r("ivf_label") >= 0.2 && r("ivf_kmeans") >= 0.2, s"ivf recall: $r")
    assert(r("binary") >= 0.4, s"binary-quantized recall ${r("binary")}")
    r.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("dd05 dedup harness: minhash precision is 1.0 and planted clones are recalled") {
    // three clone pairs (one-word edits on 40-word docs -> shingle
    // jaccard well above 0.5) + unrelated fillers
    def doc(seed: Int, edit: Boolean): String =
      (1 to 40).map(i => if (edit && i == 20) "EDITED" else s"w${seed}_$i").mkString(" ")
    val rows = Seq(
      (1L, doc(1, false)), (2L, doc(1, true)),
      (3L, doc(2, false)), (4L, doc(2, true)),
      (5L, doc(3, false)), (6L, doc(3, true))) ++
      (7L to 12L).map(i => (i, doc(i.toInt * 10, false)))
    val out = Dedup.dedupRecallOn(rows.toDF("doc_id", "text"), tau = 0.5).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(out.keySet == Set("minhash_lsh", "simhash_h3", "winnow_shared_fp"))
    // ground truth found exactly the three planted pairs
    out.values.foreach(r => assert(r.getAs[Long]("n_truth") == 3L, r.toString))
    // minhash verifies with the SAME jaccard as the truth: precision
    // exactly 1.0, and one-word edits collide in nearly every band
    val mh = out("minhash_lsh")
    assert(mh.getAs[Double]("precision") == 1.0 && mh.getAs[Double]("recall") == 1.0, mh.toString)
    out.values.foreach { r =>
      assert(r.getAs[Double]("precision") >= 0.0 && r.getAs[Double]("precision") <= 1.0)
      assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
    }
    // winnowing shares fingerprints on clones: full recall, and the
    // candidate set is a superset (precision <= minhash's)
    assert(out("winnow_shared_fp").getAs[Double]("recall") == 1.0)
  }

  test("km05 cluster metrics: planted orthogonal clusters are cohesive and separated") {
    // two tight clusters along orthogonal axes, seeded by label
    def near(axis: Int, eps: Double) =
      Seq.tabulate(4)(i => if (i == axis) 1.0 else if (i == (axis + 1) % 4) eps else 0.0)
    val e = Seq(
      (1L, near(0, 0.00), 0), (2L, near(0, 0.01), 0), (3L, near(0, 0.02), 0),
      (4L, near(2, 0.00), 1), (5L, near(2, 0.01), 1), (6L, near(2, 0.02), 1)
    ).toDF("vec_id", "embedding", "label")
    val fitted = KMeans.fit(e, 2)
    val m = KMeans.clusterMetrics(fitted).collect()
    fitted.unpersist()
    assert(m.length == 2)
    m.foreach { r =>
      assert(r.getAs[Long]("n_members") == 3L)
      assert(r.getAs[Double]("mean_cc") > 0.99, s"cohesion: $r")
      assert(r.getAs[Double]("nn_cos") < 0.05, s"separation: $r") // orthogonal rival
      assert(r.getAs[Double]("separation") > 0.9, s"margin: $r")
      assert(r.getAs[Double]("min_cc") <= r.getAs[Double]("mean_cc"))
    }
  }

  test("pp01 curation pipeline: every gate fires on its planted violator with full lineage") {
    def longDoc(seed: String, edit: Boolean = false): String =
      (Seq("the", "of", "and", "that", "with") ++
        (1 to 55).map(i => if (edit && i == 30) "EDITED" else s"${seed}_$i")).mkString(" ")
    val evalText = longDoc("eval")
    // contaminated doc embeds an 8-token run from the eval doc
    val contaminated = (Seq("the", "of", "and", "that", "with") ++
      (1 to 30).map(i => s"cont_$i") ++
      evalText.split(" ").slice(20, 28) ++
      (31 to 50).map(i => s"cont_$i")).mkString(" ")
    val bullets = (1 to 60).map(i => s"- item$i the of and that with be to have").mkString("\n")
    val docs = Seq(
      (1L, "a", longDoc("good")),                      // survives everything
      (2L, "a", longDoc("clone")), (3L, "a", longDoc("clone")),   // exact pair
      (4L, "a", longDoc("near")), (5L, "a", longDoc("near", edit = true)), // near pair
      (6L, "a", bullets),                              // quality violator
      (7L, "a", contaminated),                         // decontamination hit
      (100L, "a", evalText)                            // eval doc (excluded)
    ).toDF("doc_id", "source", "text")
    val v = graft.operators.Curation.curateOn(docs, col("doc_id") === 100L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!v.contains(100L), "eval docs carry no verdict row")
    def flags(id: Long) = {
      val r = v(id)
      (r.getAs[Boolean]("quality_keep"), r.getAs[Boolean]("exact_keep"),
       r.getAs[Boolean]("neardup_keep"), r.getAs[Boolean]("decontam_keep"),
       r.getAs[Boolean]("keep"))
    }
    assert(flags(1L) == ((true, true, true, true, true)), s"good: ${flags(1L)}")
    // exact clones are also trivially near-dups; the min id survives both
    assert(flags(2L) == ((true, true, true, true, true)), s"clone keeper: ${flags(2L)}")
    assert(flags(3L) == ((true, false, false, true, false)), s"clone victim: ${flags(3L)}")
    assert(flags(4L) == ((true, true, true, true, true)), s"near keeper: ${flags(4L)}")
    assert(flags(5L)._3 == false && flags(5L)._2 == true && !flags(5L)._5,
      s"near victim: ${flags(5L)}")
    assert(!flags(6L)._1 && !flags(6L)._5, s"quality violator: ${flags(6L)}")
    assert(!flags(7L)._4 && !flags(7L)._5, s"contaminated: ${flags(7L)}")
  }

  test("sim09 semdedup: planted clone groups collapse to min-id representatives") {
    def vec(base: Array[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (v, i) => v + (if (i == 0) eps else 0.0) }.toSeq
    val a = Array(1.0, 0.0, 0.0, 0.0); val b = Array(0.0, 1.0, 0.0, 0.0)
    val c = Array(0.0, 0.0, 1.0, 0.0)
    val e = Seq(
      (1L, vec(a, 0.0)), (2L, vec(a, 0.001)), (3L, vec(a, 0.002)), // clone group {1,2,3}
      (4L, vec(b, 0.0)), (5L, vec(b, 0.001)),                      // clone group {4,5}
      (6L, vec(c, 0.0))                                            // singleton
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedupOn(e, tau = 0.999, nCells = 3, iters = 2).collect()
    val groups = out.groupBy(_.getAs[Long]("group_id"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("vec_id")).toSet }
    assert(groups == Map(1L -> Set(1L, 2L, 3L), 4L -> Set(4L, 5L)), s"got $groups")
    out.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("vec_id") == r.getAs[Long]("group_id")))
    }
    // the singleton never appears — output is bounded by the duplicate
    // population, not the corpus
    assert(!out.exists(_.getAs[Long]("vec_id") == 6L))
  }
}
