package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.VectorFunctions
import graft.operators.{AsOf, Scale}

/** Property-based checks of the custom expressions and operators
  * against mathematical invariants and brute-force reference
  * implementations on random inputs.
  */
class PropertiesSpec extends SparkSpec {

  /** Deterministic sampling from a Gen (no scalatest bridge in the
    * offline cache): fixed seed stream, n samples.
    */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))
  import spark.implicits._

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray))
        .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine invariants: bounds, self-similarity, symmetry, positive scaling") {
    samples(Gen.listOfN(8, Gen.zip(vecGen, vecGen)), 5).foreach { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.toDF("a", "b")
        val rows = df.select(
          VectorFunctions.cosineSim(col("a"), col("b")).as("ab"),
          VectorFunctions.cosineSim(col("b"), col("a")).as("ba"),
          VectorFunctions.cosineSim(col("a"), col("a")).as("aa"),
          VectorFunctions.cosineSim(col("a"), transform(col("b"), x => x * 2.5f)).as("abs")
        ).collect()
        rows.foreach { r =>
          assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9)           // bounded
          assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12) // symmetric
          assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)             // cos(a,a)=1
          assert(math.abs(r.getDouble(0) - r.getDouble(3)) < 1e-6)  // scale-invariant
        }
      }
    }
  }

  test("LCS matches reference DP on random token sequences; ROUGE-L invariants hold") {
    import graft.functions.TextFunctions.lcsLen
    // quadratic reference DP, string equality (no hashing)
    def refLcs(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- a.indices; j <- b.indices)
        dp(i + 1)(j + 1) =
          if (a(i) == b(j)) dp(i)(j) + 1 else math.max(dp(i + 1)(j), dp(i)(j + 1))
      dp(a.length)(b.length)
    }
    val tokGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dog", "cat", "は", "猫")))
    samples(Gen.listOfN(12, Gen.zip(tokGen, tokGen)), 4).foreach { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.toDF("a", "b")
        val rows = df.select(
          lcsLen(col("a"), col("b")).as("ab"),
          lcsLen(col("b"), col("a")).as("ba"),
          lcsLen(col("a"), col("a")).as("aa"),
          lcsLen(col("a"), concat(col("a"), col("b"))).as("apre"),
          size(col("a")).as("na"), size(col("b")).as("nb")).collect()
        rows.zip(pairs).foreach { case (r, (a, b)) =>
          assert(r.getInt(0) == refLcs(a, b), s"lcs($a, $b)")        // matches reference DP
          assert(r.getInt(0) == r.getInt(1))                          // symmetric
          assert(r.getInt(2) == a.length)                             // lcs(a,a) = |a|
          assert(r.getInt(3) == a.length)                             // prefix containment
          assert(r.getInt(0) <= math.min(a.length, b.length))         // bounded
        }
      }
    }
  }

  test("asof join matches brute-force reference on random event sets") {
    val evGen = Gen.listOfN(60, Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0, 5000), Gen.chooseNum(0L, 999999L)))
    samples(Gen.zip(evGen, evGen), 4).foreach { case (ls, rs) =>
      if (ls.nonEmpty && rs.nonEmpty) {
        // unique ids per side so the reference's tie-break is well-defined
        val left = ls.zipWithIndex.map { case ((k, t, _), i) => (k, new java.sql.Timestamp(t * 1000L), i.toLong) }
        val right = rs.zipWithIndex.map { case ((k, t, _), i) => (k, new java.sql.Timestamp(t * 1000L), 100000L + i) }
        val got = AsOf.joinAsOf(left.toDF("k", "ts", "id"), right.toDF("k", "ts", "id"), "k", "ts", "id")
          .collect().map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
        left.foreach { case (k, ts, id) =>
          val want = right.filter(r => r._1 == k && !r._2.after(ts))
            .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
          assert(got(id) == want, s"left $id: got ${got(id)}, want $want")
        }
      }
    }
  }

  test("salted join equals plain join on random skewed data") {
    val gen = Gen.listOfN(200, Gen.zip(Gen.oneOf(1L, 1L, 1L, 2L, 3L), Gen.chooseNum(0, 100)))
    samples(gen, 4).foreach { rows =>
      if (rows.nonEmpty) {
        val left = rows.toDF("k", "v")
        val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "w")
        val plain = left.join(right, "k")
        val salted = Scale.saltedJoin(left, right, "k", 5)
        assert(salted.count() == plain.count())
        assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      }
    }
  }

  test("scrubPii is idempotent and digit-free on random text with planted PII") {
    import graft.functions.TextFunctions
    val word = Gen.oneOf("alpha", "beta", "x7", "nine9", "bob@example.com",
      "https://a.example/p?id=9911", "4481", "ok", "12", "1")
    val gen = Gen.listOfN(12, word).map(_.mkString(" "))
    val texts = samples(gen, 40)
    val df = texts.toDF("t")
      .select(col("t"), TextFunctions.scrubPii(col("t")).as("s1"))
      .select(col("s1"), TextFunctions.scrubPii(col("s1")).as("s2"))
      .collect()
    df.foreach { r =>
      assert(r.getString(0) == r.getString(1), "scrub must be idempotent")
      assert(!r.getString(0).matches(".*\\d{2,}.*"), s"digit run survived: ${r.getString(0)}")
    }
  }

  test("connectedComponents labels match brute-force union-find on random graphs") {
    import graft.operators.Dedup
    val edgeGen = Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L)))
      .map(_.filter { case (a, b) => a != b })
    samples(edgeGen, 4).foreach { edges =>
      if (edges.nonEmpty) {
        // brute-force union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonicalize: component = set partition, compare as min-rooted groups
        val expected = nodes.groupBy(find).map { case (_, ns) => ns.toSet }.toSet
        val labels = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        val gotPairs = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
        val got = gotPairs.groupBy(_._2).map { case (_, ns) => ns.map(_._1).toSet }.toSet
        labels.unpersist()
        assert(got == expected, s"components differ on $edges")
        // the size gate must not change results: the distributed
        // min-label loop (forced via smallGraphMax = 0) and the driver
        // union-find agree label-for-label, not just partition-wise
        val dist = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b", smallGraphMax = 0L)
        val distPairs = dist.collect().map(r =>
          r.getAs[Long]("node") -> r.getAs[Long]("label"))
        dist.unpersist()
        assert(distPairs.toMap == gotPairs.toMap, s"paths disagree on $edges")
      }
    }
  }

  test("SpaceSaving bounds hold on random zipf-ish streams at any capacity") {
    import graft.functions.SpaceSavingAgg.spaceSavingTopK
    val itemGen = Gen.frequency(
      8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
      3 -> Gen.oneOf("a", "b", "c"), 2 -> Gen.chooseNum(0, 50).map("rare" + _))
    samples(Gen.listOfN(400, itemGen), 3).foreach { items =>
      if (items.nonEmpty) {
        val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val hh = items.toDF("item").repartition(7)
          .agg(spaceSavingTopK(col("item"), 3, 6).as("hh"))
          .select(explode(col("hh")).as("e"))
          .select(col("e.item"), col("e.est"), col("e.err")).collect()
        hh.foreach { r =>
          val t = trueCounts(r.getString(0))
          assert(r.getLong(1) >= t, s"underestimate for ${r.getString(0)}")
          assert(r.getLong(1) - r.getLong(2) <= t, s"error bound broken for ${r.getString(0)}")
        }
        // the dominant item must always surface first
        assert(hh.head.getString(0) == "hot")
      }
    }
  }

  test("CUSUM prefix identity equals the max(0, S+d) recursion on random series") {
    val seriesGen = Gen.listOfN(40, Gen.chooseNum(-1.0, 1.0))
    samples(seriesGen, 8).foreach { ds =>
      // identity: S_t = P_t − min(0, min_{j≤t} P_j) over prefix sums P
      var p = 0.0
      var minP = 0.0
      var sRec = 0.0
      ds.foreach { d =>
        sRec = math.max(0.0, sRec + d)
        p += d
        val sId = p - math.min(0.0, { minP = math.min(minP, p); minP })
        assert(math.abs(sRec - sId) < 1e-9, s"identity diverges on $ds")
      }
    }
  }

  test("topKBy equals sort-and-take on random data under random partitioning") {
    import graft.functions.TopKByAgg.topKBy
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.oneOf(Gen.chooseNum(-5.0, 5.0), Gen.const(Double.NaN)),
              Gen.chooseNum(0L, 50L)))
    samples(Gen.zip(rowGen, Gen.chooseNum(1, 9)), 6).foreach { case (rows, parts) =>
      if (rows.nonEmpty) {
        val got = rows.toDF("v", "id").repartition(parts)
          .agg(topKBy(col("v"), col("id"), 4).as("top"))
          .select(explode(col("top")).as("e"))
          .select(col("e.value"), col("e.id")).collect()
          .map(r => (r.getDouble(0), r.getLong(1))).toSeq
        // reference: IEEE total order desc (NaN largest), id asc — the
        // ordering Spark's own sort uses
        val expect = rows
          .sortWith { (a, b) =>
            val c = java.lang.Double.compare(a._1, b._1)
            c > 0 || (c == 0 && a._2 < b._2)
          }.take(4)
        assert(got.map { case (v, i) => (java.lang.Double.doubleToLongBits(v), i) } ==
          expect.map { case (v, i) => (java.lang.Double.doubleToLongBits(v), i) },
          s"mismatch on $rows parts=$parts")
      }
    }
  }

  test("morton interleave matches the reference on random coordinates and preserves prefix blocks") {
    val coordGen = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)))
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    samples(coordGen, 5).foreach { cs =>
      if (cs.nonEmpty) {
        val got = cs.toDF("a", "b")
          .select(Scale.mortonInterleave(col("a"), col("b")).as("z"))
          .collect().map(_.getLong(0))
        got.zip(cs).foreach { case (z, (a, b)) =>
          assert(z == ref(a, b), s"($a,$b)")
          // locality: points sharing the top 8 bits of both coordinates
          // share the top 16 bits of the code (quadtree block nesting)
          assert(z >> 16 == ref(a >> 8 << 8, b >> 8 << 8) >> 16)
        }
      }
    }
  }

  test("bigram LM scores are invariant under corpus duplication on random corpora") {
    // the LM is built from ratios (cbg/cprev, cuni/total), so cloning
    // every document scales every count equally and no score may move —
    // the distribution-soundness check for tx41
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val docGen = Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))
    samples(Gen.listOfN(8, docGen), 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val doubled = docs ++ docs.map { case (i, t) => (i + 1000L, t) }
      val base = graft.operators.TextOps.bigramLogLikOn(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val dup = graft.operators.TextOps.bigramLogLikOn(doubled.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      base.foreach { case (id, v) =>
        assert(dup(id) == v, s"doc $id moved under duplication: ${dup(id)} vs $v")
        assert(dup(id + 1000L) == v, s"clone of $id differs")
      }
    }
  }

  test("ev29 run-boundary identity matches the greedy DFA on random event sequences") {
    import graft.operators.Events
    // reference: the literal two-state greedy matcher over a user's
    // time-ordered A/B subsequence (seek A -> consume one -> seek B ->
    // count on first B -> back to seek A)
    def dfa(seq: Seq[String]): Long = {
      var seekingB = false; var n = 0L
      seq.foreach {
        case "view" if !seekingB => seekingB = true
        case "purchase" if seekingB => n += 1; seekingB = false
        case _ => ()
      }
      n
    }
    val typeGen = Gen.oneOf("view", "purchase", "click", "error")
    val seqGen = Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, typeGen))
    samples(Gen.listOfN(12, seqGen), 6).foreach { users =>
      val rows = users.zipWithIndex.flatMap { case (types, u) =>
        types.zipWithIndex.map { case (t, i) =>
          ((u.toLong * 1000 + i), new java.sql.Timestamp(86400000L + i * 1000L),
            (u.toLong: java.lang.Long), t, (1.0: java.lang.Double), "{}")
        }
      }
      if (rows.nonEmpty) {
        val got = Events.sequenceCountOn(
          rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
          .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_matches")).toMap
        users.zipWithIndex.foreach { case (types, u) =>
          val want = dfa(types.filter(t => t == "view" || t == "purchase"))
          assert(got.getOrElse(u.toLong, 0L) == want,
            s"user $u seq=${types.mkString(",")}: got ${got.get(u.toLong)}, want $want")
        }
      }
    }
  }

  test("q27 RANGE frame matches brute-force trailing-window sums on random order histories") {
    import graft.operators.Relational
    val orderGen = Gen.zip(Gen.chooseNum(1, 4), Gen.chooseNum(0, 90), Gen.chooseNum(1, 99999))
    samples(Gen.chooseNum(5, 30).flatMap(n => Gen.listOfN(n, orderGen)), 6).foreach { raw =>
      val orders = raw.zipWithIndex.map { case ((cust, day, centsRaw), i) =>
        (i.toLong, cust.toLong,
          new java.sql.Timestamp(86400000L * (100 + day)), centsRaw / 100.0)
      }
      val got = Relational.trailingSpendOn(
        orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"), days = 30)
        .collect().map(r => r.getAs[Long]("o_orderkey") ->
          (r.getAs[Double]("trailing_spend"), r.getAs[Long]("trailing_orders"))).toMap
      orders.foreach { case (k, cust, ts, _) =>
        val inFrame = orders.filter { case (_, c, t, _) =>
          c == cust && t.getTime <= ts.getTime && t.getTime >= ts.getTime - 30L * 86400000L
        }
        val cents = inFrame.map { case (_, _, _, p) => math.round(p * 100) }.sum
        assert(got(k) == (cents / 100.0, inFrame.length.toLong),
          s"order $k cust $cust: got ${got(k)}, want ($cents cents, ${inFrame.length})")
      }
    }
  }

  test("temperature mixture: alpha=0 is uniform, shares are monotone in the source shares") {
    import graft.operators.Sampling
    val m0 = Sampling.temperatureMixture(spark, sfDir, alpha = 0.0).collect()
    val uniform = 1.0 / m0.length
    m0.foreach(r => assert(math.abs(r.getAs[Double]("temp_share") - uniform) < 1e-4,
      s"alpha=0 must be uniform: $r"))
    // order preservation: temperature rescales but never reorders
    val m = Sampling.temperatureMixture(spark, sfDir, alpha = 0.3).collect()
      .sortBy(_.getAs[Double]("cur_share"))
    val tempSorted = m.map(_.getAs[Double]("temp_share"))
    assert(tempSorted.zip(tempSorted.tail).forall { case (a, b) => a <= b + 1e-12 },
      s"temperature reordered the mixture: ${tempSorted.toSeq}")
  }

  test("round-robin cap invariants vs a reference interleaver on random inputs") {
    import graft.operators.Sampling
    val itemsGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 5)).map(_.zipWithIndex.map {
        case (sec, i) => (s"s$sec", (i + 1).toLong)
      }))
    // the reference greedy: one item per section per round, sections in
    // first-appearance order, until the cap
    def refInterleave(items: Seq[(String, Long)], cap: Int): Set[(String, Long)] = {
      if (items.size <= cap) return items.toSet
      val order = items.map(_._1).distinct
      val queues = scala.collection.mutable.Map(
        items.groupBy(_._1).view.mapValues(v => scala.collection.mutable.Queue(v: _*)).toSeq: _*)
      val out = scala.collection.mutable.Buffer.empty[(String, Long)]
      var progressed = true
      while (out.size < cap && progressed) {
        progressed = false
        for (s <- order if out.size < cap) {
          val q = queues(s)
          if (q.nonEmpty) { out += q.dequeue(); progressed = true }
        }
      }
      out.toSet
    }
    samples(itemsGen, 8).foreach { items =>
      val cap = math.max(1, items.size / 2)
      val got = Sampling.roundRobinCapOn(items.toDF("section_key", "pos"), cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = refInterleave(items, cap)
      assert(got == want, s"items=$items cap=$cap got=$got want=$want")
    }
  }

  test("language-quota invariants: slot count preserved, quota never overshoots availability") {
    import graft.operators.Curation
    val rowGen = Gen.zip(Gen.chooseNum(5, 25), Gen.chooseNum(0, 8)).flatMap {
      case (nPool, nEn) =>
        Gen.listOfN(nPool, Gen.chooseNum(1.0, 99.0)).map { scores =>
          scores.zipWithIndex.map { case (sc, i) =>
            val lang = if (i < nEn) "en" else if (i % 7 == 0) "und" else "ja"
            ("s", (i + 1).toLong, lang, math.rint(sc), (i + 1).toLong)
          }
        }
    }
    samples(rowGen, 8).foreach { pool =>
      val poolDf = pool.toDF("section_key", "id", "language", "score", "pos")
      val k = math.min(6, pool.size)
      val curated = pool.sortBy(p => (-p._4, p._5)).take(k).zipWithIndex
        .map { case ((s, id, l, sc, _), slot) => (s, id, l, sc, slot + 1) }
      val curDf = curated.toDF("section_key", "id", "language", "score", "slot")
      val out = Curation.languageQuotaOn(curDf, poolDf, "en", 0.34).collect()
      assert(out.length == k, s"slot count changed: ${out.length} vs $k")
      assert(out.map(_.getInt(4)).sorted.sameElements(1 to k), "slots stay a permutation")
      val required = math.ceil(k * 0.34).toInt
      val enTotal = pool.count(_._3 == "en")
      val enCur = curated.count(_._3 == "en")
      val nonProtected = k - enCur
      val enOut = out.count(_.getString(2) == "en")
      val expected = math.min(math.max(enCur, math.min(required, enCur + (enTotal - enCur).min(nonProtected))), k)
      assert(enOut >= enCur, "rebalance never removes the protected language")
      assert(enOut == expected || enOut >= math.min(required, expected),
        s"quota fill: enOut=$enOut required=$required enTotal=$enTotal enCur=$enCur k=$k")
    }
  }
}
