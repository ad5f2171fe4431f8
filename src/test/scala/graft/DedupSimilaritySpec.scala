package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private def corpus = Seq(
    (1L, base),                                    // 40-token doc
    (2L, base),                                    // exact dup of 1
    (3L, base.replace("tok40", "changed")),        // near dup: 1-token edit
    (4L, (1 to 40).map(i => s"other$i").mkString(" ")), // disjoint vocab
    (5L, (1 to 40).map(i => s"alien$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("minhash LSH finds planted near-dups, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || b == 5L || a == 4L })
  }

  test("tx17 LSH-banded jaccard: subset of exact tx09, full recall on high-sim pairs") {
    import graft.operators.TextOps
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1), r.getLong(2))
    val exact = TextOps.tokenJaccard(spark, sfDir).collect()
    val lsh = TextOps.lshJaccardPairs(spark, sfDir).collect()
    val exactSet = exact.map(key).toSet
    val lshSet = lsh.map(key).toSet
    assert(exact.nonEmpty, "fixture has no exact pairs — test is vacuous")
    // every emitted pair is verified, so precision is exactly 1
    assert(lshSet.subsetOf(exactSet), s"false positives: ${lshSet -- exactSet}")
    // banding only loses borderline pairs: j >= 0.75 must all be found
    val high = exact.filter(_.getDouble(3) >= 0.75).map(key).toSet
    assert(high.subsetOf(lshSet), s"missed high-sim pairs: ${high -- lshSet}")
    // and overall recall stays near the 16x4-band theory (~0.89 at j=0.6)
    assert(lshSet.size >= (0.8 * exactSet.size).toInt,
      s"recall ${lshSet.size.toDouble / exactSet.size} too low")
  }

  test("sim05 RP-banded near-dup matches brute force on planted near-dups") {
    val rnd = new scala.util.Random(7)
    // 20 base vectors, each with a tiny-perturbation twin (cos ~0.99+),
    // plus noise vectors — τ=0.9 separates twins from everything else
    val base = (0 until 20).map(i => i -> Array.fill(32)(rnd.nextGaussian().toFloat))
    val rows = base.flatMap { case (i, v) =>
      val twin = v.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
      Seq((i.toLong, v), (100L + i, twin))
    } ++ (0 until 40).map(i => (1000L + i, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val e = rows.toDF("vec_id", "embedding")
    val brute = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", graft.functions.VectorFunctions.cosineSim(col("ea"), col("eb")))
      .filter(col("cos") >= 0.9)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.rpNearDupOn(e, threshold = 0.9, bands = 32, rowsPerBand = 8)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 20, s"fixture produced too few true pairs: ${brute.size}")
    assert(got == brute, s"missed: ${brute -- got}, extra: ${got -- brute}")
    // the r knob grows block cardinality: more sign bits → more,
    // smaller buckets per band (this is what label blocking can't do)
    import graft.functions.HashFunctions.rpSignBands
    def buckets(r: Int) = e.select(explode(rpSignBands(col("embedding"), 1, r)).as("band"))
      .agg(countDistinct("band")).head.getLong(0)
    assert(buckets(8) > buckets(4), s"buckets r=8 ${buckets(8)} <= r=4 ${buckets(4)}")
    assert(buckets(4) > buckets(2), s"buckets r=4 ${buckets(4)} <= r=2 ${buckets(2)}")
  }

  test("simhash guarantees recall for pairs within hamming <= 3") {
    import graft.functions.{HashFunctions, TextFunctions}
    // the 4×16-bit pigeonhole blocking guarantees candidates only for
    // hamming <= 3 — find (deterministically) a 1-token edit that stays
    // inside that bound, then assert the pipeline catches it
    val variants = (0 until 400).map(i => (i.toLong, base.replace("tok40", s"v$i")))
    val sigOf = (variants :+ (-1L, base)).toDF("id", "text")
      .select(col("id"), HashFunctions.simhash64(TextFunctions.tokens(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseSig = sigOf(-1L)
    val nearId = variants.collectFirst {
      case (i, _) if java.lang.Long.bitCount(baseSig ^ sigOf(i)) <= 3 && sigOf(i) != baseSig => i
    }
    assert(nearId.isDefined, "no <=3-hamming variant found in search space")
    val near = variants.find(_._1 == nearId.get).get._2
    val c = Seq((1L, base), (2L, base), (3L, near),
      (4L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(c, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(pairs.contains((1L, 3L)), s"guaranteed near-dup pair missing from $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L }) // unrelated stays out
  }

  test("fingerprints: dup docs share min fingerprint") {
    val fps = Dedup.fingerprints(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps(1L) == fps(2L))
  }

  test("knn brute: k rows per query, self excluded, ranks contiguous") {
    val r = Similarity.knnBrute(spark, sfDir).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to 5))
      assert(!rows.exists(_.getLong(1) == q))
    }
  }

  test("ivf recall@1 is high on clustered corpus") {
    // plant 3 well-separated clusters: axis direction + small noise
    val rnd = new scala.util.Random(7)
    val rows = for (c <- 0 until 3; i <- 0 until 40) yield {
      val v = Array.tabulate(8)(j => (if (j == c) 1.0f else 0.0f) + rnd.nextFloat() * 0.1f)
      (c * 100L + i, v, c)
    }
    val e = rows.toDF("vec_id", "embedding", "label")
    val pred = col("vec_id") % 10 === 0
    val brute = Similarity.knnBruteOn(e, pred).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfAnnOn(e, pred).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hits = ivf.count { case (q, n) => brute.get(q).contains(n) }
    assert(hits.toDouble / ivf.size >= 0.9, s"ivf recall@1 too low: $hits/${ivf.size}")
    // and on the random test-data embeddings it still returns k ranked rows
    val r = Similarity.ivfAnn(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(4)).sorted.sameElements(1 to rs.length))
    }
  }
}
