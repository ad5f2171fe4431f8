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
