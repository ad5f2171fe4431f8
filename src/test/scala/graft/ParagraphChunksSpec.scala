package graft

import org.apache.spark.sql.functions._
import graft.operators.ParagraphChunks

/** Rule-per-case pins for rag16 — rag-orchestrator domain/chunker.go
  * (:68-112), merger.go (:7-104), splitter.go (:9-123).
  */
class ParagraphChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(body: String): Seq[(Int, Int)] = {
    val df = Seq((1L, body)).toDF("doc_id", "body")
    ParagraphChunks.chunk(df).orderBy("ordinal").collect()
      .map(r => (r.getInt(1), r.getInt(2))).toSeq
  }
  private def contentsOf(body: String): Seq[String] =
    Seq((1L, body)).toDF("doc_id", "body")
      .select(ParagraphChunks.chunkArray(col("body")).as("c"))
      .collect()(0).getSeq[String](0)

  private val long1 = "L1 " + "a" * 90
  private val long2 = "L2 " + "b" * 90

  test("paragraph split on blank lines, trim, empty drop, CRLF/CR normalization (chunker.go:74-88)") {
    assert(contentsOf(s"  $long1  \r\n\r\n\r\n\r\n$long2\r") == Seq(long1, long2))
  }

  test("pass 1: mid shorts merge into the PREVIOUS chunk; trailing short merges back (merger.go:22-35, :50-60)") {
    assert(contentsOf(s"$long1\n\nnote\n\n$long2") ==
      Seq(long1 + "\n\nnote", long2))
    assert(contentsOf(s"$long1\n\ntail") == Seq(long1 + "\n\ntail"))
  }

  test("pass 1: leading shorts PREPEND to the first long paragraph (the v5 rule, :28-31); a >=80 accumulation stands alone") {
    assert(contentsOf(s"lead one\n\nlead two\n\n$long1") ==
      Seq(s"lead one\n\nlead two\n\n$long1"))
    val fat = "x" * 45
    // two 45-rune shorts accumulate to 92 >= 80 -> own chunk
    assert(contentsOf(s"$fat\n\n$fat\n\n$long1") ==
      Seq(s"$fat\n\n$fat", long1))
  }

  test("only-content shorts stay as one possibly-short chunk (merger.go:57-59's comment)") {
    assert(contentsOf("one\n\ntwo\n\nthree") == Seq("one\n\ntwo\n\nthree"))
  }

  test("pass 2: a short survivor absorbs the NEXT paragraph regardless of its length — the while-chain and prepend-to-next branches coincide (merger.go:75-93, proven here)") {
    // plant a pass-1 output shape directly: [short>=80-accum impossible
    // after pass 1 alone when followed by long, so drive pass2 directly]
    val paras = Seq((1L, Seq("tiny", long1))).toDF("id", "ps")
    val got = paras.select(ParagraphChunks.pass2(col("ps")).as("r"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq(s"tiny\n\n$long1"))
    // trailing short appends to the previous result (:95-98)
    val paras2 = Seq((1L, Seq(long1, "tiny"))).toDF("id", "ps")
    val got2 = paras2.select(ParagraphChunks.pass2(col("ps")).as("r"))
      .collect()(0).getSeq[String](0)
    assert(got2 == Seq(s"$long1\n\ntiny"))
  }

  test("sentence split: terminator + space/newline/EOF; no split inside numbers; 。!? all split (splitter.go:97-123)") {
    val df = Seq((1L, "Pi is 3.14 yes. Two!\nThree? 四。 tail")).toDF("id", "p")
    val got = df.select(ParagraphChunks.sentences(col("p")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("Pi is 3.14 yes.", "Two!", "Three?", "四。", "tail"))
  }

  test("packing: greedy <=1000 with single-space joints; the boundary is chunk+1+sentence > 1000 (splitter.go:36-39)") {
    val s498 = "s" * 497 + "." // 498 runes
    val s501 = "t" * 500 + "." // 501
    // 498 + 1 + 501 = 1000 — NOT > 1000 -> one chunk
    val one = contentsOf(s498 + " " + s501)
    assert(one == Seq(s498 + " " + s501))
    val s502 = "u" * 501 + "." // 502: 498+1+502 = 1001 > 1000 -> split
    val two = contentsOf(s498 + " " + s502)
    assert(two == Seq(s498, s502))
  }

  test("overlong sentences slab-split at 1000 runes; a sub-80 tail slab merges into the previous slab under 1500 (splitter.go:41-71)") {
    val giant = "g" * 1050 // no terminators: one 1050-rune sentence
    assert(contentsOf(giant) == Seq("g" * 1050)) // 1000 + 50 -> tail merges
    val giant2 = "h" * 2100 // 1000 + 1000 + 100: tail 100 >= 80 stands
    assert(contentsOf(giant2) == Seq("h" * 1000, "h" * 1000, "h" * 100))
    val giant3 = "i" * 2050 // 1000 + 1000 + 50 -> merges into second slab
    assert(contentsOf(giant3) == Seq("i" * 1000, "i" * 1050))
  }

  test("chunk hashes are the sha256 of the content (chunker.go:99-108)") {
    val df = Seq((1L, long1)).toDF("doc_id", "body")
    val got = ParagraphChunks.chunk(df).collect()(0).getString(3)
    val expect = java.security.MessageDigest.getInstance("SHA-256")
      .digest(long1.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got == expect)
  }
}
