package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for tx33 (JSD source divergence) and the Z-order layout
  * utilities.
  */
class LayoutDivergenceSpec extends SparkSpec {
  import spark.implicits._

  test("tx33 JSD: absent-term identity matches the full-vocabulary formula, bounded by ln 2") {
    val out = TextOps.sourceDivergence(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("jsd")).toMap
    assert(out.nonEmpty)
    out.values.foreach { j => assert(j >= 0.0 && j <= math.log(2.0) + 1e-9) }
    // reference: full-vocab JSD computed locally (absent terms scored
    // explicitly with p=0 → 0.5·q·ln2), must equal the closed form
    val counts = Tables.documents(spark, sfDir)
      .select(col("source"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("source", "term").count()
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("term"), r.getAs[Long]("count")))
    val vocab = counts.map(_._2).distinct
    val termTot = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val srcTot = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val corpusTot = counts.map(_._3).sum.toDouble
    counts.groupBy(_._1).foreach { case (src, rows) =>
      val p = rows.map(r => r._2 -> r._3.toDouble / srcTot(src)).toMap
      var jsd = 0.0
      vocab.foreach { t =>
        val pt = p.getOrElse(t, 0.0)
        val qt = termTot(t) / corpusTot
        val mt = (pt + qt) / 2
        if (pt > 0) jsd += 0.5 * pt * math.log(pt / mt)
        if (qt > 0) jsd += 0.5 * qt * math.log(qt / mt)
      }
      assert(math.abs(out(src) - BigDecimal(jsd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6,
        s"closed form diverges from full-vocab JSD for $src")
    }
  }

  test("tx36 snippets: window brackets the first hit, counts exact") {
    val out = TextOps.searchSnippets(spark, sfDir).collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.split("\\s+")
      val first = toks.indexOf("spark")
      assert(first >= 0 && r.getAs[Long]("pos") == first + 1)
      assert(r.getAs[Int]("n_hits") == toks.count(_ == "spark"))
      val snip = r.getAs[String]("snippet").split(" ")
      assert(snip.contains("spark") && snip.length <= 7)
      val start = math.max(0, first - 3)
      assert(snip.sameElements(toks.slice(start, start + 7)))
    }
  }

  test("morton interleave matches the reference bit interleave") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 2L), (12345L, 54321L),
      (65535L, 65535L), (40000L, 7L))
    val got = cases.toDF("a", "b")
      .select(Scale.mortonInterleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    got.zip(cases).foreach { case (z, (a, b)) => assert(z == ref(a, b), s"($a,$b)") }
  }

  test("quantileBand is the exact count of cuts <= value, duplicates and range ends included") {
    // duplicate-heavy sorted cuts with a partial final chunk
    val cuts = (Seq.fill(40)(5.0) ++ (1 to 983).map(i => (i % 97).toDouble)).sorted.toArray
    val values = Seq(-1.0, 0.0, 0.5, 4.9, 5.0, 5.1, 50.0, 96.0, 96.5, 1e9)
    val got = values.toDF("v")
      .select(col("v"), Scale.quantileBand(col("v"), cuts).as("band"))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    values.foreach { v =>
      assert(got(v) == cuts.count(_ <= v), s"band($v)")
    }
  }

  test("z-ordered layout plan has no WindowExec and no single-partition exchange") {
    val df = Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey", "l_quantity")
    val plan = Scale.zOrderedLayout(df, files = 8, "l_partkey", "l_suppkey")
      .queryExecution.executedPlan
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(all)) ++ p.subqueries.flatMap(all)
    val nodes = all(plan)
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "WindowExec in z-order layout plan — the global-ntile shape must not come back")
    nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { e =>
      assert(e.outputPartitioning.numPartitions > 1,
        "single-partition exchange in z-order layout plan")
    }
  }

  test("z-ordered layout keeps per-file min/max boxes tight in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey", "l_quantity")
    Scale.writeZOrdered(df, s"$dir/z", files = 8, "l_partkey", "l_suppkey")
    val withFile = spark.read.parquet(s"$dir/z")
      .withColumn("f", input_file_name())
    val spans = withFile.groupBy("f").agg(
      (max("l_partkey") - min("l_partkey")).as("span_a"),
      (max("l_suppkey") - min("l_suppkey")).as("span_b"))
      .collect()
    assert(spans.length == 8)
    val fullA = df.agg(max("l_partkey") - min("l_partkey")).head.getLong(0).toDouble
    val fullB = df.agg(max("l_suppkey") - min("l_suppkey")).head.getLong(0).toDouble
    val avgA = spans.map(_.getAs[Long]("span_a")).sum / spans.length / fullA
    val avgB = spans.map(_.getAs[Long]("span_b")).sum / spans.length / fullB
    // a lexicographic sort on A leaves B's per-file span at ~1.0; the
    // interleave must bound BOTH well below that
    assert(avgA < 0.8, s"span_a fraction $avgA")
    assert(avgB < 0.8, s"span_b fraction $avgB")
  }
}
