package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.HashFunctions._

/** Dev scratch main for plan/size investigation (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, dir)
    time("tokenize only") {
      docs.select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).head
    }
    time("shingles only") {
      docs.select(array_distinct(shingles(col("text"), 3)).as("sh"))
        .select(sum(size(col("sh")))).head
    }
    time("shingles+sig") {
      docs.select(minhashSignature(array_distinct(shingles(col("text"), 3)), 64).as("sig"))
        .select(sum(size(col("sig")))).head
    }
    time("shingles+sig+bands+explode") {
      docs.select(col("doc_id"),
        explode(lshBands(minhashSignature(array_distinct(shingles(col("text"), 3)), 64), 16, 4)).as("band"))
        .count()
    }
    time("full tx07") {
      graft.operators.Dedup.tx07(spark, dir).count()
    }
    spark.stop()
  }
}
