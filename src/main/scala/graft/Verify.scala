package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // dev convenience: an optional comma-separated third arg restricts
    // the dump (and the emitted oracle json) to the named queries; the
    // driver always passes two args, so its contract is unchanged
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    def selected(name: String) = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a query that THROWS is simply absent from the driver's comparison
    // — indistinguishable from "not implemented" (round 6 lost all 53
    // events-family queries to a testdata schema change exactly this
    // way, with zero red rows anywhere). Record failures durably so an
    // absent result is always attributable.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(q => selected(q._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // hard convention (round-10 verdict): the driver's pandas
        // comparator crashes on array/map/struct output columns, so a
        // non-scalar column is a broken row even when values are right
        val nonScalar = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
                 || f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
                 || f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] => f.name
        }
        if (nonScalar.nonEmpty) throw new IllegalStateException(
          s"non-scalar output columns (posexplode or array_join them): ${nonScalar.mkString(", ")}")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators that persist() intermediates (minhash LSH, IVF) cache
      // for the session; drop between queries so runs stay independent
      spark.catalog.clearCache()
    }
    val nSel = SparkEntry.queries.count(q => selected(q._1))
    System.err.println(
      s"[verify] ${nSel - failures.size}/$nSel dumped" +
      (if (failures.isEmpty) "" else s", FAILED: ${failures.keys.mkString(", ")}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(o => selected(o._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/verify_failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
