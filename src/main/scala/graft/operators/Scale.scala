package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-out utilities: skew salting and bucketed co-location.
  *
  * These are the knobs the 100 TB deployment turns that small-SF tests
  * never force: a hot key (one feed with 10M articles, one service
  * producing half the logs) stalls a shuffle join on a single task, and
  * repeated joins on the same key re-shuffle the same terabytes.
  * Mirrors the reference's pain points: ClickHouse partitions logs by
  * (service_group, service_name) for the same locality reason
  * (clickhouse/migrations/001_create_logs_table.sql).
  */
object Scale {

  /** Skew-resistant equi-join: left rows scatter across `salts`
    * sub-keys, right rows replicate to every sub-key, so one hot key
    * spreads over `salts` tasks instead of one. Use when AQE's skew
    * handling isn't enough (e.g. a single key larger than any split).
    * Result is identical to `left.join(right, key)`.
    *
    * The salt must be DETERMINISTIC per row — rand /
    * monotonically_increasing_id / spark_partition_id all change on
    * shuffle-stage retries when upstream lineage is order-
    * nondeterministic (SPARK-23207 class) and would duplicate or drop
    * rows. So the salt hashes row CONTENT: `saltCols` if given (pass a
    * unique id column when rows of a hot key can be byte-identical —
    * content-hashing identical rows cannot spread them, by
    * construction), else all columns.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 saltCols: Seq[String] = Nil): DataFrame = {
    require(salts >= 1)
    val basis = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val sl = left.withColumn("__salt",
      pmod(xxhash64(basis.map(col): _*), lit(salts.toLong)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a fact table partitioned by day — the layout ClickHouse
    * gets from `PARTITION BY toYYYYMMDD(timestamp)` (migrations/002)
    * and what makes es03-style TTL a metadata drop instead of a scan:
    * time-range predicates prune whole directories at planning time.
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("__day", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__day")
      .parquet(path)

  /** Compact a many-small-files dataset into ~`rowsPerFile`-sized
    * parquet files — the maintenance pass ClickHouse gets for free
    * from MergeTree part merges and a streaming-ingest lake must run
    * itself (every micro-batch of st06/rask ingestion leaves one file
    * per partition per trigger; a year of that is millions of tiny
    * files and a scheduler-bound scan). One count to size the target,
    * one round-robin repartition, `maxRecordsPerFile` as the cap so a
    * future append can't silently exceed it.
    */
  def compact(df: DataFrame, dest: String, rowsPerFile: Long,
              partitionCols: Seq[String] = Nil): Unit = {
    require(rowsPerFile >= 1)
    if (partitionCols.nonEmpty) {
      // partitioned lake: compact WITHIN each partition directory and
      // keep the layout (round-robin mixing would silently drop the
      // planning-time pruning the layout exists for). Hash-clustering
      // on the partition cols writes one file per partition value,
      // split by maxRecordsPerFile; a single huge partition value is
      // the caller's skew signal, not this function's to fix.
      df.repartition(partitionCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCols: _*)
        .option("maxRecordsPerFile", rowsPerFile)
        .parquet(dest)
    } else {
      val n = math.min(
        math.max(1L, math.ceil(df.count().toDouble / rowsPerFile).toLong),
        Int.MaxValue.toLong).toInt
      df.repartition(n)
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", rowsPerFile)
        .parquet(dest)
    }
  }

  /** Range-clustered layout: repartition by range on `sortCols` and
    * sort within partitions before writing, so every parquet file
    * covers a narrow `sortCols` interval and its row-group min/max
    * statistics actually prune. This is the MergeTree ORDER BY
    * (timestamp) analog (clickhouse/migrations/001 orders logs by
    * time): a day-partitioned lake prunes to the day, but a range-
    * clustered file layout prunes WITHIN the day — a 1-hour predicate
    * over a 100 TB day touches ~1/24th of the files instead of all of
    * them. Z-order generalizes this to multiple dimensions; for the
    * time-dominant log/event workloads here, plain range clustering
    * on ts is the observed access pattern.
    */
  def writeRangeClustered(df: DataFrame, dest: String, files: Int,
                          sortCols: Seq[String]): Unit = {
    require(files >= 1 && sortCols.nonEmpty)
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .parquet(dest)
  }

  /** Write a DataFrame as a bucketed+sorted table: joins and
    * aggregations on `key` between tables bucketed the same way run
    * with NO shuffle exchange — the physical plan reads co-located
    * buckets directly. This is how the repeatedly-joined facts
    * (events⋈users, lineitem⋈orders) should be laid out at 100 TB.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Morton (Z-order) interleave of two non-negative keys, `bits` low
    * bits each → one locality-preserving long. The classic
    * magic-number bit spread (public domain "Bit Twiddling Hacks"),
    * expressed as plain shift/and/or column arithmetic so the whole
    * thing stays inside whole-stage codegen — no UDF.
    */
  def mortonInterleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16)
    def spread(x: Column): Column = {
      // confine to `bits` low bits, then spread: abcd → 0a0b0c0d
      val masked = x.bitwiseAND(lit((1L << bits) - 1))
      val s1 = masked.bitwiseOR(shiftleft(masked, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Quantile band of `value` against a sorted broadcast cut-point
    * array: the count of cuts <= value, computed as a two-level
    * counting fold (√n super-cuts to pick the chunk, then one chunk) —
    * O(2·√|cuts|) comparisons per row, pure codegen'd expression, no
    * window, no shuffle. Exact: chunks before the picked one are
    * wholly <= value (their last element is), chunks after are wholly
    * greater (their elements dominate the picked chunk's last), so
    * counting one chunk element-wise recovers the full count.
    */
  private[graft] def quantileBand(value: Column, cuts: Array[Double]): Column = {
    require(cuts.nonEmpty)
    val chunk = math.max(1, math.ceil(math.sqrt(cuts.length)).toInt)
    // super-cut j = last element of chunk j: if it is <= v, every
    // element of that chunk is <= v (sortedness), so only ONE chunk
    // needs element-wise counting
    val superCuts = (chunk - 1 until cuts.length by chunk).map(cuts).toArray
    val v = value.cast("double")
    def countLe(arr: Column, x: Column): Column =
      aggregate(arr, lit(0), (acc, c) => acc + when(c <= x, 1).otherwise(0))
    val coarse = countLe(typedLit(superCuts), v)
    val fine = countLe(slice(typedLit(cuts), coarse * chunk + 1, lit(chunk)), v)
    coarse * chunk + fine
  }

  /** Z-order layout plan: the frame range-partitioned + sorted on the
    * Morton code of two numeric filter columns, ready to write. Keys
    * are rank-compressed to the Morton domain with broadcast
    * approx-quantile cut points (the q19 pattern) so skewed raw values
    * still interleave evenly — ONE stat pass for both columns plus the
    * banding projection inside the scan; no global window anywhere
    * (the previous ntile form serialized the whole write set through
    * a single task, which at the 100 TB scale this utility exists for
    * does not finish).
    */
  def zOrderedLayout(df: DataFrame, files: Int,
                     colA: String, colB: String, bits: Int = 10): DataFrame = {
    // bits > 10 would only grow the broadcast cut arrays (1024 bands
    // per dimension is already >= 10x any realistic per-write file
    // count) — reject rather than silently cap, so callers know the
    // knob's real range
    require(files >= 1, s"files must be >= 1, got $files")
    require(bits >= 1 && bits <= 10, s"bits must be in [1, 10], got $bits")
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    // approxQuantile is numeric-only: band timestamps/dates through
    // their numeric image (the band is order-determined, so any
    // monotone cast gives the same boxes the old sort-based form did)
    def numeric(name: String): (String, Column, DataFrame => DataFrame) = {
      val dt = df.schema(name).dataType
      dt match {
        case _: org.apache.spark.sql.types.NumericType =>
          (name, col(name), identity)
        case _: org.apache.spark.sql.types.TimestampType |
             _: org.apache.spark.sql.types.DateType =>
          val surrogate = s"__zq_$name"
          (surrogate, col(surrogate),
            (d: DataFrame) => d.withColumn(surrogate, col(name).cast("double")))
        case other => throw new IllegalArgumentException(
          s"zOrderedLayout: column $name has type ${other.simpleString}; " +
          "z-order banding needs a numeric, timestamp, or date column")
      }
    }
    val (nameA, valA, prepA) = numeric(colA)
    val (nameB, valB, prepB) = numeric(colB)
    val prepped = prepB(prepA(df))
    val Array(cutsA, cutsB) =
      prepped.stat.approxQuantile(Array(nameA, nameB), probs, 1.0 / (4 * nb))
    // empty frame or all-null column → no cut points; a single band
    // (code 0) keeps the write valid instead of failing the layout job
    def bandOf(v: Column, cuts: Array[Double]): Column =
      if (cuts.isEmpty) lit(0) else quantileBand(v, cuts)
    prepped
      .withColumn("__z", mortonInterleave(
        bandOf(valA, cutsA), bandOf(valB, cutsB), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", s"__zq_$colA", s"__zq_$colB")
  }

  /** Z-order-clustered write — writeRangeClustered's multi-dimensional
    * form (the Delta/Iceberg OPTIMIZE ZORDER BY analog, built from
    * primitives): range-partition + sort on the Morton code of two
    * filter columns, so per-file min/max boxes are tight in BOTH
    * dimensions and row-group stats prune selective predicates on
    * either one.
    */
  def writeZOrdered(df: DataFrame, dest: String, files: Int,
                    colA: String, colB: String, bits: Int = 10): Unit =
    zOrderedLayout(df, files, colA, colB, bits)
      .write.mode(SaveMode.Overwrite)
      .parquet(dest)
}
