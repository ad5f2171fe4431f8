package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL ingestion with a corrupt-record quarantine.
  *
  * The reference's streams are newline-delimited JSON end to end
  * (rask-log-forwarder ships docker JSON logs; mq-hub messages are
  * JSON envelopes) and a malformed line in a 100 TB feed must neither
  * kill the job (FAILFAST) nor vanish silently (DROPMALFORMED). Parse
  * with `from_json` (null struct on malformed input), split good rows
  * from a quarantine that keeps the RAW line for replay — the
  * dead-letter pattern, as one scan-side projection with no shuffle.
  * Works identically on a static DataFrame and a readStream source.
  */
object JsonLines {

  private val corruptCol = "_corrupt_record"

  /** Tag each raw line with its parse result. PERMISSIVE from_json
    * yields an all-null struct (not a null) for malformed input, so
    * corruption is detected via the columnNameOfCorruptRecord channel:
    * `rec._corrupt_record` is non-null exactly for malformed lines.
    */
  def tagged(lines: DataFrame, schema: StructType, lineCol: String = "value"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol), s"schema already has $corruptCol")
    val withCorrupt = schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    lines.withColumn("rec",
      from_json(col(lineCol), withCorrupt,
        Map("columnNameOfCorruptRecord" -> corruptCol)))
  }

  /** Blank/whitespace-only input makes from_json return a NULL struct
    * (not a corrupt-tagged row) — those lines are junk too and must
    * land in the quarantine, not surface as all-null "good" rows.
    */
  private def isGood(c: org.apache.spark.sql.Column) =
    c.isNotNull && c.getField(corruptCol).isNull

  /** Parsed good rows, record fields flattened. */
  def parsed(lines: DataFrame, schema: StructType, lineCol: String = "value"): DataFrame =
    tagged(lines, schema, lineCol)
      .filter(isGood(col("rec")))
      .select(col("rec.*")).drop(corruptCol)

  /** The dead-letter side: raw lines that failed to parse (including
    * blank lines), kept verbatim for replay after a parser fix.
    */
  def quarantine(lines: DataFrame, schema: StructType, lineCol: String = "value"): DataFrame =
    tagged(lines, schema, lineCol)
      .filter(!isGood(col("rec")))
      .select(col(lineCol).as("raw_line"))
}
