package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic rounding helpers.
  *
  * `round(num/den, dp)` on a double quotient is a latent determinism
  * bug: when the quotient's shortest decimal repr ends in "…5" at the
  * target scale (e.g. 41/640 at 6 dp), Spark's BigDecimal HALF_UP on
  * the binary double and DuckDB's round disagree, and the flip
  * depends on the data distribution, not the code (tx21 flipped
  * between two sf0.1 runs of one build; the round-4 review found
  * divergent pairs in dq07/ev30 before data hit them).
  *
  * The discipline (worked examples tx21/tx25/tx41/ev30/rag02): scale
  * the numerator into 10^dp units FIRST, round at scale 0 — exact
  * half-INTEGERS are representable doubles, so both engines' half-up
  * rounds agree — then divide the resulting long by 10^dp. The final
  * division is one IEEE op both engines perform identically. Oracle
  * SQL must mirror the exact op sequence:
  * `CAST(round(num * 1e{dp} / den) AS BIGINT) / 1e{dp}`.
  */
object Numeric {

  /** `round(num/den, dp)` as a scale-0 round in 10^dp units.
    * Oracle lockstep: `CAST(round(num * 1e{dp} / den) AS BIGINT) / 1e{dp}`.
    */
  def microRatio(num: Column, den: Column, dp: Int): Column = {
    val unit = math.pow(10, dp)
    round(num * unit / den, 0).cast("long") / unit
  }

  /** The 10^dp-unit long itself (for boundary comparisons: gate on the
    * exact integer, never on the re-divided double).
    */
  def microUnits(num: Column, den: Column, dp: Int): Column =
    round(num * math.pow(10, dp) / den, 0).cast("long")

  /** `round(x, dp)` of an already-computed double as a scale-0 round —
    * for log/exp outputs where the quotient form doesn't apply.
    * Oracle lockstep: `CAST(round(x * 1e{dp}) AS BIGINT) / 1e{dp}`.
    */
  def microRound(x: Column, dp: Int): Column = {
    val unit = math.pow(10, dp)
    round(x * unit, 0).cast("long") / unit
  }

  /** SQL-side twin of [[microRatio]] for oracle strings. */
  def microRatioSql(num: String, den: String, dp: Int): String =
    s"CAST(round(($num) * 1e$dp / ($den)) AS BIGINT) / 1e$dp"

  /** SQL-side twin of [[microRound]] for oracle strings. */
  def microRoundSql(x: String, dp: Int): String =
    s"CAST(round(($x) * 1e$dp) AS BIGINT) / 1e$dp"

  /** Per-row exact integer 10^dp units of a double. A per-row double is
    * bit-identical across engines (same source bytes / same op chain),
    * and a scale-0 round of identical doubles always agrees — so the
    * long is identical too, and SUMS of it are exact and independent of
    * summation order. This is the first step of every migrated
    * aggregate: sum longs, round once at scale 0 at the end.
    * Oracle lockstep: `CAST(round(x * 1e{dp}) AS BIGINT)`.
    */
  def units(x: Column, dp: Int): Column =
    round(x * math.pow(10, dp), 0).cast("long")

  /** Money cents — [[units]] at dp=2. Oracle: `CAST(round(x * 100) AS BIGINT)`. */
  def cents(x: Column): Column = units(x, 2)

  /** SQL-side twin of [[units]] for oracle strings. */
  def unitsSql(x: String, dp: Int): String =
    s"CAST(round(($x) * 1e$dp) AS BIGINT)"

  /** SQL-side twin of [[cents]] for oracle strings. */
  def centsSql(x: String): String = s"CAST(round(($x) * 100) AS BIGINT)"
}
