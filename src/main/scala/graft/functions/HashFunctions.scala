package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-sketch column functions: MinHash signatures, SimHash, winnowing
  * fingerprints.
  *
  * Mirrors recap-worker's sentence-level XXH3 near-duplicate filtering
  * (recap-worker/recap-worker/src/util/text.rs — hash-based dedup before
  * recap compilation), generalized to the standard large-corpus sketches
  * an LLM-data pipeline needs.
  *
  * Everything composes native higher-order functions over `xxhash64`, so
  * signatures are computed inside codegen with no UDF boxing, and the
  * sketch computation is embarrassingly parallel (per-row, no shuffle).
  */
object HashFunctions {

  /** MinHash signature of a shingle array: k permutations simulated by
    * seeding xxhash64 with the permutation index. Returns array<long>
    * of length k (null-min avoided by empty-array guard: empty input →
    * signature of Long.MaxValue sentinels).
    */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => coalesce(
        array_min(transform(shingleCol, sh => xxhash64(concat(i.cast("string"), lit(":"), sh)))),
        lit(Long.MaxValue)))

  /** LSH band hashes of a minhash signature: b bands of r rows each —
    * docs sharing any band hash are candidate pairs. Returns
    * array<long> of length b.
    */
  def lshBands(sigCol: Column, b: Int = 16, r: Int = 4): Column =
    transform(sequence(lit(0), lit(b - 1)),
      band => xxhash64(
        concat(band.cast("string"), lit("|"),
          concat_ws(",", transform(slice(sigCol, band * r + lit(1), lit(r)), x => x.cast("string")))))
    )

  /** 64-bit SimHash over a token array: per-bit vote counts from each
    * token's xxhash64, sign → bit. Near-identical token multisets land
    * within small hamming distance.
    */
  def simhash64(tokenCol: Column): Column = {
    val votes = aggregate(
      tokenCol,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1) === 1, 1L).otherwise(-1L)),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, j) => struct(v.as("v"), j.as("j"))),
      lit(0L),
      (acc, p) => when(p.getField("v") > 0,
        acc.bitwiseOR(call_function("shiftleft", lit(1L), p.getField("j")))).otherwise(acc))
  }

  /** 16-bit chunks of a 64-bit simhash — pigeonhole blocking: two sigs
    * within hamming distance 3 share at least one of the 4 chunks.
    * Returns array<struct<chunk_idx:int, chunk_val:long>>.
    */
  def simhashChunks(sigCol: Column): Column =
    transform(sequence(lit(0), lit(3)),
      c => struct(
        c.cast("int").as("chunk_idx"),
        call_function("shiftright", sigCol, c * 16).bitwiseAND(0xFFFFL).as("chunk_val")))

  /** Winnowing fingerprints (rolling min-hash over windows of token
    * hashes, window w): the document-fingerprint scheme of MOSS. Returns
    * the distinct, sorted fingerprint array.
    */
  def winnowFingerprints(tokenCol: Column, w: Int = 4): Column = {
    val hashes = transform(tokenCol, t => xxhash64(t))
    array_sort(array_distinct(
      when(size(hashes) < w, array(array_min(hashes)))
        .otherwise(transform(
          sequence(lit(1), size(hashes) - lit(w - 1)),
          i => array_min(slice(hashes, i, lit(w)))))))
  }
}
