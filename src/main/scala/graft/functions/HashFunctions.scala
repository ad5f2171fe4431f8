package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Hash-sketch column functions: MinHash signatures, SimHash, winnowing
  * fingerprints.
  *
  * Mirrors recap-worker's sentence-level XXH3 near-duplicate filtering
  * (recap-worker/recap-worker/src/util/text.rs:11 hash_text/xxh3_64 and
  * text.rs:30 rolling_hash_windows — hash-based dedup before recap
  * compilation), generalized to the standard large-corpus sketches
  * an LLM-data pipeline needs.
  *
  * The per-row sketches (minhash signature, simhash) are native Catalyst
  * expressions (SketchExpressions.scala) — tight codegen loops, one hash
  * per shingle; banding/windowing compose native higher-order functions.
  * Sketch computation is embarrassingly parallel (per-row, no shuffle).
  */
object HashFunctions {

  /** MinHash signature of a shingle array: k permutations of the
    * one-shot XXH64 shingle hash via linear maps, computed by the native
    * `MinHashSignature` expression (codegen'd tight loop — the
    * higher-order-function formulation was ~100× slower). Empty input →
    * signature of Long.MaxValue sentinels.
    */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingleCol), k))

  /** Shingles → LSH band hashes in one native pass (signature + band
    * chaining fused; see MinHashBands for why the composed form is slow).
    */
  def minhashBands(shingleCol: Column, k: Int = 64, bands: Int = 16): Column =
    ColumnBridge.column(MinHashBands(ColumnBridge.expression(shingleCol), k, bands))

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

  /** 64-bit SimHash over a token array: per-bit ±1 vote counts from each
    * token's XXH64, sign → bit, via the native `SimHash64` expression.
    * Near-identical token multisets land within small hamming distance.
    */
  def simhash64(tokenCol: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenCol)))

  /** 16-bit chunks of a 64-bit simhash — pigeonhole blocking: two sigs
    * within hamming distance 3 share at least one of the 4 chunks.
    * Returns array<struct<chunk_idx:int, chunk_val:long>>.
    */
  def simhashChunks(sigCol: Column): Column =
    transform(sequence(lit(0), lit(3)),
      c => struct(
        c.cast("int").as("chunk_idx"),
        call_function("shiftright", sigCol, c * 16).bitwiseAND(0xFFFFL).as("chunk_val")))

  /** Random-hyperplane LSH band values of an embedding column — the
    * embedding-space analog of minhashBands (see RpSignBands): vectors
    * within a small angle collide in some band with high probability.
    * rowsPerBand is the block-size knob (buckets per band ≤ 2^r).
    */
  def rpSignBands(embCol: Column, bands: Int = 16, rowsPerBand: Int = 8): Column =
    ColumnBridge.column(RpSignBands(ColumnBridge.expression(embCol), bands, rowsPerBand))

  /** Winnowing fingerprints (rolling min-hash over windows of token
    * hashes, window w): the document-fingerprint scheme of MOSS. Returns
    * the distinct, sorted fingerprint array (native expression — the
    * HOF form copied the hash array per window).
    */
  def winnowFingerprints(tokenCol: Column, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(tokenCol), w))
}
