package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The reference stores article imagery/attachments by URL and
  * enriches them out-of-band; at pipeline scale the idiom is an opaque
  * `binary` column with typed metadata and a partition-wise
  * decode/feature step. The Spark-side plumbing here — schema, batch
  * iteration via mapPartitions, feature struct — is real and tested;
  * the actual codec call is STUBBED (deterministic fake decoder) because
  * no image/audio libraries ship in this container. Swap
  * `stubDecode` for a real codec (JNI/FFI per partition) without
  * touching the surrounding plan.
  */
object BinaryMeta {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, checksum: Long)

  /** STUB decoder: deterministic pseudo-dimensions derived from the
    * payload bytes. Replace with a real codec; the signature —
    * bytes in, (width, height) out, called once per row inside a
    * partition batch — is the contract.
    */
  private[multimodal] def stubDecode(payload: Array[Byte]): (Int, Int) = {
    val h = payload.foldLeft(17L)((acc, b) => acc * 31 + b)
    (256 + (h % 1024).toInt.abs, 256 + ((h >> 10) % 1024).toInt.abs)
  }

  /** Partition-wise feature extraction. mapPartitions (not map) so a
    * real decoder can amortize per-batch init (model load, codec
    * context) across the partition — the Spark-idiomatic shape of the
    * reference's enrichment sidecars.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition init would go here (codec context, model handle)
      rows.map { r =>
        val (w, h) = stubDecode(r.payload)
        val checksum = r.payload.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
        MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, checksum)
      }
    }
  }

  case class FrameRow(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic stride frame sampling for video payloads: every
    * `everyN`-th frame up to `maxFrames` per asset — the
    * one-row-to-many-frames fan-out a video pipeline runs before
    * per-frame feature extraction. The frame SLICING is stubbed (fixed
    * 64-byte stride standing in for a container demuxer); the shape —
    * flatMap inside mapPartitions so a real demuxer can hold its codec
    * context across the partition, bounded output per asset so one
    * long video cannot blow up a task — is the contract.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 10,
                   maxFrames: Int = 8): Dataset[FrameRow] = {
    require(everyN >= 1 && maxFrames >= 1)
    implicit val enc = Encoders.product[FrameRow]
    media.filter(col("kind") === "video" && length(col("payload")) > 0)
      .mapPartitions { rows =>
      // per-partition demuxer init would go here
      rows.flatMap { r =>
        val frameBytes = 64 // stub frame size; a demuxer reads real frame boundaries
        val nFrames = math.max(1, r.payload.length / frameBytes)
        (0 until nFrames by everyN).take(maxFrames).iterator.map { i =>
          FrameRow(r.media_id, i,
            r.payload.slice(i * frameBytes, math.min((i + 1) * frameBytes, r.payload.length)))
        }
      }
    }
  }

  case class AudioWindow(media_id: Long, window_idx: Int,
                         start_sample: Long, n_samples: Int,
                         window_bytes: Array[Byte])

  /** mm04: overlapping audio window chunking — the fixed-length,
    * strided windowing every audio model front-end needs (Whisper-style
    * 30 s windows with overlap; VAD/embedding chunkers): window of
    * `windowSamples` advancing by `hopSamples` (consecutive windows
    * share windowSamples − hopSamples samples), bounded at
    * `maxWindows` per asset so one long recording cannot blow up a
    * task. The DECODE is stubbed (raw bytes read as 16-bit PCM — no
    * audio codecs in this container); the flatMap-inside-mapPartitions
    * shape, the overlap arithmetic, and the bounded fan-out are the
    * real contract a resampling decoder drops into.
    */
  def chunkAudio(media: Dataset[MediaRow], windowSamples: Int = 480,
                 hopSamples: Int = 320, maxWindows: Int = 16): Dataset[AudioWindow] = {
    require(windowSamples >= 1 && hopSamples >= 1 && maxWindows >= 1)
    implicit val enc = Encoders.product[AudioWindow]
    val bytesPerSample = 2 // stub: PCM16 mono; a real decoder resamples
    media.filter(col("kind") === "audio" && length(col("payload")) >= bytesPerSample)
      .mapPartitions { rows =>
        // per-partition decoder init would go here
        rows.flatMap { r =>
          val totalSamples = r.payload.length / bytesPerSample
          Iterator.from(0)
            .map(_.toLong * hopSamples)
            .takeWhile(start => start < totalSamples)
            .take(maxWindows)
            .zipWithIndex
            .map { case (start, idx) =>
              val n = math.min(windowSamples.toLong, totalSamples - start).toInt
              AudioWindow(r.media_id, idx, start, n,
                r.payload.slice((start * bytesPerSample).toInt,
                  ((start + n) * bytesPerSample).toInt))
            }
        }
      }
  }

  /** mm03: perceptual-hash near-dup pairs over binary payloads — the
    * image-dedup step a multimodal training pipeline runs (same role
    * as tx07/tx08 for text; CLIP-dedup/pHash in LAION-style curation).
    * The HASH is stubbed (a deterministic 64-bit fold of the payload
    * standing in for a real pHash over decoded pixels — no codecs in
    * this container); everything downstream is the REAL scale
    * machinery: 16-bit-chunk pigeonhole blocking over the 64-bit
    * signature, candidate equi-join on chunk, exact hamming verify on
    * candidates only — identical plan shape to Dedup.simhashPairs, so
    * swapping in a real pHash changes zero lines of the distribution
    * strategy.
    *
    * maxHamming defaults to 3 because the 4×16-bit chunk blocking only
    * GUARANTEES recall for hamming ≤ 3 (pigeonhole: 4+ differing bits
    * can straddle all four chunks and share none). Raising maxHamming
    * without narrowing the chunks makes recall above 3 best-effort.
    */
  def phashPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    val sigs = media.mapPartitions { rows =>
      // per-partition codec init would go here; stub pHash: stable
      // 64-bit FNV-style fold of the payload
      rows.map { r =>
        (r.media_id, r.payload.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L))
      }
    }.toDF("media_id", "sig")
    phashPairsFromSigs(sigs, maxHamming)
  }

  /** The candidate machinery behind phashPairs, over a caller-supplied
    * (media_id, sig) frame — the seam a real pHash plugs into, and the
    * seam the recall spec drives with PLANTED signatures: the
    * chunk-blocked path must find exactly the brute-force pair set at
    * hamming ≤ 3 (the pigeonhole guarantee is exactness there, not
    * best-effort recall).
    */
  def phashPairsFromSigs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = sigs.select(col("media_id"), col("sig"),
      explode(graft.functions.HashFunctions.simhashChunks(col("sig"))).as("chunk"))
    val a = chunked.select(col("chunk"), col("media_id").as("media_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk"), col("media_id").as("media_b"), col("sig").as("sig_b"))
    a.join(b, "chunk")
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("media_a", "media_b", "hamming")
  }

  /** Metadata rollup over extracted features — the queryable side. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.groupBy("kind")
      .agg(count(lit(1)).as("n"),
           avg("n_bytes").as("avg_bytes"),
           max("width").as("max_width"),
           max("height").as("max_height"))
}
