package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) ride through the
  * pipeline as opaque `binary` payload columns with typed metadata
  * alongside. The Spark-side contract — schema, partition-parallel batch
  * decode via `mapPartitions`, typed output — is real and tested; the
  * actual codec call is STUBBED (this container ships no image/audio
  * libraries) behind [[fakeDecode]], a deterministic stand-in keyed on
  * payload bytes. A production build replaces `fakeDecode`'s body with
  * e.g. a JNI image decoder; nothing else changes.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(
      doc_id: Long,
      octets: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      checksum: Long)

  /** STUB decoder: deterministic pseudo-metadata from payload size and
    * first byte. Replace with a real codec (??? in spirit) in production.
    */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val octets = payload.length.toLong
    val first = if (payload.nonEmpty) (payload(0) & 0xff).toLong else 0L
    MediaMeta(
      doc_id = docId,
      octets = octets,
      width = 64L + octets % 576L,
      height = 64L + (octets * 7L) % 448L,
      n_frames = 1L + first % 8L,
      checksum = (octets * 31L + first) % 997L)
  }

  /** Partition-parallel "decode": binary payloads in, typed metadata out.
    * One decoder instantiation per partition (the mapPartitions shape
    * that amortizes codec setup at scale), no shuffle.
    */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Documents → fake media payloads (UTF-8 bytes of the text stand in
    * for an image blob) → decoded metadata table.
    */
  def documentMedia(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"))).toDF()

  /** Resized media row: target dims plus the resized payload. */
  final case class Resized(
      doc_id: Long, out_width: Long, out_height: Long, out_octets: Long,
      resized_payload: Array[Byte])

  /** "Resize" media payloads to target dimensions — the STUB keeps one
    * byte per `stride = ceil(octets / (w·h))` input bytes (a deterministic
    * stand-in for pixel resampling); a real build swaps the loop body for
    * a codec call. Same partition-parallel batch shape as [[decodeMeta]]:
    * binary in, binary out, no shuffle, decoder init amortized per
    * partition.
    */
  def resize(
      spark: SparkSession, payloads: DataFrame, w: Int, h: Int): Dataset[Resized] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val target = w.toLong * h
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val stride = math.max(1L, (n + target - 1) / target)
          val outLen = ((n + stride - 1) / stride).toInt
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) { out(i) = bytes((i * stride).toInt); i += 1 }
          Resized(id, w.toLong, h.toLong, outLen.toLong, out)
        }
      }
  }

  /** Sampled frame row: byte-range coordinates into the payload plus the
    * extracted slice. A real video path replaces the slice arithmetic
    * with codec seeks; the 1→N row-expansion shape, the binary column
    * riding along, and the sampling predicate are the Spark-side contract.
    */
  final case class Frame(
      doc_id: Long, frame_idx: Long, frame_off: Long, frame_len: Long,
      frame_payload: Array[Byte])

  /** Frame sampling over "video" payloads: each payload splits into its
    * decoded frame count (STUB: [[fakeDecode]]'s n_frames), every
    * `everyN`-th frame is kept, and the frame's byte range is sliced out.
    * Narrow row expansion — no shuffle; downstream feature extraction
    * (resize, embed) maps over `frame_payload` with the same
    * `mapPartitions` shape as [[decodeMeta]].
    */
  def frameSample(
      spark: SparkSession, payloads: DataFrame, everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    payloads.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val meta = fakeDecode(id, bytes)
          val flen = meta.octets / meta.n_frames
          (0L until meta.n_frames).iterator
            .filter(_ % everyN == 0)
            .map { k =>
              val off = k * flen
              // the LAST frame absorbs the octets % n_frames remainder so
              // the frames partition the payload with no dropped bytes
              val len =
                if (k == meta.n_frames - 1) meta.octets - off else flen
              Frame(id, k, off, len,
                java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt))
            }
        }
      }
  }
}
