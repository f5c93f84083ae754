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
}
