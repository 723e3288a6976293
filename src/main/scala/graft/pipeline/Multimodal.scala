package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY columns with typed
  * metadata, batch-decoded per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[DecodeStub.decode]]); everything
  * around it — schema, binary columns, partition-batched iteration, typed
  * output — is the real Spark plumbing a codec would drop into.
  *
  * Scale notes: decode runs inside `mapPartitions` (the Scala analog of a
  * pandas-batch UDF): one decoder init per partition, streaming iterator,
  * no per-row lambda dispatch, no driver involvement. Re-partition by size
  * before decoding if blob sizes are skewed.
  */
object Multimodal {

  final case class MediaBlob(doc_id: Long, media_type: String, blob: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Fake media table from documents: the UTF-8 text bytes stand in for an
    * encoded media payload (deterministic; oracle-reproducible).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("blob"))

  /** STUB decoder: a real build links an image/audio codec here. The fake
    * derives deterministic "decoded" metadata from the payload bytes so the
    * pipeline shape (and its oracle) is testable without codecs.
    */
  object DecodeStub {
    def decode(b: MediaBlob): MediaMeta = {
      val n = b.blob.length.toLong
      // ??? real codec goes here — e.g. javax.imageio / ffmpeg binding
      MediaMeta(
        doc_id = b.doc_id,
        media_type = b.media_type,
        n_bytes = n,
        digest = {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.digest(b.blob).map("%02x".format(_)).mkString
        },
        width = (n % 640).toInt,
        height = (n * 7 % 480).toInt,
        n_frames = if (b.media_type == "video") (n % 16).toInt else 1)
    }
  }

  /** Partition-batched decode: one decoder per partition, streaming. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      // per-partition decoder init would happen here
      it.map(DecodeStub.decode)
    }
  }
}
