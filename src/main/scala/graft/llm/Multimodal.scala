package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches.
  *
  * The Spark-side design is real and tested: schema, partitioning, batch
  * iteration, metadata extraction as codegen'd expressions. The actual media
  * decode is STUBBED (no image/audio libraries in this environment) behind
  * [[FakeDecoder]] — a deterministic stand-in with the same signature a real
  * decoder (javax.imageio / ffmpeg-bound) would have. Swap `decodeImage`
  * for a real implementation and nothing else changes.
  *
  * Scale notes: binary payloads ride in the same parquet row group as their
  * metadata; `maxPartitionBytes` bounds per-task memory; decode happens via
  * `mapPartitions` so any per-batch native context (decoder handles, GPU
  * sessions) is amortized across the partition, the same shape as
  * `mapInPandas` batching in PySpark.
  */
object Multimodal {

  /** A media row: opaque bytes + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded media metadata (what a real decoder would return). */
  case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sha: String)

  /** Real, pure-JVM image header parsing — no decode libraries needed.
    * Reads (width, height) straight out of the container header: PNG's IHDR
    * chunk (first chunk by spec, big-endian dims at bytes 16/20) and JPEG's
    * SOFn frame segment (scan the marker stream for 0xC0–0xCF excluding
    * DHT/JPG/DAC, dims at segment offset +5/+7). Anything unrecognized or
    * truncated returns None and callers fall back to [[FakeDecoder]] (the
    * audio/video paths, and the test corpus's text-bytes stand-ins).
    */
  object ImageHeaders {
    def dimensions(b: Array[Byte]): Option[(Int, Int)] =
      if (isPng(b)) pngDims(b)
      else if (isJpeg(b)) jpegDims(b)
      else None

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

    private def pngDims(b: Array[Byte]): Option[(Int, Int)] =
      // PNG spec: IHDR MUST be the first chunk — type at bytes 12–15,
      // then width/height as big-endian u32
      if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        Some((be32(b, 16), be32(b, 20)))
      else None

    private def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 9 <= b.length) {
        if (u8(b, i) != 0xff) return None // marker stream desynced
        val marker = u8(b, i + 1)
        if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2 // standalone
        else {
          // SOF0–SOF15 carry frame dims; 0xC4/0xC8/0xCC are DHT/JPG/DAC
          if (marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
            return Some((be16(b, i + 7), be16(b, i + 5)))
          i += 2 + be16(b, i + 2) // skip segment: 2 marker bytes + payload len
        }
      }
      None
    }
  }

  /** STUB decoder: deterministic fake dimensions derived from the payload.
    * A real implementation would parse the container header here.
    */
  object FakeDecoder {
    def decodeImage(bytes: Array[Byte]): (Int, Int, Int) = {
      // STUB: real decode unavailable in this environment; deterministic fake:
      val n = bytes.length
      val w = 64 + (n % 1216)
      val h = 64 + ((n * 7) % 656)
      val frames = if (n % 3 == 0) 1 else 1 + (n % 30)
      (w, h, frames)
    }

    /** STUB resample (real one unavailable in this environment):
      * deterministic fake preserving the real contract — output size ∝
      * target area, content-derived bytes. Empty input yields the
      * zero-filled output (a real resampler emits a black canvas).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(1, (w * h) / 64))
      if (bytes.nonEmpty) {
        var i = 0
        while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
      }
      out
    }
  }

  /** Build a media table from the documents corpus (text bytes stand in for
    * media payloads — the plumbing under test is schema/partition/batch).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("content"))

  /** Metadata extraction as pure expressions (no decode): byte length,
    * content hash, head-of-payload hex — the cheap scan-time envelope pass
    * that runs *before* any expensive decode is scheduled.
    */
  def envelope(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("content")).as("n_bytes"),
      sha2(col("content"), 256).as("content_sha"),
      hex(substring(col("content"), 1, 16)).as("head16"))

  /** One sampled frame of a media payload. */
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling (video → every-Nth-frame rows): the flatMap shape a
    * real extractor has — one input row fans out to its sampled frames,
    * decoder context per partition, per-task memory bounded by
    * `maxPartitionBytes` on the input side and the sampling rate on the
    * output side. Frame bytes themselves come from the stub decoder.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyN: Int = 10): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val (_, _, frames) = FakeDecoder.decodeImage(r.content)
          (0 until frames by everyN).iterator.map { i =>
            val len = math.max(1, r.content.length)
            val start = (i * 17) % len
            val end = math.min(len, start + 32)
            Frame(r.media_id, i, java.util.Arrays.copyOfRange(r.content, start, end))
          }
        }
      }
  }

  /** Batched resize pass (bytes → bytes at target dimensions). */
  case class Resized(media_id: Long, width: Int, height: Int, content: Array[Byte])
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[Resized] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions(rows => rows.map(r =>
        Resized(r.media_id, w, h, FakeDecoder.resize(r.content, w, h))))
  }

  /** Feature extraction (the CLIP-encoder slot): a fixed-width float vector
    * per media row, model session per partition. The stub derives 16
    * deterministic floats in [-1, 1] from the content digest — identical
    * payloads get identical vectors, so the output composes directly with
    * the embedding operators (`Embeddings.lshBucket` / `annTopK` /
    * `dedupInCells`): decode → embed → ANN dedup is one pipeline.
    */
  case class MediaFeatures(media_id: Long, embedding: Array[Float])
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition model session would be initialized here
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          digest.reset()
          val d = digest.digest(r.content)
          val vec = Array.tabulate(16)(i =>
            ((((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)) - 32768) / 32768.0f)
          MediaFeatures(r.media_id, vec)
        }
      }
  }

  /** Batched decode pass: mapPartitions over the typed Dataset so decoder
    * state is per-partition, not per-row. Image dimensions come from the
    * REAL header parse ([[ImageHeaders]]: PNG IHDR / JPEG SOF) whenever the
    * payload is a recognized container; only unrecognized payloads (audio/
    * video, and the test corpus's text stand-ins) fall back to the stub.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder context would be initialized here
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { r =>
          val (w, h, f) = ImageHeaders.dimensions(r.content) match {
            case Some((pw, ph)) => (pw, ph, 1) // still image: one frame
            case None           => FakeDecoder.decodeImage(r.content)
          }
          digest.reset()
          val sha = digest.digest(r.content).map("%02x".format(_)).mkString
          MediaMeta(r.media_id, r.kind, r.content.length.toLong, w, h, f, sha)
        }
      }
  }
}
