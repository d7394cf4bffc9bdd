package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque binary
  * columns with typed metadata, plus batch decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side contract — schema, partitioning, batch shape — is real
  * and tested. The *decoders themselves are STUBS*: this container has no
  * image/audio codecs, so `decodeFeatures` derives a deterministic fake
  * feature vector from the bytes (hash-seeded), clearly marked below.
  * Swapping in a real codec changes only the body of `stubDecode`; the
  * distributed plumbing (binary columns travel with their partition, the
  * decoder runs once per row inside mapPartitions with per-partition
  * library setup, output schema is fixed) is production-shaped.
  */
object Multimodal {

  /** One media row: the analogue of the documents table for binary data. */
  case class MediaRow(media_id: Long, kind: String, media: Array[Byte],
      format: String, width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** ======== STUB ========
    * Deterministic fake decode: a real implementation would decode the
    * media and run a feature extractor; this derives `dim` floats from a
    * rolling 64-bit hash of the payload so tests are reproducible without
    * codecs. Replace this body (only) for production. */
  private[multimodal] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // FNV-ish rolling hash of the payload
    bytes.foreach(b => h = h * 31 + (b & 0xff))
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      i += 1
    }
    out
  }

  /** Batch feature extraction over the media column. mapPartitions so any
    * real decoder initializes its (expensive) native context once per
    * partition, not once per row — the Scala analogue of a batched pandas
    * UDF. The operation is a pure map: no shuffle, scales with partitions. */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (native lib handle, model)
      rows.map(r => MediaFeatures(r.media_id, r.kind, r.media.length.toLong,
        stubDecode(r.media, dim)))
    }
  }

  /** Frame sampling: slice the payload into fixed-size frames with a
    * stride, as an array<binary> column — pure Column expressions, no
    * decode needed for container formats with fixed frame layout. */
  def frameSample(media: org.apache.spark.sql.Column, frameSize: Int,
      stride: Int): org.apache.spark.sql.Column = {
    // number of full frames: floor((len - frameSize) / stride) + 1, if any
    val nFrames = (floor((length(media) - frameSize).cast("double") / stride) + 1).cast("int")
    when(length(media) >= frameSize,
      transform(sequence(lit(1), nFrames),
        i => substr(media, (i - lit(1)) * stride + 1, lit(frameSize))))
      .otherwise(array().cast("array<binary>"))
  }

  /** Resize metadata after a (stub) spatial downscale: the metadata math
    * is real; the pixel transform would live in the decoder. */
  def resizeMeta(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    df.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Deterministic synthetic media table for tests/demos (seeded). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val bytes = new Array[Byte](64 + rnd.nextInt(192))
      rnd.nextBytes(bytes)
      val kind = Seq("image", "audio", "video")(i % 3)
      MediaRow(i.toLong, kind, bytes, Seq("png", "wav", "mp4")(i % 3),
        width = 2 + rnd.nextInt(1024), height = 2 + rnd.nextInt(1024),
        sample_rate = 8000 + 100 * rnd.nextInt(80))
    }
    spark.createDataset(rows)
  }
}
