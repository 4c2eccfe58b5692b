package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal (image/audio/video) plumbing for a training-data pipeline.
  *
  * Media rides as an opaque `binary` column plus a typed metadata struct;
  * decode / feature-extraction / resize / frame-sampling run as typed
  * `mapPartitions` stages (the JVM-side equivalent of `mapInPandas`
  * batches: one iterator per partition, amortized per-batch setup). The
  * actual codec calls are STUBBED — this container has no image/audio
  * libraries — behind [[Codecs]], with deterministic fakes so the
  * Spark-side schema, partitioning, and batch shape are real and tested.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, feature: Array[Float], featureNorm: Double)
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUBBED codec boundary. In production these call the real decoders
    * (libjpeg/ffmpeg/…); here they are deterministic functions of the bytes
    * so tests and oracles are stable. */
  object Codecs {
    /** Stub "decode + embed": dim floats derived from a rolling byte hash. */
    def decodeToFeatures(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic fake — NOT a real decoder
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      var d = 0
      while (d < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(d) = ((h % 1000003L).toDouble / 1000003.0).toFloat
        d += 1
      }
      out
    }

    /** Stub resize: keeps a deterministic prefix ("thumbnail bytes"). */
    def resize(content: Array[Byte], maxBytes: Int): Array[Byte] =
      content.take(maxBytes)

    /** Stub frame sampling: n evenly-spaced byte slices ("frames"). */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (content.isEmpty) return Seq.empty
      val step = math.max(1, content.length / n)
      (0 until math.min(n, content.length)).map { i =>
        content.slice(i * step, math.min(content.length, i * step + step))
      }
    }
  }

  /** Deterministic media table synthesized from the documents table (text
    * bytes as payload) — the test/bench stand-in for a real media lake. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        (col("n_chars") % 1024).cast("int").as("width"),
        (col("n_chars") % 768).cast("int").as("height"),
        (col("n_chars") * 40L).as("durationMs")).as("meta"))

  /** Decode + feature-extract, one partition at a time. Repartition first so
    * decode work spreads evenly (binary sizes can be skewed). */
  def extractFeatures(media: DataFrame, dim: Int = 16, partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions) else media
    balanced.as[MediaRecord].mapPartitions { it =>
      it.map { m =>
        val f = Codecs.decodeToFeatures(m.content, dim)
        val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
        MediaFeatures(m.media_id, m.kind, f, norm)
      }
    }
  }

  /** Frame-sample video media into one row per frame (explode shape). */
  def sampleVideoFrames(media: DataFrame, framesPerVideo: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRecord].flatMap { m =>
      Codecs.sampleFrames(m.content, framesPerVideo).zipWithIndex.map {
        case (bytes, i) => MediaFrame(m.media_id, i, bytes)
      }
    }
  }

  /** Resize stage (stub): replaces content with the "thumbnail". */
  def resizeAll(media: DataFrame, maxBytes: Int = 64): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(m => m.copy(content = Codecs.resize(m.content, maxBytes)))
    }
  }
}
