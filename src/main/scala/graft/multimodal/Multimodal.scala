package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for 100 TB training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; per-record decode/feature work runs partition-wise so a
  * cluster processes shards independently (the Scala analogue of
  * `mapInPandas` batch processing).
  *
  * IMAGE decode is REAL (JDK `javax.imageio` via [[MediaCodec]]: header
  * sniff for width/height/format, full raster decode for features —
  * PNG/JPEG/BMP/GIF). Audio/video decode remains a clearly-marked
  * deterministic fake in [[MediaStubs.decodeBytes]] (no ffmpeg-class
  * library exists in the JDK); everything around it is real: schemas,
  * magic-byte sniffing, batch iteration, 1→N frame explosion, metadata
  * propagation, feature vectors.
  */
object MediaModel {
  /** Typed metadata carried alongside the raw bytes. */
  final case class MediaMeta(
      width: Int, height: Int, channels: Int,
      sampleRate: Int, durationMs: Long, codec: String)

  /** One media record: id + modality + raw bytes + metadata. */
  final case class MediaRecord(
      mediaId: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  /** Decoded frame/clip features: one row per sampled frame. */
  final case class MediaFeature(
      mediaId: Long, kind: String, frameIndex: Int, frameTsMs: Long,
      features: Array[Float])

  implicit val metaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
  implicit val recordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featureEnc: Encoder[MediaFeature] = Encoders.product[MediaFeature]
}

/** Columnar (codegen-friendly) media functions — no decode required. */
object MediaFunctions {

  /** Magic-byte prefixes for modality sniffing (real format signatures). */
  val Magics: Seq[(String, String)] = Seq(
    "ffd8ff" -> "image/jpeg",
    "89504e47" -> "image/png",
    "52494646" -> "audio/wav", // RIFF
    "494433" -> "audio/mp3", // ID3
    "000000186674797" -> "video/mp4", // ....ftyp (common prefix)
    "1a45dfa3" -> "video/webm")

  /** Sniff the modality from the first bytes — pure column expression,
    * identical in DuckDB via hex(). */
  def sniffKind(bytes: Column): Column = {
    val prefix = lower(hex(substring(bytes, 1, 8)))
    Magics.foldRight(lit("application/octet-stream")) { case ((magic, kind), acc) =>
      when(prefix.startsWith(magic), lit(kind)).otherwise(acc)
    }
  }

  def byteLength(bytes: Column): Column = length(bytes)

  /** Stable content fingerprint of the raw bytes. */
  def contentHash(bytes: Column): Column = md5(bytes)
}

/** Partition-wise decode/transform pipeline. Batch shape mirrors
  * `mapInPandas`: the iterator is consumed lazily per partition, never
  * materialized on the driver. Image bytes decode for REAL through
  * [[MediaCodec]]; only audio/video fall back to the deterministic
  * fake. */
object MediaStubs {
  import MediaModel._

  /** Decode bytes to a `dim`-length feature vector. Bytes a JDK image
    * reader accepts (PNG/JPEG/BMP/GIF) decode for REAL — a block-mean
    * luma grid over the actual raster ([[MediaCodec.decodeLumaGrid]]).
    * Everything else (audio/video — no JDK codec exists) takes the
    * deterministic fake: a reproducible pseudo-signal hashed from the
    * uppercase hex rendering of the bytes, mirrorable exactly as
    * `md5(hex(blob))` in DuckDB, each component k/128 (a power-of-two
    * quotient, bit-exact in float and double across engines). */
  def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    val grid = math.sqrt(dim.toDouble).toInt
    val real =
      if (grid * grid == dim) MediaCodec.decodeLumaGrid(bytes, grid) else None
    real.getOrElse {
      val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      Array.tabulate(dim)(i => ((h(i % 16) & 0xff) - 128) / 128.0f)
    }
  }

  /** Number of frames the stub "decoder" samples from a video clip. */
  def frameCount(meta: MediaMeta, everyMs: Long): Int =
    math.max(1, (meta.durationMs / math.max(1L, everyMs)).toInt)

  /** Decode + featurize each record, partition-wise: video explodes to one
    * row per sampled frame (1→N), images/audio produce a single row. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 16,
      frameEveryMs: Long = 1000L): Dataset[MediaFeature] =
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        val frames =
          if (rec.kind.startsWith("video/")) frameCount(rec.meta, frameEveryMs) else 1
        (0 until frames).iterator.map { f =>
          // frame sampling: perturb the fake decode deterministically per frame
          val frameBytes = rec.bytes ++ BigInt(f).toByteArray
          MediaFeature(rec.mediaId, rec.kind, f, f * frameEveryMs,
            decodeBytes(frameBytes, dim))
        }
      }
    }

  /** "Resize": metadata-true transform over the stubbed pixels — the real
    * version re-decodes at the target resolution; shapes and metadata
    * behave identically. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] =
    ds.map { rec =>
      if (rec.kind.startsWith("image/"))
        rec.copy(meta = rec.meta.copy(width = w, height = h))
      else rec
    }

  /** Lift a DataFrame with (id, bytes) columns into typed media records.
    * Image metadata is REAL — width/height/format parsed from the actual
    * container header ([[MediaCodec.imageMeta]]); bytes no JDK reader
    * accepts keep the sniffed kind with synthesized placeholder metadata
    * (audio/video container parsing is a codec concern the JDK lacks). */
  def toMediaRecords(df: DataFrame, idCol: String, bytesCol: String): Dataset[MediaRecord] = {
    val withKind = df.select(
      col(idCol).cast("long").as("mediaId"),
      MediaFunctions.sniffKind(col(bytesCol)).as("kind"),
      col(bytesCol).as("bytes"))
    withKind.as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .map { case (id, kind, bytes) =>
        MediaCodec.imageMeta(bytes) match {
          case Some((w, h, fmt)) =>
            MediaRecord(id, s"image/$fmt", bytes,
              MediaMeta(width = w, height = h, channels = 3,
                sampleRate = 0, durationMs = 0L, codec = s"image/$fmt"))
          case None =>
            val durMs = if (kind.startsWith("video/") || kind.startsWith("audio/"))
              1000L * (1 + (bytes.length % 10)) else 0L
            MediaRecord(id, kind, bytes,
              MediaMeta(width = 64, height = 64, channels = 3,
                sampleRate = if (kind.startsWith("audio/")) 16000 else 0,
                durationMs = durMs, codec = kind))
        }
      }
  }
}
