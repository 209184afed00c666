package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for 100 TB training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; per-record decode/feature work runs partition-wise so a
  * cluster processes shards independently (the Scala analogue of
  * `mapInPandas` batch processing).
  *
  * The actual codec calls are STUBBED (no image/audio libraries in this
  * environment) behind [[MediaStubs.decodeBytes]] — a clearly-marked,
  * deterministic fake. Everything around the stub is real: schemas,
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

/** Partition-wise decode/transform pipeline with the codec boundary
  * stubbed. Batch shape mirrors `mapInPandas`: the iterator is consumed
  * lazily per partition, never materialized on the driver. */
object MediaStubs {
  import MediaModel._

  /** STUB — deterministic fake decode. A real implementation would call
    * an image/audio codec here (e.g. libjpeg/ffmpeg via JNI); this fake
    * derives a reproducible pseudo-signal from the byte content so the
    * surrounding pipeline (shapes, determinism, tests, oracles) is fully
    * exercisable without the native libraries. It hashes the uppercase
    * hex rendering of the bytes (not the raw blob) so engines without
    * blob-md5 can mirror it exactly (`md5(hex(blob))` in DuckDB), and
    * each component is k/128 — a power-of-two quotient, bit-exact in
    * float and double across engines. */
  def decodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec call goes here; deterministic fake below
    val hex = bytes.map(b => f"${b & 0xff}%02X").mkString
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(hex.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    Array.tabulate(dim)(i => ((h(i % 16) & 0xff) - 128) / 128.0f)
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

  /** Lift a DataFrame with (id, bytes) columns into typed media records,
    * sniffing the modality and synthesizing metadata (the real pipeline
    * reads metadata from container headers — also a codec concern). */
  def toMediaRecords(df: DataFrame, idCol: String, bytesCol: String): Dataset[MediaRecord] = {
    val withKind = df.select(
      col(idCol).cast("long").as("mediaId"),
      MediaFunctions.sniffKind(col(bytesCol)).as("kind"),
      col(bytesCol).as("bytes"))
    withKind.as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .map { case (id, kind, bytes) =>
        val durMs = if (kind.startsWith("video/") || kind.startsWith("audio/"))
          1000L * (1 + (bytes.length % 10)) else 0L
        MediaRecord(id, kind, bytes,
          MediaMeta(width = 64, height = 64, channels = 3,
            sampleRate = if (kind.startsWith("audio/")) 16000 else 0,
            durationMs = durMs, codec = kind))
      }
  }
}
