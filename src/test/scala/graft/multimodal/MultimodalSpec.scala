package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multimodal plumbing: sniffing, typed records, stubbed decode shape,
  * frame sampling, resize metadata — the parts that must be real even
  * though the codec call is faked. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import MediaModel._

  private def bytesOf(parts: Int*): Array[Byte] = parts.map(_.toByte).toArray

  private def mediaDF = Seq(
    (1L, bytesOf(0xFF, 0xD8, 0xFF, 0xE0) ++ "jpegbody".getBytes),
    (2L, bytesOf(0x89, 0x50, 0x4E, 0x47) ++ "pngbody".getBytes),
    (3L, "RIFFwavbody".getBytes),
    (4L, bytesOf(0, 0, 0, 0x18) ++ "ftypisomvideo".getBytes),
    (5L, "plain text".getBytes)).toDF("id", "bytes")

  test("sniffKind recognizes container magic numbers") {
    val got = mediaDF.select($"id", MediaFunctions.sniffKind($"bytes")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(
      1L -> "image/jpeg", 2L -> "image/png", 3L -> "audio/wav",
      4L -> "video/mp4", 5L -> "application/octet-stream"))
  }

  test("toMediaRecords builds typed records with synthesized metadata") {
    val recs = MediaStubs.toMediaRecords(mediaDF, "id", "bytes").collect()
      .map(r => r.mediaId -> r).toMap
    assert(recs(1L).kind === "image/jpeg")
    assert(recs(1L).meta.channels === 3)
    assert(recs(3L).meta.sampleRate === 16000)
    assert(recs(4L).meta.durationMs > 0)
  }

  test("extractFeatures is deterministic and batch-shaped (mapInPandas analogue)") {
    val ds = MediaStubs.toMediaRecords(mediaDF, "id", "bytes")
    val a = MediaStubs.extractFeatures(ds, dim = 8).collect().sortBy(r => (r.mediaId, r.frameIndex))
    val b = MediaStubs.extractFeatures(ds, dim = 8).collect().sortBy(r => (r.mediaId, r.frameIndex))
    assert(a.map(_.features.toSeq) === b.map(_.features.toSeq)) // deterministic
    assert(a.forall(_.features.length === 8)) // fixed feature dim
    assert(a.forall(f => f.features.forall(v => v >= -1f && v <= 1f)))
  }

  test("video explodes 1→N frames with timestamps; others stay single-row") {
    val ds = MediaStubs.toMediaRecords(mediaDF, "id", "bytes")
    val feats = MediaStubs.extractFeatures(ds, dim = 4, frameEveryMs = 1000L).collect()
    val byId = feats.groupBy(_.mediaId)
    assert(byId(1L).length === 1)
    assert(byId(4L).length >= 1)
    val video = byId(4L).sortBy(_.frameIndex)
    assert(video.map(_.frameTsMs).toSeq === video.indices.map(_ * 1000L))
    // distinct frames decode to distinct features (per-frame sampling)
    if (video.length > 1) assert(video(0).features.toSeq !== video(1).features.toSeq)
  }

  test("resize rewrites image metadata only") {
    val ds = MediaStubs.toMediaRecords(mediaDF, "id", "bytes")
    val resized = MediaStubs.resize(ds, 224, 224).collect().map(r => r.mediaId -> r).toMap
    assert(resized(1L).meta.width === 224 && resized(1L).meta.height === 224)
    assert(resized(3L).meta.width === 64) // audio untouched
  }

  test("REAL codec round-trip: imageMeta recovers encoded PNG dimensions") {
    for (id <- Seq(0L, 7L, 31L, 100L)) {
      val (w, h) = ((8 + id % 32).toInt, (8 + id % 24).toInt)
      val bytes = MediaCodec.encodePng(w, h, id)
      assert(MediaCodec.imageMeta(bytes) === Some((w, h, "png")))
    }
    // fake magic-prefix blobs and garbage are rejected, not misparsed
    assert(MediaCodec.imageMeta(bytesOf(0xFF, 0xD8, 0xFF) ++ "junk".getBytes) === None)
    assert(MediaCodec.imageMeta("not an image".getBytes) === None)
    assert(MediaCodec.imageMeta(Array.empty[Byte]) === None)
  }

  test("REAL codec: decodeLumaGrid averages the actual raster") {
    // a real all-gray PNG (v constant) must decode to a constant grid
    val im = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    val grid = MediaCodec.decodeLumaGrid(out.toByteArray, 4).get
    assert(grid.length === 16)
    assert(grid.forall(v => math.abs(v - 128f / 255f) < 1e-4))
    // decodeBytes routes real images through the real decoder
    val viaStub = MediaStubs.decodeBytes(out.toByteArray, 16)
    assert(viaStub.toSeq === grid.toSeq)
  }

  test("toMediaRecords carries REAL header metadata for real images") {
    val realPng = MediaCodec.encodePng(20, 12, seed = 5L)
    val df = Seq((9L, realPng)).toDF("id", "bytes")
    val rec = MediaStubs.toMediaRecords(df, "id", "bytes").collect().head
    assert(rec.kind === "image/png")
    assert(rec.meta.width === 20 && rec.meta.height === 12)
  }

  test("REAL codec: resizeNearest floor-samples the source raster exactly") {
    // 8x6 pattern, resized to 4x4: target (x,y) must copy source
    // (x*8/4, y*6/4) — assert every pixel against the pattern formula
    val seed = 7L
    val bytes = MediaCodec.encodePng(8, 6, seed)
    val resized = MediaCodec.resizeNearest(bytes, 4, 4).get
    assert(MediaCodec.imageMeta(resized) === Some((4, 4, "png")))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    var expectedSum = 0L
    for (y <- 0 until 4; x <- 0 until 4) {
      val (sx, sy) = (x * 8 / 4, y * 6 / 4)
      val v = ((seed + sx * 31L + sy * 17L) & 0xff).toInt
      assert((img.getRGB(x, y) & 0xff) === v, s"pixel ($x,$y)")
      expectedSum += v
    }
    assert(MediaCodec.rasterChecksum(resized) === Some(expectedSum))
    // upscale also floor-samples (no interpolation): 2x2 -> 5x5 repeats
    val up = MediaCodec.resizeNearest(MediaCodec.encodePng(2, 2, 0L), 5, 5).get
    val upImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(up))
    assert((upImg.getRGB(0, 0) & 0xff) === (upImg.getRGB(1, 1) & 0xff)) // both sample (0,0)
    assert(MediaCodec.resizeNearest("junk".getBytes, 4, 4) === None)
  }

  test("REAL audio codec: WAV round-trip is sample-exact, meta from the RIFF header") {
    val samples = Array.tabulate(800)(i => ((i * 17) % 4096 - 2048).toShort)
    val wav = MediaCodec.encodeWavPcm16(8000, samples)
    val (sr, ch, frames) = MediaCodec.audioMeta(wav).get
    assert((sr, ch, frames) === ((8000, 1, 800L)))
    // PCM is lossless: every sample survives the JDK decode path
    assert(MediaCodec.decodePcm16(wav).get.toSeq === samples.toSeq)
    // truncated/fake bytes are rejected, not thrown
    assert(MediaCodec.audioMeta(wav.take(20)) === None)
    assert(MediaCodec.audioMeta("junk".getBytes) === None)
    assert(MediaCodec.decodePcm16("junk".getBytes) === None)
    // r16 (ADVICE r15): the one-pass decoder distinguishes reader
    // rejection from a decoded-but-unsupported format, naming the fields
    val ok = MediaCodec.decodePcm16WithMeta(wav)
    assert(ok.isRight)
    assert(ok.toOption.get._4.toSeq === samples.toSeq)
    assert(MediaCodec.decodePcm16WithMeta("junk".getBytes)
      .left.exists(_.contains("rejected")))
    // a stereo WAV opens fine but fails the mono check: the error must
    // carry the actual channel count, not "rejected"
    val stereo = {
      val b = MediaCodec.encodeWavPcm16(8000, samples.take(8))
      // RIFF fmt chunk: channels at offset 22 (LE short), block align 34,
      // byte rate 28 — patch to 2-channel so only the header changes
      b(22) = 2; b(32) = 4
      val byteRate = 8000 * 4
      b(28) = (byteRate & 0xff).toByte; b(29) = ((byteRate >> 8) & 0xff).toByte
      b(30) = ((byteRate >> 16) & 0xff).toByte; b(31) = ((byteRate >> 24) & 0xff).toByte
      b
    }
    assert(MediaCodec.decodePcm16WithMeta(stereo)
      .left.exists(_.contains("2 channel")))
  }

  test("frame container: round-trips real PNG frames, rejects torn blobs") {
    val frames = (0 until 3).map(f => MediaCodec.encodePng(4, 4, f.toLong))
    val blob = MediaCodec.encodeFrameContainer(frames)
    val back = MediaCodec.decodeFrameContainer(blob).get
    assert(back.length === 3)
    back.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // every decoded frame still passes the REAL image reader
    back.foreach(f => assert(MediaCodec.imageMeta(f).get === ((4, 4, "png"))))
    assert(MediaCodec.decodeFrameContainer(blob.dropRight(5)) === None) // torn
    assert(MediaCodec.decodeFrameContainer("nope".getBytes) === None) // bad magic
    assert(MediaCodec.decodeFrameContainer(Array.emptyByteArray) === None)
  }

  test("media features flow back into the relational layer (join with embeddings shape)") {
    val ds = MediaStubs.toMediaRecords(mediaDF, "id", "bytes")
    val feats = MediaStubs.extractFeatures(ds, dim = 8).toDF()
    val out = feats.groupBy("kind").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("image/jpeg") === 1L)
    assert(out.values.sum === feats.count())
  }
}
