package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing tests: deterministic GRFT assets synthesized in
  * the fixture, then decoded/sliced/sampled through the operators. The
  * byte format is fake (no codecs in this image); what's under test is
  * the Spark-side plumbing — schema, header parsing via codegen
  * built-ins, payload slicing, batched mapPartitions shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def asset(kind: Int, w: Int, h: Int, frames: Int, frameSize: Int,
      seed: Int): Array[Byte] = {
    val payload = Array.tabulate(frames * frameSize)(i => ((seed * 31 + i) % 251).toByte)
    val buf = ByteBuffer.allocate(Multimodal.HeaderLen + payload.length)
    buf.put(Multimodal.Magic.getBytes("UTF-8"))
    buf.putInt(kind).putInt(w).putInt(h).putInt(frames)
    buf.put(payload)
    buf.array()
  }

  private val frameSize = 32
  private lazy val assets = Seq(
    (1L, asset(Multimodal.Kind.Image, 64, 48, 1, frameSize, 7)),
    (2L, asset(Multimodal.Kind.Video, 32, 24, 10, frameSize, 11)),
    (3L, asset(Multimodal.Kind.Audio, 0, 0, 4, frameSize, 13)),
    (4L, "NOPE".getBytes("UTF-8") ++ new Array[Byte](32))) // corrupt magic
    .toDF("asset_id", "bytes")

  test("decodeHeader: typed metadata from binary, corrupt rows quarantined") {
    val out = Multimodal.decodeHeader(assets).orderBy("asset_id")
      .select("asset_id", "kind", "width", "height", "frames", "payload_len")
      .collect()
    assert(out.length == 3) // corrupt magic dropped
    assert(out(0).toSeq == Seq(1L, 1, 64, 48, 1, frameSize.toLong))
    assert(out(1).toSeq == Seq(2L, 3, 32, 24, 10, 10L * frameSize))
    assert(out(2).toSeq == Seq(3L, 2, 0, 0, 4, 4L * frameSize))
  }

  test("sampleFrames: every k-th fixed-size frame via byte slicing") {
    val video = Multimodal.decodeHeader(assets).filter(col("kind") === Multimodal.Kind.Video)
    val out = Multimodal.sampleFrames(video, everyK = 3, frameSize = frameSize)
      .select("asset_id", "sampled_frames").head()
    val frames = out.getSeq[Array[Byte]](1)
    assert(frames.length == 4) // ceil(10/3)
    assert(frames.forall(_.length == frameSize))
    // frame i content = payload bytes [i*3*frameSize, ...) of the source
    val src = asset(Multimodal.Kind.Video, 32, 24, 10, frameSize, 11)
    (0 until 4).foreach { i =>
      val expect = src.slice(Multimodal.HeaderLen + i * 3 * frameSize,
        Multimodal.HeaderLen + i * 3 * frameSize + frameSize)
      assert(frames(i).toSeq == expect.toSeq, s"frame $i")
    }
  }

  test("payloadStats + resizeStub: metadata math without driver loops") {
    val img = Multimodal.decodeHeader(assets).filter(col("kind") === Multimodal.Kind.Image)
    val stats = Multimodal.payloadStats(img).head()
    val bpp = stats.getAs[Double]("bytes_per_pixel")
    assert(math.abs(bpp - frameSize.toDouble / (64 * 48)) < 1e-12)

    val resized = Multimodal.resizeStub(img, 32, 24).head()
    assert(resized.getAs[Int]("width") == 32)
    // payload shrinks by the pixel ratio (quarter)
    assert(resized.getAs[Int]("resized_len") == math.ceil(frameSize / 4.0).toInt)
    assert(resized.getAs[Array[Byte]]("resized_bytes").length ==
      math.ceil(frameSize / 4.0).toInt)
  }

  // --- real codec tier: javax.imageio (JDK-builtin, headless-safe) ---

  /** An actual PNG byte array: left half solid red, right half solid
    * blue — known dimensions, exactly computable mean luma (PNG is
    * lossless, so decoded RGB is bit-exact). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: real PNG bytes -> (width, height, mean luma), corrupt quarantined") {
    val png = pngBytes(8, 6)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val df = Seq((1L, png), (2L, "not an image at all".getBytes("UTF-8")))
      .toDF("asset_id", "bytes")
    val out = Multimodal.decodeImages(df).collect()
    assert(out.length == 1, "undecodable bytes are quarantined, not fatal")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getInt(1) == 8 && r.getInt(2) == 6)
    // half red (luma .299*255) + half blue (luma .114*255)
    val expected = (0.299 * 255 + 0.114 * 255) / 2
    assert(math.abs(r.getDouble(3) - expected) < 1e-9,
      s"mean luma ${r.getDouble(3)} != $expected")
  }

  test("resizeImages: bilinear resize re-encodes a real PNG at the target size") {
    val df = Seq((1L, pngBytes(8, 6))).toDF("asset_id", "bytes")
    val resized = Multimodal.resizeImages(df, 4, 3)
    val row = resized.head()
    assert(row.getAs[Int]("width") == 4 && row.getAs[Int]("height") == 3)
    // round-trip: the resized bytes are themselves a decodable PNG of
    // the target size, and solid-color halves keep their exact luma
    val back = Multimodal.decodeImages(resized).head()
    assert(back.getInt(1) == 4 && back.getInt(2) == 3)
    val expected = (0.299 * 255 + 0.114 * 255) / 2
    assert(math.abs(back.getDouble(3) - expected) < 1e-9)
  }

  test("decodePartition: batched per-partition decode shape") {
    val out = Multimodal.decodePartition(assets.filter(col("asset_id") <= 3L))
      .orderBy("asset_id").collect()
    val expected = Seq(1L, 2L, 3L).map { id =>
      val src = id match {
        case 1L => asset(Multimodal.Kind.Image, 64, 48, 1, frameSize, 7)
        case 2L => asset(Multimodal.Kind.Video, 32, 24, 10, frameSize, 11)
        case 3L => asset(Multimodal.Kind.Audio, 0, 0, 4, frameSize, 13)
      }
      src.drop(Multimodal.HeaderLen).map(b => (b & 0xff).toLong).sum
    }
    assert(out.map(_.getLong(1)).toSeq == expected)
  }
}
