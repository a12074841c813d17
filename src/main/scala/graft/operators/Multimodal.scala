package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus the decode / feature-extract / resize /
  * frame-sample plumbing a training-data pipeline needs.
  *
  * Two codec tiers:
  *  - REAL images (PNG/JPEG/GIF/BMP) decode and resize through the
  *    JDK's `javax.imageio` — no external library — in
  *    [[decodeImages]] / [[resizeImages]], executor-side only.
  *  - The deterministic "GRFT" test container (20-byte header: 4-byte
  *    magic, then kind ┃ width ┃ height ┃ frames as big-endian int32s,
  *    then `frames × frame_size` payload bytes) exercises the
  *    byte-slicing paths for formats whose codecs (audio/video) are
  *    genuinely absent here.
  * Every Spark-side decision is shared and transfers unchanged to any
  * codec:
  *  - header fields are parsed with codegen'd built-ins
  *    (`substr` on binary + `conv(hex(_), 16, 10)`) — the same
  *    expressions parse a PNG IHDR (fixed offsets, big-endian) with
  *    different constants;
  *  - payload transforms slice bytes with `substr`, so nothing
  *    decompresses on the driver and nothing leaves the executors;
  *  - `decodePartition` is the batched-iterator shape (a
  *    `mapPartitions` over rows) where a JNI/library codec would plug
  *    in — one codec handle per PARTITION, not per row.
  *
  * Scale notes: assets are wide rows (payload ≫ metadata). Metadata-only
  * queries must never read payload bytes — keep `bytes` a separate
  * parquet column (columnar pruning skips it; check ReadSchema in the
  * plan). Filters on kind/width/height are plain pushable predicates.
  */
object Multimodal {

  val Magic = "GRFT"
  val HeaderLen = 20

  object Kind {
    val Image = 1
    val Audio = 2
    val Video = 3
  }

  /** Big-endian int32 at 1-based byte offset `pos` of a binary column —
    * pure built-ins, stays in whole-stage codegen. */
  private def beInt(bytes: Column, pos: Int): Column =
    conv(hex(substring(bytes, pos, 4)), 16, 10).cast("int")

  /** Decode the typed metadata columns out of the binary header,
    * without touching payload bytes past the header. Rows that don't
    * carry the magic are dropped (corrupt-input policy: quarantine
    * upstream, never throw mid-scan). */
  def decodeHeader(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val b = col(bytesCol)
    df.filter(substring(b, 1, 4).cast("string") === Magic)
      .withColumn("kind", beInt(b, 5))
      .withColumn("width", beInt(b, 9))
      .withColumn("height", beInt(b, 13))
      .withColumn("frames", beInt(b, 17))
      .withColumn("payload_len", (length(b) - HeaderLen).cast("long"))
  }

  /** Frame sampling for video assets: every `everyK`-th fixed-size
    * frame, as an array of binary frames, via byte slicing only. The
    * per-asset fan-out is bounded by frames/everyK; at corpus scale a
    * subsequent `explode` redistributes frames across partitions. */
  def sampleFrames(df: DataFrame, everyK: Int, frameSize: Int,
      bytesCol: String = "bytes"): DataFrame = {
    val nSampled = ((col("frames") + everyK - 1) / everyK).cast("int")
    df.withColumn("sampled_frames",
      transform(sequence(lit(0), nSampled - 1),
        i => col(bytesCol).substr(
          lit(HeaderLen + 1) + i * (everyK * frameSize), lit(frameSize))))
  }

  /** Cheap per-asset payload features — the "feature extraction" stage
    * shape: pure column expressions over the payload, no driver
    * involvement. */
  def payloadStats(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("payload_first_word",
        when(col("payload_len") >= 4,
          // unsigned 32-bit word → long (an int cast overflows ANSI-mode
          // for payloads whose first byte has the high bit set)
          conv(hex(substring(col(bytesCol), HeaderLen + 1, 4)), 16, 10).cast("long"))
          .otherwise(0L))
      .withColumn("bytes_per_pixel",
        col("payload_len").cast("double") /
          greatest(col("width") * col("height") * col("frames"), lit(1)).cast("double"))

  /** Resize STUB: recomputes metadata for the target size and truncates
    * the payload proportionally — a REAL implementation replaces only
    * the payload expression with a codec call in [[decodePartition]]'s
    * batched shape; schema and plumbing stay exactly as here. */
  def resizeStub(df: DataFrame, newWidth: Int, newHeight: Int,
      bytesCol: String = "bytes"): DataFrame = {
    val scale = (lit(newWidth) * newHeight).cast("double") /
      greatest(col("width") * col("height"), lit(1)).cast("double")
    df.withColumn("resized_len",
        greatest(ceil(col("payload_len").cast("double") * scale).cast("int"), lit(0)))
      .withColumn("resized_bytes",
        col(bytesCol).substr(lit(HeaderLen + 1), col("resized_len")))
      .withColumn("width", lit(newWidth))
      .withColumn("height", lit(newHeight))
  }

  /** REAL image decode via the JDK's `javax.imageio`: width, height,
    * and mean Rec.601 luma per asset. Same batched shape as
    * [[decodePartition]] — per-task init (the ImageIO disk cache is
    * disabled once per partition so executors never spill decode
    * scratch to local disk), bytes never leave the executors, and rows
    * ImageIO cannot parse are QUARANTINED (dropped), the same
    * corrupt-input policy as [[decodeHeader]] — a poison byte array
    * must not kill a 100 TB scan. */
  def decodeImages(df: DataFrame, idCol: String = "asset_id",
      bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // once per task
        it.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            Some((id, w, h, sum / (w.toDouble * h)))
          }
        }
      }
      .toDF(idCol, "width", "height", "mean_luma")
  }

  /** REAL image resize: bilinear scale to (newWidth, newHeight),
    * re-encoded as PNG (lossless, JDK-builtin writer). Replaces
    * [[resizeStub]] for image assets — the stub remains only for the
    * synthetic GRFT container. Undecodable rows are quarantined, as in
    * [[decodeImages]]. */
  def resizeImages(df: DataFrame, newWidth: Int, newHeight: Int,
      idCol: String = "asset_id", bytesCol: String = "bytes"): DataFrame = {
    require(newWidth > 0 && newHeight > 0,
      s"target size must be positive: ${newWidth}x$newHeight")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None
          else {
            val out = new java.awt.image.BufferedImage(
              newWidth, newHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, newWidth, newHeight, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some((id, bos.toByteArray))
          }
        }
      }
      .toDF(idCol, bytesCol)
      .withColumn("width", lit(newWidth))
      .withColumn("height", lit(newHeight))
  }

  /** The batched decode shape for the synthetic GRFT container: one
    * iterator per PARTITION so a codec initializes once per task, not
    * per row ([[decodeImages]] is the real-codec instantiation of this
    * shape). The fake "decode" checksums payload bytes. Kept narrow
    * deliberately: wide decoded outputs should stream straight to a
    * parquet target from inside the same job. */
  def decodePartition(df: DataFrame, idCol: String = "asset_id",
      bytesCol: String = "bytes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val codec = Codec.open()  — once per partition
        it.map { case (id, bytes) =>
          var s = 0L
          var i = HeaderLen
          while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
          (id, s)
        }
      }
      .toDF(idCol, "checksum")
  }
}
