package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (beyond-reference).
  *
  * Media is carried as opaque `binary` columns + typed metadata structs.
  * Header metadata (PNG IHDR / JPEG SOF / WAV fmt) is parsed with native
  * declarative expressions; pixel encode/decode/feature/resize use the JDK's
  * `javax.imageio` (PNG/JPEG/GIF/BMP) inside `mapPartitions` — codec
  * initialized once per partition, rows streamed, nothing image-sized on the
  * driver. Only video frame sampling remains a byte-chunk fake (no container
  * demuxer in the JDK); its explode/metadata plumbing is real.
  */
object Multimodal {

  /** Canonical media-column schema: payload + metadata struct. */
  val imageSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType))))))

  val audioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType))))))

  /** Wrap arbitrary binary payloads with inferred image metadata columns.
    * Magic-byte sniffing + PNG IHDR + JPEG SOF dimension parsing are all REAL
    * byte-level parsers: PNG stores width/height as big-endian u32 at fixed
    * offsets 16..23; JPEG needs a segment scan for the SOF marker, done by
    * the native codegen expression [[graft.ext.JpegDims]]. Only pixel DECODE
    * is stubbed (decodeImageFeatures — no codec libs in this container). */
  def withImageMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = F.col(payloadCol)
    val magic = F.hex(F.substring(p, 1, 4))
    val isPng = magic.startsWith("89504E47")
    val isJpeg = magic.startsWith("FFD8")
    val format = F.when(isJpeg, "jpeg")
      .when(isPng, "png")
      .otherwise("unknown")
    def beU32(offset1Based: Int) = // big-endian u32 from 4 payload bytes
      F.conv(F.hex(F.substring(p, offset1Based, 4)), 16, 10).cast(IntegerType)
    // PNG color type (byte 26, 0-based 25): 0 gray,2 rgb,3 palette,4 gray+a,6 rgba
    val colorType = F.conv(F.hex(F.substring(p, 26, 1)), 16, 10).cast(IntegerType)
    val channels = F.when(colorType === 0, 1).when(colorType === 2, 3)
      .when(colorType === 3, 1).when(colorType === 4, 2).when(colorType === 6, 4)
    val jpegDims = org.apache.spark.sql.GraftInternalOps.column(
      graft.ext.JpegDims(org.apache.spark.sql.GraftInternalOps.expression(p)))
    df.withColumn("__jd__", F.when(isJpeg, jpegDims))
      .withColumn("meta", F.struct(
        format.as("format"),
        F.when(isPng, beU32(17)).when(isJpeg, F.element_at(F.col("__jd__"), 1)).as("width"),
        F.when(isPng, beU32(21)).when(isJpeg, F.element_at(F.col("__jd__"), 2)).as("height"),
        F.when(isPng, channels).when(isJpeg, F.element_at(F.col("__jd__"), 3)).as("channels")))
      .drop("__jd__")
  }

  /** Audio (WAV/RIFF) metadata from the canonical PCM header layout — real
    * little-endian byte parsing via declarative expressions: channels @22,
    * sample rate @24, byte rate @28, bits/sample @34, data size @40 (0-based);
    * duration = data_size / byte_rate. Non-WAV payloads get format "unknown"
    * and null fields. */
  def withAudioMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val p = F.col(payloadCol)
    def u8(off1: Int) = F.conv(F.hex(F.substring(p, off1, 1)), 16, 10).cast("long")
    def leU16(off1: Int) = u8(off1) + u8(off1 + 1) * 256L
    def leU32(off1: Int) = leU16(off1) + leU16(off1 + 2) * 65536L
    // Fixed-offset parsing is only valid for the canonical 44-byte PCM layout,
    // so also pin the chunk ids at the assumed offsets: 'fmt ' at 12 with
    // size 16, 'data' at 36. Extended-fmt / fact / LIST files (still RIFF/WAVE)
    // degrade to null fields instead of garbage.
    val isWav = F.hex(F.substring(p, 1, 4)) === "52494646" && // "RIFF"
      F.hex(F.substring(p, 9, 4)) === "57415645" &&           // "WAVE"
      F.hex(F.substring(p, 13, 4)) === "666D7420" &&          // "fmt "
      leU32(17) === 16L &&                                    // PCM fmt size
      F.hex(F.substring(p, 37, 4)) === "64617461"             // "data"
    val byteRate = leU32(29)
    df.withColumn("audio_meta", F.struct(
      F.when(isWav, "wav").otherwise("unknown").as("format"),
      F.when(isWav, leU16(23).cast(IntegerType)).as("channels"),
      F.when(isWav, leU32(25).cast(IntegerType)).as("sample_rate"),
      F.when(isWav, leU16(35).cast(IntegerType)).as("bits_per_sample"),
      F.when(isWav, (leU32(41).cast("double") / F.nullif(byteRate, F.lit(0L)))
        .cast("double")).as("duration_s")))
  }

  /** Decoded-pixel luma grid, or None when the payload is not a decodable
    * image. Gray (1-band) rasters read raw samples — `getRGB` would push
    * them through the linear-gray→sRGB colorspace transform and destroy
    * exactness — so a gray PNG round-trips its 8-bit values untouched;
    * multi-band images take integer Rec.601 luma (299r+587g+114b)/1000,
    * which reduces to the sample itself when r=g=b. */
  private def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      // NonFatal, not just IOException: the JDK image readers throw
      // RuntimeExceptions (NegativeArraySize/IndexOutOfBounds) on crafted or
      // truncated payloads with valid magic bytes — one bad row must yield
      // null, not kill the task
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val bands = img.getRaster.getNumBands
    val luma = new Array[Int](w * h)
    var y = 0
    var i = 0
    if (bands == 1) {
      val shift = if (img.getRaster.getSampleModel.getSampleSize(0) > 8) 8 else 0
      while (y < h) {
        var x = 0
        while (x < w) { luma(i) = img.getRaster.getSample(x, y, 0) >> shift; x += 1; i += 1 }
        y += 1
      }
    } else {
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          luma(i) = (299 * r + 587 * g + 114 * b) / 1000
          x += 1; i += 1
        }
        y += 1
      }
    }
    Some((w, h, bands, luma))
  }

  /** REAL pixel decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP):
    * adds a `decoded` struct of (width, height, channels, luma_sum,
    * mean_luma, weighted_sum) — luma_sum = Σ luma, weighted_sum =
    * Σ luma·(rowMajorIndex+1), mean_luma = luma_sum / (w·h) as one exact
    * integer division in double. Undecodable or empty payloads get a null
    * struct. mapPartitions shape: `ImageIO` file-cache disabled once per
    * partition, rows streamed — nothing image-sized on the driver. */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema.add("decoded", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("luma_sum", LongType),
      StructField("mean_luma", DoubleType),
      StructField("weighted_sum", LongType))))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // decoder init, once per partition
      it.map { row =>
        val decoded = decodeLuma(row.get(idx) match {
          case b: Array[Byte] => b
          case _              => null
        }).map { case (w, h, bands, luma) =>
          var sum = 0L
          var wsum = 0L
          var i = 0
          while (i < luma.length) { sum += luma(i); wsum += luma(i).toLong * (i + 1); i += 1 }
          Row(w, h, bands, sum, sum.toDouble / (w.toLong * h), wsum)
        }.orNull
        Row.fromSeq(row.toSeq :+ decoded)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Grayscale PNG encoder for declaratively-built pixel grids: `pixelsCol`
    * is an array<int> of row-major 8-bit values, `widthCol`/`heightCol` its
    * shape. Adds binary `payload` (a real PNG via `ImageIO.write` on a
    * TYPE_BYTE_GRAY raster — lossless, so decode recovers every sample).
    * This is the gate harness for [[decodeImages]]: the pixel FORMULA stays
    * declarative where a SQL oracle can recompute it, while the bytes in
    * between go through the real codec both ways. */
  def encodeGrayPng(df: DataFrame, pixelsCol: String, widthCol: String,
                    heightCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema.add("payload", BinaryType)
    val pIdx = df.schema.fieldIndex(pixelsCol)
    val wIdx = df.schema.fieldIndex(widthCol)
    val hIdx = df.schema.fieldIndex(heightCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val payload =
          if (row.isNullAt(pIdx) || row.isNullAt(wIdx) || row.isNullAt(hIdx)) null
          else {
            val w = row.getInt(wIdx)
            val h = row.getInt(hIdx)
            val px = row.getSeq[Any](pIdx)
            require(px.length == w * h,
              s"encodeGrayPng: ${px.length} pixels for ${w}x$h")
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var i = 0
            while (i < px.length) {
              val v = px(i) match {
                case n: Int  => n
                case n: Long => n.toInt
              }
              img.getRaster.setSample(i % w, i / w, 0, v & 0xff)
              i += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          }
        Row.fromSeq(row.toSeq :+ payload)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Image features from REAL decoded pixels: a `dim`-bin normalized luma
    * histogram (bin = luma·dim/256, mass sums to 1). Undecodable payloads
    * get null features. Same mapPartitions shape as [[decodeImages]]. */
  def decodeImageFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    require(dim > 0 && dim <= 256, "histogram dim must be in 1..256")
    val spark = df.sparkSession
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val feats = decodeLuma(row.get(idx) match {
          case b: Array[Byte] => b
          case _              => null
        }).map { case (_, _, _, luma) =>
          val counts = new Array[Long](dim)
          luma.foreach(v => counts(math.min(v * dim / 256, dim - 1)) += 1)
          counts.map(c => (c.toDouble / luma.length).toFloat).toSeq
        }.orNull
        Row.fromSeq(row.toSeq :+ feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL resize: decode with `ImageIO`, nearest-neighbor sample the luma
    * grid to width×height (srcX = x·srcW/outW — deterministic integer
    * arithmetic, no AWT rendering pipeline, so results are identical across
    * JVMs/platforms). Emits grayscale bytes + dimension metadata;
    * undecodable payloads get a null grid. */
  def resizeImages(df: DataFrame, payloadCol: String,
                   width: Int = 32, height: Int = 32): DataFrame = {
    require(width > 0 && height > 0, "resize dims must be positive")
    val spark = df.sparkSession
    val outSchema = df.schema
      .add("resized", BinaryType)
      .add("resized_width", IntegerType, nullable = false)
      .add("resized_height", IntegerType, nullable = false)
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val out = decodeLuma(row.get(idx) match {
          case b: Array[Byte] => b
          case _              => null
        }).map { case (srcW, srcH, _, luma) =>
          val bytes = new Array[Byte](width * height)
          var y = 0
          var i = 0
          while (y < height) {
            val sy = y * srcH / height
            var x = 0
            while (x < width) {
              bytes(i) = luma(sy * srcW + x * srcW / width).toByte
              x += 1; i += 1
            }
            y += 1
          }
          bytes
        }.orNull
        Row.fromSeq(row.toSeq ++ Seq(out, width, height))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sample stub for video: pick every nth "frame" (chunk) of the
    * payload — real plumbing (explode to frame rows, metadata propagation),
    * fake chunking. */
  def sampleFrames(df: DataFrame, payloadCol: String, everyNth: Int = 10,
                   frameBytes: Int = 1024): DataFrame = {
    val p = F.col(payloadCol)
    val nFrames = F.greatest(F.floor(F.octet_length(p) / frameBytes), F.lit(1)).cast("int")
    df.withColumn("frame_idx",
        F.explode(F.sequence(F.lit(0), nFrames - 1, F.lit(everyNth))))
      .withColumn("frame_payload",
        p.substr(F.col("frame_idx") * frameBytes + 1, F.lit(frameBytes)))
  }
}
