package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession, functions => F}
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (beyond-reference).
  *
  * Media is carried as opaque `binary` columns + typed metadata structs; the
  * Spark-side schema / partitioning / batch shape is real, while the actual
  * codec step is STUBBED with a deterministic fake (image/audio libraries are
  * not available in this container — swap `fakeDecode*` for a real codec bound
  * in `mapPartitions`/`mapInPandas` in production).
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

  /** STUB decode: deterministic fake features from the payload bytes. In
    * production this is the only line that changes — bind a real codec here.
    * Runs as mapPartitions so a heavyweight decoder initializes once per
    * partition, the shape a real implementation needs. */
  def decodeImageFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      // ??? real implementation: initialize codec once here, decode per row
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case null           => Array.empty[Byte]
        }
        val feats = fakeDecode(bytes, dim)
        Row.fromSeq(row.toSeq :+ feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic fake "decode": hash-derived pseudo-features, stable across
    * runs/partitionings so tests are reproducible. */
  private[graft] def fakeDecode(bytes: Array[Byte], dim: Int): Seq[Float] = {
    var h = 1125899906842597L
    bytes.foreach { b => h = 31 * h + b }
    (0 until dim).map { i =>
      val x = h ^ (i.toLong * 0x9E3779B97F4A7C15L)
      val m = (x ^ (x >>> 33)) * 0xFF51AFD7ED558CCDL
      ((m >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** Resize stub: emits a width×height grayscale grid derived
    * deterministically from the payload bytes (real decoder+scaler binds at
    * the marked line). Same mapPartitions shape as [[decodeImageFeatures]]:
    * per-partition codec init, binary out column plus dimension metadata —
    * the schema/batching a real implementation keeps. */
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
      // ??? real implementation: initialize codec/scaler once here
      it.map { row =>
        val bytes = row.get(idx) match {
          case b: Array[Byte] => b
          case _              => Array.empty[Byte]
        }
        val out =
          if (bytes.isEmpty) null
          else Array.tabulate(width * height)(i => bytes(i % bytes.length))
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
