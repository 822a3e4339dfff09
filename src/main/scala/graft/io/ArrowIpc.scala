package graft.io

import java.io.{FileInputStream, FileOutputStream}
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ASchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ATimeUnit}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC file source/sink (reference: lib/polars/io/ipc.rb:27,108,198
  * read_ipc/read_ipc_stream/scan_ipc; data_frame.rb write_ipc).
  *
  * Spark has no built-in Arrow-IPC data source; this uses the arrow-vector
  * Java API that ships with Spark. Driver-side materialization — an ingest/
  * egress convenience mirroring the reference's eager local-file reads, not a
  * distributed scan path (at scale, land data as Parquet).
  */
object ArrowIpc {

  private def toArrowField(f: StructField): Field = f.dataType match {
    case ArrayType(elem, containsNull) =>
      val child = toArrowField(StructField("item", elem, containsNull))
      new Field(f.name, new FieldType(f.nullable, new ArrowType.List(), null),
        Seq(child).asJava)
    case dt =>
      val t: ArrowType = dt match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case ShortType => new ArrowType.Int(16, true)
        case ByteType => new ArrowType.Int(8, true)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType => new ArrowType.Utf8
        case BooleanType => new ArrowType.Bool
        case BinaryType => new ArrowType.Binary
        // TimestampType is an INSTANT and must carry a timezone in arrow
        // (else it reads back as NTZ wall-clock — wrong type and, in a
        // non-UTC session, shifted values); NTZ maps to the null-tz type
        case TimestampType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, "UTC")
        case TimestampNTZType => new ArrowType.Timestamp(ATimeUnit.MICROSECOND, null)
        case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
        case other => throw new UnsupportedOperationException(s"arrow ipc: $other")
      }
      new Field(f.name, new FieldType(f.nullable, t, null), Nil.asJava)
  }

  def write(df: DataFrame, path: String, batchSize: Int = 4096): Unit = {
    val schema = df.schema
    val aSchema = new ASchema(schema.fields.map(toArrowField).toSeq.asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(aSchema, alloc)
    val out = new FileOutputStream(path)
    val writer = new ArrowFileWriter(root, null, out.getChannel)
    try {
      writer.start()
      df.toLocalIterator().asScala.grouped(batchSize).foreach { batch =>
        root.allocateNew()
        batch.zipWithIndex.foreach { case (row, i) => setRow(root, schema, row, i) }
        root.setRowCount(batch.size)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); out.close(); root.close(); alloc.close() }
  }

  private def setRow(root: VectorSchemaRoot, schema: StructType, row: Row, i: Int): Unit =
    schema.fields.zipWithIndex.foreach { case (f, c) =>
      val vec = root.getVector(c)
      if (row.isNullAt(c)) vec.asInstanceOf[FieldVector] match {
        case v: BaseFixedWidthVector => v.setNull(i)
        case v: BaseVariableWidthVector => v.setNull(i)
        case v => v.setNull(i)
      }
      else (f.dataType, vec) match {
        case (LongType, v: BigIntVector) => v.setSafe(i, row.getLong(c))
        case (IntegerType, v: IntVector) => v.setSafe(i, row.getInt(c))
        case (ShortType, v: SmallIntVector) => v.setSafe(i, row.getShort(c))
        case (ByteType, v: TinyIntVector) => v.setSafe(i, row.getByte(c))
        case (DoubleType, v: Float8Vector) => v.setSafe(i, row.getDouble(c))
        case (FloatType, v: Float4Vector) => v.setSafe(i, row.getFloat(c))
        case (StringType, v: VarCharVector) => v.setSafe(i, row.getString(c).getBytes("UTF-8"))
        case (BooleanType, v: BitVector) => v.setSafe(i, if (row.getBoolean(c)) 1 else 0)
        case (BinaryType, v: VarBinaryVector) => v.setSafe(i, row.getAs[Array[Byte]](c))
        case (TimestampType, v: TimeStampMicroTZVector) =>
          // getTime is millis (floor-div for pre-epoch); getNanos carries the full sub-second
          val ts = row.getAs[java.sql.Timestamp](c)
          v.setSafe(i, Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000)
        case (TimestampNTZType, v: TimeStampMicroVector) =>
          val ldt = row.getAs[java.time.LocalDateTime](c)
          v.setSafe(i, ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000)
        case (DateType, v: DateDayVector) =>
          v.setSafe(i, row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
        case (ArrayType(elem, _), v: complex.ListVector) =>
          val w = v.getWriter
          w.setPosition(i)
          w.startList()
          row.getSeq[Any](c).foreach(e => writeListElem(w, elem, e, v))
          w.endList()
        case (dt, v) => throw new UnsupportedOperationException(s"arrow ipc write: $dt -> ${v.getClass}")
      }
    }

  /** Write one element of a list cell through the position-based writer. */
  private def writeListElem(w: org.apache.arrow.vector.complex.impl.UnionListWriter,
                            elem: DataType, e: Any,
                            v: complex.ListVector): Unit =
    if (e == null) w.writeNull()
    else elem match {
      case LongType => w.bigInt().writeBigInt(e.asInstanceOf[Long])
      case IntegerType => w.integer().writeInt(e.asInstanceOf[Int])
      case DoubleType => w.float8().writeFloat8(e.asInstanceOf[Double])
      case FloatType => w.float4().writeFloat4(e.asInstanceOf[Float])
      case BooleanType => w.bit().writeBit(if (e.asInstanceOf[Boolean]) 1 else 0)
      case StringType =>
        val bytes = e.toString.getBytes("UTF-8")
        val buf = v.getAllocator.buffer(bytes.length.toLong)
        try { buf.setBytes(0, bytes); w.varChar().writeVarChar(0, bytes.length, buf) }
        finally buf.close()
      case other => throw new UnsupportedOperationException(s"arrow ipc list elem: $other")
    }

  def read(path: String)(implicit spark: SparkSession): DataFrame = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(path)
    val reader = new ArrowFileReader(in.getChannel, alloc)
    try readFromReader(reader.getVectorSchemaRoot, () => reader.loadNextBatch())
    finally { reader.close(); in.close(); alloc.close() }
  }

  /** Arrow IPC *stream* format (reference io/ipc.rb:108 read_ipc_stream,
    * write_ipc_stream) — same row handling as the file format. */
  def writeStream(df: DataFrame, path: String, batchSize: Int = 4096): Unit = {
    val schema = df.schema
    val aSchema = new ASchema(schema.fields.map(toArrowField).toSeq.asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(aSchema, alloc)
    val out = new FileOutputStream(path)
    val writer = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null, out.getChannel)
    try {
      writer.start()
      df.toLocalIterator().asScala.grouped(batchSize).foreach { batch =>
        root.allocateNew()
        batch.zipWithIndex.foreach { case (row, i) => setRow(root, schema, row, i) }
        root.setRowCount(batch.size)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); out.close(); root.close(); alloc.close() }
  }

  def readStream(path: String)(implicit spark: SparkSession): DataFrame = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(path)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
    try readFromReader(reader.getVectorSchemaRoot, () => reader.loadNextBatch())
    finally { reader.close(); in.close(); alloc.close() }
  }

  private def readFromReader(root: VectorSchemaRoot, next: () => Boolean)
                            (implicit spark: SparkSession): DataFrame = {
    val fields = root.getSchema.getFields.asScala.toSeq
    val sparkSchema = StructType(fields.map { f =>
      StructField(f.getName, sparkTypeOf(f), f.isNullable)
    })
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (next()) {
      val n = root.getRowCount
      (0 until n).foreach { i =>
        rows += Row.fromSeq(fields.indices.map(c => vecValue(root.getVector(c), i)))
      }
    }
    spark.createDataFrame(rows.asJava, sparkSchema)
  }

  private def sparkTypeOf(f: Field): DataType = f.getType match {
    case _: ArrowType.List =>
      val child = f.getChildren.get(0)
      ArrayType(sparkTypeOf(child), child.isNullable)
    case t => arrowToSpark(t)
  }

  private def arrowToSpark(t: ArrowType): DataType = t match {
    case t: ArrowType.Int if t.getBitWidth == 64 => LongType
    case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
    case t: ArrowType.Int if t.getBitWidth == 16 => ShortType
    case _: ArrowType.Int => ByteType
    case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case _: ArrowType.FloatingPoint => FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.Binary => BinaryType
    case t: ArrowType.Timestamp if t.getTimezone != null => TimestampType
    case _: ArrowType.Timestamp => TimestampNTZType
    case _: ArrowType.Date => DateType
    case t => throw new UnsupportedOperationException(s"arrow ipc read: $t")
  }

  private def vecValue(vec: FieldVector, i: Int): Any =
    if (vec.isNull(i)) null
    else vec match {
      case v: BigIntVector => v.get(i)
      case v: IntVector => v.get(i)
      case v: SmallIntVector => v.get(i)
      case v: TinyIntVector => v.get(i)
      case v: Float8Vector => v.get(i)
      case v: Float4Vector => v.get(i)
      case v: VarCharVector => new String(v.get(i), "UTF-8")
      case v: BitVector => v.get(i) == 1
      case v: VarBinaryVector => v.get(i)
      case v: TimeStampMicroTZVector => // instant (TimestampType)
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(v.get(i), 1000000L),
          Math.floorMod(v.get(i), 1000000L) * 1000)
      case v: TimeStampMicroVector => // wall-clock (TimestampNTZType)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(v.get(i), 1000000L),
          (Math.floorMod(v.get(i), 1000000L) * 1000).toInt,
          java.time.ZoneOffset.UTC)
      case v: DateDayVector => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(i)))
      case v: complex.ListVector =>
        v.getObject(i).asScala.map {
          case t: org.apache.arrow.vector.util.Text => t.toString
          case e => e
        }.toSeq
      case v => throw new UnsupportedOperationException(s"arrow ipc read vec: ${v.getClass}")
    }

  /** Peek schema without materializing data (reference io/ipc.rb:164). */
  def readSchema(path: String): StructType = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(path)
    val reader = new ArrowFileReader(in.getChannel, alloc)
    try {
      val fields = reader.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
      // the SAME type mapping read() uses — a schema peek that reports a
      // different dtype than the read is a silently wrong answer
      StructType(fields.map { f =>
        val dt = f.getType match {
          case _: ArrowType.List =>
            ArrayType(arrowToSpark(f.getChildren.get(0).getType))
          case t => arrowToSpark(t)
        }
        StructField(f.getName, dt, f.isNullable)
      })
    } finally { reader.close(); in.close(); alloc.close() }
  }
}
