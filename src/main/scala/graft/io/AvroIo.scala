package graft.io

import java.io.File
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (reference: lib/polars/io/avro.rb
  * read_avro / DataFrame#write_avro).
  *
  * The spark-avro DataSource jar is not in this image, but avro-core is —
  * this reads/writes Avro object container files through the Generic API,
  * driver-side, mirroring the reference's eager local-file semantics (same
  * role as [[ArrowIpc]]; at cluster scale add the spark-avro jar and scan
  * distributed).
  */
object AvroIo {

  private def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      if (branches.size > 1)
        throw new UnsupportedOperationException(
          s"avro read: multi-type union ${s.getTypes.asScala.map(_.getType).mkString("[", ",", "]")}")
      val nullable = branches.size != s.getTypes.size()
      val (dt, _) = sparkType(branches.head)
      (dt, nullable)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = sparkType(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, n) = sparkType(f.schema()); StructField(f.name(), dt, n)
      }), false)
    case t => throw new UnsupportedOperationException(s"avro read: $t")
  }

  private def toSpark(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case l: java.util.Collection[_] => l.asScala.toSeq.map(toSpark)
    case r: GenericRecord =>
      Row.fromSeq(r.getSchema.getFields.asScala.toSeq.map(f => toSpark(r.get(f.pos()))))
    case other => other
  }

  def read(path: String)(implicit spark: SparkSession): DataFrame = {
    val reader = new DataFileReader[GenericRecord](new File(path), new GenericDatumReader[GenericRecord]())
    try {
      val schema = reader.getSchema
      val sparkSchema = sparkType(schema)._1.asInstanceOf[StructType]
      val rows = reader.iterator().asScala.map(toSpark(_).asInstanceOf[Row]).toSeq
      spark.createDataFrame(rows.asJava, sparkSchema)
    } finally reader.close()
  }

  private def avroType(dt: DataType, nullable: Boolean): Schema = {
    val base = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case StringType => Schema.create(Schema.Type.STRING)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, en) => Schema.createArray(avroType(et, en))
      case other => throw new UnsupportedOperationException(s"avro write: $other")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  private def toAvro(v: Any, s: Schema): Any = v match {
    case null => null
    case seq: scala.collection.Seq[_] =>
      val elem = (if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s).getElementType
      new GenericData.Array(avroElemSchema(s), seq.map(toAvro(_, elem)).asJava)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }
  private def avroElemSchema(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s

  def write(df: DataFrame, path: String): Unit = {
    val fields = df.schema.fields
    val record = Schema.createRecord("graft", null, "graft.avro", false,
      fields.map(f => new Schema.Field(f.name, avroType(f.dataType, f.nullable), null, null)).toList.asJava)
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](record))
    writer.create(record, new File(path))
    try {
      df.toLocalIterator().asScala.foreach { row =>
        val rec = new GenericData.Record(record)
        fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, if (row.isNullAt(i)) null
          else toAvro(row.get(i), record.getField(f.name).schema()))
        }
        writer.append(rec)
      }
    } finally writer.close()
  }
}
