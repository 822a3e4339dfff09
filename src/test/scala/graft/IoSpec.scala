package graft

import java.nio.file.Files
import graft.Polars._
import graft.api.DataFrame
import graft.io.ArrowIpc
import graft.testing.Testing
import org.apache.spark.sql.{functions => F}

class IoSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  private def tmp(suffix: String): String = {
    val d = Files.createTempDirectory("graft-io").toFile
    d.deleteOnExit()
    d.getAbsolutePath + suffix
  }

  private def sample = Seq((1L, "one", 1.5), (2L, "two", 2.5), (3L, "three", 3.5))
    .toDF("a", "b", "c")

  test("parquet round trip") {
    val p = tmp("/pq")
    DataFrame(sample).writeParquet(p)
    Testing.assertFrameEqual(readParquet(p).toSpark.orderBy("a"), sample)
  }

  test("partitioned parquet write prunes at scan time") {
    val p = tmp("/pqpart")
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("id", "k", "v")
    DataFrame(df).writeParquet(p, partitionBy = Seq("k"))
    // hive-style layout on disk
    val dirs = new java.io.File(p).listFiles().map(_.getName).filter(_.startsWith("k=")).sorted
    assert(dirs.toSeq == Seq("k=a", "k=b"))
    val back = readParquet(p).toSpark
    assert(back.filter(F.col("k") === "a").count() == 2)
    // the partition filter must reach the scan as partition pruning, not a row filter
    val plan = back.filter(F.col("k") === "a").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("k#"))
  }

  test("csv round trip with header + schema inference") {
    val p = tmp("/csv")
    DataFrame(sample).writeCsv(p)
    val back = readCsv(p).toSpark.orderBy("a")
    assert(back.schema.map(_.dataType.simpleString) == Seq("int", "string", "double"))
    assert(back.collect().map(_.getString(1)).toSeq == Seq("one", "two", "three"))
  }

  test("write_json emits one JSON array document") {
    val p = tmp(".json")
    DataFrame(Seq((1L, "a")).toDF("id", "s")).writeJson(p)
    val doc = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(doc == """[{"id":1,"s":"a"}]""")
    val back = readJson(p).toSpark.collect()
    assert(back(0).getAs[Long]("id") == 1L && back(0).getAs[String]("s") == "a")
  }

  test("ndjson round trip") {
    val p = tmp("/nd")
    DataFrame(sample).writeNdjson(p)
    val back = readNdjson(p).toSpark.select("a", "b", "c").orderBy("a")
    assert(back.collect().map(_.getDouble(2)).toSeq == Seq(1.5, 2.5, 3.5))
  }

  test("arrow ipc round trip incl. nulls and timestamps") {
    val p = tmp(".arrow")
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "x", 1.5), (2L, null, null), (3L, "z", 3.5)).toDF("a", "b", "c")
      .withColumn("ts", F.to_timestamp(F.lit("2024-06-01 12:00:00.123456"))) // sub-milli micros must survive
    ArrowIpc.write(df, p)
    val back = ArrowIpc.read(p).orderBy("a")
    assert(back.count() == 3)
    val r = back.collect()
    assert(r(1).isNullAt(1) && r(1).isNullAt(2))
    assert(r(0).getString(1) == "x" && r(2).getDouble(2) == 3.5)
    // TimestampType round-trips as an INSTANT (arrow tz-bearing type), not
    // as NTZ wall-clock — type preserved, sub-milli micros preserved
    assert(back.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(r(0).getAs[java.sql.Timestamp]("ts").getNanos == 123456000)
    assert(ArrowIpc.readSchema(p)("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ArrowIpc.readSchema(p)("c").dataType == org.apache.spark.sql.types.DoubleType)
    assert(ArrowIpc.readSchema(p).fieldNames.toSeq == Seq("a", "b", "c", "ts"))
  }

  test("arrow ipc round trips list columns (embeddings shape)") {
    val p = tmp(".arrow")
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq("a", "b")),
      (2L, Seq(4.5f), Seq.empty[String]),
      (3L, null, Seq("c"))).toDF("id", "emb", "tags")
    ArrowIpc.write(df, p)
    val back = ArrowIpc.read(p).orderBy("id").collect()
    assert(back(0).getSeq[Float](1) == Seq(1.0f, 2.0f, 3.0f))
    assert(back(0).getSeq[String](2) == Seq("a", "b"))
    assert(back(1).getSeq[Float](1) == Seq(4.5f))
    assert(back(1).getSeq[String](2).isEmpty)
    assert(back(2).isNullAt(1) && back(2).getSeq[String](2) == Seq("c"))
  }

  test("arrow ipc stream format round trip") {
    val p = tmp(".arrows")
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    ArrowIpc.writeStream(df, p)
    val back = ArrowIpc.readStream(p).orderBy("a").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x"), (2L, "y")))
  }

  test("Polars facade: read_ipc / scan_ipc / read_ipc_stream / read_ipc_schema") {
    val p = tmp(".arrow"); val ps = tmp(".arrows")
    val df = Seq((1L, "x"), (2L, "y")).toDF("a", "b")
    ArrowIpc.write(df, p); ArrowIpc.writeStream(df, ps)
    assert(readIpc(p).toSpark.orderBy("a").collect().map(_.getString(1)).toSeq == Seq("x", "y"))
    assert(scanIpc(p).collect().toSpark.count() == 2)
    assert(readIpcStream(ps).toSpark.count() == 2)
    assert(readIpcSchema(p).fieldNames.toSeq == Seq("a", "b"))
  }

  test("read_csv options: skip_rows, null_values, dtypes, new_columns, n_rows") {
    val p = tmp(".csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "garbage line to skip\na,b\n1,x\n2,NA\n3,z\n4,w\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType)))
    val df = Polars.readCsv(p, skipRows = 1, nullValues = Seq("NA"),
      dtypes = Some(schema), newColumns = Seq("id", "label"), nRows = Some(3))
      .toSpark.orderBy("id").collect()
    assert(df.length == 3)
    assert(df.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(df(1).isNullAt(1)) // "NA" -> null
    assert(df(0).getString(1) == "x")
  }

  test("scan_csv carries the full read_csv option surface") {
    val p = tmp(".csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "junk\na,b\n1,x\nNA,-\n3,z\n")
    val lf = Polars.scanCsv(p, skipRows = 1, nullValues = Seq("NA", "-"),
      newColumns = Seq("id", "label"))
    val rows = lf.toSpark.orderBy(F.col("id").asc_nulls_first).collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1)) // both markers null
    assert(rows(1).getInt(0) == 1 && rows(2).getInt(0) == 3) // inferred numeric
  }

  test("read_csv null_values list: every listed marker becomes null") {
    val p = tmp(".csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "a,b,c\n1,x,true\nNA,null,false\n3,-,true\n")
    // dtype parity with the single-marker path: timestamps survive inference
    val p2 = tmp(".csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p2),
      "d,t\n2024-01-01,2024-01-01 12:30:00\nNA,-\n")
    val typed2 = Polars.readCsv(p2, nullValues = Seq("NA", "-")).toSpark
    assert(typed2.schema.map(_.dataType.typeName) == Seq("date", "timestamp"))
    // inference path: a stays numeric (markers cleaned BEFORE type inference)
    val df = Polars.readCsv(p, nullValues = Seq("NA", "null", "-"))
      .toSpark.orderBy(F.col("a").asc_nulls_first).collect()
    assert(df(0).isNullAt(0) && df(0).isNullAt(1) && df(0).getBoolean(2) == false)
    assert(df(1).getInt(0) == 1 && df(1).getString(1) == "x") // int like single-marker inference
    assert(df(2).getInt(0) == 3 && df(2).isNullAt(1))
    // explicit-dtypes path
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c", org.apache.spark.sql.types.BooleanType)))
    val typed = Polars.readCsv(p, nullValues = Seq("NA", "null", "-"), dtypes = Some(schema))
      .toSpark
    assert(typed.schema == schema)
    assert(typed.filter(F.col("a").isNull || F.col("b").isNull).count() == 2)
  }

  test("avro multi-type union is an explicit unsupported error") {
    val p = tmp(".avro")
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"u","type":["null","long","string"]}]}""".stripMargin)
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(p))
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("u", 1L); w.append(rec); w.close()
    val e = intercept[UnsupportedOperationException](Polars.readAvro(p))
    assert(e.getMessage.contains("union"))
  }

  test("avro round trip incl. nulls, lists, binary") {
    val p = tmp(".avro")
    val df = Seq(
      (1L, "x", Some(1.5), Seq(1, 2), Array[Byte](1, 2)),
      (2L, null, None, Seq.empty[Int], Array.empty[Byte]))
      .toDF("id", "s", "d", "l", "b")
      .select(F.col("id"), F.col("s"), F.col("d"), F.col("l"), F.col("b"))
    // goes through the datasource-absent fallback path on both sides
    DataFrame(df).writeAvro(p)
    val back = Polars.readAvro(p).toSpark.orderBy("id").collect()
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "x")
    assert(back(0).getDouble(2) == 1.5 && back(0).getSeq[Int](3) == Seq(1, 2))
    assert(back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).getSeq[Int](3).isEmpty)
  }

  test("read_database round trip via embedded Derby JDBC") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toFile
    dbDir.deleteOnExit()
    val url = s"jdbc:derby:${dbDir.getAbsolutePath}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE t (id INT, name VARCHAR(20))")
      st.execute("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
      st.close()
    } finally conn.close()
    val df = Polars.readDatabase(url, "t").toSpark.orderBy("ID").collect()
    assert(df.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "a"), (2, "b")))
  }

  test("with_context scalar pattern") {
    val main = DataFrame(Seq(1.0, 2.0, 3.0).toDF("v"))
    val other = DataFrame(Seq(10.0, 20.0).toDF("w"))
    val out = main.withContext(other, "w_mean" -> col("w").mean)
      .select((col("v") * col("w_mean")).alias("scaled")).toSpark
      .collect().map(_.getDouble(0)).sorted
    assert(out.toSeq == Seq(15.0, 30.0, 45.0))
  }

  test("scan (lazy) csv keeps plan lazy") {
    val p = tmp("/csv2")
    DataFrame(sample).writeCsv(p)
    val lazyF = scanCsv(p).filter(col("a") > 1).select(col("a"), col("c"))
    assert(lazyF.collect().toSpark.count() == 2)
  }
}
