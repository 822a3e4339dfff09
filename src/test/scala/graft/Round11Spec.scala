package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-11 review fixes: Polars/Namespaces surface parity — horizontal
  * concat null-pad, regex replace/extract semantics, weekly Monday anchors,
  * pre-1970 round midpoints, struct.fields null retention, order-aware
  * str.join, exact list.sample, Time-carrier dt.combine, empty int ranges. */
class Round11Spec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("concat horizontal null-pads unequal heights (reference eager.rb)") {
    val a = DataFrame(Seq(1, 2, 3, 4, 5).toDF("x"))
    val b = DataFrame(Seq("p", "q", "r").toDF("y"))
    val out = Polars.concat(Seq(a, b), "horizontal").toSpark.orderBy("x").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(out.size == 5 && out.count(_._2 == null) == 2, out)
    val e = intercept[IllegalArgumentException] { Polars.concat(Seq(a), "sideways") }
    assert(e.getMessage.contains("how must be one of"))
  }

  test("str.extract_all returns the full match; group-less patterns work") {
    val df = DataFrame(Seq("a1b22c333").toDF("s"))
    val all = df.select(col("s").str.extractAll("\\d+").alias("m"))
      .toSpark.collect()(0).getSeq[String](0)
    assert(all == Seq("1", "22", "333"))
    val grouped = df.select(col("s").str.extractAll("(a)\\d").alias("m"))
      .toSpark.collect()(0).getSeq[String](0)
    assert(grouped == Seq("a1"), grouped) // full match, not the group fragment
  }

  test("str.replace supports backreferences and $N substitutions; lone $ is literal") {
    val df = DataFrame(Seq("baa costs $5").toDF("s"))
    // pattern backreference \1 must survive the injected prefix group
    val br = df.select(col("s").str.replace("(a)\\1", "X").alias("r"))
      .toSpark.collect()(0).getString(0)
    assert(br == "bX costs $5", br)
    // $1 in the replacement references the user's first group
    val sub = df.select(col("s").str.replace("(\\d+)", "[$1]").alias("r"))
      .toSpark.collect()(0).getString(0)
    assert(sub == "baa costs $[5]", sub)
    // a lone $ in the replacement is literal
    val lit = df.select(col("s").str.replace("costs", "$ =").alias("r"))
      .toSpark.collect()(0).getString(0)
    assert(lit == "baa $ = $5", lit)
  }

  test("dt.truncate/round anchor pure-week buckets on Monday") {
    val df = DataFrame(Seq("2024-01-04 10:00:00").toDF("s") // a Thursday
      .withColumn("t", F.to_timestamp(F.col("s"))))
    val tr = df.select(col("t").dt.truncate("1w").alias("w"))
      .toSpark.collect()(0).getTimestamp(0).toString
    assert(tr.startsWith("2024-01-01"), tr) // the Monday of that week
    val rd = df.select(col("t").dt.round("1w").alias("w"))
      .toSpark.collect()(0).getTimestamp(0).toString
    assert(rd.startsWith("2024-01-01"), rd) // Thursday 10:00 is before midweek midpoint
  }

  test("dt.round maps pre-1970 midpoints to the bucket END like post-1970") {
    val df = DataFrame(Seq("1969-12-31 23:30:00").toDF("s")
      .withColumn("t", F.to_timestamp(F.col("s"))))
    val r = df.select(col("t").dt.round("1h").alias("r"))
      .toSpark.collect()(0).getTimestamp(0).toString
    assert(r.startsWith("1970-01-01 00:00"), r)
  }

  test("struct.fields keeps null-valued fields") {
    val df = DataFrame(Seq((Option.empty[Int], 1)).toDF("a", "b")
      .select(F.struct(F.col("a"), F.col("b")).as("st")))
    val fs = df.select(col("st").struct.fields.alias("f"))
      .toSpark.collect()(0).getSeq[String](0)
    assert(fs.toSet == Set("a", "b"), fs)
  }

  test("str.join concatenates in the frame's hidden row order") {
    // multi-partition but LAYOUT-STABLE frame (parallelize chunks preserve
    // the original order): join must follow the hidden index discipline the
    // rest of the order-dependent surface uses, not bare collect_list luck
    val rows = (0 until 50).map(i => org.apache.spark.sql.Row(('a' + i % 26).toChar.toString))
    val sdf = spark.createDataFrame(spark.sparkContext.parallelize(rows, 7),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType))))
    val joined = DataFrame(sdf).select(col("s").str.join(",").alias("j"))
      .toSpark.collect()(0).getString(0)
    val want = (0 until 50).map(i => ('a' + i % 26).toChar.toString).mkString(",")
    assert(joined == want)
  }

  test("list.sample returns exactly floor(fraction * len) elements") {
    val df = DataFrame(Seq(Seq.range(1, 11)).toDF("xs"))
    val n = df.select(Expr(F.size(col("xs").list.sample(0.5).col)).alias("n"))
      .toSpark.collect()(0).getInt(0)
    assert(n == 5, s"got $n")
  }

  test("dt.combine accepts both the nanos Time carrier and an HH:mm:ss string") {
    val df = DataFrame(Seq("2024-03-05 09:15:00").toDF("s")
      .withColumn("d", F.to_timestamp(F.col("s"))))
    val viaNanos = df.select(col("d").dt.combine(
        (F.lit(10L * 3600 + 30 * 60) * 1000000000L)).alias("t")) // 10:30:00 in nanos
      .toSpark.collect()(0).getTimestamp(0).toString
    assert(viaNanos.startsWith("2024-03-05 10:30:00"), viaNanos)
    val viaString = df.select(col("d").dt.combine(F.lit("11:45:00")).alias("t"))
      .toSpark.collect()(0).getTimestamp(0).toString
    assert(viaString.startsWith("2024-03-05 11:45:00"), viaString)
  }

  test("int_range/int_ranges: empty when start >= end") {
    val e = DataFrame(Seq(1).toDF("one"))
      .select(Polars.intRange(5, 5).alias("r"))
      .toSpark.collect()(0).getSeq[Int](0)
    assert(e.isEmpty)
    val rows = DataFrame(Seq((1L, 4L), (5L, 5L), (7L, 6L)).toDF("s", "e"))
      .select(Polars.intRanges(col("s"), col("e")).alias("r"))
      .toSpark.collect().map(_.getSeq[Long](0)).toSeq
    assert(rows == Seq(Seq(1L, 2L, 3L), Seq(), Seq()), rows)
  }
}
