package graft

import graft.Polars._
import graft.api.DataFrame

class EagerSurfaceSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("hash-of-columns constructor with dtype inference") {
    val df = Polars.dataFrame(
      "i" -> Seq(1, 2, 3),
      "x" -> Seq(1.5, 2.5, 3.5),
      "s" -> Seq("a", "b", "c"))
    assert(df.schema.map(_.dataType.simpleString) == Seq("int", "double", "string"))
    assert(df.shape == (3L, 3))
    intercept[IllegalArgumentException] {
      Polars.dataFrame("a" -> Seq(1), "b" -> Seq(1, 2))
    }
  }

  test("to_maps row egress") {
    val maps = Polars.dataFrame("i" -> Seq(1, 2), "s" -> Seq("x", "y")).toMaps
    assert(maps == Seq(Map("i" -> 1, "s" -> "x"), Map("i" -> 2, "s" -> "y")))
  }

  test("memory shims: n_chunks / rechunk / estimated_size / flags") {
    val df = Polars.dataFrame("i" -> (1 to 100).toSeq)
    assert(df.nChunks >= 1)
    assert(df.rechunk(4).nChunks == 4)
    assert(df.estimatedSize > 0)
    assert(df.setSorted("i").flags.isEmpty)
  }

  test("collect_all runs queries concurrently") {
    val a = Polars.dataFrame("i" -> Seq(1, 2, 3)).lazyFrame.filter(col("i") > 1)
    val b = Polars.dataFrame("j" -> Seq(10.0)).lazyFrame
    val Seq(ra, rb) = Polars.collectAll(Seq(a, b))
    assert(ra.toSpark.count() == 2 && rb.toSpark.count() == 1)
  }

  test("series element-wise arithmetic zips positionally") {
    val a = graft.api.Series("x", Seq(1.0, 2.0, 3.0))
    val b = graft.api.Series("y", Seq(10.0, 20.0, 30.0))
    assert((a + b).toList == List(11.0, 22.0, 33.0))
    assert((b / a).toList == List(10.0, 10.0, 10.0))
  }

  test("fill_null strategies") {
    val df = DataFrame(Seq[java.lang.Double](1.0, null, 3.0).toDF("v"))
    def s(name: String) = df.select(col("v").fillNullStrategy(name).alias("f"))
      .toSpark.collect().map(r => Option(r.get(0)))
    assert(s("forward").toSeq == Seq(Some(1.0), Some(1.0), Some(3.0)))
    assert(s("backward").toSeq == Seq(Some(1.0), Some(3.0), Some(3.0)))
    assert(s("zero")(1) == Some(0.0))
    assert(s("mean")(1) == Some(2.0))
    assert(s("min")(1) == Some(1.0))
    assert(s("max")(1) == Some(3.0))
  }

  test("transpose is executor-side and matches the reference shape") {
    val df = graft.api.DataFrame(
      Seq((1, "a", 2.5), (2, "b", 3.5), (3, null.asInstanceOf[String], 4.5))
        .toDF("x", "s", "d").repartition(3))
    val t = df.transpose()
    assert(t.columns == Seq("column", "column_0", "column_1", "column_2"))
    val rows = t.toSpark.collect().map(_.toSeq)
    assert(rows(0) == Seq("x", "1", "2", "3"))
    assert(rows(1) == Seq("s", "a", "b", null))
    assert(rows(2) == Seq("d", "2.5", "3.5", "4.5"))
    // no header variant + empty frame
    assert(df.transpose(includeHeader = false).columns == Seq("column_0", "column_1", "column_2"))
    val empty = graft.api.DataFrame(Seq.empty[(Int, String)].toDF("x", "s"))
    assert(empty.transpose().toSpark.collect().map(_.getString(0)).toSeq == Seq("x", "s"))
  }
}
