package graft

import graft.ext.{GraftExtensions, StrReplaceN}
import graft.Polars._
import graft.api.DataFrame

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("StrReplaceN static helper semantics") {
    assert(StrReplaceN.replaceN("aXbXcX", "X", "-", 2) == "a-b-cX")
    assert(StrReplaceN.replaceN("aXbX", "X", "-", 0) == "aXbX")
    assert(StrReplaceN.replaceN("abc", "z", "-", 3) == "abc")
    assert(StrReplaceN.replaceN("a1b22c", "[0-9]+", "#", 1) == "a#b22c")
  }

  test("graft_replace_n resolves via registry in SQL and DSL, codegen path") {
    GraftExtensions.register(spark)
    val sqlOut = spark.sql("SELECT graft_replace_n('xAyAzA', 'A', '_', 2) AS r")
      .collect()(0).getString(0)
    assert(sqlOut == "x_y_zA")
    val df = DataFrame(Seq("fooXbarXbaz", "noX").toDF("t"))
    val out = df.select(col("t").str.replaceN("X", "|", 1).alias("r"))
      .toSpark.collect().map(_.getString(0))
    assert(out.toSeq == Seq("foo|barXbaz", "no|"))
    // null propagation
    val nulls = DataFrame(Seq[(Integer, String)]((1, null)).toDF("i", "t"))
    assert(nulls.select(col("t").str.replaceN("a", "b", 1).alias("r"))
      .toSpark.collect()(0).isNullAt(0))
  }
}
