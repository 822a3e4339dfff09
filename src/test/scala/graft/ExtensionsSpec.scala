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

  test("graft_minhash: one-pass signature matches MinHash invariants") {
    GraftExtensions.register(spark)
    // identical texts -> identical signatures; near texts share most entries;
    // far texts share few. Whitespace/case normalization is applied.
    val base = "The quick  brown fox jumps over the lazy dog and runs away tonight"
    val near = base.replace("tonight", "today")
    val far = "completely different content about columnar query engines"
    val df = Seq((1L, base), (2L, base.toLowerCase), (3L, near), (4L, far)).toDF("id", "t")
    val sigs = df.select(org.apache.spark.sql.functions.col("id"),
        graft.ml.Dedup.minhashSignature(org.apache.spark.sql.functions.col("t"), 32, 5).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).size == 32)
    assert(sigs(1L) == sigs(2L)) // case-normalized
    val shareNear = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val shareFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(shareNear > 20, s"near dup should share most minhashes, got $shareNear/32")
    assert(shareFar < 8, s"unrelated should share few minhashes, got $shareFar/32")
    // SQL registry path
    val n = spark.sql("SELECT size(graft_minhash('hello world', 5, 16)) AS n")
      .collect()(0).getInt(0)
    assert(n == 16)
    // null propagation
    val nullSig = Seq[(Long, String)]((1L, null)).toDF("id", "t")
      .select(graft.ml.Dedup.minhashSignature(org.apache.spark.sql.functions.col("t")).as("s"))
    assert(nullSig.collect()(0).isNullAt(0))
    // invalid k / numHashes are explicit errors, not NegativeArraySize or
    // silently-empty signatures
    val badK = intercept[IllegalArgumentException](
      graft.ext.MinHashSig.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("x"), 0, 16))
    assert(badK.getMessage.contains("shingle"))
    val badN = intercept[IllegalArgumentException](
      graft.ext.MinHashSig.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("x"), 5, -1))
    assert(badN.getMessage.contains("numHashes"))
  }
}
