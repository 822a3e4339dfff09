package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** Expr/Series any/all boolean aggregates (reference expr.rb:198,223,
  * series.rb:534-560), incl. the Kleene drop_nulls=false forms. */
class BoolAggSpec extends SparkSpec {
  import spark.implicits._

  private def frame(vs: Seq[Option[Boolean]]): DataFrame =
    DataFrame(vs.map(_.map(Boolean.box).orNull).toDF("b"))

  private def ev(vs: Seq[Option[Boolean]], e: graft.expr.Expr): Any =
    frame(vs).toSpark.select(e.col).collect()(0).get(0)

  private val T = Some(true); private val Fa = Some(false); private val N = None

  test("any/all drop_nulls=true ignore nulls; empty/all-null defaults") {
    assert(ev(Seq(T, Fa, N), col("b").any()) == true)
    assert(ev(Seq(Fa, N), col("b").any()) == false)
    assert(ev(Seq.empty, col("b").any()) == false)
    assert(ev(Seq(T, N), col("b").all()) == true)
    assert(ev(Seq(T, Fa), col("b").all()) == false)
    assert(ev(Seq.empty, col("b").all()) == true)
    assert(ev(Seq(N, N), col("b").all()) == true)
  }

  test("any/all drop_nulls=false use Kleene logic") {
    assert(ev(Seq(T, N), col("b").any(false)) == true)      // true dominates
    assert(ev(Seq(Fa, N), col("b").any(false)) == null)     // unknown
    assert(ev(Seq(Fa, Fa), col("b").any(false)) == false)
    assert(ev(Seq(Fa, N), col("b").all(false)) == false)    // false dominates
    assert(ev(Seq(T, N), col("b").all(false)) == null)      // unknown
    assert(ev(Seq(T, T), col("b").all(false)) == true)
  }

  test("any/all inside group_by().agg aggregate per group") {
    val df = DataFrame(Seq(("a", true), ("a", false), ("b", true), ("b", true))
      .toDF("k", "b"))
    val out = df.groupBy("k")
      .agg(col("b").any().alias("any_b"), col("b").all().alias("all_b"))
      .sortBy(Seq(col("k"))).toSpark.collect()
    assert(out.map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSeq ==
      Seq(("a", true, false), ("b", true, true)))
  }

  test("composite aggregates broadcast per key under over()") {
    val df = DataFrame(Seq(
      ("a", Some(true)), ("a", None), ("b", Some(false)), ("b", Some(false)),
      ("c", Some(true)), ("c", Some(true))).map { case (k, v) =>
      (k, v.map(Boolean.box).orNull)
    }.toDF("k", "b"))
    val out = df.withColumns(
        "any_k" -> col("b").any(false).over(col("k")),
        "all_k" -> col("b").all(false).over(col("k")))
      .toSpark.select("k", "any_k", "all_k").distinct().collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getBoolean(1),
        if (r.isNullAt(2)) null else r.getBoolean(2))).toSet
    assert(out == Set(("a", true, null), ("b", false, false), ("c", true, true)))
  }

  test("std(ddof=0) windows per key (composite rescale arithmetic)") {
    val df = DataFrame(Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0), ("b", 4.0))
      .toDF("k", "v"))
    val out = df.withColumn("s0", col("v").std(0).over(col("k")))
      .toSpark.select("k", "s0").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // population std: a = std of {1,3} = 1; b = std of {2,6,4} = sqrt(8/3)
    assert(math.abs(out("a") - 1.0) < 1e-12)
    assert(math.abs(out("b") - math.sqrt(8.0 / 3)) < 1e-12)
  }

  test("series any/all/none") {
    val s = graft.api.Series("s",
      Seq(Some(false), None).map(_.map(Boolean.box).orNull).toDF("s"))
    assert(s.any() == false)
    assert(s.any(ignoreNulls = false) == null)
    assert(s.all() == false)
    assert(s.none)
  }
}
