package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** Round-15 pins for the round-14 advisor items: (a) flatten's group
  * aggregate is row-order-sensitive (GroupAggForm.orderSensitive forces the
  * repartition+sort discipline on multi-partition data); (b) plain
  * row-index exprs (implode/gather/agg_groups of a bare column) mixed with
  * per-group forms (element-mode quantile) attach the hidden index;
  * (c) IEEE division edge cases — NaN/0, ±1/−0.0, null propagation. */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  test("agg(flatten) concatenates in row order on multi-partition data") {
    // spark.range on local[4] plans 4 ordered partitions — pre-fix the
    // flatten-only agg skipped the repartition+sortWithinPartitions and
    // concatenation order was partition-arbitrary
    val n = 1000L
    val base = spark.range(n).select(
      (F.col("id") % 7).as("k"),
      F.array(F.col("id"), F.col("id") * 10).as("vs"))
    assert(base.rdd.getNumPartitions > 1, "test needs multi-partition input")
    val got = DataFrame(base).groupBy("k").agg(col("vs").flatten.alias("flat"))
      .sortBy(Seq(col("k"))).toSpark.collect()
    assert(got.length == 7)
    got.foreach { r =>
      val k = r.getLong(0)
      val expect = (k until n by 7).flatMap(i => Seq(i, i * 10L))
      assert(r.getSeq[Long](1) == expect, s"group $k out of row order")
    }
  }

  test("mixing a plain row-index expr (implode) with an element-mode quantile resolves") {
    // pre-fix: needsIdx only consulted the per-group forms, so the plain
    // implode's hidden-row-index reference failed to resolve
    val df = DataFrame(Seq(
      ("a", 1.0), ("a", 3.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"))
    val got = df.groupBy("k").agg(
      col("v").implode.alias("vals"),
      col("v").quantile(0.5, "lower").alias("q"))
      .sortBy(Seq(col("k"))).toSpark.collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", Seq(1.0, 3.0, 2.0), 2.0), // implode in ROW order; lower-median of {1,2,3}
      ("b", Seq(5.0), 5.0)))
  }

  test("agg_groups mixed with an element-mode quantile attaches the row index") {
    val df = DataFrame(Seq(
      ("a", 10.0), ("b", 20.0), ("a", 30.0)).toDF("k", "v"))
    val got = df.groupBy("k").agg(
      col("v").aggGroups.alias("idx"),
      col("v").quantile(0.5, "higher").alias("q"))
      .sortBy(Seq(col("k"))).toSpark.collect()
      .map(r => (r.getString(0), r.getSeq[Long](1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", Seq(0L, 2L), 30.0),
      ("b", Seq(1L), 20.0)))
  }

  test("IEEE division: NaN numerator at zero divisor is NaN, -0.0 divisor flips the sign") {
    val df = DataFrame(Seq(
      (Double.NaN, 0.0), (1.0, -0.0), (-1.0, -0.0), (0.0, 0.0),
      (1.0, 0.0), (-1.0, 0.0), (6.0, 3.0), (Double.NaN, 2.0)).toDF("a", "b"))
    val got = df.select((col("a") / col("b")).alias("d"))
      .toSpark.collect().map(_.getDouble(0))
    assert(got(0).isNaN, s"NaN/0 must be NaN, got ${got(0)}")
    assert(got(1) == Double.NegativeInfinity, s"1/-0.0 must be -inf, got ${got(1)}")
    assert(got(2) == Double.PositiveInfinity, s"-1/-0.0 must be +inf, got ${got(2)}")
    assert(got(3).isNaN, s"0/0 must be NaN, got ${got(3)}")
    assert(got(4) == Double.PositiveInfinity)
    assert(got(5) == Double.NegativeInfinity)
    assert(got(6) == 2.0)
    assert(got(7).isNaN, "NaN/2 must be NaN")
  }

  test("IEEE division: null numerator or divisor stays null, even at zero") {
    val df = DataFrame(Seq[(java.lang.Double, java.lang.Double)](
      (null, 0.0), (null, 2.0), (1.0, null), (null, null)).toDF("a", "b"))
    val got = df.select((col("a") / col("b")).alias("d")).toSpark.collect()
    assert(got.forall(_.isNullAt(0)), "null operands must propagate null")
  }
}
