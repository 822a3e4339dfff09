package graft
import org.apache.spark.sql.{functions => F}

/** Pins the conservative aggregate-free proof behind polars' implicit
  * implode: DSL-only aggregates (product/mode/count_min_sketch) are NOT
  * registry-resolvable and must stay un-imploded. */
class AggCheckSpec extends SparkSpec {
  test("provablyAggregateFree: false for aggregates and unresolvables, true for elementwise") {
    import org.apache.spark.sql.GraftInternalOps.provablyAggregateFree
    for (c <- Seq(F.sum(F.col("v")), F.mode(F.col("v")), F.product(F.col("v")),
        F.first(F.col("v")), F.collect_list(F.col("v")),
        F.percentile(F.col("v"), F.lit(0.5)),
        F.count_min_sketch(F.col("v"), F.lit(0.1), F.lit(0.1), F.lit(1)),
        F.sum(F.col("v")).over(org.apache.spark.sql.expressions.Window.partitionBy(F.col("k")))))
      assert(!provablyAggregateFree(c), c.toString)
    for (c <- Seq(F.col("v") * 2, F.abs(F.col("v")), F.col("v"),
        F.coalesce(F.col("v"), F.lit(0)), F.upper(F.col("s"))))
      assert(provablyAggregateFree(c), c.toString)
  }
}
