package graft

import graft.Polars._
import graft.api.LazyFrame
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-12 discipline pins: the emptied OracleLint allowlist, the decimal
  * exact-sum helpers, and the GroupBy.agg duplicate-output guard (advisor
  * round 11: agg must reject colliding default names like select does). */
class DisciplineSpec extends SparkSpec {
  import spark.implicits._

  test("OracleLint allowlist is empty and the full oracle map is hazard-free") {
    assert(OracleLint.reviewedHazards.isEmpty)
    val hz = OracleLint.hazards(SparkEntry.oracleSql)
    assert(hz.isEmpty, s"raw-double sum/avg hazards in oracle SQL: ${hz.toSeq.sorted.mkString(", ")}")
  }

  test("decSum/decMean: exact decimal accumulation presented as double") {
    val df = LazyFrame(Seq(("a", 0.1), ("a", 0.2), ("b", 0.3)).toDF("k", "v"))
    val out = df.groupBy("k")
      .agg(
        DecimalDiscipline.decSum(col("v"), 2).alias("s"),
        DecimalDiscipline.decMean(col("v"), 2).alias("m"))
      .sortBy(Seq(col("k"))).collect().toSpark.collect()
    // 0.1 + 0.2 in raw doubles is 0.30000000000000004; decimal sum is exact
    assert(out(0).getDouble(1) == 0.3)
    assert(out(0).getDouble(2) == 0.15)
    assert(out(1).getDouble(1) == 0.3)
    assert(out.head.schema("s").dataType == org.apache.spark.sql.types.DoubleType)
  }

  test("group_by().agg rejects colliding default output names (polars DuplicateError)") {
    val df = LazyFrame(Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v"))
    val ex = intercept[IllegalArgumentException] {
      df.groupBy("k").agg(col("v").sum, col("v").mean).collect().toSpark.collect()
    }
    assert(ex.getMessage.contains("duplicate"), ex.getMessage)
    // an agg output colliding with a group key collides too
    val ex2 = intercept[IllegalArgumentException] {
      df.groupBy("k").agg(col("v").sum.alias("k")).collect().toSpark.collect()
    }
    assert(ex2.getMessage.contains("duplicate"), ex2.getMessage)
  }
}
