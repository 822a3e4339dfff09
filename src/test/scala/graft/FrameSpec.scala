package graft

import graft.Polars._
import graft.api.{DataFrame, LazyFrame, SQLContext}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

class FrameSpec extends SparkSpec {
  import spark.implicits._

  private def df = DataFrame(
    Seq((1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0), (4, "c", 4.0), (5, "b", 5.0))
      .toDF("id", "k", "v"))

  test("head/tail/slice/reverse preserve row order semantics") {
    assert(df.head(2).toSpark.collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(df.tail(2).toSpark.collect().map(_.getInt(0)).toSeq == Seq(4, 5))
    assert(df.slice(1, 2).toSpark.collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    assert(df.reverse.toSpark.collect().map(_.getInt(0)).toSeq == Seq(5, 4, 3, 2, 1))
    assert(df.gatherEvery(2).toSpark.collect().map(_.getInt(0)).toSeq == Seq(1, 3, 5))
  }

  test("with_row_index") {
    val out = df.withRowIndex("idx").toSpark.collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.head.schema.fieldNames.head == "idx")
  }

  test("unique keep first/last/none") {
    val d = DataFrame(Seq((1, "x"), (2, "x"), (3, "y")).toDF("id", "k"))
    assert(d.unique(Seq("k"), keep = "first").toSpark.collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(d.unique(Seq("k"), keep = "last").toSpark.collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
    assert(d.unique(Seq("k"), keep = "none").toSpark.collect()
      .map(_.getInt(0)).toSeq == Seq(3))
  }

  test("joins: suffix handling and how variants") {
    val left = DataFrame(Seq((1, "l1"), (2, "l2")).toDF("id", "name"))
    val right = DataFrame(Seq((2, "r2"), (3, "r3")).toDF("id", "name"))
    val inner = left.join(right, Seq("id"))
    assert(inner.columns == Seq("id", "name", "name_right"))
    assert(inner.toSpark.collect().length == 1)
    assert(left.join(right, Seq("id"), how = "full").toSpark.collect().length == 3)
    assert(left.join(right, Seq("id"), how = "anti").toSpark.collect()
      .map(_.getInt(0)).toSeq == Seq(1))
  }

  test("join_nulls null-safe condition") {
    val l = DataFrame(Seq[(Integer, String)]((1, "a"), (null, "b")).toDF("id", "lv"))
    val r = DataFrame(Seq[(Integer, String)]((1, "x"), (null, "y")).toDF("id", "rv"))
    assert(l.join(r, Seq("id"), joinNulls = true).toSpark.collect().length == 2)
    assert(l.join(r, Seq("id")).toSpark.collect().length == 1)
  }

  test("group_by head/tail") {
    val out = df.groupBy("k").head(1).toSpark.collect().map(_.getInt(0)).sorted.toSeq
    assert(out == Seq(1, 2, 4))
  }

  test("pivot and unpivot round-trip shape") {
    val p = df.pivotValues("k", Seq("a", "b", "c"), Seq.empty[String], "v", "sum")
    // no index cols: single row of sums — use a constant index instead
    val d2 = df.withColumn("g", lit(1))
    val p2 = d2.pivotValues("k", Seq("a", "b", "c"), Seq("g"), "v", "sum")
    val row = p2.toSpark.collect()(0)
    assert(row.getDouble(row.fieldIndex("a")) == 4.0)
    assert(row.getDouble(row.fieldIndex("b")) == 7.0)
    val up = d2.unpivot(Seq("v"), Seq("id", "k"))
    assert(up.toSpark.collect().length == 5)
  }

  test("explode with empty list keeps row (polars explode semantics)") {
    val d = DataFrame(Seq((1, Seq(10, 20)), (2, Seq.empty[Int])).toDF("id", "l"))
    val out = d.explode("l").toSpark.collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(1)) == 1)
  }

  test("explode multiple columns in lockstep + explodeWith position") {
    val d = DataFrame(Seq(
      (1, Seq(10, 20), Seq("a", "b")),
      (2, Seq.empty[Int], Seq.empty[String])).toDF("id", "l", "m"))
    val out = d.explode("l", "m").toSpark.collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1),
      r.getString(2))).toSeq == Seq((1, 10, "a"), (1, 20, "b"), (2, null, null)))
    val pos = d.explodeWith("pos", "l", "m").toSpark.collect()
    assert(pos.map(r => if (r.isNullAt(3)) -1 else r.getInt(3)).toSeq == Seq(0, 1, -1))
    // documented divergence: mismatched lengths null-pad (polars raises)
    val mm = DataFrame(Seq((1, Seq(10, 20), Seq("a"))).toDF("id", "l", "m"))
      .explode("l", "m").toSpark.collect()
    assert(mm.length == 2 && mm(1).isNullAt(2))
  }

  test("unnest struct") {
    val d = DataFrame(Seq((1, ("x", 9))).toDF("id", "s"))
    val out = d.unnest("s")
    assert(out.columns == Seq("id", "_1", "_2"))
  }

  test("to_dummies") {
    val out = df.toDummies(Seq("k")).toSpark.collect()
    val schema = df.toDummies(Seq("k")).columns
    assert(schema.contains("k_a") && schema.contains("k_b") && schema.contains("k_c"))
    assert(out.map(_.getByte(2).toInt).sum == 2) // two 'a' rows
  }

  test("concat vertical and diagonal") {
    val a = DataFrame(Seq((1, "x")).toDF("i", "s"))
    val b = DataFrame(Seq((2, "y")).toDF("i", "s"))
    assert(Polars.concat(Seq(a, b)).toSpark.collect().length == 2)
    val c = DataFrame(Seq((3, true)).toDF("i", "flag"))
    val diag = Polars.concat(Seq(a, c), how = "diagonal")
    assert(diag.columns.toSet == Set("i", "s", "flag"))
    assert(diag.toSpark.collect().length == 2)
  }

  test("hstack positional") {
    val a = DataFrame(Seq(1, 2, 3).toDF("x"))
    val b = DataFrame(Seq("p", "q", "r").toDF("y"))
    val out = a.hstack(b).toSpark.collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSet == Set((1, "p"), (2, "q"), (3, "r")))
    // mismatched layouts (different partition counts) take the index-join path
    val c = DataFrame(Seq("p", "q", "r").toDF("y").repartition(7))
    val out2 = a.hstack(c).toSpark.collect()
    assert(out2.map(r => (r.getInt(0), r.getString(1))).toSet.size == 3)
  }

  test("hstack of same-base projections is shuffle-free") {
    val p = java.nio.file.Files.createTempDirectory("graft-hstack").toFile
    p.deleteOnExit()
    val path = p.getAbsolutePath + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
      .write.parquet(path)
    val base = DataFrame(spark.read.parquet(path))
    val left = base.select(col("k"))
    val right = base.select(col("s"), col("v"))
    val stacked = left.hstack(right)
    val rows = stacked.toSpark.orderBy("k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    // aligned-zip fast path: the zipped result's plan has no Exchange at all
    val plan = stacked.toSpark.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("hstack fusion edge cases: computed projections, filters, collisions") {
    val p = java.nio.file.Files.createTempDirectory("graft-hstack2").toFile
    p.deleteOnExit()
    val path = p.getAbsolutePath + "/t"
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v").write.parquet(path)
    val base = DataFrame(spark.read.parquet(path))
    // computed projections over the same base fuse and stay correct
    val f1 = base.select((col("k") * 10).alias("k10"))
      .hstack(base.select((col("v") + 1).alias("v1")))
    val r1 = f1.toSpark.orderBy("k10").collect()
    assert(r1.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((10L, 11.0), (20L, 21.0), (30L, 31.0)))
    assert(!f1.toSpark.queryExecution.executedPlan.toString.contains("Exchange"))
    // same filtered base (one instance) still fuses
    val filt = base.filter(col("v") > 15.0)
    val f2 = filt.select(col("k")).hstack(filt.select(col("v")))
    assert(f2.toSpark.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(!f2.toSpark.queryExecution.executedPlan.toString.contains("Exchange"))
    // DIFFERENT filters must not fuse (row sets differ) — falls back and the
    // index join zips each side's own 2 rows positionally
    val g = base.filter(col("v") > 15.0).select(col("k"))
      .hstack(DataFrame(Seq(100L, 200L).toDF("m")))
    assert(g.toSpark.collect().length == 2)
    // name collision falls back to the historical dup-column behavior
    val h = base.select(col("k")).hstack(base.select(col("k")))
    assert(h.toSpark.columns.count(_ == "k") == 2)
  }

  test("sort with nulls handling and stability tiebreak") {
    val d = DataFrame(Seq[(Integer, String)]((3, "c"), (null, "n"), (1, "a")).toDF("v", "s"))
    val nf = d.sort("v").toSpark.collect().map(r => Option(r.get(0)))
    assert(nf.head.isEmpty) // nulls first by default (polars default nulls_last: false)
    val nl = d.sort("v", nullsLast = true).toSpark.collect().map(r => Option(r.get(0)))
    assert(nl.last.isEmpty)
  }

  test("SQLContext register/execute") {
    val ctx = new SQLContext(spark)
    ctx.register("t_frame", df)
    val out = ctx.execute("SELECT k, sum(v) AS s FROM t_frame GROUP BY k ORDER BY k")
      .collect().toSpark.collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 4.0), ("b", 7.0), ("c", 4.0)))
  }

  test("group_by_dynamic tumbling windows") {
    val d = DataFrame(Seq(
      ("2024-01-01 00:05:00", 1.0), ("2024-01-01 00:20:00", 2.0),
      ("2024-01-01 01:10:00", 4.0)).toDF("s", "v"))
      .withColumn("ts", col("s").str.toDatetime())
    val out = d.groupByDynamic("ts", every = "1h")
      .agg(col("v").sum.alias("sv"), Expr(F.count(F.lit(1))).alias("n"))
      .toSpark.collect()
    assert(out.length == 2)
    val bySum = out.map(r => r.getDouble(r.fieldIndex("sv"))).sorted.toSeq
    assert(bySum == Seq(3.0, 4.0))
  }

  test("merge_sorted interleaves") {
    val a = DataFrame(Seq(1, 3, 5).toDF("k"))
    val b = DataFrame(Seq(2, 4).toDF("k"))
    assert(a.mergeSorted(b, "k").toSpark.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("lazy collect and plan description") {
    val l = df.lazyFrame.filter(col("v") > 2.0).select(col("id"))
    assert(l.describeOptimizedPlan().nonEmpty)
    assert(l.collect().toSpark.collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 4, 5))
  }
}
