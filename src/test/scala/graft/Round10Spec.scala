package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-10 review fixes: calendar group_by_dynamic closed modes, per-group
  * datapoint/weekday origins, calendar rolling name overwrite + empty-window
  * count, lockstep explode null-pad, Series reference defaults. */
class Round10Spec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("calendar group_by_dynamic honors closed: boundary row rolls back on right") {
    val df = DataFrame(Seq(
      (ts("2024-02-10 12:00:00"), 1.0),
      (ts("2024-03-01 00:00:00"), 2.0), // exactly on the month boundary
      (ts("2024-03-15 08:00:00"), 4.0)).toDF("t", "v"))
    def run(closed: String): Map[String, (Long, Double)] =
      df.groupByDynamic("t", every = "1mo", closed = closed)
        .agg(Expr(F.count(F.lit(1))).alias("n"), col("v").sum.alias("sv"))
        .toSpark.collect()
        .map(r => r.getTimestamp(0).toString.take(10) ->
          (r.getLong(1), r.getDouble(2))).toMap
    // left (default): Mar-01 belongs to March
    assert(run("left") == Map("2024-02-01" -> (1L, 1.0), "2024-03-01" -> (2L, 6.0)))
    // right: (Feb1, Mar1] — Mar-01 rolls back into February's window
    assert(run("right") == Map("2024-02-01" -> (2L, 3.0), "2024-03-01" -> (1L, 4.0)))
    // both: Mar-01 joins BOTH windows
    assert(run("both") == Map("2024-02-01" -> (2L, 3.0), "2024-03-01" -> (2L, 6.0)))
    // none: Mar-01 joins neither
    assert(run("none") == Map("2024-02-01" -> (1L, 1.0), "2024-03-01" -> (1L, 4.0)))
  }

  test("group_by_dynamic start_by=datapoint anchors per by-group") {
    val df = DataFrame(Seq(
      ("a", ts("2024-01-01 00:17:00"), 1.0),
      ("a", ts("2024-01-01 00:50:00"), 2.0),
      ("a", ts("2024-01-01 01:20:00"), 4.0),
      ("b", ts("2024-01-01 05:03:00"), 8.0),
      ("b", ts("2024-01-01 05:40:00"), 16.0),
      ("b", ts("2024-01-01 06:10:00"), 32.0)).toDF("k", "t", "v"))
    val out = df.groupByDynamic("t", every = "1h", by = Seq("k"), startBy = "datapoint")
      .agg(col("v").sum.alias("sv"))
      .toSpark.collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 16), r.getDouble(2)))
      .toSet
    // each group's grid starts at ITS first datapoint, not the global min
    assert(out == Set(
      ("a", "00:17", 3.0), ("a", "01:17", 4.0),
      ("b", "05:03", 24.0), ("b", "06:03", 32.0)), out)
  }

  test("group_by_dynamic start_by=monday anchors at the Monday before the first datapoint") {
    // first datapoint Thursday 2021-12-16 (reference lazy_frame.rb start_by
    // docs example: windows start Monday 2021-12-13); every=2w would expose
    // an epoch-anchored grid (epoch Mondays are 1970-01-05 + 2w*k, which is
    // NOT aligned with 2021-12-13)
    val df = DataFrame(Seq(
      (ts("2021-12-16 00:00:00"), 1.0),
      (ts("2021-12-20 00:00:00"), 2.0),
      (ts("2022-01-05 00:00:00"), 4.0)).toDF("t", "v"))
    val out = df.groupByDynamic("t", every = "2w", startBy = "monday")
      .agg(col("v").sum.alias("sv"))
      .toSpark.collect().map(r => r.getTimestamp(0).toString.take(10) -> r.getDouble(1)).toMap
    assert(out == Map("2021-12-13" -> 3.0, "2021-12-27" -> 4.0), out)
  }

  test("calendar rolling agg named after an existing column overwrites it") {
    val df = DataFrame(Seq(
      (ts("2024-01-10 00:00:00"), 1.0),
      (ts("2024-01-20 00:00:00"), 2.0),
      (ts("2024-02-05 00:00:00"), 4.0)).toDF("t", "v"))
    val out = df.rolling("t", "1mo").agg("v" -> col("v").sum)
      .toSpark.orderBy("t").select("v").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 3.0, 7.0), out)
  }

  test("calendar rolling count over an empty window is 0, like the fixed path") {
    val df = DataFrame(Seq(
      (ts("2024-01-10 00:00:00"), 1.0),
      (ts("2024-03-20 00:00:00"), 2.0)).toDF("t", "v"))
    // closed=none excludes t itself; the two rows are months apart, so each
    // window is empty
    val cal = df.rolling("t", "1mo", closed = "none")
      .agg("n" -> Expr(F.count(F.lit(1))), "sv" -> col("v").sum)
      .toSpark.orderBy("t").collect()
      .map(r => (r.getLong(r.fieldIndex("n")), r.getDouble(r.fieldIndex("sv")))).toSeq
    // polars: sum over an empty window group is 0, not null (expr.rb:2713
    // filter golden — sum of an empty slice is the additive identity)
    assert(cal == Seq((0L, 0.0), (0L, 0.0)), cal.mkString(","))
    val fixed = df.rolling("t", "30d", closed = "none")
      .agg("n" -> Expr(F.count(F.lit(1))), "sv" -> col("v").sum)
      .toSpark.orderBy("t").collect()
      .map(r => (r.getLong(r.fieldIndex("n")), r.getDouble(r.fieldIndex("sv")))).toSeq
    assert(fixed == cal)
  }

  test("lockstep explode null-pads a NULL list instead of collapsing the row") {
    val df = DataFrame(Seq(
      (1L, Seq("x", "y"), Option(Seq(10, 20))),
      (2L, Seq("z", "w"), Option.empty[Seq[Int]])).toDF("id", "a", "b"))
    val out = df.explode("a", "b").toSpark.orderBy("id", "a").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)))).toSeq
    assert(out == Seq(
      (1L, "x", Some(10)), (1L, "y", Some(20)),
      (2L, "w", None), (2L, "z", None)), out)
  }

  test("Series#entropy defaults to normalize=false (reference series.rb:1144)") {
    val s = Series("p", Seq(0.2, 0.3))
    val raw = -(0.2 * math.log(0.2) + 0.3 * math.log(0.3))
    assert(math.abs(s.entropy().asInstanceOf[Double] - raw) < 1e-12)
    // Expr surface keeps normalize=true (expr.rb:6637)
    val sum = 0.5
    val norm = -Seq(0.2, 0.3).map(_ / sum).map(p => p * math.log(p)).sum
    val e = DataFrame(Seq(0.2, 0.3).toDF("p"))
      .select(col("p").entropy(math.E).alias("e"))
      .toSpark.collect()(0).getDouble(0)
    assert(math.abs(e - norm) < 1e-12)
  }

  test("Series string describe counts null as a unique value") {
    val s = Series("s", Seq[Any]("a", "b", null))
    val desc = s.describe().toSpark.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(desc("unique") == 3L, desc)
  }

  test("fixed-path rolling aggs see ORIGINAL columns even when an agg shadows one") {
    // keyed and keyless fixed paths: an agg output named after an existing
    // column must not shadow it for the aggs that follow
    val df = DataFrame(Seq(
      ("a", ts("2024-01-01 00:00:00"), 2.0),
      ("a", ts("2024-01-01 00:10:00"), 4.0),
      ("a", ts("2024-01-01 00:20:00"), 8.0)).toDF("k", "t", "v"))
    def check(byKeys: Seq[String]): Unit = {
      val out = df.rolling("t", "15m", by = byKeys)
        .agg("v" -> col("v").sum, "m" -> col("v").mean)
        .toSpark.orderBy("t").select("v", "m").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
      // windows (t-15m, t]: sums 2, 6, 12; means of the ORIGINAL v: 2, 3, 6
      assert(out == Seq((2.0, 2.0), (6.0, 3.0), (12.0, 6.0)), s"$byKeys: $out")
    }
    check(Seq("k")) // keyed range frame
    check(Nil)      // keyless phantom-carry kernel
  }

  test("index-count windows require integer index columns and reject expr-level use") {
    val tdf = DataFrame(Seq((ts("2024-01-01 00:00:00"), 1.0)).toDF("t", "v"))
    val e1 = intercept[IllegalArgumentException] {
      tdf.rolling("t", "100i").agg("s" -> col("v").sum).toSpark.collect()
    }
    assert(e1.getMessage.contains("integer index column"))
    val e2 = intercept[IllegalArgumentException] {
      tdf.groupByDynamic("t", every = "10i").agg(col("v").sum.alias("s")).toSpark.collect()
    }
    assert(e2.getMessage.contains("integer index column"))
    val e3 = intercept[IllegalArgumentException] {
      col("v").rollingSumBy(col("t"), "2i")
    }
    assert(e3.getMessage.contains("expression level"))
  }

  test("Series.filter rejects a length-mismatched mask") {
    val s = Series("x", Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    val m = Series("m", Seq(true, false, true))
    val e = intercept[IllegalArgumentException] { s.filter(m) }
    assert(e.getMessage.contains("mask length"))
  }

  test("index/temporal offset unit mismatches raise directed errors") {
    val df = DataFrame(Seq((1L, 1.0), (2L, 2.0)).toDF("i", "v"))
    val e1 = intercept[IllegalArgumentException] {
      df.groupByDynamic("i", every = "500i", offset = Some("1h"))
        .agg(col("v").sum.alias("sv")).toSpark.collect()
    }
    assert(e1.getMessage.contains("pure index count"))
    val df2 = DataFrame(Seq((ts("2024-01-01 00:00:00"), 1.0)).toDF("t", "v"))
    val e2 = intercept[IllegalArgumentException] {
      df2.groupByDynamic("t", every = "1h", offset = Some("5i"))
        .agg(col("v").sum.alias("sv")).toSpark.collect()
    }
    assert(e2.getMessage.contains("index-count offset"))
  }
}
