package graft

import org.apache.spark.sql.{functions => F}

import graft.kernel.Quantiles

/** Histogram-refinement selection kernel: exact parity with a local sort
  * across adversarial value distributions. */
class QuantilesSpec extends SparkSpec {

  private def check(values: Seq[java.lang.Double], ranks: Seq[Long], clue: String): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(values.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    val got = Quantiles.orderStats(df, Seq(Quantiles.Req.at("v", ranks)))
      .get("v").map(_.at).getOrElse(Map.empty)
    // local reference: Spark double sort order (-Inf < finite < +Inf < NaN)
    val sorted = values.filter(_ != null).map(_.doubleValue).sorted(new Ordering[Double] {
      def compare(a: Double, b: Double): Int = java.lang.Double.compare(a, b)
    })
    for (r <- ranks) {
      if (r >= 0 && r < sorted.size) {
        val want = sorted(r.toInt)
        val g = got.get(r)
        assert(g.isDefined, s"$clue: rank $r unresolved (want $want)")
        if (want.isNaN) assert(g.get.isNaN, s"$clue: rank $r: got ${g.get}, want NaN")
        else assert(g.get == want, s"$clue: rank $r: got ${g.get}, want $want")
      } else assert(!got.contains(r), s"$clue: out-of-range rank $r resolved to ${got.get(r)}")
    }
  }

  test("uniform, duplicate-heavy, constant, and tiny domains match a local sort") {
    val rnd = new scala.util.Random(42)
    val uniform = Seq.fill(5000)(Double.box(rnd.nextDouble() * 1e6 - 5e5))
    check(uniform, Seq(0L, 1L, 1249L, 2500L, 3750L, 4998L, 4999L), "uniform")

    val dupes = Seq.fill(5000)(Double.box((rnd.nextInt(7) * 10).toDouble))
    check(dupes, Seq(0L, 100L, 2500L, 4999L), "7-distinct-values")

    val const = Seq.fill(1000)(Double.box(3.14))
    check(const, Seq(0L, 500L, 999L), "constant")

    val tiny = Seq(Double.box(2.0), Double.box(1.0), Double.box(3.0))
    check(tiny, Seq(0L, 1L, 2L, 3L, -1L), "three values + out-of-range")
  }

  test("nulls, NaN, infinities, and ulp-narrow bands resolve exactly") {
    val rnd = new scala.util.Random(7)
    val mixed: Seq[java.lang.Double] =
      Seq.fill(300)(Double.box(rnd.nextGaussian())) ++
        Seq.fill(40)(Double.box(Double.NaN)) ++
        Seq.fill(25)(Double.box(Double.PositiveInfinity)) ++
        Seq.fill(15)(Double.box(Double.NegativeInfinity)) ++
        Seq.fill(50)(null.asInstanceOf[java.lang.Double])
    // non-null count 380: ranks probing every region
    check(mixed, Seq(0L, 7L, 14L, 15L, 100L, 314L, 315L, 330L, 339L, 340L, 379L), "mixed")

    // two adjacent representable doubles — histogram width underflows to 0,
    // the value-count fallback must still split them exactly
    val base = 1.0
    val next = java.lang.Math.nextUp(base)
    val narrow = Seq.fill(700)(Double.box(base)) ++ Seq.fill(300)(Double.box(next))
    check(narrow, Seq(0L, 699L, 700L, 999L), "ulp-narrow")
  }

  test("multi-column request shares scans and resolves independently") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      org.apache.spark.sql.Row(Double.box(rnd.nextDouble() * 100),
        Double.box((i % 13).toDouble))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.DoubleType))))
    val got = Quantiles.orderStats(df,
      Seq(Quantiles.Req.at("a", Seq(0L, 999L, 2000L, 3999L)), Quantiles.Req.at("b", Seq(0L, 2000L, 3999L))))
    val la = df.select("a").collect().map(_.getDouble(0)).sorted
    val lb = df.select("b").collect().map(_.getDouble(0)).sorted
    assert(got("a").at(0L) == la(0) && got("a").at(999L) == la(999) &&
      got("a").at(2000L) == la(2000) && got("a").at(3999L) == la(3999))
    assert(got("b").at(0L) == lb(0) && got("b").at(2000L) == lb(2000) && got("b").at(3999L) == lb(3999))
  }

  test("interpolated quantiles match quantile_cont semantics") {
    val vals = Seq(10.0, 20.0, 30.0, 40.0, 50.0).map(Double.box)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))))
    val q = Quantiles.interpolated(df, Seq("v"), Seq(0.25, 0.5, 0.75))("v")
    assert(q == Seq(Some(20.0), Some(30.0), Some(40.0)))
  }

  test("qcut guards: out-of-range quantiles raise; wide decimals take the exact rank path") {
    import graft.Polars._
    val e = intercept[IllegalArgumentException] {
      col("v").qcut(Seq(1.5), Seq("a", "b"))
    }
    assert(e.getMessage.contains("[0, 1]"))
    // decimal(38,18): ulp-separated values collapse onto one double — the
    // cut-literal path would label everything "lo"; the rank fallback splits
    // them by the true order
    val rows = (Seq.fill(7)("1.000000000000000001") ++ Seq.fill(3)("1.000000000000000002"))
      .map(s => org.apache.spark.sql.Row(new java.math.BigDecimal(s)))
    val df = graft.api.DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.DecimalType(38, 18))))))
    val out = df.withColumn("b", col("d").qcut(Seq(0.5), Seq("lo", "hi")))
      .toSpark.select("d", "b").collect()
      .map(r => r.getDecimal(0).toPlainString -> r.getString(1))
    // pr(1.000...001) = 0 <= 0.5 -> lo; pr(1.000...002) = 7/9 > 0.5 -> hi
    assert(out.filter(_._1.endsWith("1")).forall(_._2 == "lo"), out.toSeq)
    assert(out.filter(_._1.endsWith("2")).forall(_._2 == "hi"), out.toSeq)
  }

  test("qcut min-rank parity: value-cut labeling equals the percent-rank rule on ties") {
    import graft.Polars._
    // duplicate-heavy so cut values land ON ties — the regime where the
    // v <= value_at_rank(floor(q*(n-1))) equivalence must hold exactly
    val rnd = new scala.util.Random(3)
    val rows = (1 to 2000).map(_ => org.apache.spark.sql.Row(
      if (rnd.nextInt(20) == 0) null else Double.box((rnd.nextInt(12) * 5).toDouble)))
    val df = graft.api.DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))))
    val out = df.withColumn("b", col("v").qcut(Seq(0.3, 0.7), Seq("a", "b", "c")))
      .toSpark.select("v", "b").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0))) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1))))
    // local min-rank percent-rank reference
    val nn = out.flatMap(_._1)
    val n = nn.length
    def pr(v: Double): Double = if (n <= 1) 0.0 else nn.count(_ < v).toDouble / (n - 1)
    out.foreach {
      case (None, b) => assert(b.isEmpty, "null value must keep a null bucket")
      case (Some(v), b) =>
        val want = if (pr(v) <= 0.3) "a" else if (pr(v) <= 0.7) "b" else "c"
        assert(b.contains(want), s"v=$v pr=${pr(v)}: got $b want $want")
    }
  }

  // ---- grouped element-mode quantile: two-pass rank selection (r13
  // verdict directive #1 — constant per-group agg state, no collect_list) ----

  private def groupedFrame(nRows: Int, nGroups: Int, seed: Int,
                           nullEvery: Int = 17): graft.api.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until nRows).map { i =>
      org.apache.spark.sql.Row(s"g${i % nGroups}",
        if (i % nullEvery == 0) null else Double.box(rnd.nextDouble() * 1000 - 500))
    }
    graft.api.DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))))
  }

  /** Local reference: polars element-pick over the sorted non-null group. */
  private def localPick(sorted: IndexedSeq[Double], q: Double, m: String): Option[Double] = {
    if (sorted.isEmpty) return None
    val h = q * (sorted.size - 1).toDouble
    val lo = sorted(math.floor(h).toInt); val hi = sorted(math.ceil(h).toInt)
    Some(m match {
      case "lower"    => lo
      case "higher"   => hi
      case "midpoint" => (lo + hi) / 2.0
      case "nearest"  => if (h - math.floor(h) >= 0.5) hi else lo
    })
  }

  test("grouped element modes: large groups match a local sort, with no collect_list in the plan") {
    import graft.Polars._
    // 2 groups x ~25k rows — the table-sized-group regime the old
    // sort_array(collect_list) spelling buffered per aggregation state
    val df = groupedFrame(50000, 2, 7)
    for (q <- Seq(0.0, 0.25, 0.37, 0.5, 0.9, 1.0); m <- Seq("lower", "higher", "midpoint", "nearest")) {
      val out = df.groupBy("k").agg(col("v").quantile(q, m).alias("qv"))
      val plan = out.toSpark.queryExecution.executedPlan.toString
      assert(!plan.contains("collect_list"),
        s"q=$q m=$m: grouped element-mode quantile must not buffer the group:\n$plan")
      val got = out.toSpark.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val local = df.toSpark.collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.flatMap(_._2).sorted.toIndexedSeq }
      for ((k, sorted) <- local)
        assert(got(k) == localPick(sorted, q, m).get, s"q=$q m=$m group $k")
    }
  }

  test("grouped element modes: all-null groups yield null, single-row groups the row") {
    import graft.Polars._
    val rows = Seq(
      org.apache.spark.sql.Row("a", null), org.apache.spark.sql.Row("a", null),
      org.apache.spark.sql.Row("b", Double.box(3.5)),
      org.apache.spark.sql.Row("c", Double.box(1.0)), org.apache.spark.sql.Row("c", Double.box(2.0)))
    val df = graft.api.DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))))
    for (m <- Seq("lower", "higher", "midpoint", "nearest")) {
      val got = df.groupBy("k").agg(col("v").quantile(0.5, m).alias("qv"))
        .sortBy(Seq(col("k"))).toSpark.collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      assert(got.toSeq == Seq("a" -> None, "b" -> Some(3.5),
        "c" -> Some(if (m == "midpoint") 1.5 else if (m == "higher" || m == "nearest") 2.0 else 1.0)), s"mode $m")
    }
  }

  test("quantile.over(keys): windowed per-key element modes match the grouped results") {
    import graft.Polars._
    val df = groupedFrame(4000, 5, 11)
    val agg = df.groupBy("k").agg(col("v").quantile(0.37, "nearest").alias("qv"))
      .toSpark.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val win = df.withColumn("qv", col("v").quantile(0.37, "nearest").over(col("k")))
      .toSpark.select("k", "qv").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(win == agg)
  }

  test("GroupBy.quantile shortcut defaults to nearest (group_by.rb:571), not linear") {
    import graft.Polars._
    val df = groupedFrame(3000, 3, 13)
    val shortcut = df.groupBy("k").quantile(0.37)
      .sortBy(Seq(col("k"))).toSpark.collect().map(r => r.getDouble(1))
    val explicit = df.groupBy("k").agg(col("v").quantile(0.37, "nearest").alias("v"))
      .sortBy(Seq(col("k"))).toSpark.collect().map(r => r.getDouble(1))
    assert(shortcut.toSeq == explicit.toSeq)
  }

  test("Series.quantile and quantileFrame route through the kernel and match the Expr spelling") {
    import graft.Polars._
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(20000)(Double.box(rnd.nextDouble() * 100)) ++ Seq(null, null)
    val s = graft.api.Series("x", spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.DoubleType)))))
    for (m <- Seq("lower", "higher", "midpoint", "nearest", "linear")) {
      val kq = s.quantile(0.37, m).asInstanceOf[Double]
      val eq = graft.api.DataFrame(s.toFrame.toSpark)
        .select(col("x").quantile(0.37, m).alias("q"))
        .toSpark.collect()(0).getDouble(0)
      assert(kq == eq, s"mode $m: kernel $kq vs expr $eq")
    }
    // frame-level: numeric columns to f64 picks, non-numeric stays typed null
    val f = graft.api.DataFrame(s.toFrame.toSpark.withColumn("lab", F.lit("ham")))
      .quantileFrame(0.37)
    val row = f.toSpark.collect()(0)
    assert(f.toSpark.schema("lab").dataType == org.apache.spark.sql.types.StringType)
    assert(row.isNullAt(row.fieldIndex("lab")))
    assert(row.getDouble(row.fieldIndex("x")) == s.quantile(0.37, "nearest").asInstanceOf[Double])
  }
}
