package graft

import scala.util.Random
import graft.kernel.Ewm
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-8 pins: the renormalizing EWM recursion (adjust=false,
  * ignore_nulls=false), calendar-duration group_by_dynamic / frame rolling,
  * and calendar dt.round. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  // ---- ewm adjust=false, ignore_nulls=false (reference expr.rb:6381-6444) ----

  /** Independent sequential reference: the pandas `old_wt` recursion for
    * ignore_na=False, adjust=False (the definition, not the kernel). */
  private def seqEwmRenorm(xs: Seq[Option[Double]], alpha: Double)
    : Seq[Option[(Double, Double)]] = {
    val beta = 1 - alpha
    var mean = Double.NaN; var cov = 0.0
    var sumWt = 1.0; var sumWt2 = 1.0; var oldWt = 1.0
    var nobs = 0L
    xs.map {
      case None =>
        if (!mean.isNaN) { sumWt *= beta; sumWt2 *= beta * beta; oldWt *= beta }
        None
      case Some(x) =>
        if (mean.isNaN) { mean = x; cov = 0.0; sumWt = 1.0; sumWt2 = 1.0; oldWt = 1.0 }
        else {
          sumWt *= beta; sumWt2 *= beta * beta; oldWt *= beta
          val om = mean
          if (mean != x) mean = (oldWt * om + alpha * x) / (oldWt + alpha)
          cov = (oldWt * (cov + (om - mean) * (om - mean)) +
            alpha * (x - mean) * (x - mean)) / (oldWt + alpha)
          sumWt += alpha; sumWt2 += alpha * alpha; oldWt += alpha
          sumWt /= oldWt; sumWt2 /= oldWt * oldWt; oldWt = 1.0
        }
        nobs += 1
        val num = sumWt * sumWt
        val den = num - sumWt2
        Some((mean, if (den > 0) (num / den) * cov else Double.NaN))
    }
  }

  test("keyed ewm adjust=false ignore_nulls=false matches the renormalizing recursion") {
    val rnd = new Random(42)
    val keys = Seq("a", "b", "c")
    val data = keys.flatMap { k =>
      Seq.tabulate(200)(i => (k, i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 10 - 5)))
    }
    val df = data.toDF("k", "i", "x").repartition(5)
    val out = Ewm.ewm(df, "x", "i", by = Seq("k"), alpha = 0.35,
      adjust = false, ignoreNulls = false, outputs = Seq("mean", "var"))
    val got = out.orderBy("k", "i").collect().map { r =>
      if (r.isNullAt(3)) None
      else Some((r.getDouble(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    }
    val exp = keys.flatMap(k => seqEwmRenorm(data.filter(_._1 == k).map(_._3), 0.35))
    assert(got.length == exp.length)
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      (g, e) match {
        case (None, None) =>
        case (Some((gm, gv)), Some((em, ev))) =>
          assert(math.abs(gm - em) < 1e-9, s"mean mismatch at $i: $gm vs $em")
          assert(gv.isNaN && ev.isNaN || math.abs(gv - ev) < 1e-9,
            s"var mismatch at $i: $gv vs $ev")
        case _ => fail(s"null mismatch at $i: $g vs $e")
      }
    }
  }

  test("renorm recursion differs from the linear form across a null gap (sanity)") {
    // x = [1, null, 10] with alpha=0.5:
    //   ignore_nulls=true  → mean3 = 0.5*1 + 0.5*10 = 5.5
    //   ignore_nulls=false → old_wt decays twice: (0.25*1 + 0.5*10)/0.75 = 7.0
    val df = Seq(("g", 0L, Some(1.0)), ("g", 1L, None), ("g", 2L, Some(10.0)))
      .toDF("k", "i", "x")
    val strict = Ewm.ewm(df, "x", "i", by = Seq("k"), alpha = 0.5,
      adjust = false, ignoreNulls = false)
      .orderBy("i").collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(strict.toSeq == Seq(1.0, null, 7.0), strict.toSeq.toString)
    val ign = Ewm.ewm(df, "x", "i", by = Seq("k"), alpha = 0.5,
      adjust = false, ignoreNulls = true)
      .orderBy("i").collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(ign.toSeq == Seq(1.0, null, 5.5), ign.toSeq.toString)
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The renorm flag pair, KEYLESS: distributed via the quadratic-map
    * composition (Ewm.ewmKeylessRenorm) — must match the sequential
    * definition across partition boundaries, including null runs that span
    * them and leading nulls. */
  private def renormStress(xs: Seq[Option[Double]], alpha: Double): Unit = {
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("i", "x").repartition(7)
    val out = withConf("spark.sql.adaptive.enabled", "false") {
      Ewm.ewm(df, "x", "i", alpha = alpha, adjust = false,
        ignoreNulls = false, outputs = Seq("mean", "var"))
    }
    assert(out.rdd.getNumPartitions > 1, "keyless renorm ewm collapsed to one partition")
    val got = out.orderBy("i").collect().map { r =>
      if (r.isNullAt(2)) None
      else Some((r.getDouble(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    }
    val exp = seqEwmRenorm(xs, alpha)
    assert(got.length == exp.length)
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      (g, e) match {
        case (None, None) =>
        case (Some((gm, gv)), Some((em, ev))) =>
          assert(math.abs(gm - em) < 1e-9, s"mean mismatch at $i: $gm vs $em")
          assert(gv.isNaN && ev.isNaN || math.abs(gv - ev) < 1e-9,
            s"var mismatch at $i: $gv vs $ev")
        case _ => fail(s"null mismatch at $i: $g vs $e")
      }
    }
  }

  test("keyless ewm adjust=false ignore_nulls=false distributes and matches the recursion") {
    val rnd = new Random(99)
    renormStress(Seq.fill(500)(
      if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 10 - 5)), 0.35)
  }

  test("keyless renorm ewm: leading nulls, long null runs, constant tail") {
    // 90 leading nulls (spanning whole partitions), a 60-null interior run
    // (old_wt decays across partition boundaries), and a constant tail (the
    // mean==x fast path at composition points)
    val xs = Seq.fill(90)(None) ++
      Seq.tabulate(80)(i => Some(i.toDouble % 7 - 3)) ++
      Seq.fill(60)(None) ++
      Seq.tabulate(70)(i => Some(math.sin(i.toDouble))) ++
      Seq.fill(50)(Some(2.5))
    renormStress(xs, 0.2)
  }

  test("keyless renorm ewm single-element and all-null frames") {
    renormStress(Seq(Some(3.0)), 0.5)
    renormStress(Seq(None, None, None), 0.5)
    // alpha = 1: zero decay, mean tracks the last value exactly
    renormStress(Seq(Some(1.0), None, Some(4.0), Some(9.0)), 1.0)
  }

  // ---- dt.round calendar durations (reference date_time_expr.rb:107-216) ----

  test("dt.round 1mo/1q/1y maps each half-interval to the nearer boundary") {
    import graft.Polars._
    val ts = Seq(
      "2021-01-10 00:00:00", // first half of Jan (mid = Jan 16 12:00) → Jan 1
      "2021-01-17 00:00:00", // second half → Feb 1
      "2021-02-14 23:59:59", // Feb 2021 mid = Feb 15 00:00 → Feb 1
      "2021-02-15 00:00:00", // midpoint inclusive → Mar 1
      "2021-07-02 11:59:59", // 2021 mid = Jul 2 12:00 → 2021-01-01
      "2021-07-02 12:00:00") // → 2022-01-01
    val df = graft.api.DataFrame(
      ts.zipWithIndex.map { case (t, i) => (i, java.sql.Timestamp.valueOf(t)) }
        .toDF("i", "ts"))
    val out = df.select(
      col("i"),
      col("ts").dt.round("1mo").cast(org.apache.spark.sql.types.StringType).alias("mo"),
      col("ts").dt.round("1q").cast(org.apache.spark.sql.types.StringType).alias("q"),
      col("ts").dt.round("1y").cast(org.apache.spark.sql.types.StringType).alias("y"))
      .toSpark.orderBy("i").collect()
    val mo = out.map(_.getString(1)).toSeq
    assert(mo == Seq("2021-01-01 00:00:00", "2021-02-01 00:00:00",
      "2021-02-01 00:00:00", "2021-03-01 00:00:00",
      "2021-07-01 00:00:00", "2021-07-01 00:00:00"), mo.toString)
    val q = out.map(_.getString(2)).toSeq
    // Q1 2021 (90 d) mid = Feb 15 00:00; Q3 (92 d) mid = Aug 16 00:00
    assert(q == Seq("2021-01-01 00:00:00", "2021-01-01 00:00:00",
      "2021-01-01 00:00:00", "2021-04-01 00:00:00",
      "2021-07-01 00:00:00", "2021-07-01 00:00:00"), q.toString)
    val y = out.map(_.getString(3)).toSeq
    assert(y == Seq("2021-01-01 00:00:00", "2021-01-01 00:00:00",
      "2021-01-01 00:00:00", "2021-01-01 00:00:00",
      "2021-01-01 00:00:00", "2022-01-01 00:00:00"), y.toString)
  }

  // ---- calendar group_by_dynamic (reference lazy_frame.rb:1416-1459) ----

  private def tsFrame(rows: Seq[(String, Double)]): graft.api.DataFrame = {
    import graft.Polars._
    graft.api.DataFrame(
      rows.map { case (t, v) => (java.sql.Timestamp.valueOf(t), v) }.toDF("ts", "v"))
  }

  test("group_by_dynamic monthly tumbling buckets with boundaries") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-05 10:00:00", 1.0), ("2021-01-25 00:00:00", 2.0),
      ("2021-02-10 00:00:00", 4.0), ("2021-04-01 00:00:00", 8.0)))
    val out = d.groupByDynamic("ts", every = "1mo", includeBoundaries = true)
      .agg(col("v").sum.alias("sv"))
      .toSpark.orderBy("ts").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(r.fieldIndex("sv")),
        r.getTimestamp(r.fieldIndex("_upper_boundary")).toString))
    assert(out.toSeq == Seq(
      ("2021-01-01 00:00:00.0", 3.0, "2021-02-01 00:00:00.0"),
      ("2021-02-01 00:00:00.0", 4.0, "2021-03-01 00:00:00.0"),
      ("2021-04-01 00:00:00.0", 8.0, "2021-05-01 00:00:00.0")), out.toSeq.toString)
  }

  test("group_by_dynamic label variants name windows by right edge or first datapoint") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-05 10:00:00", 1.0), ("2021-01-25 00:00:00", 2.0),
      ("2021-02-10 00:00:00", 4.0)))
    def run(label: String, every: String): Seq[String] =
      d.groupByDynamic("ts", every = every, label = label)
        .agg(col("v").sum.alias("sv"))
        .toSpark.orderBy("ts").collect().map(_.getTimestamp(0).toString.take(16)).toSeq
    // calendar path
    assert(run("right", "1mo") == Seq("2021-02-01 00:00", "2021-03-01 00:00"))
    assert(run("datapoint", "1mo") == Seq("2021-01-05 10:00", "2021-02-10 00:00"))
    // fixed path (daily buckets)
    assert(run("right", "1d") == Seq("2021-01-06 00:00", "2021-01-26 00:00", "2021-02-11 00:00"))
    assert(run("datapoint", "1d") == Seq("2021-01-05 10:00", "2021-01-25 00:00", "2021-02-10 00:00"))
    // default output schema has no boundary columns (polars include_boundaries=false)
    val cols = d.groupByDynamic("ts", every = "1d")
      .agg(col("v").sum.alias("sv")).toSpark.columns.toSeq
    assert(!cols.contains("_lower_boundary") && !cols.contains("_upper_boundary"), cols.toString)
  }

  test("group_by_dynamic sliding calendar windows (every=1mo, period=2mo)") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-10 00:00:00", 1.0), ("2021-02-10 00:00:00", 2.0),
      ("2021-03-10 00:00:00", 4.0)))
    val out = d.groupByDynamic("ts", every = "1mo", period = Some("2mo"))
      .agg(col("v").sum.alias("sv"))
      .toSpark.orderBy("ts").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getDouble(r.fieldIndex("sv"))))
    assert(out.toSeq == Seq(
      ("2020-12-01", 1.0), ("2021-01-01", 3.0),
      ("2021-02-01", 6.0), ("2021-03-01", 4.0)), out.toSeq.toString)
  }

  test("group_by_dynamic quarterly with a 1mo offset shifts bucket origins") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-10 00:00:00", 1.0), // bucket [2020-11-01, 2021-02-01)
      ("2021-03-10 00:00:00", 2.0), // bucket [2021-02-01, 2021-05-01)
      ("2021-04-20 00:00:00", 4.0)))
    val out = d.groupByDynamic("ts", every = "1q", offset = Some("1mo"))
      .agg(col("v").sum.alias("sv"))
      .toSpark.orderBy("ts").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getDouble(r.fieldIndex("sv"))))
    assert(out.toSeq == Seq(("2020-11-01", 1.0), ("2021-02-01", 6.0)),
      out.toSeq.toString)
  }

  test("group_by_dynamic period shorter than every drops uncovered rows") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-10 00:00:00", 1.0),  // inside [Jan, Feb) of the Jan-start window
      ("2021-02-20 00:00:00", 2.0))) // Feb start is not ≡ 0 mod 2mo → dropped
    val out = d.groupByDynamic("ts", every = "2mo", period = Some("1mo"))
      .agg(col("v").sum.alias("sv"))
      .toSpark.orderBy("ts").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getDouble(r.fieldIndex("sv"))))
    assert(out.toSeq == Seq(("2021-01-01", 1.0)), out.toSeq.toString)
  }

  // ---- ADVICE r7: aggregate operands under keyed composition ----

  test("plain aggregate operand in a keyed zip broadcasts per key") {
    import graft.Polars._
    val df = graft.api.DataFrame(Seq(
      ("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 3.0, 30.0), ("b", 4.0, 5.0))
      .toDF("k", "v", "w"))
    val got = df.select(col("k"),
        (col("v").shift(1) + col("w").sum).over(col("k")).alias("x"))
      .toSpark.orderBy("k", "x").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq("a" -> null, "a" -> 61.0, "a" -> 62.0, "b" -> null),
      got.toSeq.toString)
  }

  test("compound aggregate operand in a keyed zip raises the directed error") {
    import graft.Polars._
    val df = graft.api.DataFrame(Seq(
      ("a", 1.0, 10.0), ("a", 2.0, 20.0)).toDF("k", "v", "w"))
    // std(ddof=0) spells as arithmetic over aggregates — no bare window form
    // (plain std()/ddof=1 IS bare stddev_samp and broadcast-spells fine)
    val ex = intercept[UnsupportedOperationException] {
      df.select((col("v").shift(1) + col("w").std(0)).over(col("k")).alias("x"))
        .toSpark.collect()
    }
    assert(ex.getMessage.contains("materialize the aggregate"), ex.getMessage)
  }

  // ---- ADVICE r7: rank(random) deterministic seeded tiebreak ----

  test("rank(random) is reproducible for a fixed seed and permutes each tie group") {
    import graft.Polars._
    val base = Seq(1, 1, 1, 2, 2, 3).toDF("x").repartition(3)
    def run(): Seq[(Int, Int)] = graft.api.DataFrame(base)
      .select(col("x"), col("x").rank("random", seed = 7).alias("r"))
      .toSpark.collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val a = run(); val b = run()
    assert(a == b, s"non-reproducible: $a vs $b")
    // ranks are a permutation of 1..n with tie groups occupying their slots
    assert(a.map(_._2).sorted == Seq(1, 2, 3, 4, 5, 6), a.toString)
    assert(a.filter(_._1 == 1).map(_._2).toSet == Set(1, 2, 3), a.toString)
    assert(a.filter(_._1 == 2).map(_._2).toSet == Set(4, 5), a.toString)
  }

  // ---- pre-1970 calendar arithmetic (negative months-since-epoch) ----

  test("calendar truncate/round/group_by_dynamic handle pre-1970 dates") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("1969-11-15 06:00:00", 1.0), ("1969-12-20 00:00:00", 2.0),
      ("1970-01-10 00:00:00", 4.0)))
    // 2mo epoch-aligned buckets: Nov 1969 has mse -2 → bucket start Nov 1969;
    // Dec 1969 (mse -1) → same bucket; Jan 1970 → [Jan, Mar)
    val tr = d.select(col("ts").dt.truncate("2mo")
        .cast(org.apache.spark.sql.types.StringType).alias("t"))
      .toSpark.collect().map(_.getString(0))
    assert(tr.toSeq == Seq("1969-11-01 00:00:00", "1969-11-01 00:00:00",
      "1970-01-01 00:00:00"), tr.toSeq.toString)
    val gbd = d.groupByDynamic("ts", every = "2mo")
      .agg(col("v").sum.alias("sv"))
      .toSpark.orderBy("ts").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getDouble(r.fieldIndex("sv"))))
    assert(gbd.toSeq == Seq(("1969-11-01", 3.0), ("1970-01-01", 4.0)), gbd.toSeq.toString)
    val rd = d.select(col("ts").dt.round("1q")
        .cast(org.apache.spark.sql.types.StringType).alias("r"))
      .toSpark.collect().map(_.getString(0))
    // Q4 1969 mid = Nov 16 00:00 (92d); Q1 1970 mid = Feb 15 00:00 (90d)
    assert(rd.toSeq == Seq("1969-10-01 00:00:00", "1970-01-01 00:00:00",
      "1970-01-01 00:00:00"), rd.toSeq.toString)
  }

  // ---- dt.offset_by month shifts preserve time-of-day; negative DSL ----

  test("dt.offset_by with months keeps the timestamp's time component") {
    import graft.Polars._
    val d = tsFrame(Seq(("2021-03-31 14:30:45", 1.0)))
    val got = d.select(
        col("ts").dt.offsetBy("1mo").cast(org.apache.spark.sql.types.StringType).alias("p"),
        col("ts").dt.offsetBy("-1mo").cast(org.apache.spark.sql.types.StringType).alias("n"),
        col("ts").dt.offsetBy("1mo2d").cast(org.apache.spark.sql.types.StringType).alias("pd"))
      .toSpark.collect()(0)
    assert(got.getString(0) == "2021-04-30 14:30:45", got.toString) // clamped, time kept
    assert(got.getString(1) == "2021-02-28 14:30:45", got.toString)
    assert(got.getString(2) == "2021-05-02 14:30:45", got.toString)
  }

  test("duration DSL: a leading '-' negates the whole duration") {
    import graft.kernel.DurationDsl
    val d = DurationDsl.parse("-1mo2d")
    assert(d.months == -1 && d.days == -2, d.toString)
    assert(DurationDsl.parse("-90s").totalMicros == -90000000L)
  }

  test("upsample and date_range honor calendar and MIXED calendar durations") {
    import graft.Polars._
    // monthly upsample grid fills the missing month
    val d = graft.api.DataFrame(Seq(
      (java.sql.Date.valueOf("2021-01-01"), 1.0),
      (java.sql.Date.valueOf("2021-04-01"), 4.0)).toDF("d", "v"))
    val up = d.upsample("d", "1mo").toSpark.orderBy("d").collect()
      .map(r => (r.getDate(0).toString, if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(up.toSeq == Seq(("2021-01-01", 1.0), ("2021-02-01", null),
      ("2021-03-01", null), ("2021-04-01", 4.0)), up.toSeq.toString)
    // mixed "1mo2d" steps previously dropped the +2d silently
    val dr = graft.api.DataFrame(Seq(1).toDF("one")).select(
      Polars.dateRange(
        Expr(F.lit(java.sql.Date.valueOf("2021-01-01"))),
        Expr(F.lit(java.sql.Date.valueOf("2021-03-10"))), "1mo2d").alias("r"))
      .toSpark.collect()(0).getSeq[java.sql.Date](0).map(_.toString)
    assert(dr.toSeq == Seq("2021-01-01", "2021-02-03", "2021-03-05"), dr.toSeq.toString)
  }

  // ---- calendar frame rolling (reference lazy_frame.rb:1161-1181) ----

  test("frame rolling 1mo keyed: trailing calendar window with day clamping") {
    import graft.Polars._
    val rows = Seq(
      ("a", "2021-01-15 10:00:00", 1.0),
      ("a", "2021-02-10 09:00:00", 2.0),
      ("a", "2021-02-15 10:00:00", 4.0),  // [Jan 15 10:00, Feb 15 10:00] → 1+2+4
      ("a", "2021-03-31 00:00:00", 8.0),  // [Feb 28 00:00 (clamped), Mar 31] → 8
      ("b", "2021-02-15 10:00:00", 16.0))
    val d = graft.api.DataFrame(
      rows.map { case (k, t, v) => (k, java.sql.Timestamp.valueOf(t), v) }
        .toDF("k", "ts", "v"))
    val out = d.rolling("ts", "1mo", by = Seq("k"), closed = "both")
      .aggKeep("s" -> col("v").sum, "n" -> Expr(F.count(F.lit(1))))
      .toSpark.collect()
      .map(r => r.getDouble(2) -> ((r.getDouble(3), r.getLong(4)))).toMap
    assert(out(1.0) == ((1.0, 1L)), out.toString)
    assert(out(2.0) == ((3.0, 2L)), out.toString)
    assert(out(4.0) == ((7.0, 3L)), out.toString)
    assert(out(8.0) == ((8.0, 1L)), out.toString)
    assert(out(16.0) == ((16.0, 1L)), out.toString)
  }

  test("frame rolling 1mo keyed: null by-key rows form their own group") {
    import graft.Polars._
    val rows = Seq(
      (Some("a"), "2021-01-10 00:00:00", 1.0),
      (None, "2021-01-10 00:00:00", 2.0),
      (None, "2021-01-20 00:00:00", 4.0))
    val d = graft.api.DataFrame(
      rows.map { case (k, t, v) => (k.orNull, java.sql.Timestamp.valueOf(t), v) }
        .toDF("k", "ts", "v"))
    val out = d.rolling("ts", "1mo", by = Seq("k"))
      .aggKeep("s" -> col("v").sum)
      .toSpark.collect().map(r => r.getDouble(2) -> r.getDouble(3)).toMap
    assert(out == Map(1.0 -> 1.0, 2.0 -> 2.0, 4.0 -> 6.0), out.toString)
  }

  test("group_by_dynamic calendar: by-keys + sliding + offset combine") {
    import graft.Polars._
    val d = graft.api.DataFrame(Seq(
      ("x", java.sql.Timestamp.valueOf("2021-01-10 00:00:00"), 1.0),
      ("x", java.sql.Timestamp.valueOf("2021-02-10 00:00:00"), 2.0),
      ("y", java.sql.Timestamp.valueOf("2021-02-10 00:00:00"), 4.0))
      .toDF("k", "ts", "v"))
    // every=1mo period=2mo offset=1mo: window starts at month-since-epoch
    // ≡ 1 (mod 1) — offset shifts nothing for 1mo stride, but must not
    // break; windows per row: {trunc-1, trunc}
    val out = d.groupByDynamic("ts", every = "1mo", period = Some("2mo"),
        offset = Some("1mo"), by = Seq("k"))
      .agg(col("v").sum.alias("sv"))
      .toSpark.orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        r.getDouble(r.fieldIndex("sv"))))
    assert(out.toSeq == Seq(
      ("x", "2020-12-01", 1.0), ("x", "2021-01-01", 3.0), ("x", "2021-02-01", 2.0),
      ("y", "2021-01-01", 4.0), ("y", "2021-02-01", 4.0)), out.toSeq.toString)
  }

  test("rolling closed variants control endpoint inclusivity (keyless kernel)") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-01 00:00:00", 1.0), ("2021-01-01 00:01:00", 2.0),
      ("2021-01-01 00:02:00", 4.0)))
    def run(closed: String): Seq[Option[Double]] =
      d.rolling("ts", "1m", closed = closed).aggKeep("s" -> col("v").sum)
        .toSpark.orderBy("ts").collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    // empty windows sum to 0 (polars sum identity — expr.rb:2713 golden)
    assert(run("right") == Seq(Some(1.0), Some(2.0), Some(4.0))) // (t-1m, t]
    assert(run("both") == Seq(Some(1.0), Some(3.0), Some(6.0)))  // [t-1m, t]
    assert(run("left") == Seq(Some(0.0), Some(1.0), Some(2.0)))  // [t-1m, t)
    assert(run("none") == Seq(Some(0.0), Some(0.0), Some(0.0)))  // (t-1m, t)
  }

  test("rolling with a forward offset aggregates the upcoming window") {
    import graft.Polars._
    val d = tsFrame(Seq(
      ("2021-01-01 00:00:00", 1.0), ("2021-01-01 00:01:00", 2.0),
      ("2021-01-01 00:02:00", 4.0)))
    // offset=0 → window (t, t+1m]; keyless path carries phantoms forward
    val got = d.rolling("ts", "1m", offset = Some("0s")).aggKeep("s" -> col("v").sum)
      .toSpark.orderBy("ts").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    // trailing empty window: polars sum identity 0 (expr.rb:2713 golden)
    assert(got == Seq(Some(2.0), Some(4.0), Some(0.0)), got.toString)
  }

  test("calendar rolling default closed=right excludes the exact month-back boundary") {
    import graft.Polars._
    val rows = Seq(
      ("a", "2021-01-15 10:00:00", 1.0),
      ("a", "2021-02-10 09:00:00", 2.0),
      ("a", "2021-02-15 10:00:00", 4.0)) // (Jan 15 10:00, Feb 15 10:00] → 2+4
    val d = graft.api.DataFrame(
      rows.map { case (k, t, v) => (k, java.sql.Timestamp.valueOf(t), v) }
        .toDF("k", "ts", "v"))
    val out = d.rolling("ts", "1mo", by = Seq("k"))
      .aggKeep("s" -> col("v").sum)
      .toSpark.collect().map(r => r.getDouble(2) -> r.getDouble(3)).toMap
    assert(out(4.0) == 6.0, out.toString)
  }

  test("frame rolling 1mo keyless matches the all-rows trailing window") {
    import graft.Polars._
    val rows = Seq(
      ("2021-01-15 10:00:00", 1.0), ("2021-02-10 09:00:00", 2.0),
      ("2021-02-15 10:00:00", 4.0), ("2021-02-15 10:00:00", 16.0),
      ("2021-03-31 00:00:00", 8.0))
    val d = tsFrame(rows)
    val out = d.rolling("ts", "1mo", closed = "both")
      .aggKeep("s" -> col("v").sum)
      .toSpark.collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // Feb 15 peers (4 and 16) share the window [Jan 15 10:00, Feb 15 10:00]
    assert(out == Map(1.0 -> 1.0, 2.0 -> 3.0, 4.0 -> 23.0, 16.0 -> 23.0, 8.0 -> 8.0),
      out.toString)
  }

  // ---- Expr-level ewm_mean/std/var (round 9): the kernel routed through
  //      the prep machinery; composes with .over(keys) and chains ----

  test("Expr ewm_mean: global, keyed, and chained spellings match the kernel") {
    import graft.Polars.col
    val rnd = new Random(7)
    val data = Seq("a", "b").flatMap { k =>
      Seq.tabulate(40)(i => (k, i.toLong,
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextDouble() * 10 - 5)))
    }
    val sdf = data.map { case (k, i, v) => (k, i, v.map(Double.box).orNull) }
      .toDF("k", "i", "v")
    def seqAdj(xs: Seq[Option[Double]], alpha: Double): Seq[Option[Double]] = {
      // adjusted ignore_nulls=true reference: y = sum w_j x_j / sum w_j over
      // OBSERVATIONS; null positions stay null (polars, unlike pandas' carry)
      var num = 0.0; var den = 0.0
      xs.map {
        case None => None
        case Some(x) =>
          num = (1 - alpha) * num + x; den = (1 - alpha) * den + 1
          Some(num / den)
      }
    }
    def collectE(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Option[Double]] =
      df.select("i", "k", "e").collect()
        .map(r => ((r.getString(1), r.getLong(0)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    def check(name: String, got: Map[(String, Long), Option[Double]],
              rows: Seq[(String, Long, Option[Double])],
              exp: Seq[Option[Double]]): Unit =
      rows.zipWithIndex.foreach { case ((k, i, _), pos) =>
        (got((k, i)), exp(pos)) match {
          case (None, None) =>
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"$name $k/$pos: $a vs $b")
          case (a, b) => fail(s"$name null mismatch $k/$pos: $a vs $b")
        }
      }
    // GLOBAL: frame order = input order
    val g = collectE(graft.api.DataFrame(sdf)
      .withColumn("e", col("v").ewmMean(alpha = Some(0.3))).toSpark)
    check("global", g, data, seqAdj(data.map(_._3), 0.3))
    // KEYED: .over(k) = per-key recursion
    val got = collectE(graft.api.DataFrame(sdf)
      .withColumn("e", col("v").ewmMean(alpha = Some(0.3)).over(col("k"))).toSpark)
    Seq("a", "b").foreach { k =>
      val xs = data.filter(_._1 == k)
      check("keyed", got, xs, seqAdj(xs.map(_._3), 0.3))
    }
    // CHAINED: shift(1) then per-key ewm — the ewm consumes the per-key
    // shifted series
    val ch = collectE(graft.api.DataFrame(sdf)
      .withColumn("e",
        col("v").shift(1).ewmMean(alpha = Some(0.3)).over(col("k"))).toSpark)
    Seq("a", "b").foreach { k =>
      val xs = data.filter(_._1 == k)
      val shifted = Option.empty[Double] +: xs.map(_._3).dropRight(1)
      check("chain", ch, xs, seqAdj(shifted, 0.3))
    }
    // ONE Expr instance reused globally AND keyed in one projection: the
    // two spellings must not collide on a shared prep key (each gets its
    // own fresh output column)
    val e = col("v").ewmMean(alpha = Some(0.3))
    val both = graft.api.DataFrame(sdf)
      .withColumn("g", e).withColumn("ke", e.over(col("k"))).toSpark
      .select("i", "k", "g", "ke").collect()
      .map(r => ((r.getString(1), r.getLong(0)),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val globalRef = seqAdj(data.map(_._3), 0.3)
    data.zipWithIndex.foreach { case ((k, i, _), pos) =>
      val ok = (both((k, i))._1, globalRef(pos)) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case (x, y) => x == y
      }
      assert(ok, s"reused-global $k/$i")
    }
    Seq("a", "b").foreach { k =>
      val xs = data.filter(_._1 == k)
      val expK = seqAdj(xs.map(_._3), 0.3)
      xs.zipWithIndex.foreach { case ((_, i, _), pos) =>
        ((both((k, i))._2, expK(pos)): @unchecked) match {
          case (None, None) =>
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"reused-keyed $k/$i")
        }
      }
    }
    // over() with no keys degrades to the keyless kernel, not a crash
    val emptyOver = graft.api.DataFrame(sdf)
      .withColumn("e", col("v").ewmMean(alpha = Some(0.3)).over()).toSpark
    assert(emptyOver.count() == data.size)
    // parameterization: exactly one of com/span/half_life/alpha
    intercept[IllegalArgumentException] {
      col("v").ewmMean(com = Some(1.0), alpha = Some(0.5))
    }
    // std/var surfaces resolve too (values pinned by the kernel specs)
    val sv = graft.api.DataFrame(sdf).withColumn("s",
        col("v").ewmStd(span = Some(3.0)).over(col("k")))
      .withColumn("vr", col("v").ewmVar(alpha = Some(0.4))).toSpark
    assert(sv.count() == data.size)
  }
}
