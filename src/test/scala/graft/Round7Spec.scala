package graft

import scala.util.Random
import graft.Polars._
import graft.api.DataFrame
import graft.kernel.Ewm
import org.apache.spark.sql.{functions => F}

/** Round-7 pins: preps propagation through Expr combinators, null-safe
  * NTILE, stale-index kernel entry points, GroupBy.agg rejection of scanned
  * exprs, the distributed keyless EWM, the shared-base prep cache, and
  * sessionize tie/boundary properties. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ---- Expr preps propagation (ADVICE r6: clip/isBetween/filter/coalesce) ----

  test("scanned ops compose through clip") {
    val df = DataFrame(Seq(1, 2, 3, 4, 5).toDF("x"))
    val got = df.select(col("x").shift(1).clip(2, 3).alias("c")).toSpark
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(got.toSeq == Seq(null, 2, 2, 3, 3))
  }

  test("scanned ops compose through isBetween") {
    val df = DataFrame(Seq(1, 2, 3, 4, 5).toDF("x"))
    val got = df.select(col("x").cumSum().isBetween(3, 10).alias("b")).toSpark
      .collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(false, true, true, true, false))
  }

  test("scanned ops compose through filter and coalesceWith") {
    val df = DataFrame(Seq(1, 2, 3, 4, 5).toDF("x"))
    val f = df.select(col("x").filter(col("x").shift(1) >= 2).alias("f")).toSpark
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(f.toSeq == Seq(null, null, 3, 4, 5))

    val nn = DataFrame(Seq[(Int, Option[Int])]((1, Some(10)), (2, None), (3, None))
      .toDF("x", "y"))
    val c = nn.select(col("y").coalesceWith(col("x").shift(1)).alias("c")).toSpark
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(c.toSeq == Seq(10, 1, 2))
  }

  test("scanned ops compose through when/then/otherwise and horizontal aggs") {
    val df = DataFrame(Seq(1, 2, 3, 4).toDF("x"))
    // branch value is a scanned op: shift = [null,1,2,3]
    val wt = df.select(Polars.when(col("x") > 2).then(col("x").shift(1))
        .otherwise(0).alias("r")).toSpark
      .collect().map(_.getInt(0))
    assert(wt.toSeq == Seq(0, 0, 2, 3))
    // predicate is a scanned op
    val wp = df.select(Polars.when(col("x").cumSum() >= 6).then(1)
        .otherwise(0).alias("r")).toSpark
      .collect().map(_.getInt(0))
    assert(wp.toSeq == Seq(0, 0, 1, 1))
    val hz = df.select(Polars.maxHorizontal(col("x"),
        col("x").shift(1).fillNull(0)).alias("m")).toSpark
      .collect().map(_.getInt(0))
    assert(hz.toSeq == Seq(1, 2, 3, 4))
    val co = DataFrame(Seq[Option[Int]](Some(1), None, Some(3)).toDF("x"))
      .select(Polars.coalesce(col("x"), col("x").shift(1)).alias("c")).toSpark
      .collect().map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(co.toSeq == Seq(1, 1, 3))
  }

  test("scanned ops compose through namespaces (.str/.dt/.struct)") {
    val df = DataFrame(Seq("a", "bb", "ccc").toDF("s"))
    // forwardFill on a derived nullable col, then a .str op on top
    val up = DataFrame(Seq[Option[String]](Some("x"), None, Some("z")).toDF("s"))
      .select(col("s").forwardFill.str.toUppercase.alias("u")).toSpark
      .collect().map(_.getString(0))
    assert(up.toSeq == Seq("X", "X", "Z"))
    // .str.lengths of a shifted string column
    val ln = df.select(col("s").shift(1).str.lenChars.alias("n")).toSpark
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)) // len_chars u32 → i64 (§1.2)
    assert(ln.toSeq == Seq(-1L, 1L, 2L))
  }

  test("scanned ops work as sort keys, top_k keys, and Series.map bodies") {
    val df = DataFrame(Seq(5, 1, 4, 2, 3).toDF("x"))
    // sort by rank of x == sort by x
    val sorted = df.sortBy(Seq(col("x").rank("min"))).toSpark
      .collect().map(_.getInt(0))
    assert(sorted.toSeq == Seq(1, 2, 3, 4, 5))
    val top = df.topK(2, col("x").rank("min")).toSpark.collect().map(_.getInt(0))
    assert(top.sorted.toSeq == Seq(4, 5))
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val s = graft.api.Series("v", Seq(1.0, 2.0, 4.0))
      .map(_.cumSum()).toList
    assert(s == List(1.0, 3.0, 7.0))
  }

  test("forward fill composes through isBetween and filter") {
    val df = DataFrame(Seq[Option[Int]](Some(1), None, Some(5), None)
      .toDF("x"))
    val got = df.select(col("x").forwardFill.isBetween(1, 4).alias("b")).toSpark
      .collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, true, false, false))
  }

  // ---- GroupBy.agg of chained order-dependent exprs (keyedInput chains) ----

  test("group_by().agg of a CHAINED order-dependent expr lists the per-group chain") {
    val df = DataFrame(Seq((1, 1.0), (1, 2.0), (2, 5.0)).toDF("k", "v"))
    // per group: cum_sum then shift(1) -> k=1: [null, 1.0]; k=2: [null]
    val got = df.groupBy("k").agg(col("v").cumSum().shift(1).alias("cs")).toSpark
      .orderBy("k").collect()
      .map(r => r.getSeq[java.lang.Double](1).map(Option(_).map(_.toDouble)).toSeq)
    assert(got.toSeq == Seq(Seq(None, Some(1.0)), Seq(None)))
  }

  test("group_by().agg: aggregate-of-scanned yields a scalar per group") {
    val df = DataFrame(Seq(("a", 1.0), ("b", 10.0), ("a", 2.0), ("b", 20.0), ("a", 4.0))
      .toDF("k", "v"))
    // shift(1).sum per group: a -> 1+2 = 3; b -> 10
    // cumSum().max per group: a -> 7; b -> 30
    val out = df.groupBy("k").agg(
      col("v").shift(1).sum.alias("s"),
      col("v").cumSum().max.alias("m")).toSpark
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(out.toSeq == Seq(("a", 3.0, 7.0), ("b", 10.0, 30.0)))
    // duplicate unaliased names rejected like polars' DuplicateError
    val e = intercept[IllegalArgumentException](
      df.groupBy("k").agg(col("v").cumSum(), col("v").shift(1)))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // polars default naming (round 11): unaliased sum("v")/avg("v") BOTH
    // materialize as "v", so the pair raises DuplicateError like polars;
    // distinct aliases pass
    val e2 = intercept[IllegalArgumentException](
      df.groupBy("k").agg(col("v").cumSum().alias("cs"),
        graft.expr.Expr(F.sum(F.col("v"))), graft.expr.Expr(F.avg(F.col("v")))))
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    val ok = df.groupBy("k").agg(col("v").cumSum().alias("cs"),
      graft.expr.Expr(F.sum(F.col("v"))).alias("s"),
      graft.expr.Expr(F.avg(F.col("v"))).alias("a")).toSpark
    assert(ok.columns.length == 4)

    // order-sensitive aggregate of a scanned op: row-order discipline holds
    // on multi-partition input (first = first in row order, not shuffle order)
    val big = DataFrame(Seq.tabulate(200)(i => (s"k${i % 5}", i.toDouble))
      .toDF("k", "v").repartition(7))
    val firsts = big.groupBy("k").agg(col("v").shift(1).first.alias("f")).toSpark
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    // per key, first row's shift(1) is always null
    assert(firsts.values.forall(_ == -1.0), firsts.toString)
    val lasts = big.groupBy("k").agg(col("v").cumSum().last.alias("l")).toSpark
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val expectedSums = (0 until 200).groupBy(i => s"k${i % 5}")
      .map { case (k, is) => k -> is.map(_.toDouble).sum }
    assert(lasts == expectedSums, lasts.toString)

    // user alias survives a later elementwise transform on the aggregate
    val named = df.groupBy("k").agg(
      (col("v").shift(1).sum.alias("s") * 2).alias("s2")).toSpark
    assert(named.columns.contains("s2") || named.columns.contains("s"),
      named.columns.mkString(","))

    // per-key aggregate-of-scanned as a WINDOW: agg.over(keys)
    val w = df.withColumn("r", col("v").cumSum().max.over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(w.sorted.toSeq == Seq(("a", 7.0), ("a", 7.0), ("a", 7.0),
      ("b", 30.0), ("b", 30.0)))

    // ...and with post-transforms composed on the aggregate: the window must
    // wrap the BARE aggregate (alias / * constant / cast applied outside)
    val w2 = df.withColumn("r", (col("v").cumSum().max * 2).over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(w2.sorted.toSeq == Seq(("a", 14.0), ("a", 14.0), ("a", 14.0),
      ("b", 60.0), ("b", 60.0)), w2.mkString(","))
    val w3 = df.withColumn("r",
      col("v").cumSum().max.alias("m").cast(org.apache.spark.sql.types.LongType)
        .over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(w3.sorted.toSeq == Seq(("a", 7L), ("a", 7L), ("a", 7L),
      ("b", 30L), ("b", 30L)), w3.mkString(","))

    // a prep-bearing partition KEY (dense rank) builds its helper first
    val w4 = df.withColumn("r", col("v").cumSum().max.over(col("k").rank("dense")))
      .toSpark.select("k", "r").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(w4.sorted.toSeq == Seq(("a", 7.0), ("a", 7.0), ("a", 7.0),
      ("b", 30.0), ("b", 30.0)), w4.mkString(","))

    // an alias on the CONSTANT operand must not name the output
    val cn = df.groupBy("k").agg(col("v").shift(1).sum * lit(2).alias("two")).toSpark
    assert(cn.columns.toSeq == Seq("k", "v"), cn.columns.mkString(","))

    // a per-group name colliding with an ALIASED plain aggregate raises
    val dup = intercept[IllegalArgumentException](
      df.groupBy("k").agg(col("v").cumSum().alias("x"),
        graft.expr.Expr(F.sum(F.col("v")).as("x"))))
    assert(dup.getMessage.contains("duplicate"), dup.getMessage)

    // ...as does a per-group name colliding with a GROUP KEY
    val dupK = intercept[IllegalArgumentException](
      df.groupBy("k").agg(col("v").cumSum().alias("k")))
    assert(dupK.getMessage.contains("duplicate"), dupK.getMessage)

    // ...and the all-plain fast path checks too (aliased like a key / twice)
    val dupP = intercept[IllegalArgumentException](
      df.groupBy("k").agg(graft.expr.Expr(F.sum(F.col("v")).as("k"))))
    assert(dupP.getMessage.contains("duplicate"), dupP.getMessage)
    val dupP2 = intercept[IllegalArgumentException](
      df.groupBy("k").agg(graft.expr.Expr(F.sum(F.col("v")).as("x")),
        graft.expr.Expr(F.avg(F.col("v")).as("x"))))
    assert(dupP2.getMessage.contains("duplicate"), dupP2.getMessage)

    // PLAIN n_unique as a window: count(distinct) re-spells for windows
    val pnu = df.withColumn("r", col("v").nUnique.alias("nu").over(col("k"))).toSpark
    assert(pnu.columns.contains("r"))
    val pnuVals = pnu.select("k", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pnuVals.sorted.toSeq == Seq(("a", 3L), ("a", 3L), ("a", 3L), ("b", 2L), ("b", 2L)),
      pnuVals.mkString(","))

    // distinct aggregate of a scanned op as a window: count(distinct) has no
    // window form, so it re-spells as size(collect_set)
    val nu = df.withColumn("r", col("v").shift(1).nUnique.over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    // group a: shift(1) over (1,2,4) = (null,1,2) -> 3 distinct (n_unique
    // counts null as a value, polars semantics); b: (null,10) -> 2
    assert(nu.sorted.toSeq == Seq(("a", 3L), ("a", 3L), ("a", 3L), ("b", 2L), ("b", 2L)),
      nu.mkString(","))

    // a prep-bearing PARTITION KEY builds its helper before a keyed form
    // that itself emits a prep (rle_id)
    val rk = df.withColumn("r", col("v").rleId.over(col("k").rank("dense"))).toSpark
    assert(rk.count() == 5)
  }

  test("keyless frame rolling: null index rows are not double-counted") {
    val rows = Seq(
      (Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), 1.0),
      (Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:30")), 2.0),
      (Some(java.sql.Timestamp.valueOf("2024-01-01 00:10:00")), 4.0),
      (None, 100.0), (None, 200.0))
    val df = DataFrame(rows.toDF("ts", "v"))
    val out = df.rolling("ts", "1m", closed = "both").aggKeep("s" -> col("v").sum, "n" -> col("v").count)
      .toSpark.select("v", "s", "n").collect()
      .map(r => r.getDouble(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out(1.0) == ((1.0, 1L)), out.toString)
    assert(out(2.0) == ((3.0, 2L)), out.toString)   // 30s window reaches row 1
    assert(out(4.0) == ((4.0, 1L)), out.toString)
    // null-ts rows: each counted ONCE, peers = the null group (Spark range-
    // frame null semantics, same as the keyed path)
    assert(out(100.0) == ((300.0, 2L)), out.toString)
    assert(out(200.0) == ((300.0, 2L)), out.toString)
  }

  test("keyed forms ride through namespaces and when/then under .over(keys)") {
    val df = DataFrame(Seq(("a", "x"), ("b", "q"), ("a", "y"))
      .toDF("k", "s"))
    val up = df.withColumn("r", col("s").shift(1).str.toUppercase.over(col("k"))).toSpark
      .select("k", "r").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) "-" else r.getString(1)))
    assert(up.sorted.toSeq == Seq(("a", "-"), ("a", "X"), ("b", "-")))

    val dfn = DataFrame(Seq(("a", 1), ("b", 10), ("a", 5), ("b", 2)).toDF("k", "v"))
    val wt = dfn.withColumn("r",
        Polars.when(col("v").cumSum() >= 6).then(1).otherwise(0).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // per-key cumsum: a: 1,6 -> 0,1 ; b: 10,12 -> 1,1
    assert(wt.sorted.toSeq == Seq(("a", 1, 0), ("a", 5, 1), ("b", 2, 1), ("b", 10, 1)))

    val mh = dfn.withColumn("r",
        Polars.maxHorizontal(col("v"), col("v").shift(1).fillNull(0)).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // per-key: a: max(1,0)=1, max(5,1)=5 ; b: max(10,0)=10, max(2,10)=10
    assert(mh.sorted.toSeq == Seq(("a", 1, 1), ("a", 5, 5), ("b", 2, 10), ("b", 10, 10)))
  }

  test("group_by().agg evaluates order-dependent exprs per group as lists") {
    val df = DataFrame(Seq(("a", 1), ("b", 10), ("a", 2), ("b", 20), ("a", 3))
      .toDF("k", "v"))
    val out = df.groupBy("k").agg(
      col("v").cumSum().alias("cs"),
      col("v").shift(1).alias("pv"),
      graft.expr.Expr(F.sum("v")).alias("s")).toSpark
      .collect().map { r =>
        (r.getString(0), r.getSeq[Any](1).toList, r.getSeq[Any](2).toList, r.getLong(3))
      }.sortBy(_._1)
    assert(out.toSeq == Seq(
      ("a", List(1L, 3L, 6L), List(null, 1, 2), 6L),
      ("b", List(10L, 30L), List(null, 10), 30L)))
  }

  // ---- NTILE over a nullable column (ADVICE r6) ----

  test("withNtile buckets null values with a count-all total") {
    val df = Seq[(Int, Option[Double])](
      (0, None), (1, None), (2, Some(1.0)), (3, Some(2.0)), (4, Some(3.0)), (5, Some(4.0)))
      .toDF("id", "v")
    val out = graft.kernel.Scan.withNtile(df, F.col("v"), "nt", 3)
      .select("id", "nt").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // 6 rows / 3 buckets = 2 each; nulls sort LAST (DuckDB/Postgres NTILE
    // default, matching the oracle gate) so they take the highest bucket
    assert(out(2) == 1 && out(3) == 1)
    assert(out(4) == 2 && out(5) == 2)
    assert(out(0) == 3 && out(1) == 3)
  }

  // ---- stale hidden index at kernel entry points (ADVICE r6) ----

  test("keyless interpolate ignores a stale pre-attached row index") {
    val base = Seq[(Int, Option[Double])](
      (5, Some(50.0)), (1, Some(10.0)), (3, None), (2, None), (4, Some(40.0)))
      .toDF("o", "v")
    val stale = graft.kernel.RowIndex.attach(base) // arrival order, NOT o order
    val got = graft.kernel.Interpolate.interpolate(stale, "v", "o")
      .orderBy("o").collect().map(_.getDouble(1))
    assert(got.zip(Seq(10.0, 20.0, 30.0, 40.0, 50.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }, got.toSeq.toString)
  }

  test("linearPack ignores a stale pre-attached row index") {
    val base = Seq((3L, 30L), (1L, 10L), (2L, 20L)).toDF("ord", "ntok")
    val stale = graft.kernel.RowIndex.attach(base)
    val got = graft.ml.Packing.linearPack(stale, "ntok", "ord", 25L)
      .select("ord", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ord order: offsets 0,10,30 → bins 0,0,1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  // ---- distributed keyless EWM ----

  /** Independent sequential reference (the definition, not the kernel). */
  private def seqEwm(xs: Seq[Option[Double]], alpha: Double, adjust: Boolean)
    : Seq[Option[(Double, Double)]] = {
    val beta = 1 - alpha
    var wSum = 0.0; var wx = 0.0; var wx2 = 0.0; var w2 = 0.0; var n = 0L
    xs.map {
      case None => None
      case Some(x) =>
        if (adjust) {
          wSum = beta * wSum + 1; wx = beta * wx + x
          wx2 = beta * wx2 + x * x; w2 = beta * beta * w2 + 1
        } else if (n == 0) { wSum = 1; wx = x; wx2 = x * x; w2 = 1 }
        else {
          wSum = 1; wx = beta * wx + alpha * x
          wx2 = beta * wx2 + alpha * x * x; w2 = beta * beta * w2 + alpha * alpha
        }
        n += 1
        val mean = wx / wSum
        val vb = math.max(wx2 / wSum - mean * mean, 0.0)
        val denom = 1 - w2 / (wSum * wSum)
        Some((mean, if (denom > 0) vb / denom else Double.NaN))
    }
  }

  private def ewmStress(adjust: Boolean): Unit = {
    val rnd = new Random(if (adjust) 7 else 13)
    val xs = Seq.fill(500)(
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble() * 10 - 5))
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("i", "x").repartition(7)
    // AQE coalesces this tiny sort to one partition, masking the pin; force
    // the multi-partition shape the kernel must survive at scale
    val out = withConf("spark.sql.adaptive.enabled", "false") {
      Ewm.ewm(df, "x", "i", alpha = 0.3, adjust = adjust,
        minPeriods = 1, outputs = Seq("mean", "var"))
    }
    assert(out.rdd.getNumPartitions > 1, "keyless ewm collapsed to one partition")
    val got = out.orderBy("i").collect().map { r =>
      if (r.isNullAt(2)) None
      else Some((r.getDouble(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    }
    val exp = seqEwm(xs, 0.3, adjust)
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      (g, e) match {
        case (None, None) =>
        case (Some((gm, gv)), Some((em, ev))) =>
          assert(math.abs(gm - em) < 1e-9, s"mean mismatch at $i: $gm vs $em")
          if (!ev.isNaN && i > 0) // var defined from the 2nd non-null on
            assert(gv.isNaN == ev.isNaN || math.abs(gv - ev) < 1e-9,
              s"var mismatch at $i: $gv vs $ev")
        case _ => fail(s"null mismatch at $i: $g vs $e")
      }
    }
  }

  test("keyless ewm adjust=true distributes and matches the sequential recurrence") {
    ewmStress(adjust = true)
  }
  test("keyless ewm adjust=false distributes and matches the sequential recurrence") {
    ewmStress(adjust = false)
  }

  // ---- shared-base prep cache ----

  test("stacked kernel ops read one cached base (no N re-scans)") {
    val ev = DataFrame(spark.read.parquet(s"$sf/events.parquet"))
    val out = ev.select(
      col("value").cumSum().alias("cs"),
      col("value").shift(1).alias("sh"),
      col("value").forwardFill.alias("ff")).toSpark
    val rows = out.collect() // materialize through the cache
    assert(rows.nonEmpty)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"),
      s"expected the multi-prep base to be cached:\n$p")
  }

  // ---- keyless frame-level rolling: time-bucket phantom distribution ----

  test("keyless rolling() distributes via time-bucket phantoms and matches brute force") {
    val rnd = new Random(11)
    val p = 1000L * 1000000 // 1000 s
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(5000).toLong * 1000000L, rnd.nextDouble() * 10))
    val df = DataFrame(rows.toDF("id", "us", "v")
      .select(F.col("id"), F.col("v"), F.timestamp_micros(F.col("us")).as("ts")))
    val out = df.rolling("ts", "1000s", closed = "both")
      .aggKeep("rs" -> col("v").sum, "rn" -> graft.expr.Expr(F.count(F.lit(1)))).toSpark
    val plan = out.queryExecution.executedPlan.toString
    plan.linesIterator.zipWithIndex
      .filter(_._1.contains("Exchange SinglePartition")).foreach { case (_, i) =>
        fail(s"keyless rolling planned a single-partition exchange:\n$plan")
      }
    val got = out.select("id", "rs", "rn").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    rows.foreach { case (id, us, _) =>
      val in = rows.filter { case (_, u2, _) => u2 >= us - p && u2 <= us }
      val (es, en) = (in.map(_._3).sum, in.size.toLong)
      val (gs, gn) = got(id)
      assert(gn == en, s"id $id: window count $gn vs $en")
      assert(math.abs(gs - es) < 1e-6, s"id $id: window sum $gs vs $es")
    }
  }

  // ---- keyed forms: polars' cum_sum/shift/fill/rank/rolling .over(keys) ----

  test("order-dependent ops re-spell per key under .over(keys)") {
    // rows arrive interleaved across keys; per-key row order is arrival order
    val df = DataFrame(Seq(
      ("a", 1), ("b", 10), ("a", 2), ("b", 20), ("a", 3), ("b", 30))
      .toDF("k", "v"))
    val cs = df.withColumn("r", col("v").cumSum().over(col("k"))).toSpark
      .select("k", "v", "r").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(cs.sorted.toSeq == Seq(("a", 1, 1L), ("a", 2, 3L), ("a", 3, 6L),
      ("b", 10, 10L), ("b", 20, 30L), ("b", 30, 60L)))

    val sh = df.withColumn("r", col("v").shift(1).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) -1 else r.getInt(2)))
    assert(sh.sorted.toSeq == Seq(("a", 1, -1), ("a", 2, 1), ("a", 3, 2),
      ("b", 10, -1), ("b", 20, 10), ("b", 30, 20)))

    // shift_and_fill fills only structurally-missing rows, not null values
    val sf = df.withColumn("r", col("v").shiftAndFill(1, 0).over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(sf.count(_._2 == 0) == 2) // one leading row per key

    val rk = DataFrame(Seq(("a", 2), ("a", 1), ("a", 2), ("b", 5)).toDF("k", "v"))
      .withColumn("r", col("v").rank("min").over(col("k"))).toSpark
      .select("k", "v", "r").collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(rk.sorted.toSeq == Seq(("a", 1, 1), ("a", 2, 2), ("a", 2, 2), ("b", 5, 1)))

    val ff = DataFrame(Seq(("a", Some(1.0)), ("a", None), ("b", None), ("b", Some(2.0)))
      .toDF("k", "v"))
    val ffr = ff.withColumn("r", col("v").forwardFill.over(col("k"))).toSpark
      .select("k", "r").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(ffr.sorted.toSeq == Seq(("a", Some(1.0)), ("a", Some(1.0)),
      ("b", None), ("b", Some(2.0))))

    // polars default min_periods = window size: first row per key is null
    val rm = df.withColumn("r", col("v").rollingMean(2).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(rm.sorted.toSeq == Seq(("a", 1, -1.0), ("a", 2, 1.5), ("a", 3, 2.5),
      ("b", 10, -1.0), ("b", 20, 15.0), ("b", 30, 25.0)))

    // keyed plan shape: one hash shuffle on the keys, no scan-kernel bucket
    val plan = df.withColumn("r", col("v").cumSum().over(col("k"))).toSpark
      .queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bucket__"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)

    // elementwise transforms commute: alias/cast/arithmetic ride the keyed form
    val al = df.withColumn("r", col("v").cumSum().alias("cs").over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(al.sorted.toSeq == Seq(("a", 1L), ("a", 3L), ("a", 6L),
      ("b", 10L), ("b", 30L), ("b", 60L)))
    val ar = df.withColumn("r", (col("v").cumSum() * 2).over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ar.sorted.toSeq == Seq(("a", 2L), ("a", 6L), ("a", 12L),
      ("b", 20L), ("b", 60L), ("b", 120L)))
    // two keyed ops combine per key in one shuffle
    val two = df.withColumn("r",
        (col("v").cumSum() + col("v").shift(1).fillNull(0)).over(col("k"))).toSpark
      .select("k", "r").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(two.sorted.toSeq == Seq(("a", 1L), ("a", 4L), ("a", 8L),
      ("b", 10L), ("b", 40L), ("b", 80L)))

    // chaining one order-dependent op INTO another evaluates the WHOLE
    // chain per key (polars semantics): per-key cum_sum, then per-key shift
    val ch = df.withColumn("r", col("v").cumSum().shift(1).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getInt(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(ch.sorted.toSeq == Seq(("a", 1, -1L), ("a", 2, 1L), ("a", 3, 3L),
      ("b", 10, -1L), ("b", 20, 10L), ("b", 30, 30L)))
  }

  test("diff/pct_change/rle_id/interpolate keyed forms under .over(keys)") {
    val df = DataFrame(Seq(
      ("a", 1.0), ("b", 10.0), ("a", 3.0), ("b", 10.0), ("a", 6.0), ("b", 40.0))
      .toDF("k", "v"))
    val d = df.withColumn("r", col("v").diff(1).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(d.filterNot(_._3.isNaN).sorted.toSeq ==
      Seq(("a", 3.0, 2.0), ("a", 6.0, 3.0), ("b", 10.0, 0.0), ("b", 40.0, 30.0)))

    val p = df.withColumn("r", col("v").pctChange(1).over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(p.filterNot(_._3.isNaN).sorted.toSeq ==
      Seq(("a", 3.0, 2.0), ("a", 6.0, 1.0), ("b", 10.0, 0.0), ("b", 40.0, 3.0)))

    val rle = df.withColumn("r", col("v").rleId.over(col("k"))).toSpark
      .select("k", "v", "r").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // per-key runs in arrival order: a: 1,3,6 -> 0,1,2; b: 10,10,40 -> 0,0,1
    assert(rle.sorted.toSeq == Seq(("a", 1.0, 0L), ("a", 3.0, 1L), ("a", 6.0, 2L),
      ("b", 10.0, 0L), ("b", 10.0, 0L), ("b", 40.0, 1L)))

    val ip = DataFrame(Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(10.0)), ("b", None), ("b", None), ("b", Some(40.0)))
      .toDF("k", "v"))
      .withColumn("r", col("v").interpolate().over(col("k"))).toSpark
      .select("k", "r").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(ip.sorted.toSeq == Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 40.0)))
  }

  test("keyed forms agree with the scan kernel on a single-key frame") {
    val rnd = new Random(23)
    val rows = Seq.tabulate(120)(i =>
      (i.toLong, "only",
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(20).toDouble)))
    val df = DataFrame(rows.toDF("id", "k", "v"))
    val ops: Seq[(String, () => graft.expr.Expr)] = Seq(
      "cum_sum" -> (() => col("v").cumSum()),
      "cum_min" -> (() => col("v").cumMin()),
      "shift2" -> (() => col("v").shift(2)),
      "lead1" -> (() => col("v").shift(-1)),
      "shift_fill" -> (() => col("v").shiftAndFill(1, -1.0)),
      "ffill" -> (() => col("v").forwardFill),
      "bfill" -> (() => col("v").backwardFill),
      "diff" -> (() => col("v").diff(1)),
      "pct" -> (() => col("v").pctChange(1)),
      "rank_min" -> (() => col("v").rank("min")),
      "rank_avg" -> (() => col("v").rank("average")),
      "rank_dense" -> (() => col("v").rank("dense")),
      "rank_max" -> (() => col("v").rank("max")),
      "roll_mean3" -> (() => col("v").rollingMean(3)),
      "roll_sum4" -> (() => col("v").rollingSum(4, minPeriods = 2)),
      "rle" -> (() => col("v").rleId),
      "interp" -> (() => col("v").interpolate()))
    ops.foreach { case (name, mk) =>
      def collectBy(d: org.apache.spark.sql.DataFrame): Map[Long, Any] =
        d.select("id", "r").collect()
          .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.get(1))).toMap
      val keyless = collectBy(df.withColumn("r", mk()).toSpark)
      val keyed = collectBy(df.withColumn("r", mk().over(col("k"))).toSpark)
      rows.foreach { case (id, _, _) =>
        val (a, b) = (keyless(id), keyed(id))
        val ok = (a, b) match {
          case (null, null) => true
          case (x: java.lang.Number, y: java.lang.Number) =>
            math.abs(x.doubleValue() - y.doubleValue()) < 1e-9
          case _ => a == b
        }
        assert(ok, s"$name diverges at id $id: keyless=$a keyed=$b")
      }
    }
  }

  // ---- exact-substring duplicate spans ----

  test("duplicateSpans finds shared token windows across documents only") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "nothing in common with anything here at all"),
      (4L, "self self self self self self self self self self self self"))
      .toDF("doc_id", "text")
    val spans = graft.ml.Dedup.duplicateSpans(docs, "text", "doc_id",
      windowTokens = 6, anchorStride = 2).collect()
    // docs 1 and 2 share 12 consecutive tokens at DIFFERENT offsets —
    // content-defined anchors land at the same tokens in both, so windows
    // inside the shared run collide; doc 3 never appears; doc 4's internal
    // repetition is single-document (n_docs = 1), filtered out
    val byDoc = spans.map(_.getLong(0)).toSet
    assert(byDoc == Set(1L, 2L), spans.mkString("\n"))
    assert(spans.forall(_.getLong(3) == 2)) // n_docs
    // the same window hash appears in both docs
    val hashes1 = spans.filter(_.getLong(0) == 1L).map(_.getLong(2)).toSet
    val hashes2 = spans.filter(_.getLong(0) == 2L).map(_.getLong(2)).toSet
    assert(hashes1.intersect(hashes2).nonEmpty)

    val ratios = graft.ml.Dedup.spanDupRatio(docs, "text", "doc_id",
      windowTokens = 6, anchorStride = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ratios(3L) == 0.0 && ratios(4L) == 0.0)
    assert(ratios(1L) > 0.0 && ratios(2L) > 0.0)
  }

  test("spanChunks: short docs emit nothing; anchorStride=1 is exhaustive") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val chunks = graft.ml.Dedup.spanChunks(docs, "text", "doc_id",
      windowTokens = 4, anchorStride = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(!chunks.exists(_._1 == 1L)) // 3 tokens < window of 4
    assert(chunks.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0, 1, 2, 3, 4))
  }

  // ---- sessionize tie/boundary properties (VERDICT r6 #5) ----

  test("sessionize properties: ties share, exact gap merges, ids dense per key") {
    val gap = 1000L * 1000000 // 1000 s in µs
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // coarse grid forces tied timestamps and exact-gap boundaries; a few
      // single-event users come from the sparse key draw
      val rows = Seq.fill(300)(
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong * (gap / 2)))
      val df = rows.toDF("user_id", "us")
        .select(F.col("user_id"), F.col("us"), F.timestamp_micros(F.col("us")).as("ts"))
      val got = graft.ml.Sessionize.assign(df, "ts", Seq("user_id"), gapMicros = gap)
        .select("user_id", "us", "session").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      assert(got.length == rows.length) // null-free, no rows dropped
      got.groupBy(_._1).foreach { case (u, evs) =>
        val byTs = evs.sortBy(_._2)
        // expected ids from the sequential definition: split iff gap exceeded
        var sid = 0L; var prev = Long.MinValue
        val expected = byTs.map { case (_, ts, _) =>
          if (prev != Long.MinValue && ts - prev > gap) sid += 1
          prev = ts; sid
        }
        assert(byTs.map(_._3).toSeq == expected.toSeq, s"user $u: ${byTs.toSeq}")
        // ties share a session
        byTs.groupBy(_._2).values.foreach(g => assert(g.map(_._3).distinct.length == 1))
        // ids dense from 0
        assert(evs.map(_._3).distinct.sorted.toSeq == (0L to expected.max).toSeq)
      }
    }
  }
}
