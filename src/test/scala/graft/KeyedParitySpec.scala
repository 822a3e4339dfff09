package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** Randomized keyed-scope parity sweep (round 7): every order-dependent op's
  * `.over(keys)` spelling and its group_by().agg per-group forms are checked
  * against a locally computed per-key reference on seeded random data. The
  * pinned property is SCOPING — each key's rows see exactly their own group
  * in row order — the failure class the keyed-form architecture is most
  * exposed to (an op silently evaluating globally, or in shuffle order).
  */
class KeyedParitySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260813)
  private val n = 400
  // (id, key, nullable value) — id is the row-order handle and compare key
  private val rows: IndexedSeq[(Long, String, Option[Double])] =
    (0 until n).map { i =>
      (i.toLong, s"k${rng.nextInt(6)}",
        if (rng.nextInt(5) == 0) None else Some((rng.nextInt(400) - 200) / 10.0))
    }
  private lazy val df = DataFrame(rows
    .map { case (i, k, v) => (i, k, v.map(Double.box).orNull) }
    .toDF("id", "k", "v"))

  /** Local per-key reference: apply `f` to each key's values in row order,
    * return the per-row expectation keyed by id. */
  private def perKey(f: IndexedSeq[Option[Double]] => IndexedSeq[Option[Double]])
    : Map[Long, Option[Double]] =
    rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.map(_._1).zip(f(rs.map(_._3).toIndexedSeq))
    }

  /** Engine result of e.over(k) per row id (values read as Double). */
  private def engine(e: graft.expr.Expr): Map[Long, Option[Double]] =
    df.withColumn("r", e.over(col("k"))).toSpark
      .select(F.col("id"), F.col("r").cast("double")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  private def assertAgree(name: String, got: Map[Long, Option[Double]],
                          want: Map[Long, Option[Double]]): Unit = {
    assert(got.keySet == want.keySet, s"$name: row sets differ")
    val bad = want.collect {
      case (id, w) if !((got(id), w) match {
        case (None, None) => true
        case (Some(a), Some(b)) => math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
        case _ => false
      }) => (id, want(id), got(id))
    }
    assert(bad.isEmpty, s"$name: ${bad.take(5)} (of ${bad.size})")
  }

  test("shift/diff/fill/cum over(keys) match the local per-key reference") {
    assertAgree("shift(1)", engine(col("v").shift(1)),
      perKey(vs => Option.empty[Double] +: vs.dropRight(1)))
    assertAgree("shift(-2)", engine(col("v").shift(-2)),
      perKey(vs => vs.drop(2) ++ IndexedSeq.fill(math.min(2, vs.size))(Option.empty[Double])))
    assertAgree("diff(1)", engine(col("v").diff(1)),
      perKey { vs =>
        vs.indices.map(i =>
          if (i == 0) None
          else for { a <- vs(i); b <- vs(i - 1) } yield a - b).toIndexedSeq
      })
    assertAgree("forward_fill", engine(col("v").forwardFill),
      perKey { vs =>
        var last: Option[Double] = None
        vs.map { v => if (v.isDefined) last = v; v.orElse(last) }
      })
    assertAgree("backward_fill", engine(col("v").backwardFill),
      perKey { vs =>
        var next: Option[Double] = None
        vs.reverse.map { v => if (v.isDefined) next = v; v.orElse(next) }.reverse
      })
    assertAgree("cum_sum", engine(col("v").cumSum()),
      perKey { vs =>
        var acc = 0.0
        vs.map { v => v.map { x => acc += x; acc } }
      })
    assertAgree("cum_max", engine(col("v").cumMax()),
      perKey { vs =>
        var m = Double.NegativeInfinity
        vs.map { v => v.map { x => m = math.max(m, x); m } }
      })
    assertAgree("cum_count", engine(col("v").cumCount()),
      perKey { vs =>
        var c = 0L
        vs.map { v => if (v.isDefined) c += 1; Some(c.toDouble) }
      })
  }

  test("rank/rle_id over(keys) match the local per-key reference") {
    assertAgree("rank dense", engine(col("v").rank("dense")),
      perKey { vs =>
        val order = vs.flatten.distinct.sorted
        val r = order.zipWithIndex.toMap
        vs.map(_.map(x => (r(x) + 1).toDouble))
      })
    assertAgree("rank min", engine(col("v").rank("min")),
      perKey { vs =>
        val nonNull = vs.flatten.sorted
        vs.map(_.map(x => (nonNull.indexOf(x) + 1).toDouble))
      })
    assertAgree("rank average", engine(col("v").rank("average")),
      perKey { vs =>
        val nonNull = vs.flatten.sorted
        vs.map(_.map { x =>
          val lo = nonNull.indexOf(x) + 1
          val hi = nonNull.lastIndexOf(x) + 1
          (lo + hi) / 2.0
        })
      })
    assertAgree("rle_id", engine(col("v").rleId),
      perKey { vs =>
        var prev: Option[Option[Double]] = None
        var id = -1L
        vs.map { v =>
          if (!prev.contains(v)) { id += 1; prev = Some(v) }
          Some(id.toDouble)
        }
      })
  }

  test("aggregate-of-scanned in group_by().agg matches the local reference") {
    def aggEngine(e: graft.expr.Expr): Map[String, Option[Double]] =
      df.groupBy("k").agg(e.alias("r")).toSpark
        .select(F.col("k"), F.col("r").cast("double")).collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    def aggLocal(f: IndexedSeq[Option[Double]] => Option[Double]): Map[String, Option[Double]] =
      rows.groupBy(_._2).map { case (k, rs) => k -> f(rs.map(_._3).toIndexedSeq) }

    val gotSum = aggEngine(col("v").shift(1).sum)
    val wantSum = aggLocal { vs =>
      val s = vs.dropRight(1).flatten
      Some(s.sum) // sum of empty = 0.0 matches Spark's sum-over-no-rows? null — handle below
    }
    // Spark's sum over an all-null column is null; align the reference
    val wantSumAligned = wantSum.map { case (k, v) =>
      val nonNull = rows.filter(_._2 == k).map(_._3).dropRight(1).flatten
      k -> (if (nonNull.isEmpty) None else v)
    }
    assert(gotSum.keySet == wantSumAligned.keySet)
    wantSumAligned.foreach { case (k, w) =>
      (gotSum(k), w) match {
        case (None, None) =>
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"shift.sum $k: $a vs $b")
        case other => fail(s"shift.sum $k: $other")
      }
    }

    val gotLast = aggEngine(col("v").cumSum().last)
    // last row's cum_sum value (null if the last row's v is null)
    val wantLast = aggLocal { vs =>
      var acc = 0.0
      vs.map(v => v.map { x => acc += x; acc }).lastOption.flatten
    }
    assert(gotLast.keySet == wantLast.keySet)
    wantLast.foreach { case (k, w) =>
      (gotLast(k), w) match {
        case (None, None) =>
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"cumSum.last $k: $a vs $b")
        case other => fail(s"cumSum.last $k: $other")
      }
    }

    val gotFirst = aggEngine(col("v").forwardFill.first)
    val wantFirst = aggLocal(vs => vs.headOption.flatten)
    assert(gotFirst == wantFirst, s"$gotFirst vs $wantFirst")
  }

  /** Engine result of the GLOBAL (scan-kernel) path — no over(). The
    * single-key agreement test pins keyed==kernel; this pins kernel==polars
    * (a semantic both paths share wrongly would pass agreement). */
  private def engineGlobal(e: graft.expr.Expr): Map[Long, Option[Double]] =
    df.withColumn("r", e).toSpark
      .select(F.col("id"), F.col("r").cast("double")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  /** Whole-frame reference: one implicit group in id order. */
  private def global(f: IndexedSeq[Option[Double]] => IndexedSeq[Option[Double]])
    : Map[Long, Option[Double]] =
    rows.map(_._1).zip(f(rows.map(_._3))).toMap

  test("GLOBAL scan-kernel paths match the local reference") {
    assertAgree("g shift(3)", engineGlobal(col("v").shift(3)),
      global(vs => IndexedSeq.fill(3)(Option.empty[Double]) ++ vs.dropRight(3)))
    assertAgree("g diff(1)", engineGlobal(col("v").diff(1)),
      global { vs =>
        vs.indices.map(i =>
          if (i == 0) None
          else for { a <- vs(i); b <- vs(i - 1) } yield a - b).toIndexedSeq
      })
    assertAgree("g forward_fill", engineGlobal(col("v").forwardFill),
      global { vs =>
        var last: Option[Double] = None
        vs.map { v => if (v.isDefined) last = v; v.orElse(last) }
      })
    assertAgree("g cum_sum", engineGlobal(col("v").cumSum()),
      global { vs =>
        var acc = 0.0
        vs.map { v => v.map { x => acc += x; acc } }
      })
    assertAgree("g cum_sum reverse", engineGlobal(col("v").cumSum(reverse = true)),
      global { vs =>
        var acc = 0.0
        vs.reverse.map { v => v.map { x => acc += x; acc } }.reverse
      })
    assertAgree("g cum_min", engineGlobal(col("v").cumMin()),
      global { vs =>
        var m = Double.PositiveInfinity
        vs.map { v => v.map { x => m = math.min(m, x); m } }
      })
    assertAgree("g rank dense", engineGlobal(col("v").rank("dense")),
      global { vs =>
        val order = vs.flatten.distinct.sorted
        val r = order.zipWithIndex.toMap
        vs.map(_.map(x => (r(x) + 1).toDouble))
      })
  }

  test("pct_change forward-fills before computing (keyed + global)") {
    // reference expr.rb:5744-5757: [10,11,12,null,12].pct_change =
    // [null, 0.1, 0.0909.., 0.0, 0.0]
    def ref(n: Int)(vs: IndexedSeq[Option[Double]]): IndexedSeq[Option[Double]] = {
      var last: Option[Double] = None
      val filled = vs.map { v => if (v.isDefined) last = v; v.orElse(last) }
      filled.indices.map { i =>
        val prev = if (i - n < 0 || i - n >= filled.size) None else filled(i - n)
        for { c <- filled(i); p <- prev; if p != 0.0 } yield (c - p) / p
      }.toIndexedSeq
    }
    assertAgree("pct_change keyed", engine(col("v").pctChange()), perKey(ref(1)))
    assertAgree("pct_change(2) keyed", engine(col("v").pctChange(2)), perKey(ref(2)))
    assertAgree("pct_change global", engineGlobal(col("v").pctChange()), global(ref(1)))
    // the documented example, verbatim
    val ex = DataFrame(Seq[java.lang.Double](10.0, 11.0, 12.0, null, 12.0).toDF("a"))
      .withColumn("p", col("a").pctChange()).toSpark
      .select("p").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(ex(0).isEmpty && math.abs(ex(1).get - 0.1) < 1e-9 &&
      math.abs(ex(2).get - 1.0 / 11) < 1e-9 && ex(3).contains(0.0) && ex(4).contains(0.0),
      ex.mkString(","))
  }

  test("rolling default min_periods is the window size; explicit counts non-nulls") {
    // reference expr.rb:5072-5091: [1,8,6,2,16,10].rolling_mean(2) =
    // [null, 4.5, 7.0, 4.0, 9.0, 13.0]
    val ex = DataFrame(Seq(1.0, 8.0, 6.0, 2.0, 16.0, 10.0).toDF("a"))
      .withColumn("m", col("a").rollingMean(2)).toSpark
      .select("m").collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(ex.toSeq == Seq(None, Some(4.5), Some(7.0), Some(4.0), Some(9.0), Some(13.0)),
      ex.mkString(","))

    def refRolling(n: Int, mp: Int, f: Seq[Double] => Double)(
        vs: IndexedSeq[Option[Double]]): IndexedSeq[Option[Double]] =
      vs.indices.map { i =>
        val win = vs.slice(math.max(0, i - n + 1), i + 1).flatten
        if (win.size >= mp) Some(f(win)) else None
      }.toIndexedSeq
    assertAgree("rolling_sum(3) keyed", engine(col("v").rollingSum(3)),
      perKey(refRolling(3, 3, _.sum)))
    assertAgree("rolling_sum(3, mp=1) keyed", engine(col("v").rollingSum(3, minPeriods = 1)),
      perKey(refRolling(3, 1, _.sum)))
    assertAgree("rolling_max(4, mp=2) global", engineGlobal(col("v").rollingMax(4, minPeriods = 2)),
      global(refRolling(4, 2, _.max)))
  }

  test("rank random: a seeded permutation of ordinal ranks within ties") {
    // keyed and global forms: ranks per scope are a permutation of 1..m
    // (m = non-null count), equal values get DISTINCT consecutive ranks,
    // null stays null, and the result is reproducible for a fixed seed
    def check(got: Map[Long, Option[Double]], scopeOf: Long => String): Unit = {
      val byScope = got.toSeq.groupBy { case (id, _) => scopeOf(id) }
      byScope.foreach { case (_, idRanks) =>
        val ranks = idRanks.flatMap(_._2)
        assert(ranks.sorted == (1 to ranks.size).map(_.toDouble), ranks.toString)
      }
      rows.foreach { case (id, _, v) => assert(got(id).isDefined == v.isDefined) }
    }
    val keyed = engine(col("v").rank("random", seed = 7))
    check(keyed, id => rows(id.toInt)._2)
    val globalR = engineGlobal(col("v").rank("random", seed = 7))
    check(globalR, _ => "all")
    assert(engineGlobal(col("v").rank("random", seed = 7)) == globalR) // reproducible
    // ranks within a tie group are consecutive from the min rank
    val tied = DataFrame(Seq(5.0, 1.0, 5.0, 5.0, 9.0).toDF("a"))
      .withColumn("r", col("a").rank("random", seed = 3)).toSpark
      .select("a", "r").collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(tied.filter(_._1 == 5.0).map(_._2).sorted.toSeq == Seq(2, 3, 4), tied.mkString(","))
    assert(tied.find(_._1 == 1.0).get._2 == 1 && tied.find(_._1 == 9.0).get._2 == 5)
  }

  test("Series diff null_behavior drop shrinks the series") {
    import graft.api.Series
    val s = Series("a", Seq(10.0, 11.0, 14.0, 18.0).toDF("a"))
    val dropped = s.diff(1, "drop").df.collect().map(_.getDouble(0)).toSeq
    assert(dropped == Seq(1.0, 3.0, 4.0), dropped.toString)
    val trailing = s.diff(-1, "drop").df.collect().map(_.getDouble(0)).toSeq
    assert(trailing == Seq(-1.0, -3.0, -4.0), trailing.toString)
    // the frame-projection spelling raises the directed error
    val e = intercept[UnsupportedOperationException](col("a").diff(1, "drop"))
    assert(e.getMessage.contains("Series"), e.getMessage)
  }

  test("str pads never truncate; zfill is sign-aware; list slice/tail clamp") {
    // reference string_expr.rb:652: zfill keeps the sign in front of zeros
    val z = DataFrame(Seq("-1", "123", "999999", "+7").toDF("a"))
      .withColumn("z", col("a").str.zfill(4)).toSpark
      .select("z").collect().map(_.getString(0))
    assert(z.toSeq == Seq("-001", "0123", "999999", "+007"), z.mkString(","))
    // reference string_expr.rb:584-593: longer strings pass through whole
    val p = DataFrame(Seq("cow", "hippopotamus").toDF("a"))
      .withColumn("s", col("a").str.padStart(8, "*"))
      .withColumn("e", col("a").str.padEnd(8, "*")).toSpark
      .select("s", "e").collect().map(r => (r.getString(0), r.getString(1)))
    assert(p.toSeq == Seq(("*****cow", "cow*****"),
      ("hippopotamus", "hippopotamus")), p.mkString(","))
    // list.slice: python-window semantics — an underflowing negative offset
    // clamps the start AND shrinks the window; tail of a short list = whole
    val l = DataFrame(Seq(Seq(1, 2, 3, 4), Seq(9)).toDF("xs"))
      .withColumn("neg", col("xs").list.slice(-2, 2))
      .withColumn("t", col("xs").list.tail(3))
      .withColumn("uf", col("xs").list.slice(-6, 3))
      .withColumn("t0", col("xs").list.tail(0)).toSpark
      .select("neg", "t", "uf", "t0").collect()
      .map(r => (r.getSeq[Int](0).toList, r.getSeq[Int](1).toList,
        r.getSeq[Int](2).toList, r.getSeq[Int](3).toList))
    assert(l.toSeq == Seq(
      (List(3, 4), List(2, 3, 4), List(1), List()),
      (List(9), List(9), List(), List())), l.mkString(","))
  }

  test("round-8 composition: when branches, namespace chains, agg casts per key") {
    // (a) predicate AND both branches carry scanned ops — all three must
    // evaluate per key under .over(keys); a null predicate takes otherwise
    val e1 = Polars.when(col("v").cumSum() >= 0).then(col("v").cumSum())
      .otherwise(col("v").shift(1))
    assertAgree("when(cs>=0, cs, shift)", engine(e1), perKey { vs =>
      var acc = 0.0
      val cs = vs.map { v => v.foreach(acc += _); if (v.isDefined) Some(acc) else None }
      val sh = Option.empty[Double] +: vs.dropRight(1)
      vs.indices.map(i => cs(i) match {
        case Some(c) if c >= 0 => cs(i)
        case _ => sh(i)
      }).toIndexedSeq
    })
    // (b) a namespace chain over a keyed form: cast-to-string + str length
    // of a per-key shift (elementwise maps commute with keyed evaluation)
    val e2 = col("v").shift(1)
      .cast(org.apache.spark.sql.types.StringType).str.lenChars
    assertAgree("shift.cast(str).len_chars", engine(e2), perKey { vs =>
      (Option.empty[Double] +: vs.dropRight(1))
        .map(_.map(_.toString.length.toDouble))
    })
    // (c) aggregate-of-scanned under cast/arithmetic (GroupAggForm post)
    val got = df.groupBy("k").agg(
        (col("v").shift(1).sum * 2).alias("s2"),
        col("v").shift(1).count.cast(org.apache.spark.sql.types.IntegerType).alias("cI"))
      .toSpark.select("k", "s2", "cI").collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getInt(2))).toMap
    val want = rows.groupBy(_._2).map { case (k, rs) =>
      val sh = Option.empty[Double] +: rs.map(_._3).dropRight(1)
      val nn = sh.flatten
      k -> ((if (nn.isEmpty) None else Some(nn.sum * 2)), nn.size)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (ws, wc)) =>
      val (gs, gc) = got(k)
      assert(gc == wc, s"$k count: $gc vs $wc")
      ((gs, ws): @unchecked) match {
        case (None, None) =>
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)), s"$k sum: $a vs $b")
      }
    }
  }

  // ---- chained order-dependent ops under .over(keys): the whole chain
  //      evaluates per key (keyedInput materializes each inner spelling) ----

  private def lShift(n: Int)(vs: IndexedSeq[Option[Double]]): IndexedSeq[Option[Double]] =
    if (n >= 0) IndexedSeq.fill(math.min(n, vs.size))(None) ++ vs.dropRight(n)
    else vs.drop(-n) ++ IndexedSeq.fill(math.min(-n, vs.size))(None)
  private def lCum(f: (Double, Double) => Double)(vs: IndexedSeq[Option[Double]]) = {
    var acc = Option.empty[Double]
    vs.map {
      case None => None
      case Some(v) => acc = Some(acc.fold(v)(f(_, v))); acc
    }
  }
  private def lFwd(vs: IndexedSeq[Option[Double]]): IndexedSeq[Option[Double]] = {
    var last = Option.empty[Double]
    vs.map { v => if (v.isDefined) last = v; last }
  }
  private def lDiff(vs: IndexedSeq[Option[Double]]): IndexedSeq[Option[Double]] =
    vs.zip(lShift(1)(vs)).map {
      case (Some(a), Some(b)) => Some(a - b)
      case _ => None
    }

  test("chained scanned ops over(keys): whole chain per key") {
    assertAgree("shift.cum_sum",
      engine(col("v").shift(1).cumSum()),
      perKey(v => lCum(_ + _)(lShift(1)(v))))
    assertAgree("cum_sum.shift",
      engine(col("v").cumSum().shift(1)),
      perKey(v => lShift(1)(lCum(_ + _)(v))))
    assertAgree("shift.fill_null.cum_sum",
      engine(col("v").shift(1).fillNull(0).cumSum()),
      perKey(v => lCum(_ + _)(lShift(1)(v).map(x => Some(x.getOrElse(0.0))))))
    assertAgree("diff.forward_fill",
      engine(col("v").diff(1).forwardFill),
      perKey(v => lFwd(lDiff(v))))
    assertAgree("forward_fill.diff",
      engine(col("v").forwardFill.diff(1)),
      perKey(v => lDiff(lFwd(v))))
    assertAgree("shift.cum_sum.shift (3-deep)",
      engine(col("v").shift(1).cumSum().shift(1)),
      perKey(v => lShift(1)(lCum(_ + _)(lShift(1)(v)))))
    assertAgree("cum_max.diff",
      engine(col("v").cumMax().diff(1)),
      perKey(v => lDiff(lCum(math.max)(v))))
    assertAgree("shift.rank_min",
      engine(col("v").shift(1).rank("min")),
      perKey { v =>
        val sh = lShift(1)(v)
        sh.map(_.map(x => (1 + sh.flatten.count(_ < x)).toDouble))
      })
    assertAgree("shift.rolling_mean(2)",
      engine(col("v").shift(1).rollingMean(2)),
      perKey { v =>
        val sh = lShift(1)(v)
        sh.indices.map { i =>
          val w = sh.slice(math.max(0, i - 1), i + 1).flatten
          if (w.size >= 2) Some(w.sum / w.size) else None
        }
      })
    assertAgree("chain + plain arithmetic in one keyed zip",
      engine(col("v").shift(1).cumSum() + col("v")),
      perKey { v =>
        lCum(_ + _)(lShift(1)(v)).zip(v).map {
          case (Some(a), Some(b)) => Some(a + b)
          case _ => None
        }
      })
    assertAgree("chain inside a when branch",
      engine(Polars.when(col("v").isNotNull)
        .`then`(col("v").shift(1).cumSum()).otherwise(Polars.lit(0.0))),
      perKey { v =>
        val ch = lCum(_ + _)(lShift(1)(v))
        v.indices.map(i => if (v(i).isDefined) ch(i) else Some(0.0))
      })
  }

  test("per-group LIST of a scanned op matches the local reference") {
    val got = df.groupBy("k").agg(col("v").shift(1).alias("xs")).toSpark
      .select("k", "xs").collect()
      .map(r => r.getString(0) -> r.getSeq[java.lang.Double](1).map(Option(_).map(_.toDouble)))
      .toMap
    val want = rows.groupBy(_._2).map { case (k, rs) =>
      k -> (Option.empty[Double] +: rs.map(_._3).dropRight(1)).toSeq
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) => assert(got(k) == w, s"$k: ${got(k)} vs $w") }
  }
}
