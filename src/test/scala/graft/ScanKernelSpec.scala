package graft

import scala.util.Random
import org.apache.spark.sql.{functions => F}
import graft.kernel.{RowIndex, Scan}

/** Edge-case stress for the distributed prefix-scan kernel: every op is
  * checked against a driver-side reference computed in idx order, over
  * frames explicitly repartitioned so buckets are MANY, tiny, or empty —
  * the carry paths a 1-2 partition LocalRelation never exercises
  * (cross-bucket lag deficits, null runs spanning buckets, windows wider
  * than a bucket, reverse scans). */
class ScanKernelSpec extends SparkSpec {
  import spark.implicits._

  /** Random (value-with-nulls) frame cached AFTER idx attach so the kernel
    * output and the driver-side reference read identical (idx, v) pairs. */
  private def frame(seed: Long, n: Int, parts: Int) = {
    val rnd = new Random(seed)
    val vals = Seq.fill(n)(if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(40) - 10))
    val d = RowIndex.attach(
      vals.toDF("v").repartition(parts)).cache()
    d.count() // materialize so both reads see the same ids
    val byIdx = d.collect().map(r =>
      (r.getLong(r.fieldIndex(RowIndex.name)),
        if (r.isNullAt(0)) None else Some(r.getInt(0)))).sortBy(_._1)
    (d, byIdx.map(_._1).toSeq, byIdx.map(_._2).toSeq)
  }

  private def outByIdx[T](df: org.apache.spark.sql.DataFrame, out: String)(get: org.apache.spark.sql.Row => T): Seq[T] =
    df.collect().toSeq.map(r => (r.getLong(r.fieldIndex(RowIndex.name)), get(r)))
      .sortBy(_._1).map(_._2)

  private val shapes = Seq((1L, 200, 1), (2L, 200, 7), (3L, 200, 64), (4L, 5, 13), (5L, 97, 16))

  test("running sum/min/max/count forward, reverse, exclusive match the sequential scan") {
    for ((seed, n, parts) <- shapes) {
      val (d, _, vs) = frame(seed, n, parts)
      // forward inclusive sum
      val sum = outByIdx(Scan.running(d, F.col("v"), "o", F.sum, "sum"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getLong(r.fieldIndex("o"))))
      var acc = Option.empty[Long]
      val expSum = vs.map { v =>
        acc = (acc, v) match {
          case (None, None) => None
          case (a, b) => Some(a.getOrElse(0L) + b.map(_.toLong).getOrElse(0L))
        }
        acc
      }
      assert(sum == expSum, s"sum seed=$seed parts=$parts")
      // reverse inclusive min
      val min = outByIdx(Scan.running(d, F.col("v"), "o", F.min, "min", reverse = true), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o"))))
      val expMin = vs.reverse.scanLeft(Option.empty[Int]) {
        case (a, v) => (a ++ v).reduceOption(_ min _)
      }.tail.reverse
      assert(min == expMin, s"min-rev seed=$seed parts=$parts")
      // exclusive count
      val cnt = outByIdx(Scan.running(d, F.col("v"), "o", F.count, "sum", inclusive = false), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) 0L else r.getLong(r.fieldIndex("o")))
      val expCnt = vs.scanLeft(0L)((a, v) => a + v.size).init
      assert(cnt == expCnt, s"cnt-excl seed=$seed parts=$parts")
    }
  }

  test("shifted lag/lead match, including shifts wider than any bucket") {
    for ((seed, n, parts) <- shapes; sh <- Seq(1, 3, 50, -1, -37)) {
      val (d, _, vs) = frame(seed, n, parts)
      val got = outByIdx(Scan.shifted(d, F.col("v"), sh, "o"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o"))))
      val exp = vs.indices.map { i =>
        val j = i - sh
        if (j >= 0 && j < n) vs(j) else None
      }
      assert(got == exp, s"shift=$sh seed=$seed parts=$parts")
    }
    // fill value applies only to structurally-missing positions
    val (d, _, vs) = frame(2L, 200, 7)
    val got = outByIdx(Scan.shifted(d, F.col("v"), 4, "o", Some(F.lit(-99))), "o")(
      r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o"))))
    val exp = vs.indices.map(i => if (i < 4) Some(-99) else vs(i - 4))
    assert(got == exp)
  }

  test("fillOrdered forward/backward carry across null runs spanning buckets") {
    // long null runs guarantee some bucket is entirely null
    for ((seed, n, parts) <- Seq((11L, 120, 31), (12L, 60, 8))) {
      val rnd = new Random(seed)
      val vals = Seq.fill(n)(if (rnd.nextInt(10) < 7) None else Some(rnd.nextInt(100)))
      val d = RowIndex.attach(vals.toDF("v").repartition(parts)).cache()
      d.count()
      val vs = d.collect().map(r => (r.getLong(1), if (r.isNullAt(0)) None else Some(r.getInt(0))))
        .sortBy(_._1).map(_._2).toSeq
      val fwd = outByIdx(Scan.fillOrdered(d, Seq("v")), "v")(
        r => if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getInt(r.fieldIndex("v"))))
      val expF = vs.scanLeft(Option.empty[Int])((a, v) => v.orElse(a)).tail
      assert(fwd == expF, s"fwd seed=$seed")
      val bwd = outByIdx(Scan.fillOrdered(d, Seq("v"), backward = true), "v")(
        r => if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getInt(r.fieldIndex("v"))))
      val expB = vs.reverse.scanLeft(Option.empty[Int])((a, v) => v.orElse(a)).tail.reverse
      assert(bwd == expB, s"bwd seed=$seed")
    }
  }

  test("rollingApply windows wider than buckets match the sequential trailing window") {
    for ((seed, n, parts) <- shapes; win <- Seq(1, 4, 17)) {
      val (d, _, vs) = frame(seed, n, parts)
      val got = outByIdx(
        Scan.rollingApply(d, F.col("v"), win, "o", (v, w) => F.sum(v).over(w)), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getLong(r.fieldIndex("o"))))
      val exp = vs.indices.map { i =>
        val window = vs.slice(math.max(0, i - win + 1), i + 1).flatten
        if (window.isEmpty) None else Some(window.map(_.toLong).sum)
      }
      assert(got == exp, s"win=$win seed=$seed parts=$parts")
    }
  }

  test("withRank methods match driver-side ranks; nulls rank null") {
    for ((seed, n, parts) <- Seq((21L, 150, 13), (22L, 40, 40))) {
      val (d, _, vs) = frame(seed, n, parts)
      val nonNull = vs.flatten
      def ltCount(x: Int) = nonNull.count(_ < x).toLong
      def eqCount(x: Int) = nonNull.count(_ == x).toLong
      val gotMin = outByIdx(Scan.withRank(d, F.col("v"), "o", "min"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o")).toLong))
      assert(gotMin == vs.map(_.map(x => ltCount(x) + 1)), s"min seed=$seed")
      val gotMax = outByIdx(Scan.withRank(d, F.col("v"), "o", "max"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getLong(r.fieldIndex("o"))))
      assert(gotMax == vs.map(_.map(x => ltCount(x) + eqCount(x))), s"max seed=$seed")
      val gotDense = outByIdx(Scan.withRank(d, F.col("v"), "o", "dense"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o")).toLong))
      assert(gotDense == vs.map(_.map(x => nonNull.distinct.count(_ < x).toLong + 1)), s"dense seed=$seed")
      val gotAvg = outByIdx(Scan.withRank(d, F.col("v"), "o", "average"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getDouble(r.fieldIndex("o"))))
      assert(gotAvg == vs.map(_.map(x => ltCount(x) + (eqCount(x) + 1) / 2.0)), s"avg seed=$seed")
      val gotMinDesc = outByIdx(Scan.withRank(d, F.col("v"), "o", "min", descending = true), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o")).toLong))
      assert(gotMinDesc == vs.map(_.map(x => nonNull.count(_ > x).toLong + 1)), s"min-desc seed=$seed")
      // ordinal: a permutation of 1..#nonNull, consistent with min/max bounds
      val gotOrd = outByIdx(Scan.withRank(d, F.col("v"), "o", "ordinal"), "o")(
        r => if (r.isNullAt(r.fieldIndex("o"))) None else Some(r.getInt(r.fieldIndex("o"))))
      assert(gotOrd.flatten.sorted == (1 to nonNull.size).toSeq, s"ord seed=$seed")
      vs.zip(gotOrd).foreach {
        case (Some(x), Some(o)) => assert(o >= ltCount(x) + 1 && o <= ltCount(x) + eqCount(x))
        case (None, o) => assert(o.isEmpty)
        case other => fail(other.toString)
      }
    }
  }

  test("Expr.interpolate fills gaps linearly over row positions across buckets") {
    // spark.range with 5 partitions keeps ordered contiguous splits, so the
    // idx order is the id order while still spanning many buckets
    val base = spark.range(0, 7, 1, 5).select(
      F.when(F.col("id") === 0, 0.0).when(F.col("id") === 3, 3.0)
        .when(F.col("id") === 5, 5.0).as("v"))
    val df = graft.api.LazyFrame(base)
    def run(method: String): Seq[Option[Double]] =
      df.select(Polars.col("v").interpolate(method).alias("i"),
          graft.Polars.col(RowIndex.name).alias("ord")).toSpark
        .orderBy("ord")
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(run("linear") ==
      Seq(Some(0.0), Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(5.0), None))
    assert(run("nearest") ==
      Seq(Some(0.0), Some(0.0), Some(3.0), Some(3.0), Some(3.0), Some(5.0), None))
  }

  test("withNtile matches the SQL first-buckets-larger distribution") {
    for ((seed, n, parts, k) <- Seq((31L, 103, 9, 4), (32L, 20, 6, 7), (33L, 3, 5, 4))) {
      val rnd = new Random(seed)
      // unique values so tie order cannot differ between engines
      val vals = rnd.shuffle((1 to n).toList)
      val d = RowIndex.attach(vals.toDF("v").repartition(parts)).cache()
      d.count()
      val got = Scan.withNtile(d, F.col("v"), "o", k)
        .select("v", "o").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val size = n / k; val large = n % k
      val exp = vals.sorted.zipWithIndex.map { case (v, r0) =>
        val b = if (r0 < large * (size + 1)) r0 / (size + 1)
                else large + (r0 - large * (size + 1)) / size
        v -> (b + 1)
      }.toMap
      assert(got == exp, s"seed=$seed")
    }
  }
}
