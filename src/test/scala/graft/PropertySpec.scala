package graft

import scala.util.Random
import graft.Polars._
import graft.api.DataFrame
import graft.kernel.DurationDsl
import org.apache.spark.sql.{functions => F}

/** Property-style invariants over seeded random inputs (SURVEY §5: ScalaTest
  * unit + property tests; deterministic seeds keep CI stable). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomFrame(seed: Long, n: Int = 60) = {
    val rnd = new Random(seed)
    DataFrame(Seq.fill(n)((rnd.nextInt(10), rnd.nextDouble() * 100, rnd.nextPrintableChar().toString))
      .toDF("k", "v", "s"))
  }

  test("filter partitions the frame: |p| + |!p| = |all|") {
    for (seed <- 1L to 5L) {
      val df = randomFrame(seed)
      val p = col("v") > 50.0
      val a = df.filter(p).toSpark.count()
      val b = df.filter(!p).toSpark.count()
      assert(a + b == df.toSpark.count())
    }
  }

  test("sort is a permutation: multiset of values preserved") {
    for (seed <- 1L to 5L) {
      val df = randomFrame(seed)
      val before = df.toSpark.select("v").collect().map(_.getDouble(0)).sorted.toSeq
      val after = df.sortBy(Seq(col("v")), Seq(seed % 2 == 0)).toSpark
        .select("v").collect().map(_.getDouble(0)).sorted.toSeq
      assert(before == after)
    }
  }

  test("cum_sum last element equals total sum") {
    for (seed <- 1L to 5L) {
      val df = randomFrame(seed)
      val cs = df.select(col("v").cumSum().alias("cs")).toSpark
        .collect().map(_.getDouble(0))
      val total = df.toSpark.agg(F.sum("v")).collect()(0).getDouble(0)
      assert(math.abs(cs.last - total) < 1e-6)
    }
  }

  test("concat vertical preserves row count; diagonal preserves columns") {
    for (seed <- 1L to 5L) {
      val a = randomFrame(seed, 30)
      val b = randomFrame(seed + 100, 20)
      assert(Polars.concat(Seq(a, b)).toSpark.count() == 50)
      val c = DataFrame(Seq((1, true)).toDF("k", "extra"))
      val d = Polars.concat(Seq(a, c), how = "diagonal")
      assert(d.columns.toSet == Set("k", "v", "s", "extra"))
      assert(d.toSpark.count() == 31)
    }
  }

  test("unique(any) row count equals distinct count; keep=first is a subset") {
    for (seed <- 1L to 5L) {
      val df = randomFrame(seed)
      val nd = df.toSpark.select("k").distinct().count()
      assert(df.unique(Seq("k")).toSpark.count() == nd)
      assert(df.unique(Seq("k"), keep = "first").toSpark.count() == nd)
    }
  }

  test("rank ordinal is a permutation of 1..n") {
    for (seed <- 1L to 3L) {
      val df = randomFrame(seed, 40)
      val ranks = df.select(col("v").rank("ordinal").alias("r")).toSpark
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(ranks == (1 to 40).toSeq)
    }
  }

  test("shift round trip: shift(n) then access original interior values") {
    for (seed <- 1L to 3L) {
      val df = randomFrame(seed, 30)
      val orig = df.toSpark.select("v").collect().map(_.getDouble(0)).toSeq
      val shifted = df.select(col("v").shift(3).alias("sv")).toSpark
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
      assert(shifted.take(3).forall(_.isEmpty))
      assert(shifted.drop(3).flatten == orig.dropRight(3))
    }
  }

  test("duration DSL is additive over concatenation") {
    val rnd = new Random(7)
    for (_ <- 1 to 20) {
      val (a, b) = (rnd.nextInt(100) + 1, rnd.nextInt(100) + 1)
      val (ua, ub) = (Seq("s", "m", "h", "d")(rnd.nextInt(4)), Seq("s", "m", "h", "d")(rnd.nextInt(4)))
      val joint = DurationDsl.parse(s"$a$ua$b$ub")
      val parts = DurationDsl.parse(s"$a$ua").totalNanos + DurationDsl.parse(s"$b$ub").totalNanos
      assert(joint.totalNanos == parts)
    }
  }

  test("jaccard symmetry and identity on random strings") {
    val rnd = new Random(11)
    val pairs = Seq.fill(5) {
      val base = Seq.fill(30)(('a' + rnd.nextInt(4)).toChar).mkString
      val other = Seq.fill(30)(('a' + rnd.nextInt(4)).toChar).mkString
      (base, other)
    }
    val df = pairs.toDF("a", "b")
    val out = df.select(
      graft.ml.Dedup.jaccard(df, F.col("a"), F.col("a")).as("self"),
      graft.ml.Dedup.jaccard(df, F.col("a"), F.col("b")).as("ab"),
      graft.ml.Dedup.jaccard(df, F.col("b"), F.col("a")).as("ba")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == 1.0)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("group sums equal global sum") {
    for (seed <- 1L to 5L) {
      val df = randomFrame(seed)
      val grouped = df.groupBy("k").agg(col("v").sum.alias("sv")).toSpark
        .agg(F.sum("sv")).collect()(0).getDouble(0)
      val global = df.toSpark.agg(F.sum("v")).collect()(0).getDouble(0)
      assert(math.abs(grouped - global) < 1e-6)
    }
  }

  test("minhash signature invariant under whitespace collapse and case") {
    val texts = Seq("The Quick  Brown\tFox", "the quick brown fox",
      "  THE QUICK BROWN FOX  ")
    import org.apache.spark.unsafe.types.UTF8String
    val sigs = texts.map(t =>
      graft.ext.MinHashSig.compute(UTF8String.fromString(t), 5, 16).toLongArray.toSeq)
    // leading/trailing whitespace is a real character for shingling, but
    // internal runs collapse and case folds: first two must agree
    assert(sigs(0) == sigs(1))
    assert(sigs.forall(_.size == 16))
  }

  test("reshape(r,c) then flatten is the identity for random lengths") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    for (seed <- 1L to 3L) {
      val rnd = new Random(seed)
      val c = rnd.nextInt(5) + 1
      val r = rnd.nextInt(8) + 1
      val values = Seq.fill(r * c)(rnd.nextInt(1000))
      val s = graft.api.Series("x", values)
      assert(s.reshape(Seq(r.toLong, c.toLong)).reshape(Seq(-1L)).toList == values.toList)
    }
  }

  test("z-value is monotone per coordinate and a bijection on the grid") {
    val pts = for { x <- 0 until 16; y <- 0 until 16 } yield (x, y)
    val z = pts.toDF("x", "y")
      .select(F.col("x"), F.col("y"),
        graft.io.Layout.zValue(Seq(F.col("x"), F.col("y")), bits = 4).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // bijection onto 0..255
    assert(z.values.toSet == (0L until 256L).toSet)
    // fixing one coordinate, z is strictly increasing in the other
    for (x <- 0 until 16; y <- 0 until 15) assert(z((x, y)) < z((x, y + 1)))
    for (y <- 0 until 16; x <- 0 until 15) assert(z((x, y)) < z((x + 1, y)))
  }

  test("connected components match driver-side union-find on random graphs") {
    for (seed <- 1L to 3L) {
      val rnd = new Random(seed)
      val n = 30
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: classic union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt)); if (ra != rb) parent(ra) = rb
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // canonical label = min member of the component
          val root = find(v.toInt)
          (0L until n).filter(u => find(u.toInt) == root)
            .filter(u => edges.exists(e => e._1 == u || e._2 == u)).min
        }).toMap
      val got = graft.ml.Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("tz offset is zero for UTC and total = base + dst") {
    import org.apache.spark.unsafe.types.UTF8String
    val instants = Seq(0L, 1704067200000000L, 1721088000000000L) // 1970, 2024-01, 2024-07
    for (us <- instants) {
      assert(graft.ext.TzOffset.offsetMicros(us, UTF8String.fromString("UTC"), false) == 0L)
      assert(graft.ext.TzOffset.offsetMicros(us, UTF8String.fromString("UTC"), true) == 0L)
      val base = graft.ext.TzOffset.offsetMicros(us, UTF8String.fromString("Europe/Berlin"), false)
      val dst = graft.ext.TzOffset.offsetMicros(us, UTF8String.fromString("Europe/Berlin"), true)
      assert(base == 3600L * 1000000) // CET standard offset is +1h year-round
      assert(dst == 0L || dst == 3600L * 1000000)
    }
  }

  test("packing invariants on random corpora: offsets bounded, bins monotone, tokens conserved") {
    for (seed <- 1L to 3L) {
      val rnd = new Random(seed)
      val docs = (1L to 200L).map(i => (i, rnd.nextInt(400) + 1L)).toDF("id", "ntok")
      val budget = 512L
      val lin = graft.ml.Packing.linearPack(docs, "ntok", "id", budget)
        .orderBy("id").collect()
      assert(lin.forall(r => r.getAs[Long]("bin_offset") >= 0 &&
        r.getAs[Long]("bin_offset") < budget))
      val bins = lin.map(_.getAs[Long]("bin"))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b }) // monotone in id order
      val nf = graft.ml.Packing.nextFitPack(docs, "ntok", "id", budget)
      val stats = graft.ml.Packing.binStats(nf, "ntok", budget).collect()
      // no bin overfills unless it holds a single oversized doc (none here)
      assert(stats.forall(_.getAs[Long]("n_tokens") <= budget))
      assert(stats.map(_.getAs[Long]("n_tokens")).sum ==
        docs.collect().map(_.getLong(1)).sum) // every token lands exactly once
    }
  }

  test("int8 quantization error bounded by half a step per coordinate") {
    for (seed <- 1L to 3L) {
      val rnd = new Random(seed)
      val vecs = (1L to 50L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
      val out = vecs.select(F.col("v"),
          graft.ml.Similarity.quantizeInt8(F.col("v")).as("q"))
        .collect()
      out.foreach { r =>
        val v = r.getSeq[Float](0)
        val q = r.getStruct(1)
        val codes = q.getSeq[Int](0); val scale = q.getDouble(1)
        v.zip(codes).foreach { case (x, c) =>
          assert(math.abs(x.toDouble - c / scale) <= 0.5 / scale + 1e-12)
          assert(c >= -127 && c <= 127)
        }
      }
    }
  }
}
