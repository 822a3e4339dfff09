package graft.kernel

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Exact distributed order statistics WITHOUT a global sort.
  *
  * Selecting the value at rank r is a search problem, not a sort problem:
  * a fixed-width histogram over the column's [min, max] localizes every
  * requested rank to one bucket (counts are exact, so the bucket is exact),
  * and refining inside that bucket converges geometrically — 8192 buckets
  * cut the candidate range 8192x per round, so even 1e12 rows resolve in
  * ~3 narrow scans. The classic sort spelling (describe()'s previous
  * quartile path, or DuckDB's quantile_cont) range-shuffles the ENTIRE
  * column; this kernel shuffles NOTHING — each scan is a mapPartitions
  * array-histogram treeReduced to the driver (#partitions × #bands × 64 KB,
  * log-depth merge), and the final step collects one bounded value-count
  * table per ambiguous band. Backs [[graft.api.DataFrame.describe]]'s exact
  * quartiles and [[graft.expr.Expr.qcut]]'s cut values (reference
  * expr.rb:2611 — qcut's min-rank bucket rule `percent_rank(v) <= q` is
  * exactly `v <= value at rank floor(q*(n-1))`, so the cuts broadcast as
  * literals and the labeling pass is a pure projection).
  *
  * All ranks sharing a candidate interval share one histogram — requests
  * group into BANDS keyed by (column, refinement path), so a six-quantile
  * describe() costs one long[8192] per column per round, not one per rank.
  *
  * EXACTNESS under float rounding: a refinement level's membership is
  * re-derived from the PARENT level's bucket arithmetic (the identical IEEE
  * double ops that produced the counts), never from arithmetic bucket
  * bounds — so the partition a rank was localized against is bit-identical
  * to the one the next scan filters on. The nominal [lo, hi] pair only
  * steers the next level's bucket geometry; values that float-round outside
  * it stay members and clamp into the edge cells, keeping the partition
  * ordered and the counts exact. Ambiguous cells always resolve through the
  * final value-count pass, never through arithmetic bounds.
  *
  * Total order matches Spark's double sort: -Inf < finite < +Inf < NaN
  * (nulls are excluded; callers handle the null count separately).
  */
object Quantiles {

  /** Per-column request: 0-based ranks into the sorted non-null values,
    * given that column's non-null count (so callers need no count pass of
    * their own — the kernel's bounds scan supplies n). */
  case class Req(col: String, ranksOf: Long => Seq[Long])
  object Req {
    def at(col: String, ranks: Seq[Long]): Req = Req(col, _ => ranks)
  }

  /** Kernel result per column: the values at the requested (in-range) ranks
    * plus the bounds-scan facts callers commonly need next. */
  case class ColStats(nonNull: Long, nanCount: Long,
                      finiteLo: Option[Double], finiteHi: Option[Double],
                      at: Map[Long, Double])

  // one refinement level: membership = parent bucketOf(lo, width) == bucket
  private case class Level(lo: Double, width: Double, bucket: Long)
  // a band: one candidate interval shared by every rank localized into it
  private case class Band(col: String, levels: List[Level], lo: Double, hi: Double,
                          cntBefore: Long, candidates: Long, ranks: List[Long])

  private val Buckets = 8192
  // resolve by direct value-count collect once a band's member set is this
  // small — one driver round of bounded (value, count) pairs per band
  private val CollectCap = 1L << 18

  /** Clamped bucket index in [0, Buckets) — monotone in v for any (lo, w),
    * including w == 0 (NaN/Inf ratios clamp to the edge cells). Plain IEEE
    * double ops, identical on driver and executors. */
  private def bucketOf(v: Double, lo: Double, width: Double): Long = {
    val b = math.floor((v - lo) / width).toLong // NaN→0, ±Inf saturate
    if (b < 0L) 0L else if (b > Buckets - 1L) Buckets - 1L else b
  }

  private def isFiniteD(v: Double): Boolean =
    !java.lang.Double.isNaN(v) && !java.lang.Double.isInfinite(v)

  // serializable per-band membership spec for the executor-side kernels
  private case class BandSpec(colIdx: Int, levels: Array[(Double, Double, Long)],
                              lo: Double, width: Double)
  private def member(v: Double, s: BandSpec): Boolean = {
    if (!isFiniteD(v)) return false
    var i = 0
    while (i < s.levels.length) {
      val (llo, lw, lb) = s.levels(i)
      if (bucketOf(v, llo, lw) != lb) return false
      i += 1
    }
    true
  }

  /** Exact values at the requested ranks (plus bounds facts) per column.
    * Ranks outside [0, nonNullCount) are absent from the `at` map. */
  def orderStats(df0: DataFrame, reqs: Seq[Req]): Map[String, ColStats] = {
    val cols = reqs.map(_.col)
    val colIdx = cols.zipWithIndex.toMap
    val df = df0.select(cols.map(c => F.col(c).cast("double").as(c)): _*)
    // bounds pass: one narrow scan — per column: non-null count, NaN count,
    // +/-Inf counts, finite min/max
    val isFiniteC: Column => Column = v =>
      v.isNotNull && !F.isnan(v) &&
        v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity
    val aggs = cols.flatMap { c =>
      val v = F.col(c)
      Seq(
        F.count(v).as(s"n__$c"),
        F.count(F.when(F.isnan(v), 1)).as(s"nan__$c"),
        F.count(F.when(v === Double.NegativeInfinity, 1)).as(s"ninf__$c"),
        F.count(F.when(v === Double.PositiveInfinity, 1)).as(s"pinf__$c"),
        F.min(F.when(isFiniteC(v), v)).as(s"lo__$c"),
        F.max(F.when(isFiniteC(v), v)).as(s"hi__$c"))
    }
    val b = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def gl(n: String): Long = b.getLong(b.fieldIndex(n))
    def gd(n: String): Option[Double] = {
      val i = b.fieldIndex(n); if (b.isNullAt(i)) None else Some(b.getDouble(i))
    }

    val resolved = scala.collection.mutable.Map.empty[(String, Long), Double]
    var bands = List.empty[Band]
    val facts = reqs.map { r =>
      val c = r.col
      val (n, nan, ninf, pinf) = (gl(s"n__$c"), gl(s"nan__$c"), gl(s"ninf__$c"), gl(s"pinf__$c"))
      val (lo, hi) = (gd(s"lo__$c"), gd(s"hi__$c"))
      val searchable = List.newBuilder[Long]
      for (rank <- r.ranksOf(n).distinct if rank >= 0 && rank < n) {
        if (rank >= n - nan) resolved((c, rank)) = Double.NaN
        else if (rank >= n - nan - pinf) resolved((c, rank)) = Double.PositiveInfinity
        else if (rank < ninf) resolved((c, rank)) = Double.NegativeInfinity
        else (lo, hi) match {
          case (Some(l), Some(h)) if l == h => resolved((c, rank)) = l
          case (Some(_), Some(_)) => searchable += rank
          case _ => () // finite rank without finite bounds — unreachable
        }
      }
      val sr = searchable.result()
      if (sr.nonEmpty)
        bands ::= Band(c, Nil, lo.get, hi.get, ninf, n - nan - ninf - pinf, sr)
      c -> (n, nan, lo, hi)
    }.toMap

    val rows = org.apache.spark.sql.GraftInternalOps.internalRows(df)
    def specsOf(active: Array[Band]): Array[BandSpec] =
      active.map { s =>
        BandSpec(colIdx(s.col),
          s.levels.map(l => (l.lo, l.width, l.bucket)).toArray,
          s.lo, s.hi / Buckets - s.lo / Buckets)
      }

    // refinement rounds: one mapPartitions histogram scan per round splits
    // EVERY oversize band Buckets ways; the only cross-node traffic is the
    // treeReduced long[#bands][Buckets]
    // overflow-safe width: hi - lo can exceed Double.MaxValue (sentinels at
    // +/-1e308) — computing each half scaled first keeps the split finite,
    // and a stalled split (width 0 or non-finite) routes to the value-count
    // resolve instead of burning rounds
    def widthOf(lo: Double, hi: Double): Double = hi / Buckets - lo / Buckets
    var rounds = 0
    while (rounds < 64 &&
        bands.exists(s => s.candidates > CollectCap && {
          val w = widthOf(s.lo, s.hi)
          w > 0 && !w.isInfinity
        })) {
      rounds += 1
      val active = bands.toArray
      val specs = specsOf(active)
      val nBands = specs.length
      val hist: Array[Array[Long]] = rows.mapPartitions { it =>
        val h = Array.ofDim[Long](nBands, Buckets)
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < nBands) {
            val s = specs(i)
            if (!row.isNullAt(s.colIdx)) {
              val v = row.getDouble(s.colIdx)
              if (member(v, s)) h(i)(bucketOf(v, s.lo, s.width).toInt) += 1L
            }
            i += 1
          }
        }
        Iterator.single(h)
      }.treeReduce({ (a, bb) =>
        var i = 0
        while (i < a.length) {
          var j = 0
          while (j < Buckets) { a(i)(j) += bb(i)(j); j += 1 }
          i += 1
        }
        a
      }, depth = 2)
      val next = List.newBuilder[Band]
      active.zipWithIndex.foreach { case (s, i) =>
        val counts = hist(i)
        val w = widthOf(s.lo, s.hi)
        // localize each rank to its cell; ranks sharing a cell share the
        // child band. cumBefore(bkt) via one prefix walk.
        val children = scala.collection.mutable.LinkedHashMap
          .empty[Int, (Long, Long, List[Long])] // bucket -> (cumBefore, cnt, ranks)
        for (rank <- s.ranks) {
          val within = rank - s.cntBefore
          var cum = 0L
          var bkt = -1
          var j = 0
          while (j < Buckets && bkt < 0) {
            val cnt = counts(j)
            if (within < cum + cnt) bkt = j else { cum += cnt; j += 1 }
          }
          if (bkt >= 0) {
            val (cb, cc, rs) = children.getOrElse(bkt, (cum, counts(bkt), Nil))
            children(bkt) = (cb, cc, rank :: rs)
          } else {
            // an empty cell for an in-range rank is impossible (counts are
            // exact over the same member set) — defensive: value-count the
            // whole band
            val (cb, cc, rs) = children.getOrElse(-1, (0L, 0L, Nil))
            children(-1) = (cb, cc, rank :: rs)
          }
        }
        children.foreach {
          case (-1, (_, _, rs)) => next += s.copy(candidates = 0L, ranks = rs)
          case (bkt, (cumBefore, cnt, rs)) =>
            val nlo = math.max(s.lo, s.lo + bkt * w)
            val nhi = if (bkt >= Buckets - 1) s.hi else math.min(s.hi, s.lo + (bkt + 1) * w)
            next += Band(s.col, s.levels :+ Level(s.lo, w, bkt.toLong), nlo, nhi,
              s.cntBefore + cumBefore, cnt, rs)
        }
      }
      bands = next.result()
    }

    // final resolve: per-band value-count maps (distinct values compress, so
    // duplicate-heavy bands still stay bounded), merged log-depth
    if (bands.nonEmpty) {
      val active = bands.toArray
      val specs = specsOf(active)
      val nBands = specs.length
      val vc: Array[java.util.HashMap[java.lang.Double, Long]] = rows.mapPartitions { it =>
        val m = Array.fill(nBands)(new java.util.HashMap[java.lang.Double, Long]())
        while (it.hasNext) {
          val row = it.next()
          var i = 0
          while (i < nBands) {
            val s = specs(i)
            if (!row.isNullAt(s.colIdx)) {
              val v = row.getDouble(s.colIdx)
              if (member(v, s)) m(i).merge(v, 1L, (x, y) => x + y)
            }
            i += 1
          }
        }
        Iterator.single(m)
      }.treeReduce({ (a, bb) =>
        var i = 0
        while (i < a.length) {
          bb(i).forEach((k, v) => a(i).merge(k, v, (x, y) => x + y))
          i += 1
        }
        a
      }, depth = 2)
      active.zipWithIndex.foreach { case (s, i) =>
        val sorted = {
          import scala.jdk.CollectionConverters._
          vc(i).asScala.toArray.map { case (k, v) => (k.doubleValue, v) }.sortBy(_._1)
        }
        for (rank <- s.ranks) {
          val within = rank - s.cntBefore
          var cum = 0L
          var found = false
          for ((v, cnt) <- sorted if !found) {
            if (within < cum + cnt) { resolved((s.col, rank)) = v; found = true }
            cum += cnt
          }
        }
      }
    }

    facts.map { case (c, (n, nan, lo, hi)) =>
      c -> ColStats(n, nan, lo, hi,
        resolved.collect { case ((`c`, r), v) => r -> v }.toMap)
    }
  }

  /** The 0-based ranks a polars quantile at `q` needs: floor/ceil of
    * h = q*(n-1) — the same f64 arithmetic as the Expr-level spelling, so
    * kernel-routed scalars (Series#quantile, Frame#quantileFrame) pick the
    * identical elements. */
  def quantileRanks(q: Double): Long => Seq[Long] = n => {
    val h = q * (n - 1).toDouble
    Seq(math.floor(h).toLong, math.ceil(h).toLong)
  }

  /** Combine the values at quantileRanks(q) into the polars interpolation
    * result (reference expr.rb:2107 modes; nearest rounds half away from
    * zero per the expr.rb:2473 golden). None when the column has no
    * non-null values. */
  def quantileOf(st: ColStats, q: Double, interpolation: String): Option[Double] = {
    if (st.nonNull <= 0) return None
    val h = q * (st.nonNull - 1).toDouble
    val lo = st.at.get(math.floor(h).toLong)
    val hi = st.at.get(math.ceil(h).toLong)
    interpolation match {
      case "lower"    => lo
      case "higher"   => hi
      case "midpoint" => for (a <- lo; b <- hi) yield (a + b) / 2.0
      case "nearest"  => if (h - math.floor(h) >= 0.5) hi else lo
      case "linear"   => for (a <- lo; b <- hi) yield a + (b - a) * (h - math.floor(h))
    }
  }

  /** Linearly interpolated quantiles (quantile_cont / polars "linear") at
    * `probs` for each column: h = q*(nn-1), value = v[floor h] + frac *
    * (v[ceil h] - v[floor h]). Returns col -> per-prob Option (None when the
    * column has no non-null values). */
  def interpolated(df: DataFrame, cols: Seq[String], probs: Seq[Double])
      : Map[String, Seq[Option[Double]]] = {
    val reqs = cols.map(c => Req(c, n =>
      probs.flatMap { q =>
        val h = (n - 1) * q
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }))
    val stats = orderStats(df, reqs)
    cols.map { c =>
      val s = stats(c)
      c -> probs.map { q =>
        if (s.nonNull == 0) None
        else {
          val h = (s.nonNull - 1) * q
          for {
            lo <- s.at.get(math.floor(h).toLong)
            hi <- s.at.get(math.ceil(h).toLong)
          } yield lo + (hi - lo) * (h - math.floor(h))
        }
      }
    }.toMap
  }
}
