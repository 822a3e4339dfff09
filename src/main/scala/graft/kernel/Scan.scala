package graft.kernel

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** Distributed prefix-scan kernel (SURVEY §7 row-order discipline at scale).
  *
  * Polars' ordered-frame ops (cum_*, shift, fills, rank without `over`;
  * reference expr.rb:928-1062, 1624, 5691) need a GLOBAL row order. The naive
  * Spark spelling `Window.orderBy(idx)` funnels every row through one task
  * ("Moving all data to a single partition"), which is correct at sf0.1 and
  * dead at 100 TB. This kernel keeps the exact semantics but distributes the
  * execution with the classic two-pass scan:
  *
  *   1. bucket rows by the partition field of the monotonic row index
  *      ([[RowIndex.attach]] ids are `pid << 33 | offset`, so `idx >>> 33`
  *      yields contiguous runs of the global order — and any monotone
  *      function of a global order key gives valid scan segments);
  *   2. run the window per bucket (`Window.partitionBy(bucket).orderBy(idx)`):
  *      ONE balanced hash shuffle instead of a single-partition sort;
  *   3. reduce one partial row per bucket, prefix-combine the partials on the
  *      bucket-count-sized frame (that tiny window IS single-partition — over
  *      #source-partitions rows, never data), and broadcast-join the carry
  *      back on the bucket key.
  *
  * Cost model: the partials branch is one extra COLUMN-PRUNED pass of the
  * base (map-side partial aggregation — only #buckets rows ever shuffle),
  * so a kernel op costs ~2 narrow reads + 1 balanced shuffle instead of the
  * old 1 read + 1 all-to-one shuffle. Catalyst's ReuseExchange dedupes
  * identical exchange subtrees where shapes allow; for expensive composed
  * upstreams, cache the input frame before stacking kernel ops. The id
  * projection is deterministic for deterministic scans (the same caveat
  * [[RowIndex]] already documents).
  */
object Scan {
  val BUCKET = "__graft_bucket__"
  /** Reserved dense 1-based global position column (running count over the
    * hidden row index). Shared by every [[zipOrdered]] prep in a projection
    * — the first computes it, the rest reuse it — and dropped by the frame
    * layer with [[BUCKET]]. */
  val POS = "__graft_pos__"
  private val IDX = RowIndex.name
  private val ctr = new AtomicLong()

  /** Fresh reserved helper-column name (plan-time unique within the JVM). */
  def fresh(prefix: String): String = s"__graft_${prefix}${ctr.incrementAndGet()}__"

  /** Derive the scan bucket from the (already attached) monotonic row index. */
  def withBucket(d: DataFrame): DataFrame =
    if (d.columns.contains(BUCKET)) d
    else d.withColumn(BUCKET, F.shiftrightunsigned(F.col(IDX), 33))

  /** Per-bucket ordered window — the distributed replacement for
    * `Window.orderBy(idx)`. */
  def bucketWindow: WindowSpec =
    Window.partitionBy(F.col(BUCKET)).orderBy(F.col(IDX))

  // tiny windows over the per-bucket partials frame (#buckets rows)
  private def prior = Window.orderBy(F.col(BUCKET)).rowsBetween(Window.unboundedPreceding, -1)
  private def later = Window.orderBy(F.col(BUCKET)).rowsBetween(1, Window.unboundedFollowing)

  /** Null-transparent merge: running aggregates are null until the first
    * non-null input, exactly like a window aggregate over the full order. */
  private def merge(f: (Column, Column) => Column)(local: Column, off: Column): Column =
    F.when(local.isNull, off).when(off.isNull, local).otherwise(f(local, off))

  /** Cross-bucket reduction per running kind: how per-bucket partials combine.
    * ("sum" also merges counts — partial counts add.) */
  private def kindFns(kind: String): (Column => Column, (Column, Column) => Column) =
    kind match {
      case "sum"     => (F.sum, merge(_ + _))
      case "min"     => (F.min, merge(F.least(_, _)))
      case "max"     => (F.max, merge(F.greatest(_, _)))
      // typed product: int stays i64, floats f64 (graft.ext.GraftProduct)
      case "product" => (c => graft.expr.Expr.productAgg(c), merge(_ * _))
      case k => throw new IllegalArgumentException(
        s"Scan.running: kind must be sum|min|max|product, got '$k'")
    }

  /** `out` := running aggregate of `value` over the global idx order.
    * `aggF` runs both per-row (window within bucket) and per-bucket
    * (partial); `kind` names the cross-bucket merge — pass "sum" for counts.
    * `inclusive = false` excludes the current row (exclusive prefix).
    * `value` is projected to a real column first, so it may itself contain
    * window expressions (composed order-dependent exprs never nest windows
    * inside the aggregate). */
  def running(d0: DataFrame, value: Column, out: String, aggF: Column => Column,
              kind: String, reverse: Boolean = false,
              inclusive: Boolean = true): DataFrame = {
    val v = fresh("v"); val off = fresh("off")
    val d = withBucket(d0).withColumn(v, value)
    val frame =
      if (reverse) bucketWindow.rowsBetween(if (inclusive) Window.currentRow else 1L, Window.unboundedFollowing)
      else bucketWindow.rowsBetween(Window.unboundedPreceding, if (inclusive) Window.currentRow else -1L)
    val (offAgg, combine) = kindFns(kind)
    val partials = d.groupBy(F.col(BUCKET)).agg(aggF(F.col(v)).as("__t__"))
    val offsets = partials.select(F.col(BUCKET),
      offAgg(F.col("__t__")).over(if (reverse) later else prior).as(off))
    d.join(F.broadcast(offsets), Seq(BUCKET), "left")
      .withColumn(out, combine(aggF(F.col(v)).over(frame), F.col(off)))
      .drop(v, off)
  }

  /** Forward (backward) fill the named columns IN PLACE over the global idx
    * order. The per-bucket boundary value is the struct-max trick —
    * `max(struct(idx, v))` among non-null v — so no order-sensitive
    * aggregate is involved; the carry is the nearest prior (following)
    * bucket's boundary value. */
  def fillOrdered(d0: DataFrame, cols: Seq[String], backward: Boolean = false): DataFrame = {
    val d = withBucket(d0)
    val localW =
      if (backward) bucketWindow.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else bucketWindow.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = cols.map { c =>
      val pair = F.when(F.col(c).isNotNull, F.struct(F.col(IDX).as("i"), F.col(c).as("v")))
      (if (backward) F.min(pair) else F.max(pair)).getField("v").as(s"__b_$c")
    }
    val partials = d.groupBy(F.col(BUCKET)).agg(boundary.head, boundary.tail: _*)
    val carry = cols.map { c =>
      (if (backward) F.first(F.col(s"__b_$c"), ignoreNulls = true).over(later)
       else F.last(F.col(s"__b_$c"), ignoreNulls = true).over(prior)).as(s"__o_$c")
    }
    val offsets = partials.select((F.col(BUCKET) +: carry): _*)
    val joined = d.join(F.broadcast(offsets), Seq(BUCKET), "left")
    val filled = cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, F.coalesce(
        (if (backward) F.first(F.col(c), ignoreNulls = true)
         else F.last(F.col(c), ignoreNulls = true)).over(localW),
        F.col(s"__o_$c")))
    }
    filled.drop(cols.map(c => s"__o_$c"): _*)
  }

  /** `out` := `value` filled forward/backward (expression form of
    * [[fillOrdered]]). */
  def filled(d0: DataFrame, value: Column, out: String, backward: Boolean): DataFrame =
    fillOrdered(d0.withColumn(out, value), Seq(out), backward)

  /** `out` := `value` shifted by `n` rows over the global idx order
    * (n > 0 looks back, n < 0 looks ahead; reference expr.rb:1624). Rows
    * whose shift stays inside their bucket use a plain per-bucket lag/lead;
    * rows near a bucket boundary read from a carry array — the |n| rows
    * nearest the boundary of each other bucket, flattened across buckets on
    * the partials frame so undersized buckets chain correctly. Structurally
    * out-of-range rows yield `fill` (default null). */
  def shifted(d0: DataFrame, value: Column, n: Int, out: String,
              fill: Option[Column] = None): DataFrame = {
    require(n != 0, "Scan.shifted: n must be non-zero")
    val k = math.abs(n); val back = n > 0
    val v = fresh("v"); val rn = fresh("rn"); val rb = fresh("rb"); val carry = fresh("c")
    val d = withBucket(d0).withColumn(v, value)
    val descW = Window.partitionBy(F.col(BUCKET)).orderBy(F.col(IDX).desc)
    // row number counted from the boundary the shift reaches across
    val rnW = if (back) bucketWindow else descW
    // per-bucket boundary slice: the k rows nearest the opposite boundary
    // (tail for lag, head for lead) as (idx, value) structs in idx order
    val bW = if (back) descW else bucketWindow
    val slices = d.withColumn(rb, F.row_number().over(bW)).filter(F.col(rb) <= k)
      .groupBy(F.col(BUCKET))
      .agg(F.array_sort(F.collect_list(F.struct(F.col(IDX).as("i"), F.col(v).as("x")))).as("__s__"))
    val gathered =
      if (back) F.flatten(F.collect_list(F.col("__s__")).over(prior))
      else F.flatten(F.collect_list(F.col("__s__")).over(later))
    val kept =
      if (back) F.slice(gathered, F.greatest(F.lit(1), F.size(gathered) - (k - 1)), F.lit(k))
      else F.slice(gathered, F.lit(1), F.lit(k))
    val offsets = slices.select(F.col(BUCKET),
      F.transform(kept, s => s.getField("x")).as(carry))
    val local = if (back) F.lag(F.col(v), k).over(bucketWindow)
                else F.lead(F.col(v), k).over(bucketWindow)
    val d2 = d.withColumn(rn, F.row_number().over(rnW))
      .join(F.broadcast(offsets), Seq(BUCKET), "left")
    // carry position: lag reads (size - k + rn)-th from an idx-ascending
    // tail; lead reads (k - rn + 1)-th from an idx-ascending head
    val pos = if (back) F.size(F.col(carry)) - k + F.col(rn)
              else F.lit(k) - F.col(rn) + 1
    d2.withColumn(out,
        F.when(F.col(rn) > k, local)
          .when(pos >= 1 && pos <= F.size(F.col(carry)),
            F.element_at(F.col(carry), pos.cast("int")))
          .otherwise(fill.getOrElse(F.lit(null))))
      .drop(v, rn, carry)
  }

  /** `out` := an arbitrary trailing-`n`-row window aggregate over the global
    * idx order, executed per bucket with PHANTOM rows carried across bucket
    * boundaries: the (n-1) rows nearest each boundary travel as structs on
    * the partials frame, are exploded back into their successor buckets
    * (flagged, filtered after the window), so every real row's frame holds
    * exactly its global predecessors. `build` receives the value column and
    * the framed window spec and may reference both any number of times —
    * native aggregate numerics (skewness, stddev, collect_list order) are
    * bit-identical to the single-partition spelling. */
  def rollingApply(d0: DataFrame, value: Column, n: Int, out: String,
                   build: (Column, WindowSpec) => Column): DataFrame = {
    require(n >= 1, s"rollingApply: window must be >= 1, got $n")
    val k = n - 1
    val v = fresh("v"); val ph = fresh("ph"); val rb = fresh("rb"); val carry = fresh("c")
    val d = withBucket(d0).withColumn(v, value)
    val frame = bucketWindow.rowsBetween(-k.toLong, 0L)
    if (k == 0)
      return d.withColumn(out, build(F.col(v), frame)).drop(v)
    val descW = Window.partitionBy(F.col(BUCKET)).orderBy(F.col(IDX).desc)
    val slices = d.withColumn(rb, F.row_number().over(descW)).filter(F.col(rb) <= k)
      .groupBy(F.col(BUCKET))
      .agg(F.array_sort(F.collect_list(F.struct(F.col(IDX).as("i"), F.col(v).as("x")))).as("__s__"))
    val gathered = F.flatten(F.collect_list(F.col("__s__")).over(prior))
    val kept = F.slice(gathered, F.greatest(F.lit(1), F.size(gathered) - (k - 1)), F.lit(k))
    // two steps: a generator cannot consume a window expression directly
    val withCarry = slices.select(F.col(BUCKET), kept.as(carry))
    val phantoms = withCarry.select(F.col(BUCKET), F.explode(F.col(carry)).as("__e__"))
      .select(F.col(BUCKET) +:
        d.columns.filterNot(_ == BUCKET).map {
          case IDX    => F.col("__e__.i").as(IDX)
          case `v`    => F.col("__e__.x").as(v)
          case c      => F.lit(null).cast(d.schema(c).dataType).as(c)
        }.toSeq :+ F.lit(true).as(ph): _*)
    val aug = d.withColumn(ph, F.lit(false)).unionByName(phantoms)
    aug.withColumn(out, build(F.col(v), frame))
      .filter(!F.col(ph))
      .drop(v, ph)
  }

  /** `out` := `build(value, w)` over the temporal range frame
    * `[epoch+loIncl, epoch+hiIncl]` (µs, both bounds inclusive — open polars
    * endpoints are pre-shifted by 1 µs by the caller) WITHOUT a global
    * single-partition sort: rows bucket by `floor(epoch / bw)` with bucket
    * width >= the window's farthest reach, so a probe row's window can only
    * touch adjacent buckets; each bucket's rows ride into the neighbor
    * bucket as flagged phantom rows and the range window runs per bucket.
    * One balanced hash shuffle, <= 3x row volume. Same phantom-carry shape
    * as [[rollingApply]], bucketed by time instead of rows.
    *
    * Null-epoch rows get NO phantom copy (null+1 stays null — the phantom
    * would land back in the null bucket and double-count itself); they keep
    * their null peer-group window, matching the keyed range-frame path. */
  def rollingByApply(d0: DataFrame, value: Column, epoch: Column,
                     loIncl: Long, hiIncl: Long, out: String,
                     build: (Column, WindowSpec) => Column): DataFrame = {
    val v = fresh("v")
    rollingByApplyMulti(d0.withColumn(v, value), epoch, loIncl, hiIncl,
      Seq(out -> ((w: WindowSpec) => build(F.col(v), w)))).drop(v)
  }

  /** Multi-output form of [[rollingByApply]]: one phantom-carry pass attaches
    * every `outs` column over the same `[epoch+loIncl, epoch+hiIncl]` range
    * frame — the frame-level `rolling().agg(...)` spelling, shared with the
    * single-expression path so the bucket/phantom machinery exists once. */
  def rollingByApplyMulti(d0: DataFrame, epoch: Column,
                          loIncl: Long, hiIncl: Long,
                          outs: Seq[(String, WindowSpec => Column)]): DataFrame = {
    val ph = fresh("ph"); val tb = fresh("tb"); val ep = fresh("ep")
    val backReach = math.max(0L, -loIncl)
    val fwdReach = math.max(0L, hiIncl)
    val bw = Seq(backReach, fwdReach, 1L).max
    val d = d0.withColumn(ep, epoch)
      .withColumn(tb, F.floor(F.col(ep) / bw))
    var aug = d.withColumn(ph, F.lit(false))
    if (backReach > 0)
      aug = aug.unionByName(d.filter(F.col(tb).isNotNull)
        .withColumn(tb, F.col(tb) + 1).withColumn(ph, F.lit(true)))
    if (fwdReach > 0)
      aug = aug.unionByName(d.filter(F.col(tb).isNotNull)
        .withColumn(tb, F.col(tb) - 1).withColumn(ph, F.lit(true)))
    val w = Window.partitionBy(F.col(tb)).orderBy(F.col(ep))
      .rangeBetween(loIncl, hiIncl)
    // fresh names first, rename at the end: every build must see the
    // ORIGINAL columns — sequential withColumn would let an out named after
    // an existing column shadow it for the builds that follow
    val freshOuts = outs.map { case (out, build) => (out, build, Scan.fresh("ro")) }
    val built = freshOuts.foldLeft(aug) { case (acc, (_, build, fn)) =>
      acc.withColumn(fn, build(w)) }
    freshOuts.foldLeft(built) { case (acc, (out, _, fn)) =>
        acc.withColumn(out, F.col(fn)).drop(fn) }
      .filter(!F.col(ph))
      .drop(ph, tb, ep)
  }

  /** `out` := `aggBuild(value)` over the CALENDAR window `(t - months, t]`
    * (endpoint inclusivity per `closed`), where t is the row's own `ts`
    * value — the expr-level sibling of frame `rolling(period: "1mo")`.
    * Month lengths vary, so no fixed-offset range frame can express the
    * window; this is the distributed range-join shape instead: rows bucket
    * by `floor(months_since_epoch / m)` (a window start `t - m months`
    * keeps its month under day clamping, so it ALWAYS lands in bucket b-1),
    * each probe row explodes into join buckets {b-1, b} and equi-joins
    * candidate rows (plus `keys`, null-safe) with the µs range check as the
    * join residual; `aggBuild` runs as a plain aggregate per probe row id.
    * Two balanced shuffles, 2x probe-side row volume (join machinery
    * columns only), no data-sized single partition. Null-ts rows survive
    * with a null result (polars' rolling contract requires a non-null
    * sorted index — out-of-contract rows must not vanish). */
  def rollingByCalendar(d0: DataFrame, value: Column, ts: Column, months: Int,
                        closed: String, out: String,
                        aggBuild: Column => Column,
                        keys: Seq[Column] = Nil): DataFrame = {
    require(months > 0, s"rolling_*_by: calendar window must be positive, got $months months")
    // Join-back discipline: per-probe results re-attach to input rows by a
    // synthesized row id when the layout makes ids branch-stable (narrow
    // scan-rooted plans — [[org.apache.spark.sql.GraftInternalOps
    // .idStableLayout]]), the cheap common path. Otherwise (any shuffle /
    // nondeterminism below: round-robin scatter orders by the pruned binary
    // row, reduce-fetch interleaving varies per execution — an id-keyed
    // join-back would silently misalign) the window being a pure function of
    // (ts, keys) lets results compute per DISTINCT (ts, keys) probe and join
    // back on DATA-DERIVED columns only.
    val idStable = org.apache.spark.sql.GraftInternalOps.idStableLayout(d0)
    val vk = fresh("v"); val jb = fresh("jb"); val epk = fresh("ep"); val ri = fresh("ri")
    val kks = keys.indices.map(i => fresh(s"k$i")).toIndexedSeq
    val tsc = ts.cast("timestamp")
    val base0 = keys.zip(kks).foldLeft(
      d0.withColumn(vk, value).withColumn(epk, F.unix_micros(tsc))) {
      case (acc, (k, kk)) => acc.withColumn(kk, k)
    }
    val base = if (idStable) base0.withColumn(ri, F.monotonically_increasing_id()) else base0
    def monthCols(ep: Column): (Column, Column) = {
      val t = F.timestamp_micros(ep)
      val mse = ((F.year(t) - 1970) * 12 + F.month(t) - 1).cast("long")
      (F.floor(mse.cast("double") / months).cast("long"),
        F.unix_micros(t - F.expr(s"INTERVAL '$months' MONTH")))
    }
    val (ptb, plo) = monthCols(F.col("__p_ep__"))
    val probeKeys: Seq[String] =
      if (idStable) Seq("__p_ri__") else "__p_ep__" +: kks.map(kk => s"__p_$kk")
    val probes0 = base.select(((if (idStable) Seq(F.col(ri).as("__p_ri__")) else Nil) ++
      Seq(F.col(epk).as("__p_ep__")) ++
      kks.map(kk => F.col(kk).as(s"__p_$kk"))).toIndexedSeq: _*)
    val probes = (if (idStable) probes0 else probes0.distinct())
      .withColumn("__p_lo__", plo)
      .withColumn(jb, F.explode(F.array(ptb - 1, ptb)))
    val (ctb, _) = monthCols(F.col(epk))
    val cand = base.select((Seq(F.col(vk), F.col(epk).as("__c_ep__"),
      ctb.as("__c_tb__")) ++ kks.map(F.col)).toIndexedSeq: _*)
    val loCmp =
      if (closed == "left" || closed == "both") F.col("__c_ep__") >= F.col("__p_lo__")
      else F.col("__c_ep__") > F.col("__p_lo__")
    val hiCmp =
      if (closed == "right" || closed == "both") F.col("__c_ep__") <= F.col("__p_ep__")
      else F.col("__c_ep__") < F.col("__p_ep__")
    val cond = kks.map(kk => F.col(s"__p_$kk") <=> F.col(kk))
      .foldLeft(F.col(jb) === F.col("__c_tb__") && loCmp && hiCmp)(_ && _)
    val perProbe = probes.join(cand, cond)
      .groupBy(probeKeys.map(F.col).toIndexedSeq: _*)
      .agg(aggBuild(F.col(vk)).as(out))
    // LEFT join: an empty window (closed: "none"/"left" excluding t, or a
    // null ts — no candidate passes a null range check) must keep the probe
    // row with a null aggregate; <=> so null-ts / null-key rows re-attach
    val back =
      if (idStable) base(ri) === perProbe("__p_ri__")
      else kks.map(kk => base(kk) <=> perProbe(s"__p_$kk"))
        .foldLeft(base(epk) <=> perProbe("__p_ep__"))(_ && _)
    base.join(perProbe, back, "left")
      .drop(probeKeys: _*)
      .drop(vk, epk, ri).drop(kks: _*)
  }

  /** `out` := global rank of `value` (min/max/dense/ordinal/average; nulls
    * rank null, the reference's null behavior). Distributed shape: per-value
    * counts, exclusive prefix sum over the range-sorted distinct-value frame
    * (via [[running]]), shuffle join back on the value — never a
    * whole-data single-partition sort. `ordinal` additionally breaks ties by
    * row order and requires the idx column on `d0`. */
  def withRank(d0: DataFrame, value: Column, out: String, method: String,
               descending: Boolean = false, seed: Long = 0L): DataFrame = {
    val v = fresh("v")
    val d = d0.withColumn(v, value)
    val vc = d.groupBy(F.col(v)).agg(F.count(F.lit(1)).as("__c__"))
      .filter(F.col(v).isNotNull)
    val sorted = RowIndex.attach(
      vc.orderBy(if (descending) F.col(v).desc else F.col(v).asc))
    val withLt = running(sorted, F.col("__c__"), "__lt__", F.sum, "sum", inclusive = false)
    val withDense =
      if (method == "dense") running(withLt, F.lit(1L), "__d__", F.sum, "sum")
      else withLt
    val lt = F.coalesce(F.col("__lt__"), F.lit(0L))
    // dtype parity with the previous window spelling (and polars' idx-sized
    // ranks): min/dense/ordinal/random int, max long, average double
    val rankCol = method match {
      case "min"                => (lt + 1).cast("int")
      case "max"                => lt + F.col("__c__")
      case "dense"              => F.col("__d__").cast("int")
      case "ordinal" | "random" => (lt + 1).cast("int") // + per-row tiebreak below
      case "average" => lt.cast("double") + (F.col("__c__") + 1).cast("double") / 2.0
      case m => throw new IllegalArgumentException(
        s"rank: method must be average|min|max|dense|ordinal|random, got '$m'")
    }
    val table = withDense.select(F.col(v), rankCol.as(out))
    val joined = d.join(table, Seq(v), "left")
    // the tie-group windows are per-distinct-value sized (bounded partials),
    // never data-sized; random ties order by a materialized seeded column
    // (nondeterministic exprs are rejected inside window ordering)
    val resolved = method match {
      case "ordinal" =>
        joined.withColumn(out, (F.col(out) +
          F.row_number().over(Window.partitionBy(F.col(v)).orderBy(F.col(IDX))) - 1).cast("int"))
      case "random" =>
        // deterministic seeded tiebreak: xxhash64(seed, row-index) is a pure
        // function of the row, so the permutation is reproducible across
        // cluster configs/partition layouts — F.rand would re-draw per
        // evaluation order (same seed, different placement = different ranks)
        val rnd = fresh("rnd")
        joined.withColumn(rnd, F.xxhash64(F.lit(seed), F.col(IDX)))
          .withColumn(out, (F.col(out) +
            F.row_number().over(Window.partitionBy(F.col(v)).orderBy(F.col(rnd), F.col(IDX))) - 1).cast("int"))
          .drop(rnd)
      case _ => joined
    }
    resolved.drop(v)
  }

  /** `out` := SQL NTILE(buckets) over `value` order, distributed: one range
    * sort + a dense-index zip (single lineage, no join — the
    * zipWithDenseIndex machinery) gives the 0-based ordinal, a broadcast row
    * count feeds the first-(N mod k)-buckets-are-larger arithmetic. Tie
    * order within equal values is arbitrary, as in SQL NTILE — pass a
    * tiebreaking key inside `value` for determinism. ALL rows are bucketed,
    * null values included, and nulls sort LAST (the DuckDB/Postgres NTILE
    * default — the repo's oracle gate — so null rows land in the highest
    * buckets); the total is the full row count — not the non-null count,
    * which would misassign every bucket on a nullable column. */
  def withNtile(d0: DataFrame, value: Column, out: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"withNtile: buckets must be >= 1, got $buckets")
    val v = fresh("v"); val ord = fresh("o"); val nn = fresh("n")
    val sorted = org.apache.spark.sql.GraftInternalOps.zipWithDenseIndex(
      d0.withColumn(v, value).orderBy(F.col(v).asc_nulls_last), ord)
    val total = d0.agg(F.count(F.lit(1)).as(nn))
    val size = F.floor(F.col(nn) / buckets)
    val large = F.col(nn) % buckets
    val r0 = F.col(ord)
    val cut = large * (size + 1)
    sorted.crossJoin(F.broadcast(total))
      .withColumn(out,
        (F.when(r0 < cut, F.floor(r0 / (size + 1)))
          .otherwise(large + F.floor((r0 - cut) / size)) + 1).cast("int"))
      .drop(v, ord, nn)
  }

  /** `out` := percent rank of `value` over non-null values —
    * `(min_rank - 1) / (n - 1)`, 0.0 for a single value, null for nulls.
    * Backs qcut (reference expr.rb:2611). */
  def withPercentRank(d0: DataFrame, value: Column, out: String,
                      descending: Boolean = false): DataFrame = {
    val r = fresh("r"); val n = fresh("n")
    // count from the base frame: counting after the rank join would
    // re-execute the join for the scalar
    val total = d0.agg(F.count(value).as(n))
    val d1 = withRank(d0, value, r, "min", descending)
    d1.crossJoin(F.broadcast(total))
      .withColumn(out,
        F.when(F.col(r).isNull, F.lit(null))
          .when(F.col(n) > 1, (F.col(r) - 1).cast("double") / (F.col(n) - 1).cast("double"))
          .otherwise(F.lit(0.0)))
      .drop(r, n)
  }

  /** One ordering key of a vertical permutation: the value expression plus
    * its direction and null placement (polars defaults: ascending, nulls
    * first). */
  final case class OrderKey(value: Column, descending: Boolean = false,
                            nullsLast: Boolean = false) {
    def sortCol(c: Column): Column = (descending, nullsLast) match {
      case (false, false) => c.asc_nulls_first
      case (false, true)  => c.asc_nulls_last
      case (true, false)  => c.desc_nulls_first
      case (true, true)   => c.desc_nulls_last
    }
  }

  /** True when the permutation order is exactly "hidden row index,
    * descending" — the `reverse` op. Its mirror position is pure arithmetic
    * (cnt − pos + 1), so no second sort/ordering pass is ever needed. */
  private def isIdxReverse(order: Seq[OrderKey]): Boolean = order match {
    case Seq(OrderKey(c, true, false)) =>
      org.apache.spark.sql.GraftInternalOps.catalystExpression(c) match {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name == IDX
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          a.name == IDX
        case _ => false
      }
    case _ => false
  }

  /** Zip PROBE rows (carrying every original column at their current
    * position `rn`) with DONOR rows (carrying only the permuted value at
    * their target position `sp`) by hash-aggregating on (keys, position):
    * `first(_, ignoreNulls)` re-assembles each output row from its exactly
    * two contributions — the probe masks the value, the donor masks the
    * originals. Replaces the former positional self-join: ONE lineage, and
    * since the exploded stream keeps the windows' hash(keys) partitioning
    * the aggregation needs NO new exchange (grouping on a superset of the
    * partitioning keys). Aggregation state per (keys, pos) group is two
    * rows — constant, never group-sized. */
  private def posZip(dd: DataFrame, kns: Seq[String], rn: String, sp: String,
                     value: Column, out: String,
                     helpers: Seq[String]): DataFrame = {
    val v = fresh("v"); val e = fresh("e"); val pos = fresh("z")
    val keep = dd.columns.toSeq.filterNot(c =>
      helpers.contains(c) || kns.contains(c) || c == rn || c == sp)
    val exploded = dd.withColumn(v, value)
      .withColumn(e, F.explode(F.array(
        F.struct(F.col(rn).cast("long").as("p"), F.lit(false).as("d")),
        F.struct(F.col(sp).cast("long").as("p"), F.lit(true).as("d")))))
    val isDonor = F.col(e).getField("d")
    val aggs = keep.map(c =>
      F.first(F.when(!isDonor, F.col(c)), ignoreNulls = true).as(c)) :+
      F.first(F.when(isDonor, F.col(v)), ignoreNulls = true).as(out)
    exploded
      .groupBy((kns.map(F.col) :+ F.col(e).getField("p").as(pos)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .drop(pos)
  }

  /** `out` := the value drawn from the row at the SAME position in a
    * DIFFERENT ordering of the frame — the vertical permutation ops
    * (polars expr.sort / reverse / sort_by OUTSIDE agg contexts,
    * expr.rb:1310/1829/1427: each expr evaluates as an independent Series
    * and the projection re-zips by position). Both orderings get dense
    * 1-based positions — the current row order via the distributed
    * running-count scan, the permuted order via a pruned two-column sort +
    * dense zip (range-partitioned, never a single-partition window) — and
    * a 1:1 equi-join on position aligns them (broadcast below the
    * threshold, shuffled above — position is unique, so never skewed):
    * two narrow passes + one join, no group buffering. Ties break on the
    * hidden row index (polars sorts are stable). */
  def zipOrdered(d0: DataFrame, value: Column, out: String,
                 order: Seq[OrderKey]): DataFrame = {
    val pos = POS; val spos = fresh("q")
    val dp = if (d0.columns.contains(POS)) d0
             else running(d0, F.lit(1), POS, F.count, "sum")
    val oks = order.indices.map(i => fresh("o" + i))
    val side = d0.select(
      order.map(_.value).zip(oks).map { case (c, n) => c.as(n) } :+
        F.col(IDX).as(spos) :+ value.as(out): _*)
    val sortCols = order.zip(oks).map { case (k, n) => k.sortCol(F.col(n)) } :+
      F.col(spos).asc // stable tie-break on source order
    val sorted = side.orderBy(sortCols: _*).select(out)
    val indexed = org.apache.spark.sql.GraftInternalOps
      .zipWithDenseIndex(sorted, spos) // 0-based dense positions
    // POS stays on the frame (reserved name) so stacked permutation preps
    // in one projection reuse it; the frame layer drops it with BUCKET
    dp.join(indexed, F.col(pos) === F.col(spos) + 1, "left")
      .drop(spos)
  }

  /** Keyed [[zipOrdered]]: the permutation runs WITHIN each key group
    * (`sort().over(k)`, `reverse.over(k)`, keyed `sort_by`). ONE lineage:
    * both positions are windows over the same hash(keys) exchange — the
    * probe position orders by the hidden index, the donor position by the
    * permutation keys (`reverse` skips the second sort entirely: mirror
    * position is `count − rn + 1` over the same partitioning) — and
    * [[posZip]]'s exploded (keys, position) aggregation re-zips them with
    * NO join and no further exchange. Group size never enters any single
    * buffer. */
  def zipOrderedByKeys(d0: DataFrame, value: Column, out: String,
                       order: Seq[OrderKey], keys: Seq[Column]): DataFrame = {
    val kns = keys.indices.map(i => fresh("k" + i))
    val d = keys.zip(kns).foldLeft(d0) { case (acc, (k, n)) => acc.withColumn(n, k) }
    val rn = fresh("p"); val sp = fresh("q")
    val wI = Window.partitionBy(kns.map(F.col): _*).orderBy(F.col(IDX))
    val withRn = d.withColumn(rn, F.row_number().over(wI))
    val dd =
      if (isIdxReverse(order)) {
        val wK = Window.partitionBy(kns.map(F.col): _*)
        withRn.withColumn(sp, F.count(F.lit(1)).over(wK) - F.col(rn) + 1)
      } else {
        val oks = order.indices.map(i => fresh("o" + i))
        val dO = order.map(_.value).zip(oks)
          .foldLeft(withRn) { case (acc, (c, n)) => acc.withColumn(n, c) }
        val sortCols = order.zip(oks).map { case (k, n) => k.sortCol(F.col(n)) } :+
          F.col(IDX).asc
        val wV = Window.partitionBy(kns.map(F.col): _*).orderBy(sortCols: _*)
        dO.withColumn(sp, F.row_number().over(wV)).drop(oks: _*)
      }
    posZip(dd, kns, rn, sp, value, out, helpers = Nil).drop(kns: _*)
  }
}
