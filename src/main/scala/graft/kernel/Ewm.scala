package graft.kernel

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Exponentially-weighted moving aggregates (reference: lib/polars/expr.rb:
  * 6381-6444 `ewm_mean/ewm_std/ewm_var`, alpha prep expr.rb:7169; native
  * ext/polars/src/expr/general.rs:757).
  *
  * The recursion y_i = f(y_{i-1}, x_i) is inherently sequential, so this is
  * one of the few places where `mapPartitions` beats any declarative
  * formulation (SURVEY §7: custom work list). Scale shape: repartition by the
  * group keys, sort within partitions by (keys, order), then stream each
  * partition once with O(1) state per group — no per-group collect.
  *
  * The KEYLESS form is a global sequential recurrence, but a first-order
  * linear recurrence is associative under affine-map composition: each state
  * register evolves as s_i = β·s_{i-1} + b_i (β² for the Σw² register), so a
  * partition holding m non-null values transforms any incoming state as
  * s_out = β^m·s_in + local, where `local` is the partition's own recurrence
  * run from zero. That gives the same two-pass shape as [[Scan.running]]:
  *
  *   1. range-sort on the order column, persist the partitioned rows (both
  *      passes MUST see identical range-partition bounds — re-executing the
  *      sort could sample different bounds);
  *   2. pass 1 streams each partition once and emits ONE summary row
  *      (m, final local registers) — scalar-only driver traffic, like the
  *      dedup components' convergence counters;
  *   3. the driver prefix-composes the #partitions affine maps into per-
  *      partition seed states (bounded: #partitions × 4 doubles);
  *   4. pass 2 re-streams each partition seeded with its actual incoming
  *      state — the same per-row loop as the keyed path.
  *
  * Numerics: every term decays (β < 1), so the carry factor β^m underflows
  * gracefully to 0.0 for huge partitions — the mathematically correct limit
  * (state from >~350k rows ago contributes nothing at double precision);
  * nothing overflows, so no log-space composition is needed. adjust=false has
  * an init special case (the first value enters with weight 1, not α), so
  * pass 1 tracks two locals: the actual rule from scratch (used when no
  * non-null precedes the partition) and the linear continuation rule (used
  * otherwise; its wSum register uses the β·s+α form, not the =1 shortcut,
  * because only the linear form composes).
  *
  * The keyless path runs one Spark job eagerly at build time (the summary
  * collect); the persisted RDD is released by the ContextCleaner once the
  * result's lineage is unreachable.
  */
object Ewm {

  /** Translate the reference's com/span/half_life parameterizations to alpha
    * (reference: lib/polars/expr.rb:7169 `_prepare_alpha`). */
  def alphaFrom(com: Option[Double] = None, span: Option[Double] = None,
                halfLife: Option[Double] = None, alpha: Option[Double] = None): Double =
    (com, span, halfLife, alpha) match {
      case (Some(c), None, None, None) => 1.0 / (1.0 + c)
      case (None, Some(sp), None, None) => 2.0 / (sp + 1.0)
      case (None, None, Some(h), None) => 1.0 - math.exp(-math.log(2.0) / h)
      case (None, None, None, Some(a)) => a
      case _ => throw new IllegalArgumentException("specify exactly one of com/span/half_life/alpha")
    }

  /** Append `<valueCol>_ewm_mean` (and optionally `_ewm_var`/`_ewm_std`)
    * computed per `by`-group in `orderCol` order.
    *
    * adjust=true:  y_i = Σ w_j x_j / Σ w_j with w_j=(1-α)^(i-j)  (polars default)
    * adjust=false: y_i = (1-α) y_{i-1} + α x_i
    * Variance uses the same weighting with bias=false correction like polars.
    */
  def ewm(df: DataFrame, valueCol: String, orderCol: String,
          by: Seq[String] = Nil, alpha: Double = 0.5, adjust: Boolean = true,
          minPeriods: Int = 1, outputs: Seq[String] = Seq("mean"),
          ignoreNulls: Boolean = true): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    if (by.isEmpty) {
      // adjust=false + ignore_nulls=false renormalizes after EVERY
      // observation (the old_wt reset), so the simple 4-register affine
      // carry does not apply — it gets the dedicated quadratic-map
      // composition below instead.
      return if (!adjust && !ignoreNulls)
        ewmKeylessRenorm(df, valueCol, orderCol, alpha, minPeriods, outputs)
      else ewmKeyless(df, valueCol, orderCol, alpha, adjust, minPeriods, outputs, ignoreNulls)
    }
    val spark = df.sparkSession
    val partitioned = df.repartition(by.map(F.col): _*)
      .sortWithinPartitions((by.map(F.col) :+ F.col(orderCol)): _*)

    val schema = outSchema(df.schema, valueCol, outputs)
    val vIdx = df.schema.fieldIndex(valueCol)
    val byIdx = by.map(df.schema.fieldIndex)
    val a = alpha; val adj = adjust; val mp = minPeriods; val outs0 = outputs
    val ign = ignoreNulls

    val rdd = partitioned.rdd.mapPartitions { it =>
      // running state, reset on group-key change
      var key: Seq[Any] = null
      val st = new EwmState(a, adj, ign)
      it.map { row =>
        val k = byIdx.map(row.get)
        if (key == null || k != key) { key = k; st.reset() }
        Row.fromSeq(row.toSeq ++ st.step(numOf(row.get(vIdx)), mp, outs0))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Keyless global EWM, distributed via affine-carry composition (see the
    * object doc). Values match the single-partition recurrence to FP
    * re-association (~1 ulp per partition boundary). */
  private def ewmKeyless(df: DataFrame, valueCol: String, orderCol: String,
                         alpha: Double, adjust: Boolean, minPeriods: Int,
                         outputs: Seq[String], ignoreNulls: Boolean): DataFrame = {
    val spark = df.sparkSession
    val schema = outSchema(df.schema, valueCol, outputs)
    val vIdx = df.schema.fieldIndex(valueCol)
    val beta = 1.0 - alpha
    val a = alpha; val adj = adjust; val mp = minPeriods; val outs0 = outputs
    val ign = ignoreNulls

    val rdd0 = df.orderBy(F.col(orderCol)).rdd
    persistBounded(rdd0)
    val nParts = rdd0.getNumPartitions

    // pass 1: one (m, d, fresh-final, continuation-final) summary per
    // partition — m = non-null count (min_periods seeding), d = DECAY count
    // (equal to m with ignore_nulls; every row including nulls without)
    val partials = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var m = 0L; var d = 0L
      val fresh = new EwmState(a, adj, ign)
      var cwSum, cwx, cwx2, cw2 = 0.0 // linear continuation rule from zero
      it.foreach { row =>
        val x = numOf(row.get(vIdx))
        if (!x.isNaN) {
          fresh.update(x)
          if (adj) {
            cwSum = beta * cwSum + 1.0; cwx = beta * cwx + x
            cwx2 = beta * cwx2 + x * x; cw2 = beta * beta * cw2 + 1.0
          } else {
            cwSum = beta * cwSum + a; cwx = beta * cwx + a * x
            cwx2 = beta * cwx2 + a * x * x; cw2 = beta * beta * cw2 + a * a
          }
          m += 1; d += 1
        } else if (!ign) {
          fresh.decay()
          cwSum *= beta; cwx *= beta; cwx2 *= beta; cw2 *= beta * beta
          d += 1
        }
      }
      Iterator.single((pid, m, d,
        Array(fresh.wSum, fresh.wx, fresh.wx2, fresh.w2Sum),
        Array(cwSum, cwx, cwx2, cw2)))
    }.collect()

    // driver prefix-compose: seed(pid) = (non-null count before pid, state)
    val seeds = new Array[(Long, Array[Double])](math.max(nParts, 1))
    var n = 0L
    var s: Array[Double] = null
    partials.sortBy(_._1).foreach { case (pid, m, d, freshF, contF) =>
      seeds(pid) = (n, s)
      if (n == 0) {
        // no non-null seen yet: the from-scratch rule applies (adjust=false
        // init weight 1); leading null-only partitions decay nothing
        if (m > 0) { s = freshF; n = m }
      } else if (d > 0) {
        val pb = math.pow(beta, d.toDouble)
        val pb2 = math.pow(beta * beta, d.toDouble)
        s = Array(pb * s(0) + contF(0), pb * s(1) + contF(1),
          pb * s(2) + contF(2), pb2 * s(3) + contF(3))
        n += m
      }
    }
    val bc = spark.sparkContext.broadcast(seeds)

    // pass 2: the ordinary sequential loop, seeded per partition
    val out = rdd0.mapPartitionsWithIndex { (pid, it) =>
      val (nPrior, seed) = bc.value(pid)
      val st = new EwmState(a, adj, ign)
      st.seed(nPrior, seed)
      it.map(row => Row.fromSeq(row.toSeq ++ st.step(numOf(row.get(vIdx)), mp, outs0)))
    }
    spark.createDataFrame(out, schema)
  }

  /** Keyless EWM for the renormalizing flag pair (adjust=false,
    * ignore_nulls=false — the pandas `old_wt` recursion). The state
    * (mean, cov, Σw, Σw², old_wt) is not a linear register recurrence, but
    * it still composes across partitions:
    *
    *   - old_wt depends only on the null mask: β^(nulls since last valid),
    *     resetting to 1 after every observation — so a partition's incoming
    *     old_wt is numerically known on the driver once each partition
    *     reports its (leading-null, trailing-null, valid-count) structure;
    *   - AFTER a partition's first valid observation old_wt is numeric
    *     inside that partition, so mean/Σw/Σw² evolve as affine maps of the
    *     post-first-observation state, and cov evolves as an affine map
    *     plus a QUADRATIC in the post-first-observation mean (the
    *     (oldMean − mean)² terms) — all with constant coefficients a single
    *     pass-1 stream can accumulate;
    *   - only the first valid observation mixes the symbolic incoming mean
    *     nonlinearly with old_wt, and the driver evaluates that one step
    *     exactly (same FP sequence as the sequential code) using the
    *     composed gap.
    *
    * Pass 1 emits one summary row per partition (structure + first value +
    * from-scratch final state + 10 map coefficients); the driver folds them
    * left-to-right into per-partition seed states; pass 2 re-streams each
    * partition through the ordinary sequential recursion from its seed.
    * Values match the single-partition recursion up to FP re-association
    * (~1 ulp per partition boundary), like the linear affine carry. */
  private def ewmKeylessRenorm(df: DataFrame, valueCol: String, orderCol: String,
                               alpha: Double, minPeriods: Int,
                               outputs: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val schema = outSchema(df.schema, valueCol, outputs)
    val vIdx = df.schema.fieldIndex(valueCol)
    val beta = 1.0 - alpha
    val a = alpha; val mp = minPeriods; val outs0 = outputs

    val rdd0 = df.orderBy(F.col(orderCol)).rdd
    persistBounded(rdd0)
    val nParts = rdd0.getNumPartitions

    val partials = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var rows = 0L; var m = 0L; var lead = 0L; var trail = 0L
      var x1 = 0.0
      val fresh = new EwmState(a, adjust = false, ignoreNulls = false)
      // maps of the end-of-partition state as functions of the state right
      // AFTER the partition's first valid observation (mean1, cov1, sw1, sw2_1)
      var pm = 1.0; var qm = 0.0                     // mean_out = pm·mean1 + qm
      var ac = 1.0; var r2, r1, r0 = 0.0             // cov_out = ac·cov1 + r2·mean1² + r1·mean1 + r0
      var pw = 1.0; var qw = 0.0                     // sw_out = pw·sw1 + qw
      var pw2 = 1.0; var qw2 = 0.0                   // sw2_out = pw2·sw2_1 + qw2
      var oldWt = 1.0                                // numeric once m > 0
      it.foreach { row =>
        val x = numOf(row.get(vIdx))
        fresh.step(x, 1, Nil)
        if (x.isNaN) {
          if (m == 0) lead += 1
          else {
            trail += 1
            pw *= beta; qw *= beta; pw2 *= beta * beta; qw2 *= beta * beta
            oldWt *= beta
          }
        } else {
          if (m > 0) {
            trail = 0
            oldWt *= beta
            val w = oldWt; val d1 = w + a
            val pm2 = w * pm / d1; val qm2 = (w * qm + a * x) / d1
            val dp = pm - pm2; val dq = qm - qm2      // oldMean − newMean
            val ep = -pm2; val eq = x - qm2           // x − newMean
            val s = w / d1; val t = a / d1
            ac *= s
            r2 = s * (r2 + dp * dp) + t * ep * ep
            r1 = s * (r1 + 2 * dp * dq) + t * 2 * ep * eq
            r0 = s * (r0 + dq * dq) + t * eq * eq
            pm = pm2; qm = qm2
            pw = beta * pw / d1; qw = (beta * qw + a) / d1
            pw2 = beta * beta * pw2 / (d1 * d1); qw2 = (beta * beta * qw2 + a * a) / (d1 * d1)
            oldWt = 1.0
          } else x1 = x
          m += 1
        }
        rows += 1
      }
      Iterator.single((pid, rows, m, lead, trail, x1, fresh.renormState,
        Array(pm, qm, ac, r2, r1, r0, pw, qw, pw2, qw2)))
    }.collect()

    // driver fold: seed(pid) = (valid count before pid, renorm state before pid)
    val seeds = new Array[(Long, Array[Double])](math.max(nParts, 1))
    var n = 0L
    var st: Array[Double] = null // mean, cov, sumWt, sumWt2, oldWt
    partials.sortBy(_._1).foreach { case (pid, rows, m, lead, trail, x1, freshSt, cf) =>
      seeds(pid) = (n, st)
      if (n == 0) {
        if (m > 0) { st = freshSt; n = m }
      } else if (m == 0) {
        val pb = math.pow(beta, rows.toDouble)
        st = Array(st(0), st(1), st(2) * pb,
          st(3) * math.pow(beta, 2.0 * rows), st(4) * pb)
      } else {
        // leading nulls decay, then the exact first-observation step
        val pl = math.pow(beta, lead.toDouble)
        var mean = st(0); var cov = st(1)
        var sw = st(2) * pl; var sw2 = st(3) * math.pow(beta, 2.0 * lead)
        var ow = st(4) * pl
        sw *= beta; sw2 *= beta * beta; ow *= beta
        val oldMean = mean
        if (mean != x1) mean = (ow * mean + a * x1) / (ow + a)
        cov = (ow * (cov + (oldMean - mean) * (oldMean - mean)) +
          a * (x1 - mean) * (x1 - mean)) / (ow + a)
        sw += a; sw2 += a * a; ow += a
        sw /= ow; sw2 /= ow * ow
        // rest of the partition via the accumulated maps
        val Array(pm, qm, ac, r2, r1, r0, pw, qw, pw2, qw2) = cf
        st = Array(pm * mean + qm,
          ac * cov + r2 * mean * mean + r1 * mean + r0,
          pw * sw + qw, pw2 * sw2 + qw2,
          math.pow(beta, trail.toDouble))
        n += m
      }
    }
    val bc = spark.sparkContext.broadcast(seeds)

    val out = rdd0.mapPartitionsWithIndex { (pid, it) =>
      val (nPrior, seed) = bc.value(pid)
      val st = new EwmState(a, adjust = false, ignoreNulls = false)
      st.seedRenorm(nPrior, seed)
      it.map(row => Row.fromSeq(row.toSeq ++ st.step(numOf(row.get(vIdx)), mp, outs0)))
    }
    spark.createDataFrame(out, schema)
  }

  /** Bounded registry of the persisted sorted RDDs: many keyless-ewm calls
    * in one session must not pin unbounded executor storage. Evicting an
    * entry unpersists it; if its result is materialized later, the two
    * passes still agree — the sort's shuffle files outlive the cache, so a
    * recompute replays the SAME partitioning from the same map outputs
    * (range bounds are sampled once per RDD lineage, not per execution). */
  private val persisted = new java.util.ArrayDeque[org.apache.spark.rdd.RDD[_]]()
  private def persistBounded(rdd: org.apache.spark.rdd.RDD[_]): Unit = synchronized {
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    persisted.addLast(rdd)
    while (persisted.size > 4) {
      try persisted.removeFirst().unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  private def outSchema(base: StructType, valueCol: String, outputs: Seq[String]): StructType =
    outputs.foldLeft(base)((sc, o) => sc.add(s"${valueCol}_ewm_$o", DoubleType, nullable = true))

  private def numOf(v: Any): Double = v match {
    case null => Double.NaN
    case n: Number => n.doubleValue()
  }

  /** The four EWM registers (Σw, Σw·x, Σw·x², Σw²) plus the non-null count,
    * with the polars update rules for both adjust modes. The adjust=false
    * update uses the LINEAR register form (β·s + α·b) rather than the
    * wSum=1 shortcut: both are identical on gap-free data (weights sum to
    * 1), but only the linear form composes under the null-decay of
    * ignore_nulls=false and the keyless affine carry.
    *
    * adjust=false + ignore_nulls=false is the one combination that is NOT a
    * linear recurrence: the observation step renormalizes the accumulated
    * weight back to 1 (so a later null-gap decays a unit weight, not the
    * full history), which is the pandas `old_wt` recursion
    * (ignore_na=False, adjust=False). It runs in the dedicated
    * mean/cov/sum_wt register set below — used sequentially by the keyed
    * mapPartitions path, and keylessly via [[ewmKeylessRenorm]]'s
    * quadratic-map composition (reference flag surface: expr.rb:6381-6444). */
  private final class EwmState(alpha: Double, adjust: Boolean,
                               ignoreNulls: Boolean = true) extends Serializable {
    private val beta = 1.0 - alpha
    private val renorm = !adjust && !ignoreNulls
    var wSum, wx, wx2, w2Sum = 0.0
    // renormalizing-recursion registers (renorm mode only)
    private var mean, cov, sumWt, sumWt2, oldWt = 0.0
    var n = 0L

    def reset(): Unit = {
      wSum = 0; wx = 0; wx2 = 0; w2Sum = 0; n = 0
      mean = 0; cov = 0; sumWt = 0; sumWt2 = 0; oldWt = 0
    }

    def seed(nPrior: Long, state: Array[Double]): Unit = {
      n = nPrior
      if (state != null) { wSum = state(0); wx = state(1); wx2 = state(2); w2Sum = state(3) }
    }

    /** Renorm-mode state vector (keyless composition). */
    def renormState: Array[Double] = Array(mean, cov, sumWt, sumWt2, oldWt)

    def seedRenorm(nPrior: Long, state: Array[Double]): Unit = {
      n = nPrior
      if (state != null) {
        mean = state(0); cov = state(1); sumWt = state(2)
        sumWt2 = state(3); oldWt = state(4)
      }
    }

    def update(x: Double): Unit = {
      if (adjust) {
        wSum = beta * wSum + 1.0; wx = beta * wx + x
        wx2 = beta * wx2 + x * x; w2Sum = beta * beta * w2Sum + 1.0
      } else if (n == 0) {
        wSum = 1.0; wx = x; wx2 = x * x; w2Sum = 1.0
      } else {
        wSum = beta * wSum + alpha
        wx = beta * wx + alpha * x
        wx2 = beta * wx2 + alpha * x * x
        w2Sum = beta * beta * w2Sum + alpha * alpha
      }
      n += 1
    }

    /** ignore_nulls=false: a null row decays every weight (absolute-position
      * weighting, pandas ignore_na=False) without adding a sample. */
    def decay(): Unit = {
      wSum *= beta; wx *= beta; wx2 *= beta; w2Sum *= beta * beta
    }

    /** One step of the renormalizing recursion (adjust=false,
      * ignore_nulls=false): a null decays the unit-normalized weight; an
      * observation folds in with weight α against the decayed old weight,
      * then renormalizes old_wt back to 1. Variance via the single-pass
      * weighted-covariance update (cov against itself), debiased with
      * Σw²/(Σw²−Σw²₂). Null inputs emit null (polars propagates null at
      * null positions; the state still decays). */
    private def stepRenorm(x: Double, minPeriods: Int, outputs: Seq[String]): Seq[Any] =
      if (x.isNaN) {
        if (n > 0) { sumWt *= beta; sumWt2 *= beta * beta; oldWt *= beta }
        outputs.map(_ => null)
      } else {
        if (n == 0) { mean = x; cov = 0.0; sumWt = 1.0; sumWt2 = 1.0; oldWt = 1.0 }
        else {
          sumWt *= beta; sumWt2 *= beta * beta; oldWt *= beta
          val newWt = alpha
          val oldMean = mean
          if (mean != x) mean = (oldWt * oldMean + newWt * x) / (oldWt + newWt)
          cov = (oldWt * (cov + (oldMean - mean) * (oldMean - mean)) +
            newWt * (x - mean) * (x - mean)) / (oldWt + newWt)
          sumWt += newWt; sumWt2 += newWt * newWt; oldWt += newWt
          sumWt /= oldWt; sumWt2 /= oldWt * oldWt; oldWt = 1.0
        }
        n += 1
        val num = sumWt * sumWt
        val den = num - sumWt2
        outputs.map {
          case "mean" => if (n >= minPeriods) mean else null
          case "var"  => if (n >= minPeriods && den > 0) (num / den) * cov else null
          case "std"  => if (n >= minPeriods && den > 0) math.sqrt((num / den) * cov) else null
        }
      }

    /** Advance on `x` (NaN/null: null out; state unchanged when nulls are
      * ignored, decayed otherwise) and emit the requested outputs. */
    def step(x: Double, minPeriods: Int, outputs: Seq[String]): Seq[Any] =
      if (renorm) stepRenorm(x, minPeriods, outputs)
      else if (x.isNaN) {
        if (!ignoreNulls && n > 0) decay()
        outputs.map(_ => null)
      } else {
        update(x)
        val mean = wx / wSum
        val varBiased = math.max(wx2 / wSum - mean * mean, 0.0)
        val denom = 1.0 - w2Sum / (wSum * wSum)
        val varUnbiased = if (denom > 0) varBiased / denom else Double.NaN
        outputs.map {
          case "mean" => if (n >= minPeriods) mean else null
          case "var" => if (n >= minPeriods && n > 1 && !varUnbiased.isNaN) varUnbiased else null
          case "std" => if (n >= minPeriods && n > 1 && !varUnbiased.isNaN) math.sqrt(varUnbiased) else null
        }
      }
  }
}
