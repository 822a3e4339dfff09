package graft.expr

import org.apache.spark.sql.{Column, functions => F, DataFrame => SDF}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.types.DataType
import graft.kernel.Scan

/** A frame preparation an expression needs before it can resolve: `build`
  * adds helper column(s) (a broadcast scalar, a distributed prefix-scan
  * result, a rank join) that the expression's Column references; `drops` are
  * cleaned up by the frame layer afterwards. `key` dedupes shared preps
  * within one resolution batch. */
final case class Prep(key: String, build: SDF => SDF, drops: Seq[String])

/** How an order-dependent op re-spells itself when `.over(keys)` is applied:
  * polars' `cum_sum.over(k)` / `shift(1).over(k)` / `rank.over(k)` mean the
  * PER-KEY op in row order, which on Spark is a plain keyed window — one
  * shuffle on the keys, no scan kernel needed. `mk` receives the partition
  * keys and returns the keyed expression (built in the op's own scope, so
  * inherited preps of the INPUT expression survive while the op's global
  * scan prep is dropped). */
final case class KeyedForm(mk: Seq[Column] => Expr)

/** An AGGREGATE applied to an order-dependent op (shift(1).sum,
  * cum_sum().max, forward_fill.implode): inside group_by().agg the polars
  * semantics is "evaluate the op per group, then aggregate per group" — a
  * scalar per group. `keyed` re-spells the inner op per key; `agg` is the
  * bare outer aggregate; `post` carries elementwise transforms applied
  * AFTER the aggregate (alias, * constant, cast). Keeping them separate
  * lets over(keys) window the bare aggregate — a WindowExpression's child
  * must be an AggregateFunction, so `sum(x) * 2 over w` must be spelled
  * `(sum(x) over w) * 2`. */
final case class GroupAggForm(keyed: KeyedForm, agg: Column => Column,
                              post: Column => Column = identity,
                              orderSensitive: Boolean = false) {
  /** The full per-group column: post-transforms over the aggregate. */
  def full(c: Column): Column = post(agg(c))
  // orderSensitive: the agg half iterates rows (collect_list-style) and its
  // result depends on row order — GroupBy.agg must feed it groups whole and
  // sorted (repartition by keys + sortWithinPartitions on the row index),
  // exactly like the implicit-implode branch. Pure commutative aggregates
  // (sum, rank-selected quantiles) leave it false and keep the pruned scan.
}

/** Composable column expression — the Spark-native counterpart of the
  * reference's `Polars::Expr` (reference: lib/polars/expr.rb:28-7215).
  *
  * Wraps a Catalyst [[org.apache.spark.sql.Column]]; every method builds a new
  * declarative Column so Catalyst/Tungsten keep whole-stage codegen and
  * pushdown. Order-dependent ops (shift/cum/rolling/rank without an explicit
  * `over`) reference the hidden row-index column maintained by the frame layer
  * (see [[graft.kernel.RowIndex]]); `requiresIndex` tells the frame to attach
  * it before resolving, and `preps` carry the distributed prefix-scan /
  * scalar-broadcast stages ([[graft.kernel.Scan]]) the frame applies first —
  * so no order-dependent op ever plans a single-partition window over data.
  */
final case class Expr(col: Column, requiresIndex: Boolean = false,
                      preps: Seq[Prep] = Nil,
                      keyed: Option[KeyedForm] = None,
                      groupAgg: Option[GroupAggForm] = None) {
  import Expr._

  /** Elementwise transforms commute with per-key evaluation, so `map` and
    * `zip` carry the keyed form through: polars' `cum_sum.alias(..).over(k)`
    * or `(col - col.shift(1)).over(k)` evaluate the order-dependent op per
    * key and apply the elementwise function on top. A side that is neither
    * keyed nor prep-free blocks propagation (over() then raises the
    * directed error instead of silently mixing scopes). */
  private def map(f: Column => Column): Expr = mapElementwise(f)
  /** The elementwise-transform rule, shared with the namespace helpers
    * (package-private so .str/.dt/... propagate identically). */
  private[expr] def mapElementwise(f: Column => Column): Expr =
    Expr(f(col), requiresIndex, preps,
      keyed.map(k => KeyedForm { keys =>
        val e = k.mk(keys); Expr(f(e.col), e.requiresIndex, e.preps)
      }),
      // an elementwise transform AFTER an aggregate-of-scanned (alias, +1,
      // cast) composes into the post half, leaving the bare aggregate
      // windowable by over(keys)
      groupAgg.map(g => g.copy(post = g.post.andThen(f))))
  /** Aggregate applied to this expression: never elementwise, so the keyed
    * form must NOT ride through (sum of a per-key cum_sum is not a per-key
    * window); instead a scanned input records a [[GroupAggForm]] so
    * group_by().agg can evaluate op-then-aggregate per group. */
  private def aggMap(f: Column => Column): Expr =
    Expr(f(col), requiresIndex, preps, None, keyed.map(k => GroupAggForm(k, f)))
  private def zip(o: Expr)(f: (Column, Column) => Column): Expr = {
    val kf: Option[KeyedForm] =
      if (keyed.isEmpty && o.keyed.isEmpty) None
      else if (!keyedOrPlain(this) || !keyedOrPlain(o)) None
      else Some(KeyedForm { keys =>
        val a = keyedSide(this, keys); val b = keyedSide(o, keys)
        Expr(f(a.col, b.col), a.requiresIndex || b.requiresIndex,
          mergePreps(a.preps, b.preps))
      })
    // combining an aggregate-of-scanned with a CONSTANT stays elementwise on
    // the aggregate result (shift(1).sum * 2); any non-constant operand has
    // its own per-group story and blocks composition. The constant's alias
    // is stripped — polars names arithmetic after the non-literal operand.
    val ga: Option[GroupAggForm] = (groupAgg, o.groupAgg) match {
      case (Some(g), None) if Expr.isConstant(o) =>
        val oc = org.apache.spark.sql.GraftInternalOps.stripAlias(o.col)
        Some(g.copy(post = g.post.andThen(c => f(c, oc))))
      case (None, Some(g)) if Expr.isConstant(this) =>
        val tc = org.apache.spark.sql.GraftInternalOps.stripAlias(col)
        Some(g.copy(post = g.post.andThen(c => f(tc, c))))
      case _ => None
    }
    Expr(f(col, o.col), requiresIndex || o.requiresIndex, mergePreps(preps, o.preps), kf, ga)
  }
  /** Input spelling inside an op's KeyedForm. A scan-free input passes
    * through. An input that is ITSELF order-dependent (scan preps) chains
    * through its own keyed form: the inner per-key spelling is materialized
    * as a helper column by a prep (windows cannot nest), and the outer op
    * windows over the helper — so `shift(1).cum_sum().over(k)` evaluates
    * the WHOLE chain per key, polars' semantics. Chains recurse naturally
    * (a 3-deep chain materializes two helpers); every level partitions by
    * the same keys and orders by the hidden index, so Spark plans ONE
    * shuffle + sort reused across the stacked Window nodes. An
    * order-dependent input with no per-key spelling still raises the
    * directed error (keying only the outer op would evaluate the inner one
    * globally — silently wrong). */
  private def keyedInput(op: String, keys: Seq[Column]): Expr =
    if (preps.isEmpty) Expr(col, requiresIndex)
    else keyed match {
      case Some(k) =>
        val inner = k.mk(keys)
        val helper = Scan.fresh("x")
        Expr(F.col(helper), requiresIndex = true,
          inner.preps :+ Prep(helper, d => d.withColumn(helper, inner.col), Seq(helper)))
      case None => throw new UnsupportedOperationException(
        s"$op.over(keys): the input expression itself contains order-dependent ops " +
          "with no per-key spelling; a per-key form of only the outer op would " +
          "evaluate the inner one globally. Materialize the inner op per key first " +
          "(with_column(\"t\" -> inner.over(keys))) and chain on the new column")
    }
  /** Union this expr's preps with each operand's (order-preserving, deduped) —
    * every combinator must thread preps so a scanned op (shift/cum/fill/rank)
    * composed through it still builds its helper column. */
  private def mergedWith(os: Expr*): Seq[Prep] =
    os.foldLeft(preps)((acc, e) => mergePreps(acc, e.preps))

  private def keyedOrPlain(e: Expr): Boolean = e.keyed.isDefined || e.preps.isEmpty
  private def keyedSide(e: Expr, keys: Seq[Column]): Expr =
    e.keyed.map(_.mk(keys)).getOrElse {
      // a plain operand may still be an AGGREGATE (w.sum reached through a
      // keyed zip): polars broadcasts it per key — spell as a keyed window
      // (or raise the directed error for unwindowable aggregate structure)
      org.apache.spark.sql.GraftInternalOps.perKeyBroadcastSpelling(e.col, keys)
        .map(c => Expr(c, e.requiresIndex))
        .getOrElse(Expr(e.col, e.requiresIndex))
    }

  /** Order-dependent op: the result is a helper column produced by a
    * [[graft.kernel.Scan]] stage over the hidden row index. */
  private def scanned(build: (SDF, String) => SDF): Expr = {
    val out = Scan.fresh("x")
    // carry the SOURCE column's polars output name: the scan result column
    // is a reserved helper, and without the alias a bare select(col.shift(1))
    // would materialize (and then have withIdx drop) the helper name
    val named = meta.outputName.fold(F.col(out))(n => F.col(out).as(n))
    Expr(named, requiresIndex = true,
      preps :+ Prep(out, d => build(d, out), Seq(out, Scan.BUCKET)))
  }

  /** Whole-column scalar aggregate, broadcast-cross-joined (never a
    * single-partition `Window.partitionBy()`). */
  private def withScalar(agg: Column => Column)(f: (Column, Column) => Column): Expr = {
    val s = Scan.fresh("s")
    Expr(f(col, F.col(s)), requiresIndex,
      preps :+ Prep(s, d => d.crossJoin(F.broadcast(d.agg(agg(col).as(s)))), Seq(s)))
  }

  // ---- naming (reference: expr.rb:324,407-449; name_expr.rb) ----
  /** Re-alias collapses any existing top-level alias (polars: the outer
    * name wins) — stacked Alias nodes also break ExtractGenerator, whose
    * generator-in-projection rewrite only sees one Alias deep
    * (select(col.unique) would otherwise plan an Aggregate[explode]). */
  def alias(name: String): Expr =
    map(c => org.apache.spark.sql.GraftInternalOps.stripAlias(c).as(name))
  def as(name: String): Expr = alias(name)

  // ---- arithmetic (reference: expr.rb:28-134) ----
  def unary_- : Expr = map(c => -c)
  /** polars `+` is type-directed — Utf8 + Utf8 concatenates, numerics add.
    * The dispatch can't happen here (the Expr surface is untyped until the
    * frame binds it), so it's deferred to analysis via
    * [[graft.ext.PlusOrConcat]]; graft durations are i64 µs ticks
    * (SURVEY §1.2), so no temporal type ever reaches this `+` (datetime
    * arithmetic is `dt.addDuration` / `dt.offsetBy`). */
  def +(o: Expr): Expr = zip(o) { (a, b) =>
    val G = org.apache.spark.sql.GraftInternalOps
    G.column(graft.ext.PlusOrConcat(G.catalystExpression(a), G.catalystExpression(b)))
  }
  def -(o: Expr): Expr = zip(o)(_ - _)
  def *(o: Expr): Expr = zip(o)(_ * _)
  /** polars float division is IEEE: 1/0 = inf, -1/0 = -inf, 0/0 = NaN,
    * NaN/0 = NaN, 1/-0.0 = -inf (expr.rb truediv golden) — Spark 4's ANSI
    * mode instead RAISES on a zero divisor. The guard keeps the non-zero
    * path on Spark's native Divide (exact rounding, native dtype); the
    * zero-divisor case routes through `a * pow(b, -1)`, which is IEEE for
    * EVERY edge in one expression: pow(+0,-1)=+inf, pow(-0.0,-1)=-inf
    * (Java Math.pow — comparisons can't see the zero's sign, the power
    * can), a=0 → 0*inf=NaN, a=NaN → NaN, null a or b → null. A null
    * divisor also lands in the otherwise branch (null =!= 0 is null) and
    * comes out null via pow(null)=null. Mixing the double-typed pow branch
    * coerces decimal divisions to double — documented divergence
    * (COVERAGE.md), same as the pre-r15 spelling. */
  def /(o: Expr): Expr = zip(o) { (a, b) =>
    F.when(b =!= 0, a / b).otherwise(a * F.pow(b, F.lit(-1.0)))
  }
  def %(o: Expr): Expr = zip(o)(_ % _)
  def floorDiv(o: Expr): Expr = zip(o)((a, b) => F.floor(a / b))
  def pow(o: Expr): Expr = zip(o)(F.pow)
  def +(v: Any): Expr = this + Expr.lit(v)
  def -(v: Any): Expr = this - Expr.lit(v)
  def *(v: Any): Expr = this * Expr.lit(v)
  def /(v: Any): Expr = this / Expr.lit(v)
  def %(v: Any): Expr = this % Expr.lit(v)
  def pow(v: Double): Expr = pow(Expr.lit(v))
  /** Integer exponent keeps the input dtype (polars: i64 ** 2 → i64,
    * f64 ** 2 → f64; Spark's `power` always widens to double). Spelled as
    * repeated multiplication — dtype-preserving, null-propagating, and
    * codegen-friendly for the small literal exponents this is used with.
    * Negative exponents fall back to double `pow` (polars raises there for
    * ints; callers on floats get the usual IEEE result). */
  def pow(v: Int): Expr =
    if (v == 0) map(c => c * F.lit(0) + F.lit(1))
    else if (v > 0) map(c => Seq.fill(v)(c).reduce(_ * _))
    else pow(v.toDouble)
  // aggregate zip: the elementwise keyed propagation does not apply (the
  // per-key form of an aggregate needs a window, which zip does not add)
  def dot(o: Expr): Expr = zip(o)((a, b) => F.sum(a * b)).copy(keyed = None)

  // ---- comparisons (reference: expr.rb:3069-3179) ----
  def ===(o: Expr): Expr = zip(o)(_ === _)
  def !==(o: Expr): Expr = zip(o)(_ =!= _)
  def >(o: Expr): Expr = zip(o)(_ > _)
  def >=(o: Expr): Expr = zip(o)(_ >= _)
  def <(o: Expr): Expr = zip(o)(_ < _)
  def <=(o: Expr): Expr = zip(o)(_ <= _)
  def ===(v: Any): Expr = this === Expr.lit(v)
  def !==(v: Any): Expr = this !== Expr.lit(v)
  def >(v: Any): Expr = this > Expr.lit(v)
  def >=(v: Any): Expr = this >= Expr.lit(v)
  def <(v: Any): Expr = this < Expr.lit(v)
  def <=(v: Any): Expr = this <= Expr.lit(v)
  /** Null-safe equality (reference `eq_missing`, expr.rb:3273) */
  def eqMissing(o: Expr): Expr = zip(o)(_ <=> _)
  def neMissing(o: Expr): Expr = zip(o)((a, b) => !(a <=> b))

  // ---- boolean (reference: expr.rb:88-134) ----
  def &&(o: Expr): Expr = zip(o)(_ && _)
  def ||(o: Expr): Expr = zip(o)(_ || _)
  def unary_! : Expr = map(!_)
  def not: Expr = map(!_)
  def xor(o: Expr): Expr = zip(o)((a, b) => (a && !b) || (!a && b))

  // ---- null / nan surface (reference: expr.rb:519-693,1721-1822) ----
  def isNull: Expr = map(_.isNull)
  def isNotNull: Expr = map(_.isNotNull)
  def isNan: Expr = map(F.isnan)
  def isNotNan: Expr = map(c => !F.isnan(c))
  def isFinite: Expr = map(c => !F.isnan(c) && c =!= Double.PositiveInfinity && c =!= Double.NegativeInfinity)
  def isInfinite: Expr = map(c => c === Double.PositiveInfinity || c === Double.NegativeInfinity)
  def fillNull(v: Expr): Expr = zip(v)((c, x) => F.coalesce(c, x))
  def fillNull(v: Any): Expr = fillNull(Expr.lit(v))
  /** fill_null(strategy:) (reference expr.rb:1721): forward/backward use the
    * row-order discipline; min/max/mean are scalar aggregates broadcast via
    * a 1-row cross join (no single-partition window). */
  def fillNullStrategy(strategy: String): Expr = strategy match {
    case "forward"  => forwardFill
    case "backward" => backwardFill
    case "zero"     => fillNull(0)
    case "one"      => fillNull(1)
    case "min"      => withScalar(F.min)(F.coalesce(_, _))
    case "max"      => withScalar(F.max)(F.coalesce(_, _))
    case "mean"     => withScalar(F.avg)(F.coalesce(_, _))
  }
  def fillNan(v: Expr): Expr = zip(v)((c, x) => F.when(F.isnan(c), x).otherwise(c))
  def fillNan(v: Any): Expr = fillNan(Expr.lit(v))

  // ---- casts (reference: expr.rb:1234) ----
  def cast(dt: DataType, strict: Boolean = true): Expr =
    map(c => if (strict) c.cast(dt) else c.try_cast(dt))
  /** Bit-reinterpret Int64 <-> UInt64 (reference expr.rb:3808). Spark has no
    * unsigned types; per the SURVEY §1.2 physical mapping u64 is carried in a
    * signed long, so both directions are the identity on the physical bits. */
  def reinterpret(signed: Boolean = true): Expr = this

  // ---- math (reference: expr.rb:245-289,1088-1139,5594-6229) ----
  def abs: Expr = map(F.abs)
  def sqrt: Expr = map(F.sqrt)
  def cbrt: Expr = map(F.cbrt)
  def exp: Expr = map(F.exp)
  def log: Expr = map(F.log)
  def log(base: Double): Expr = map(c => F.log(base, c))
  def log10: Expr = map(F.log10)
  def log1p: Expr = map(F.log1p)
  def floor: Expr = map(c => F.floor(c).cast("double"))
  // polars floor/ceil preserve the float dtype; Spark's return LONG
  def ceil: Expr = map(c => F.ceil(c).cast("double"))
  def round(decimals: Int = 0): Expr = map(c => F.round(c, decimals))
  // polars sign returns Int64 for every numeric input (series.rb:2602
  // golden: f64 input renders [i64]); Spark's signum is double
  def sign: Expr = map(c => F.signum(c).cast("long"))
  def sin: Expr = map(F.sin)
  def cos: Expr = map(F.cos)
  def tan: Expr = map(F.tan)
  def asin: Expr = map(F.asin)
  def acos: Expr = map(F.acos)
  def atan: Expr = map(F.atan)
  def sinh: Expr = map(F.sinh)
  def cosh: Expr = map(F.cosh)
  def tanh: Expr = map(F.tanh)
  def asinh: Expr = map(F.asinh)
  def acosh: Expr = map(F.acosh)
  def atanh: Expr = map(F.atanh)
  def degrees: Expr = map(F.degrees)
  def radians: Expr = map(F.radians)
  def cot: Expr = map(F.cot)
  // greatest/least skip nulls (Spark returns the non-null arg), but polars
  // clip preserves null inputs — guard explicitly
  def clip(lo: Expr, hi: Expr): Expr =
    Expr(F.when(col.isNotNull, F.least(F.greatest(col, lo.col), hi.col)),
      requiresIndex || lo.requiresIndex || hi.requiresIndex, mergedWith(lo, hi))
  def clip(lo: Any, hi: Any): Expr = clip(Expr.lit(lo), Expr.lit(hi))
  def clipMin(lo: Any): Expr = map(c => F.when(c.isNotNull, F.greatest(c, Expr.lit(lo).col)))
  def clipMax(hi: Any): Expr = map(c => F.when(c.isNotNull, F.least(c, Expr.lit(hi).col)))

  // ---- membership / ranges (reference: expr.rb:3612,3727) ----
  def isIn(values: Seq[Any]): Expr = map(_.isin(values: _*))
  def isIn(other: Expr): Expr = zip(other)((c, arr) => F.array_contains(arr, c))
  def isBetween(loAny: Any, hiAny: Any, closed: String = "both"): Expr = {
    val (lo, hi) = (Expr.lit(loAny), Expr.lit(hiAny))
    val (l, h) = (lo.col, hi.col)
    val c = closed match {
      case "both"  => col >= l && col <= h
      case "left"  => col >= l && col < h
      case "right" => col > l && col <= h
      case "none"  => col > l && col < h
    }
    Expr(c, requiresIndex || lo.requiresIndex || hi.requiresIndex, mergedWith(lo, hi))
  }

  // ---- aggregations (reference: expr.rb:1852-2215,721-741) ----
  /** polars sum of an empty / all-null group is 0, not null (expr.rb:2713
    * filter golden: the group whose filtered slice is empty sums to 0).
    * The 0 literal coerces to the sum's own result type at analysis. */
  // booleans numericize under sum/mean (vertical.rb:20 golden: all.sum over
  // bool counts trues; mean is the fraction true) — BoolToInt is a lazy
  // type-directed pass-through, identity on every non-boolean dtype
  def sum: Expr = aggMap(c => F.coalesce(F.sum(Expr.boolAsInt(c)), F.lit(0)))
  def mean: Expr = aggMap(c => F.avg(Expr.boolAsInt(c)))
  def median: Expr = aggMap(c => F.median(c))
  /** Plain extrema IGNORE NaN (reference expr.rb:1895-1935 goldens: max of
    * [-1.0, NaN, 1.0] is 1.0, not NaN) — Spark orders NaN above every double,
    * so the input is routed through [[graft.ext.NanToNull]], a typed
    * pass-through that nulls NaN on float/double and is identity on every
    * other dtype (resolved at analysis, codegen-friendly). The
    * NaN-PROPAGATING forms are nanMax/nanMin below. */
  // NaN is skipped only while non-NaN values exist (polars extrema): the
  // NaN-propagating fallback makes an all-NaN float column yield NaN, not
  // null (advisor r12; for all-null input both legs are null → null stands)
  def min: Expr = aggMap(c => F.coalesce(F.min(Expr.nanSkipped(c)), F.min(c)))
  def max: Expr = aggMap(c => F.coalesce(F.max(Expr.nanSkipped(c)), F.max(c)))
  def count: Expr = aggMap(F.count)
  // polars len counts rows INCLUDING nulls (expr.rb:741 golden: len of
  // [nil,4,4] is 3 where count is 2) — count(*) not count(col)
  def len: Expr = aggMap(_ => F.count(F.lit(1)))
  def nullCount: Expr = aggMap(c => F.count(F.when(c.isNull, 1)))
  def first: Expr = aggMap(c => F.first(c))
  def last: Expr = aggMap(c => F.last(c))
  // exact partial+final agg; handles zeros/negatives; int input stays i64
  // and empty groups yield 1 (polars) via the typed GraftProduct aggregate
  def product: Expr = aggMap(Expr.productAgg)
  /** polars n_unique counts NULL as a distinct value (guide_test.rb:56
    * semantics, fuzz model): count-distinct plus one when any null exists.
    * The composite stays a legal aggregate composition (two aggregate
    * functions under arithmetic), windowable via windowCompositeAggregates. */
  def nUnique: Expr = aggMap(c => F.countDistinct(c) +
    F.when(F.count(F.lit(1)) - F.count(c) > 0, F.lit(1L)).otherwise(F.lit(0L)))
  /** any / all — boolean-column aggregates (reference: expr.rb:198,223).
    * drop_nulls=true (default) ignores nulls; empty/all-null → false / true.
    * drop_nulls=false applies Kleene logic: any = null when no true but a
    * null is present; all = null when no false but a null is present. */
  def any(dropNulls: Boolean = true): Expr = aggMap { c =>
    val anyTrue = F.coalesce(F.bool_or(c), F.lit(false))
    if (dropNulls) anyTrue
    else F.when(anyTrue, F.lit(true))
      .when(F.count(F.lit(1)) > F.count(c), F.lit(null).cast("boolean"))
      .otherwise(F.lit(false))
  }
  def all(dropNulls: Boolean = true): Expr = aggMap { c =>
    val allTrue = F.coalesce(F.bool_and(c), F.lit(true))
    if (dropNulls) allTrue
    else F.when(!allTrue, F.lit(false))
      .when(F.count(F.lit(1)) > F.count(c), F.lit(null).cast("boolean"))
      .otherwise(F.lit(true))
  }
  def approxNUnique: Expr = aggMap(c => F.approx_count_distinct(c))
  /** NaN-propagating extrema (reference expr.rb:2263 nan_max/nan_min): any
    * NaN in the group makes the result NaN. Spark already orders NaN above
    * every double, so max propagates; min needs the explicit check. */
  def nanMax: Expr = aggMap(F.max)
  def nanMin: Expr = aggMap(c =>
    F.when(F.count(F.when(F.isnan(c), 1)) > 0, Double.NaN).otherwise(F.min(c)))
  /** sort_by in aggregation context (reference expr.rb:1427): this column's
    * group values ordered by the key column(s) — the agg shape behind
    * `col("a").sort_by("b").first`. Struct-wrap keeps nulls and gives
    * lexicographic multi-key order. */
  def sortByAgg(by: Expr, descending: Boolean = false): Expr = {
    val sorted = F.array_sort(F.collect_list(F.struct(by.col.as("k"), col.as("v"))))
    val values = F.transform(sorted, s => s.getField("v"))
    Expr(if (descending) F.reverse(values) else values,
      requiresIndex || by.requiresIndex, mergedWith(by))
  }
  def std(ddof: Int = 1): Expr = aggMap(c => ddofScale(F.stddev_samp(c), F.count(c), ddof, isStd = true))
  def variance(ddof: Int = 1): Expr = aggMap(c => ddofScale(F.var_samp(c), F.count(c), ddof, isStd = false))
  /** Exact quantile, all five Polars interpolation modes (reference:
    * expr.rb:2107). `linear` maps to Spark's exact `percentile` (same
    * formula as DuckDB `quantile_cont`, distinct-value-bounded state). The
    * element-picking modes carry a [[GroupAggForm]] so GROUPED contexts
    * (group_by().agg, .over(keys)) plan a two-pass rank selection — a
    * per-key `row_number`/`count` window locates the two target ranks, and
    * a constant-state aggregate picks the matching rows — so per-group
    * memory never grows with group size (the window sort spills; the old
    * `sort_array(collect_list)` spelling buffered whole groups in one
    * aggregation buffer, an executor OOM when groups are table-sized). The
    * bare-Column spelling below keeps the sorted-array indexing for its
    * two remaining bounded uses: 1-row select goldens and rolling range
    * frames (where the frame bounds the buffer); whole-column SCALARS
    * route through [[graft.kernel.Quantiles]] instead (Series#quantile,
    * Frame#quantileFrame). */
  def quantile(q: Double, interpolation: String = "nearest"): Expr = {
    // reference error text (series_test.rb test_quantile)
    require(q >= 0.0 && q <= 1.0, "quantile should be between 0.0 and 1.0")
    // polars quantile is ALWAYS f64 (expr.rb:2473 goldens: lower/higher on
    // an i64 column still render f64), so the element-picking modes cast
    interpolation match {
      case "linear" => aggMap(c => F.percentile(c, F.lit(q)))
      case m =>
        val globalCol = {
          val c = col
          val sorted = F.sort_array(F.collect_list(c))
          val n = F.size(sorted)
          val h = F.lit(q) * (n - 1).cast("double")
          val lo = F.element_at(sorted, F.floor(h).cast("int") + 1)
          val hi = F.element_at(sorted, F.ceil(h).cast("int") + 1)
          (m match {
            case "lower"    => lo
            case "higher"   => hi
            case "midpoint" => (lo + hi) / 2.0
            case "nearest"  =>
              // polars rounds half AWAY from zero (Rust f64::round): the
              // exact-half position picks hi — expr.rb:2473 golden, q=0.3
              // over 6 rows lands on h=1.5 and returns element 2
              F.when(h - F.floor(h) >= 0.5, hi).otherwise(lo)
          }).cast("double")
        }
        val srcName = meta.outputName
        val kf = KeyedForm { keyCols =>
          val inp = keyedInput("quantile", keyCols)
          val c = inp.col
          // rank among the group's NON-NULL values in value order (nulls
          // sort last, so non-null rows get 1..n — the same total order as
          // sort_array: -Inf < finite < +Inf < NaN, nulls excluded)
          val rk = F.row_number()
            .over(Window.partitionBy(keyCols: _*).orderBy(c.asc_nulls_last))
          val n = F.count(c).over(Window.partitionBy(keyCols: _*))
          val h = F.lit(q) * (n - 1).cast("double")
          val loT = F.floor(h).cast("int") + 1
          val hiT = F.ceil(h).cast("int") + 1
          val helper = m match {
            case "midpoint" =>
              F.struct(F.when(rk === loT, c).as("l"), F.when(rk === hiT, c).as("r"))
            case "lower"  => F.when(rk === loT, c)
            case "higher" => F.when(rk === hiT, c)
            case "nearest" =>
              F.when(rk === F.when(h - F.floor(h) >= 0.5, hiT).otherwise(loT), c)
          }
          Expr(srcName.map(nm => helper.as(nm)).getOrElse(helper),
            inp.requiresIndex, inp.preps)
        }
        // exactly one row per group matches each target rank, so max() IS
        // the element pick — constant aggregation state per group
        val agg: Column => Column = m match {
          case "midpoint" =>
            hc => ((F.max(hc.getField("l")) + F.max(hc.getField("r"))) / 2.0).cast("double")
          case _ => hc => F.max(hc).cast("double")
        }
        Expr(globalCol, requiresIndex, preps, None, Some(GroupAggForm(kf, agg)))
    }
  }
  def approxQuantile(q: Double, accuracy: Int = 10000): Expr =
    aggMap(c => F.percentile_approx(c, F.lit(q), F.lit(accuracy)))
  def mode: Expr = aggMap(c => F.mode(c))
  /** Global implode is ROW-ORDERED and NULL-PRESERVING (polars: select
    * (implode("a")) on [1,2,3] is [[1,2,3]] in frame order) — bare
    * collect_list returns partition order and drops nulls, so collect
    * (idx, x) structs and strip the index after the total sort (the same
    * spelling as str.join). The per-group form stays collect_list: GroupBy
    * .agg's keyed branch already feeds it rows sorted per group. */
  def implode: Expr = {
    val base = Expr(
      F.transform(
        F.array_sort(F.collect_list(F.struct(
          F.col(graft.kernel.RowIndex.name).as("i"), col.as("x")))),
        s => s.getField("x")),
      requiresIndex = true, preps, None,
      keyed.map(k => GroupAggForm(k, F.collect_list, orderSensitive = true)))
    // default naming must stay the SOURCE's leaf name — the struct spelling
    // would otherwise leak the row-index helper as the output name
    meta.outputName.fold(base)(base.alias)
  }
  def uniqueAgg: Expr = aggMap(F.collect_set)
  /** Vertical distinct (expr.rb unique, maintain_order: false): a SELECT
    * yields the distinct values as rows (order undefined, like polars);
    * the agg form is the per-group distinct list. Chaining a further
    * aggregate (polars `unique.count`) needs a two-step select — the
    * relational Expr surface does not nest aggregates (COVERAGE.md
    * vertical-op chaining note). */
  def unique: Expr = {
    // the generator-over-aggregate shape resolves only when the aggregate
    // is a REAL AggregateExpression node (ExtractGenerator defers on an
    // unresolved collect_set and GlobalAggregates then mis-plans the
    // Project as an Aggregate) — same shape FirstSeen/get_categories uses
    val G = org.apache.spark.sql.GraftInternalOps
    def setAgg(c: Column): Column = G.column(
      org.apache.spark.sql.catalyst.expressions.aggregate.CollectSet(
        G.catalystExpression(c)).toAggregateExpression())
    val base = Expr(F.explode(setAgg(col)), requiresIndex, preps, None,
      Some(GroupAggForm(KeyedForm(_ => Expr(col, requiresIndex, preps)), F.collect_set)))
    meta.outputName.fold(base)(base.alias)
  }
  /** gather/take by index (reference expr.rb:1565 golden: per-group
    * `agg(col.take([2,1]))` selects those row positions within each group
    * in row order, returning a list). Same ordered-collect discipline as
    * [[implode]]: the global form totalizes on the hidden row index; the
    * per-group form rides GroupBy.agg's per-group sort. Negative indices
    * count from the end; out-of-bounds yields null (try_element_at). */
  def gather(indices: Seq[Int]): Expr = {
    def sel(arr: Column): Column =
      F.array(indices.map(i => F.try_element_at(arr, F.lit(if (i >= 0) i + 1 else i))): _*)
    val ordered = F.transform(
      F.array_sort(F.collect_list(F.struct(
        F.col(graft.kernel.RowIndex.name).as("i"), col.as("x")))),
      s => s.getField("x"))
    val base = Expr(sel(ordered), requiresIndex = true, preps, None,
      keyed.map(k => GroupAggForm(k, c => sel(F.collect_list(c)),
        orderSensitive = true)))
    meta.outputName.fold(base)(base.alias)
  }
  def take(indices: Seq[Int]): Expr = gather(indices)
  /** skew/kurtosis (reference expr.rb:5788,5820): Spark's skewness/kurtosis
    * aggregates are the biased g1/g2 (kurtosis already excess); bias: false
    * applies the k-statistics corrections, fisher: false adds back 3. */
  def skew(bias: Boolean = true): Expr = aggMap { c =>
    val g1 = F.skewness(c)
    if (bias) g1
    else {
      val n = F.count(c).cast("double")
      F.when(n > 2, g1 * F.sqrt(n * (n - 1)) / (n - 2))
    }
  }
  def kurtosis(fisher: Boolean = true, bias: Boolean = true): Expr = aggMap { c =>
    val g2 = F.kurtosis(c)
    val base =
      if (bias) g2
      else {
        val n = F.count(c).cast("double")
        F.when(n > 3, ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6))
      }
    if (fisher) base else base + 3
  }
  /** entropy (reference expr.rb:6637; defaults base: 2, normalize: true).
    * With normalize the column is scaled to a probability vector first:
    * -Σ (c/S) ln (c/S) = -(Σ c ln c)/S + ln S, two plain aggregates. */
  def entropy(base: Double = 2, normalize: Boolean = true): Expr = aggMap { c =>
    val raw = -F.sum(c * F.log(c))
    val s = F.sum(c)
    val ent = if (normalize) raw / s + F.log(s) else raw
    ent / math.log(base)
  }

  // ---- conditional agg helper (reference: expr.rb:2713 Expr#filter) ----
  /** Keep only elements matching the predicate inside an aggregation context. */
  def filter(pred: Expr): Expr = zip(pred)((c, p) => F.when(p, c))
  /** Alias of filter inside aggregations (reference expr.rb:2834 where). */
  def where(pred: Expr): Expr = filter(pred)

  // ---- window: over (reference: expr.rb:2278) ----
  /** Per-key evaluation. For plain aggregates this is the Spark window; for
    * order-dependent ops (shift/cum/fill/rank/rolling) it re-spells the op
    * as a keyed window in row order — polars' `cum_sum.over(k)` semantics —
    * replacing the global scan-kernel prep entirely (one shuffle on the
    * keys). */
  def over(partitionBy: Expr*): Expr = keyed match {
    case Some(k) =>
      // the keys' own preps run FIRST: a keyed form that materializes its
      // own prep (rle_id, interpolate) windows over the key columns, which
      // a prep-bearing key (rank, cum_sum) only produces once built
      val e = k.mk(partitionBy.map(_.col))
      Expr(e.col, e.requiresIndex || partitionBy.exists(_.requiresIndex),
        mergePreps(partitionBy.flatMap(_.preps).distinctBy(_.key), e.preps))
    case None if groupAgg.isDefined =>
      // aggregate-of-scanned per key: materialize the keyed inner op via a
      // prep (windows can't nest), window the BARE aggregate over the keys
      // (a WindowExpression's child must be an AggregateFunction), and apply
      // post-transforms (alias, * constant, cast) outside the window. The
      // keys' own preps run first — the helper's window references them.
      val g = groupAgg.get
      val keyCols = partitionBy.map(_.col)
      val ke = g.keyed.mk(keyCols)
      val helper = Scan.fresh("x")
      val prep = Prep(helper, d => d.withColumn(helper, ke.col), Seq(helper))
      // composite aggregates (coalesced sums, NaN-fallback extrema,
      // std(ddof:)) window each embedded aggregate; DISTINCT aggregates
      // (n_unique) re-spell as size-outside-of collect_set-in-window
      // (windowCompositeAggregates applies both per embedded aggregate)
      val aggCol = g.agg(F.col(helper))
      val windowed = org.apache.spark.sql.GraftInternalOps
        .windowCompositeAggregates(aggCol, keyCols)
        .getOrElse(aggCol.over(Window.partitionBy(keyCols: _*)))
      Expr(g.post(windowed),
        requiresIndex = true,
        mergePreps(mergePreps(partitionBy.flatMap(_.preps).distinctBy(_.key),
          ke.preps), Seq(prep)))
    case None =>
      if (preps.nonEmpty) throw new UnsupportedOperationException(
        "over: this expression composes order-dependent ops in a form that has no " +
          "per-key window spelling; apply .over(keys) to the shift/cum/fill/rank/rolling " +
          "op directly (e.g. col(\"x\").shift(1).over(k) - col(\"x\").over-free terms)")
      // window every embedded aggregate (composite aggregates like
      // std(ddof:0) / Kleene any-all have no single bare window form;
      // distinct counts re-spell via collect_set); aggregate-free columns
      // (rank family) window whole, as before
      val keyCols = partitionBy.map(_.col)
      val windowed = org.apache.spark.sql.GraftInternalOps
        .windowCompositeAggregates(col, keyCols)
        .getOrElse(col.over(Window.partitionBy(keyCols: _*)))
      // requiresIndex: the window shuffle scrambles row order; the hidden
      // index lets the projection restore polars' frame-order guarantee
      // (select/withColumns/filter re-sort; a caller's own orderBy replaces
      // that sort via EliminateSorts)
      Expr(windowed, requiresIndex = true, mergedWith(partitionBy: _*))
  }
  def over(w: WindowSpec): Expr = {
    if (keyed.isDefined || groupAgg.isDefined || preps.nonEmpty)
      throw new UnsupportedOperationException(
        "over(WindowSpec): order-dependent ops re-spell per key from partition KEYS " +
          "(the frame's hidden row order supplies the ordering); pass the keys — " +
          "over(col(\"k\")) — instead of a prebuilt WindowSpec")
    Expr(Expr.windowed(col, w), requiresIndex, preps)
  }
  def overOrdered(partitionBy: Seq[Expr], orderBy: Seq[Expr]): Expr = {
    val w = Window.partitionBy(partitionBy.map(_.col): _*).orderBy(orderBy.map(_.col): _*)
    Expr(Expr.windowed(col, w),
      requiresIndex || (partitionBy ++ orderBy).exists(_.requiresIndex),
      mergedWith(partitionBy ++ orderBy: _*))
  }

  // ---- sorting keys helpers ----
  def asc: Expr = map(_.asc)
  def desc: Expr = map(_.desc)
  def ascNullsLast: Expr = map(_.asc_nulls_last)
  def descNullsLast: Expr = map(_.desc_nulls_last)
  def ascNullsFirst: Expr = map(_.asc_nulls_first)
  def descNullsFirst: Expr = map(_.desc_nulls_first)

  // ---- order-dependent ops: resolved against the frame's hidden row index
  //      via the distributed prefix-scan kernel (graft.kernel.Scan) — never a
  //      single-partition Window.orderBy(idx) over data ----
  /** Keyed window in hidden row order — what `.over(keys)` means for the
    * order-dependent ops. */
  private def keyedIdxW(keys: Seq[Column]): WindowSpec =
    Window.partitionBy(keys: _*).orderBy(F.col(graft.kernel.RowIndex.name))
  /** shift(n) — lag/lead over implicit row order (reference: expr.rb:1624).
    * Keyed form: Spark lag/lead fill their default only for out-of-range
    * rows, exactly polars' structural-fill semantics. */
  def shift(n: Int = 1): Expr = shiftImpl(n, None)
  def shiftAndFill(n: Int, fill: Any): Expr = fill match {
    // polars promotes to the fill/value supertype: a str fill over a
    // numeric column yields a str column (expr.rb:2060 golden) — Spark's
    // ANSI coercion would instead try to CAST the fill to the column type
    case _: String => cast(org.apache.spark.sql.types.StringType)
      .shiftImpl(n, Some(Expr.lit(fill).col))
    // a fractional fill over an integral column promotes the column to f64
    // (polars supertype rule) — without the cast Spark coerces the fill to
    // the column type instead (truncating, or failing under ANSI)
    case _: Double | _: Float => cast(org.apache.spark.sql.types.DoubleType)
      .shiftImpl(n, Some(Expr.lit(fill).col))
    case _ => shiftImpl(n, Some(Expr.lit(fill).col))
  }
  private def shiftImpl(n: Int, fill: Option[Column]): Expr =
    if (n == 0) this
    else scanned((d, out) => Scan.shifted(d, col, n, out, fill)).copy(keyed =
      Some(KeyedForm { keys =>
        val in = keyedInput("shift", keys)
        val dflt = fill.getOrElse(F.lit(null))
        val c = if (n > 0) F.lag(in.col, n, dflt) else F.lead(in.col, -n, dflt)
        Expr(c.over(keyedIdxW(keys)), requiresIndex = true, in.preps)
      }))
  def diff(n: Int = 1, nullBehavior: String = "ignore"): Expr = {
    // reference expr.rb:5722 diff(n:, null_behavior:): "drop" SHRINKS the
    // series — expressible on a Series (api/Series.scala diff), not inside
    // a frame projection where every column keeps the frame's length
    if (nullBehavior == "drop") throw new UnsupportedOperationException(
      "diff(null_behavior: \"drop\") changes the column length and cannot run " +
        "inside a frame projection; use Series#diff (or slice the frame after)")
    require(nullBehavior == "ignore",
      s"diff: null_behavior must be ignore|drop, got '$nullBehavior'")
    (this - shift(n)).copy(keyed = Some(KeyedForm { keys =>
      val in = keyedInput("diff", keys)
      val prev = (if (n > 0) F.lag(in.col, n) else F.lead(in.col, -n)).over(keyedIdxW(keys))
      Expr(in.col - prev, requiresIndex = true, in.preps)
    }))
  }
  def pctChange(n: Int = 1): Expr = {
    // polars FORWARD-FILLS before computing (reference expr.rb:5744-5757:
    // [10, 11, 12, null, 12].pct_change = [null, .1, .0909, 0.0, 0.0]) — the
    // change is between filled values, so a null row repeats the last value
    // and yields 0. nullif guard: ANSI mode (Spark 4 default) errors on
    // divide-by-zero; zero-previous yields null (documented deviation from
    // polars' ±inf).
    val filled = forwardFill
    val prev = filled.shift(n)
    Expr((filled.col - prev.col) / F.nullif(prev.col, F.lit(0)), requiresIndex = true,
      mergePreps(filled.preps, prev.preps),
      keyed = Some(KeyedForm { keys =>
        val in = keyedInput("pct_change", keys)
        // windows cannot nest, but "forward-filled value n rows back" is
        // expressible directly: the last non-null value in rows
        // (-inf, current-n] — one frame, no nesting
        val w = keyedIdxW(keys)
        val cur = F.last(in.col, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        val p = F.last(in.col, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -n.toLong))
        Expr((cur - p) / F.nullif(p, F.lit(0)), requiresIndex = true, in.preps)
      }))
  }
  def cumSum(reverse: Boolean = false): Expr = cum(F.sum, "sum", reverse)
  def cumMin(reverse: Boolean = false): Expr = cum(F.min, "min", reverse)
  def cumMax(reverse: Boolean = false): Expr = cum(F.max, "max", reverse)
  def cumCount(reverse: Boolean = false): Expr = cum(F.count, "sum", reverse, maskNulls = false)
  def cumProd(reverse: Boolean = false): Expr = cum(Expr.productAgg, "product", reverse)
  /** polars cum_* PRESERVES null positions ([1, null, 2].cum_sum = [1, null,
    * 3]) where SQL's running aggregate would return the sum-so-far — mask
    * the result at null inputs (cum_count excepted: it counts non-nulls and
    * is defined at every row). */
  private def cum(f: Column => Column, kind: String, reverse: Boolean,
                  maskNulls: Boolean = true): Expr = {
    def mask(r: Column): Column = if (maskNulls) F.when(col.isNotNull, r) else r
    val base = scanned((d, out) => Scan.running(d, col, out, f, kind, reverse))
    Expr(mask(base.col), base.requiresIndex, base.preps, keyed =
      Some(KeyedForm { keys =>
        val in = keyedInput("cum_" + kind, keys)
        def maskK(r: Column): Column = if (maskNulls) F.when(in.col.isNotNull, r) else r
        val w =
          if (reverse) keyedIdxW(keys).rowsBetween(Window.currentRow, Window.unboundedFollowing)
          else keyedIdxW(keys).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Expr(maskK(f(in.col).over(w)), requiresIndex = true, in.preps)
      }))
  }
  /** rank over implicit row order of values (reference: expr.rb:5691;
    * methods average|min|max|dense|ordinal|random, `seed` for random).
    * Distributed: per-value counts + prefix sums on the distinct-value frame,
    * joined back — nulls rank null (the reference's behavior). */
  def rank(method: String = "average", descending: Boolean = false,
           seed: Long = 0L): Expr = {
    val out = Scan.fresh("x")
    // alias to the source's polars name — the helper is a reserved column a
    // bare select would otherwise drop (see `scanned`)
    Expr(meta.outputName.fold(F.col(out))(n => F.col(out).as(n)),
      requiresIndex = method == "ordinal" || method == "random" || requiresIndex,
      preps :+ Prep(out, d => Scan.withRank(d, col, out, method, descending, seed), Seq(out)),
      keyed = Some(KeyedForm { keys =>
        val in = keyedInput("rank", keys)
        // per-key rank of values: nulls_last ordering keeps non-null ranks
        // 1..m, then null inputs mask to null (polars' null behavior); dtype
        // parity with Scan.withRank: min/dense/ordinal/random int, max long,
        // average double
        val ord = if (descending) in.col.desc_nulls_last else in.col.asc_nulls_last
        val w = Window.partitionBy(keys: _*).orderBy(ord)
        val tieCnt = F.count(in.col).over(Window.partitionBy((keys :+ in.col): _*))
        val minRank = F.rank().over(w)
        // random tie order: the tiebreak must be a MATERIALIZED column
        // (nondeterministic exprs are rejected inside window ordering)
        lazy val rnd = Scan.fresh("rnd")
        val c = method match {
          case "min"     => minRank
          case "max"     => (minRank - 1).cast("long") + tieCnt
          case "dense"   => F.dense_rank().over(w)
          case "ordinal" => F.row_number().over(
            Window.partitionBy(keys: _*).orderBy(ord, F.col(graft.kernel.RowIndex.name).asc))
          case "random"  => F.row_number().over(
            Window.partitionBy(keys: _*).orderBy(ord, F.col(rnd).asc))
          case "average" => (minRank - 1).cast("double") + (tieCnt + 1).cast("double") / 2.0
          case m => throw new IllegalArgumentException(
            s"rank: method must be average|min|max|dense|ordinal|random, got '$m'")
        }
        val kePreps =
          if (method == "random")
            // deterministic seeded tiebreak (see Scan.withRank): a pure
            // function of (seed, row-index), not a per-evaluation draw
            in.preps :+ Prep(rnd, d => d.withColumn(rnd,
              F.xxhash64(F.lit(seed), F.col(graft.kernel.RowIndex.name))), Seq(rnd))
          else in.preps
        Expr(F.when(in.col.isNotNull, c),
          requiresIndex = method == "ordinal" || method == "random" || in.requiresIndex, kePreps)
      }))
  }
  def isDuplicated: Expr =
    Expr(F.count(F.lit(1)).over(Window.partitionBy(col)) > 1, requiresIndex, preps)
  def isUniqueMask: Expr =
    Expr(F.count(F.lit(1)).over(Window.partitionBy(col)) === 1, requiresIndex, preps)
  def isFirstDistinct: Expr = Expr(
    F.row_number().over(Window.partitionBy(col).orderBy(F.col(graft.kernel.RowIndex.name))) === 1,
    requiresIndex = true, preps)
  def isLastDistinct: Expr = Expr(
    F.row_number().over(Window.partitionBy(col).orderBy(F.col(graft.kernel.RowIndex.name).desc)) === 1,
    requiresIndex = true, preps)
  def forwardFill: Expr =
    scanned((d, out) => Scan.filled(d, col, out, backward = false)).copy(keyed =
      Some(KeyedForm { keys =>
        val in = keyedInput("forward_fill", keys)
        val w = keyedIdxW(keys).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Expr(F.last(in.col, ignoreNulls = true).over(w), requiresIndex = true, in.preps)
      }))
  def backwardFill: Expr =
    scanned((d, out) => Scan.filled(d, col, out, backward = true)).copy(keyed =
      Some(KeyedForm { keys =>
        val in = keyedInput("backward_fill", keys)
        val w = keyedIdxW(keys).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        Expr(F.first(in.col, ignoreNulls = true).over(w), requiresIndex = true, in.preps)
      }))
  /** interpolate nulls between neighboring non-nulls over row positions
    * (reference expr.rb:3871; frame/time-indexed form in
    * [[graft.kernel.Interpolate]]). Positions come from a distributed
    * running count (the monotonic idx has inter-partition gaps that would
    * skew linear weights), neighbors from two kernel fills. */
  def interpolate(method: String = "linear"): Expr = {
    require(Seq("linear", "nearest").contains(method),
      s"interpolate: method must be linear|nearest, got '$method'")
    val keyedForm = KeyedForm { keys =>
      val in = keyedInput("interpolate", keys)
      val inCol = in.col
      // per-key blend: positions from a keyed row_number (materialized via a
      // prep — windows can't nest), neighbors from keyed ignore-null fills
      val w = keyedIdxW(keys)
      val pos = Scan.fresh("p")
      val posPrep = Prep(pos,
        d => d.withColumn(pos, F.row_number().over(w).cast("double")), Seq(pos))
      val pair = F.when(inCol.isNotNull,
        F.struct(F.col(pos).as("o"), inCol.cast("double").as("x")))
      val prevC = F.last(pair, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val nextC = F.first(pair, ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      val prev = Scan.fresh("x"); val nxt = Scan.fresh("x")
      val fillPrep = Prep(prev,
        d => d.withColumn(prev, prevC).withColumn(nxt, nextC), Seq(prev, nxt))
      val o = F.col(pos)
      val (pv, po) = (F.col(prev).getField("x"), F.col(prev).getField("o"))
      val (nv, no) = (F.col(nxt).getField("x"), F.col(nxt).getField("o"))
      val blended = method match {
        case "linear" =>
          F.when(inCol.isNotNull, inCol.cast("double"))
            .when(pv.isNotNull && nv.isNotNull, pv + (nv - pv) * (o - po) / (no - po))
        case "nearest" =>
          F.when(inCol.isNotNull, inCol.cast("double"))
            .when(pv.isNotNull && nv.isNotNull, F.when(o - po <= no - o, pv).otherwise(nv))
      }
      Expr(blended, requiresIndex = true, in.preps ++ Seq(posPrep, fillPrep))
    }
    scanned { (d, out) =>
      val pos = Scan.fresh("p"); val prev = Scan.fresh("x"); val nxt = Scan.fresh("x")
      val d1 = Scan.running(d, F.lit(1L), pos, F.count, "sum")
      val pair = F.when(col.isNotNull,
        F.struct(F.col(pos).cast("double").as("o"), col.cast("double").as("x")))
      val d2 = Scan.filled(d1, pair, prev, backward = false)
      val d3 = Scan.filled(d2, pair, nxt, backward = true)
      val o = F.col(pos).cast("double")
      val (pv, po) = (F.col(prev).getField("x"), F.col(prev).getField("o"))
      val (nv, no) = (F.col(nxt).getField("x"), F.col(nxt).getField("o"))
      val blended = method match {
        case "linear" =>
          F.when(col.isNotNull, col.cast("double"))
            .when(pv.isNotNull && nv.isNotNull, pv + (nv - pv) * (o - po) / (no - po))
        case "nearest" =>
          F.when(col.isNotNull, col.cast("double"))
            .when(pv.isNotNull && nv.isNotNull, F.when(o - po <= no - o, pv).otherwise(nv))
      }
      d3.withColumn(out, blended).drop(pos, prev, nxt)
    }.copy(keyed = Some(keyedForm))
  }
  // ---- vertical permutation ops (reference expr.rb:1310 sort, :1829
  //      reverse, :1427 sort_by): polars evaluates each projection expr as
  //      an INDEPENDENT Series and re-zips by position — select(col.sort)
  //      reorders just that column against the others. Global forms run
  //      through [[Scan.zipOrdered]] (running-count positions + pruned
  //      sort-side + 1:1 position join — distributed, no buffering); keyed
  //      forms permute within each key group; agg forms yield the
  //      per-group list. ----
  private def permuted(opName: String, orderOf: Column => Seq[Scan.OrderKey],
                       aggList: Column => Column, aggOrderSensitive: Boolean,
                       extraOperands: Seq[Expr] = Nil): Expr = {
    def mergedAll(base: Seq[Prep]): Seq[Prep] =
      extraOperands.foldLeft(base)((a, e) => mergePreps(a, e.preps))
    val out = Scan.fresh("x")
    val named = meta.outputName.fold(F.col(out))(n => F.col(out).as(n))
    Expr(named, requiresIndex = true,
      mergedAll(preps) :+ Prep(out,
        d => Scan.zipOrdered(d, col, out, orderOf(col)), Seq(out, Scan.BUCKET)),
      keyed = Some(KeyedForm { keys =>
        val in = keyedInput(opName, keys)
        val helper = Scan.fresh("x")
        Expr(F.col(helper), requiresIndex = true,
          mergedAll(in.preps) :+ Prep(helper,
            d => Scan.zipOrderedByKeys(d, in.col, helper, orderOf(in.col), keys),
            Seq(helper, Scan.BUCKET)))
      }),
      groupAgg = Some(GroupAggForm(
        KeyedForm(_ => Expr(col, requiresIndex, preps)),
        aggList, orderSensitive = aggOrderSensitive)))
  }

  /** Independent column sort (expr.rb:1310 golden: select(col("value").sort)
    * yields 1/2/3/4/98/99 whatever the other columns do; the agg form is
    * the sorted per-group list). polars nulls placement: first unless
    * `nulls_last`, in BOTH directions. */
  def sort(descending: Boolean = false, nullsLast: Boolean = false): Expr =
    permuted("sort",
      c => Seq(Scan.OrderKey(c, descending, nullsLast)),
      c => Expr.sortedListAgg(c, descending, nullsLast),
      aggOrderSensitive = false) // the sort imposes its own order

  /** Independent column reversal (expr.rb:1829) — the mirror permutation of
    * the hidden row order; agg form: the group's values in reverse row
    * order (null-preserving). */
  def reverse: Expr =
    permuted("reverse",
      _ => Seq(Scan.OrderKey(F.col(graft.kernel.RowIndex.name), descending = true)),
      c => F.reverse(F.transform(F.collect_list(F.struct(c.as("x"))),
        s => s.getField("x"))),
      aggOrderSensitive = true) // reads row order, needs the per-group sort
  def reverseExpr: Expr = reverse // pre-r15 alias

  /** Independent sort of THIS column by other column(s) (expr.rb:1427
    * sort_by outside agg; [[sortByAgg]] remains the explicit agg-context
    * spelling and backs the grouped form here). */
  def sortBy(by: Seq[Expr], descending: Boolean): Expr =
    permuted("sort_by",
      _ => by.map(e => Scan.OrderKey(e.col, descending)),
      c => {
        val sorted = F.array_sort(F.collect_list(F.struct(
          by.map(_.col).zipWithIndex.map { case (k, i) => k.as(s"k$i") } :+
            c.as("v"): _*)))
        val values = F.transform(sorted, s => s.getField("v"))
        if (descending) F.reverse(values) else values
      },
      aggOrderSensitive = false,
      extraOperands = by)
  def sortBy(by: Seq[Expr]): Expr = sortBy(by, descending = false)
  def sortBy(by: Expr, descending: Boolean = false): Expr = sortBy(Seq(by), descending)

  // ---- rolling (fixed window, reference: expr.rb:4936-5567) ----
  /** polars rolling default: `min_periods: nil` means WINDOW SIZE — the
    * first n-1 rows are null (reference expr.rb:5055-5057,5085). Pass 0
    * (the "unset" sentinel) to get that default; an explicit value counts
    * NON-NULL values in the window. */
  def rollingSum(n: Int, minPeriods: Int = 0): Expr = rolling(F.sum, n, minPeriods)
  def rollingMean(n: Int, minPeriods: Int = 0): Expr = rolling(F.avg, n, minPeriods)
  def rollingMin(n: Int, minPeriods: Int = 0): Expr = rolling(F.min, n, minPeriods)
  def rollingMax(n: Int, minPeriods: Int = 0): Expr = rolling(F.max, n, minPeriods)
  def rollingStd(n: Int, minPeriods: Int = 0): Expr = rolling(F.stddev_samp, n, minPeriods)
  def rollingVar(n: Int, minPeriods: Int = 0): Expr = rolling(F.var_samp, n, minPeriods)
  def rollingMedian(n: Int, minPeriods: Int = 0): Expr =
    rollingQuantile(0.5, n, "linear", minPeriods)
  /** Trailing-n-row op with both spellings: global via the phantom-carry
    * kernel, keyed (`.over(keys)`) as a plain rows-frame window. Exposed to
    * the Polars module for PACKED multi-term formulas (rolling_corr/cov
    * pack (x, y) into one struct and compute every window aggregate over
    * the SAME frame in ONE kernel pass — six chained passes cost ~40× more,
    * measured at sf0.1). */
  private[graft] def rollingScanned(n: Int)(build: (Column, WindowSpec) => Column): Expr =
    scanned((d, out) => Scan.rollingApply(d, col, n, out, build)).copy(keyed =
      Some(KeyedForm { keys =>
        val in = keyedInput("rolling", keys)
        val w = keyedIdxW(keys).rowsBetween(-(n - 1).toLong, 0L)
        Expr(build(in.col, w), requiresIndex = true, in.preps)
      }))
  private def rolling(f: Column => Column, n: Int, minPeriods: Int): Expr = {
    val mp = if (minPeriods <= 0) n else minPeriods
    rollingScanned(n)((v, w) =>
      F.when(F.count(v).over(w) >= mp, f(v).over(w)))
  }
  /** rolling_quantile (reference expr.rb:5480): exact quantile over a
    * trailing rows window with polars' interpolation modes. Spark's
    * percentile/median aggregates reject window FRAMES, so every mode indexes
    * the sorted collected window (n is a small constant — the collect is
    * per-row bounded, not a data-sized state). */
  def rollingQuantile(q: Double, n: Int, interpolation: String = "nearest",
                      minPeriods: Int = 0): Expr = {
    // polars default: min_periods = window size; clamp to >= 1 so an
    // all-null window yields null, not element_at on an empty array (ANSI)
    val mp = math.max(if (minPeriods <= 0) n else minPeriods, 1)
    rollingScanned(n)((v, w) => {
      val sorted = F.sort_array(F.collect_list(v).over(w))
      F.when(F.count(v).over(w) >= mp,
        Expr.quantileOfSorted(sorted, q, interpolation))
    })
  }
  // ---- rolling_*_by: temporal windows keyed by another column
  //      (reference: expr.rb:3964-4970) ----
  /** Shared builder: for each row the window holds the rows whose `by` value
    * lies in `(t - window_size, t]` (endpoint inclusivity per `closed`,
    * default "right"), where t is the row's own `by` value.
    * Fixed durations — plain form: time-bucket phantom-carry kernel
    * ([[graft.kernel.Scan.rollingByApply]]) — one balanced shuffle, never a
    * global single-partition sort; keyed form (`.over(keys)`): a range-frame
    * window partitioned by the keys (epoch µs is integral, so shifting an
    * open polars endpoint into Spark's inclusive range bound by 1 µs is
    * exact). Calendar durations (mo/q/y — reference duration DSL
    * lazy_frame.rb:1198-1219): per-row month arithmetic has no fixed-offset
    * range frame, so both forms route the month-space bucket-join kernel
    * ([[graft.kernel.Scan.rollingByCalendar]]) with `aggBuild` as the
    * per-probe-row aggregate spelling of the op. */
  private def rollingByScanned(by: Expr, windowSize: String, closed: String)
      (build: (Column, WindowSpec) => Column)
      (aggBuild: Column => Column): Expr = {
    require(Set("left", "right", "both", "none")(closed),
      s"rolling_*_by: closed must be left|right|both|none, got '$closed'")
    val dur = graft.kernel.DurationDsl.parse(windowSize)
    val out = Scan.fresh("x")
    val basePreps = mergedWith(by)
    if (dur.isCalendar) {
      // calendar windows (reference duration DSL mo/q/y): per-row month
      // arithmetic — the bucket-join kernel, keyless and keyed alike (the
      // keyed form is a prep too: no fixed-offset range frame exists)
      require(dur.isPureCalendar,
        "rolling_*_by: calendar window sizes must be pure month multiples " +
          "(mo/q/y); mixed calendar+fixed durations (e.g. 1mo2d) are not supported")
      def calPrep(keys: Seq[Column]) = Prep(out,
        d => Scan.rollingByCalendar(d, col, by.col, dur.months.toInt, closed, out,
          aggBuild, keys),
        Seq(out))
      return Expr(F.col(out), requiresIndex = requiresIndex || by.requiresIndex,
        basePreps :+ calPrep(Nil),
        keyed = Some(KeyedForm { keys =>
          // chained input has no spelling here: the calendar kernel consumes
          // the raw input column inside its bucket join
          if (preps.nonEmpty) throw new UnsupportedOperationException(
            "rolling_*_by(calendar).over(keys): the input expression itself " +
              "contains order-dependent ops; materialize the inner op per key " +
              "first (with_column(\"t\" -> inner.over(keys))) and chain on the " +
              "new column")
          Expr(F.col(out), requiresIndex || by.requiresIndex,
            basePreps :+ calPrep(keys))
        }))
    }
    require(dur.indexCount == 0,
      s"rolling_*_by: index-count windows ('Ni') are not supported at the " +
        "expression level; use frame-level rolling(index_column:, period:) " +
        "over the integer index column")
    val p = dur.totalMicros
    require(p > 0, s"rolling_*_by: window_size must be positive, got '$windowSize'")
    val loIncl = if (closed == "left" || closed == "both") -p else -p + 1
    val hiIncl = if (closed == "right" || closed == "both") 0L else -1L
    val epoch = F.unix_micros(by.col.cast("timestamp"))
    Expr(F.col(out), requiresIndex = requiresIndex || by.requiresIndex,
      basePreps :+ Prep(out,
        d => Scan.rollingByApply(d, col, epoch, loIncl, hiIncl, out, build),
        Seq(out)),
      keyed = Some(KeyedForm { keys =>
        val in = keyedInput("rolling_by", keys)
        val w = Window.partitionBy(keys: _*).orderBy(epoch)
          .rangeBetween(loIncl, hiIncl)
        Expr(build(in.col, w), in.requiresIndex || by.requiresIndex,
          mergePreps(in.preps, by.preps))
      }))
  }
  private def rollingAggBy(by: Expr, windowSize: String, minPeriods: Int,
                           closed: String)(agg: Column => Column): Expr =
    rollingByScanned(by, windowSize, closed)((v, w) =>
      F.when(F.count(v).over(w) >= math.max(minPeriods, 1), agg(v).over(w)))(v =>
      F.when(F.count(v) >= math.max(minPeriods, 1), agg(v)))
  def rollingSumBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                   closed: String = "right"): Expr =
    rollingAggBy(by, windowSize, minPeriods, closed)(F.sum)
  def rollingMeanBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                    closed: String = "right"): Expr =
    rollingAggBy(by, windowSize, minPeriods, closed)(F.avg)
  def rollingMinBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                   closed: String = "right"): Expr =
    rollingAggBy(by, windowSize, minPeriods, closed)(F.min)
  def rollingMaxBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                   closed: String = "right"): Expr =
    rollingAggBy(by, windowSize, minPeriods, closed)(F.max)
  def rollingStdBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                   closed: String = "right", ddof: Int = 1): Expr =
    rollingByScanned(by, windowSize, closed)((v, w) => {
      val cnt = F.count(v).over(w)
      F.when(cnt >= math.max(minPeriods, 1),
        Expr.ddofScale(F.stddev_samp(v).over(w), cnt, ddof, isStd = true))
    })(v => {
      val cnt = F.count(v)
      F.when(cnt >= math.max(minPeriods, 1),
        Expr.ddofScale(F.stddev_samp(v), cnt, ddof, isStd = true))
    })
  def rollingVarBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                   closed: String = "right", ddof: Int = 1): Expr =
    rollingByScanned(by, windowSize, closed)((v, w) => {
      val cnt = F.count(v).over(w)
      F.when(cnt >= math.max(minPeriods, 1),
        Expr.ddofScale(F.var_samp(v).over(w), cnt, ddof, isStd = false))
    })(v => {
      val cnt = F.count(v)
      F.when(cnt >= math.max(minPeriods, 1),
        Expr.ddofScale(F.var_samp(v), cnt, ddof, isStd = false))
    })
  /** rolling_quantile_by (reference expr.rb:4848); median_by = q 0.5 linear
    * (the reference's rolling_median_by delegates the same way). The per-row
    * sorted collect is bounded by the rows inside one temporal window. */
  def rollingQuantileBy(by: Expr, quantile: Double, windowSize: String,
                        interpolation: String = "nearest", minPeriods: Int = 1,
                        closed: String = "right"): Expr =
    rollingByScanned(by, windowSize, closed)((v, w) => {
      val sorted = F.sort_array(F.collect_list(v).over(w))
      F.when(F.count(v).over(w) >= math.max(minPeriods, 1),
        Expr.quantileOfSorted(sorted, quantile, interpolation))
    })(v => {
      val sorted = F.sort_array(F.collect_list(v))
      F.when(F.count(v) >= math.max(minPeriods, 1),
        Expr.quantileOfSorted(sorted, quantile, interpolation))
    })
  def rollingMedianBy(by: Expr, windowSize: String, minPeriods: Int = 1,
                      closed: String = "right"): Expr =
    rollingQuantileBy(by, 0.5, windowSize, "linear", minPeriods, closed)

  /** rolling_quantile_by (reference expr.rb:4848): quantile over a caller-
    * supplied WindowSpec — the range-frame formulation used for temporal
    * `_by` windows (`Window.partitionBy(keys).orderBy(unix_micros(ts))
    * .rangeBetween(-duration, 0)`). */
  def rollingQuantileOver(q: Double, w: WindowSpec,
                          interpolation: String = "nearest"): Expr = {
    val sorted = F.sort_array(F.collect_list(col).over(w))
    // a window holding only nulls collects an empty array → null result, not
    // an element_at error
    Expr(F.when(F.size(sorted) >= 1, Expr.quantileOfSorted(sorted, q, interpolation)),
      requiresIndex, preps)
  }
  /** rolling_skew (reference expr.rb:5567): windowed skewness. Spark's
    * skewness aggregate is the biased g1 = m3/m2^1.5; bias: false applies the
    * sample correction sqrt(n(n-1))/(n-2), null under 3 points. */
  def rollingSkew(n: Int, bias: Boolean = true, minPeriods: Int = 0): Expr = {
    val mp = if (minPeriods <= 0) n else minPeriods // polars: full window
    rollingScanned(n)((v, w) => {
      val cnt = F.count(v).over(w)
      val g1 = F.skewness(v).over(w)
      val value =
        if (bias) g1
        else {
          val m = cnt.cast("double")
          F.when(m > 2, g1 * F.sqrt(m * (m - 1)) / (m - 2))
        }
      F.when(cnt >= mp, value)
    })
  }

  /** Run-length-encoding id: increments when the value changes, over implicit
    * row order (reference: expr.rb:2674 `rle_id`). One shifted (marker, value)
    * struct distinguishes "no previous row" from "previous value null", then a
    * running sum of change flags — both distributed scan stages. */
  def rleId: Expr = {
    val prev = Scan.fresh("x")
    val prevPrep = Prep(prev,
      d => Scan.shifted(d, F.struct(F.lit(1).as("m"), col.as("x")), 1, prev),
      Seq(prev, Scan.BUCKET))
    val changed = F.when(F.col(prev).isNull, 0L)
      .when(!(col <=> F.col(prev).getField("x")), 1L).otherwise(0L)
    val out = Scan.fresh("x")
    Expr(F.col(out), requiresIndex = true,
      preps ++ Seq(prevPrep,
        Prep(out, d => Scan.running(d, changed, out, F.sum, "sum"), Seq(out, Scan.BUCKET))),
      keyed = Some(KeyedForm { keys =>
        val in = keyedInput("rle_id", keys)
        // windows can't nest, so the keyed lag materializes through a prep
        // and the running sum windows over the helper
        val w = keyedIdxW(keys)
        val kPrev = Scan.fresh("x")
        val kPrep = Prep(kPrev, d => d.withColumn(kPrev,
          F.lag(F.struct(F.lit(1).as("m"), in.col.as("x")), 1).over(w)), Seq(kPrev))
        val kChanged = F.when(F.col(kPrev).isNull, 0L)
          .when(!(in.col <=> F.col(kPrev).getField("x")), 1L).otherwise(0L)
        Expr(F.sum(kChanged).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          requiresIndex = true, in.preps :+ kPrep)
      }))
  }
  /** Local maxima mask (reference: expr.rb:2376 `peak_max`). */
  def peakMax: Expr = peak(F.lit(Double.NegativeInfinity), _ > _)
  def peakMin: Expr = peak(F.lit(Double.PositiveInfinity), _ < _)
  private def peak(bound: Column, cmp: (Column, Column) => Column): Expr = {
    val (p, nx) = (shift(1), shift(-1))
    Expr(cmp(col, F.coalesce(p.col, bound)) && cmp(col, F.coalesce(nx.col, bound)),
      requiresIndex = true, mergePreps(mergePreps(preps, p.preps), nx.preps))
  }

  // ---- misc (reference: expr.rb §2.8 tail) ----
  def hash(seed: Long = 0): Expr = map(c => F.xxhash64(F.lit(seed), c))
  def repeatBy(n: Expr): Expr = zip(n)((c, k) => F.array_repeat(c, k.cast("int")))
  def coalesceWith(others: Expr*): Expr =
    Expr(F.coalesce((col +: others.map(_.col)): _*),
      requiresIndex || others.exists(_.requiresIndex), mergedWith(others: _*))
  /** Map distinct old→new values (reference expr.rb:6915 `replace`). */
  def replaceValues(mapping: Map[Any, Any]): Expr = map { c =>
    mapping.foldLeft(F.when(F.lit(false), F.lit(null))) { case (acc, (k, v)) =>
      acc.when(c === F.lit(k), F.lit(v))
    }.otherwise(c)
  }
  /** replace_strict (reference expr.rb:7010): every value must be mapped;
    * unmapped values take `default` when given, otherwise error at runtime
    * (the reference raises InvalidOperationError). */
  def replaceStrict(mapping: Map[Any, Any], default: Option[Any] = None): Expr = map { c =>
    val tail = default match {
      case Some(e: Expr) => e.col // default may be column-valued (data_frame_test.rb test_replace)
      case Some(d) => F.lit(d)
      case None => F.raise_error(F.concat(
        F.lit("replace_strict: value not mapped: "), c.cast("string")))
    }
    mapping.foldLeft(F.when(F.lit(false), F.lit(null))) { case (acc, (k, v)) =>
      acc.when(c === F.lit(k), F.lit(v))
    }.otherwise(tail)
  }
  /** cut into buckets by break points (reference expr.rb:2530). Default
    * labels use polars' break formatting — `(-inf, -1]`, integral breaks
    * without the `.0`. `includeBreaks` switches the output to the struct
    * polars documents: {breakpoint: f64 right endpoint, category: label} —
    * unnest it for the breakpoint/category column pair. */
  def cut(breaks: Seq[Double], labels: Option[Seq[String]] = None,
          leftClosed: Boolean = false, includeBreaks: Boolean = false): Expr = map { c =>
    val lbls = labels.getOrElse {
      val pts = Double.NegativeInfinity +: breaks :+ Double.PositiveInfinity
      pts.sliding(2).map { case Seq(a, b) =>
        if (leftClosed) s"[${Expr.fmtBreak(a)}, ${Expr.fmtBreak(b)})"
        else s"(${Expr.fmtBreak(a)}, ${Expr.fmtBreak(b)}]" }.toSeq
    }
    def below(b: Double) = if (leftClosed) c < b else c <= b
    def pick(vals: Seq[Any]): Column = {
      // null propagates (polars elementwise contract) — without the guard a
      // null value's all-null comparisons would fall through to `otherwise`
      // and land in the LAST bucket
      val first = F.when(c.isNull, F.lit(null)).when(below(breaks.head), vals.head)
      val mid = breaks.indices.drop(1).foldLeft(first) { (acc, i) =>
        acc.when(below(breaks(i)), vals(i))
      }
      mid.otherwise(vals.last)
    }
    if (!includeBreaks) pick(lbls)
    else F.struct(
      pick(breaks :+ Double.PositiveInfinity).cast("double").as("breakpoint"),
      pick(lbls).as("category"))
  }

  /** qcut: quantile-based buckets (reference expr.rb:2611). The min-rank
    * bucket rule `percent_rank(v) <= q` is exactly `v <= value at 0-based
    * rank floor(q*(n-1))` (percent rank of v is cntLt(v)/(n-1); the value at
    * that rank is the largest v whose strict-below count fits), so the cut
    * values resolve ONCE via histogram-refinement selection
    * ([[graft.kernel.Quantiles]] — 2-3 narrow scans, kilobyte shuffles) and
    * the labeling pass is a pure broadcast-literal projection — no
    * data-sized rank join. Values whose double image would collapse
    * (integers beyond 2^53) fall back to the exact percent-rank path. */
  /** Uniform-probability form (reference expr.rb:2611 `qcut(2, ...)`):
    * k equal-probability buckets = cutting at 1/k, 2/k, …, (k-1)/k. */
  def qcut(k: Int, labels: Seq[String]): Expr =
    qcut((1 until k).map(_.toDouble / k), Some(labels))
  def qcut(k: Int, labels: Option[Seq[String]], leftClosed: Boolean,
           allowDuplicates: Boolean, includeBreaks: Boolean): Expr =
    qcut((1 until k).map(_.toDouble / k), labels, leftClosed, allowDuplicates, includeBreaks)
  def qcut(quantiles: Seq[Double], labels: Seq[String]): Expr =
    qcut(quantiles, Some(labels))
  def qcut(quantiles: Seq[Double], labels: Option[Seq[String]] = None,
           leftClosed: Boolean = false, allowDuplicates: Boolean = false,
           includeBreaks: Boolean = false): Expr = {
    labels.foreach(ls => require(ls.size == quantiles.size + 1,
      s"qcut: ${quantiles.size + 1} labels required, got ${ls.size}"))
    require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"qcut: quantiles must lie in [0, 1], got ${quantiles.mkString(", ")}")
    val pr = Scan.fresh("x")
    val prep = Prep(pr, { d =>
      val vk = Scan.fresh("v")
      val dd = d.withColumn(vk, col.cast("double"))
      val stats = graft.kernel.Quantiles.orderStats(dd.select(F.col(vk)),
        Seq(graft.kernel.Quantiles.Req(vk, n =>
          quantiles.map(q => math.floor(q * (n - 1)).toLong))))(vk)
      val n = stats.nonNull
      // the double image must be COLLAPSE-FREE for cut literals to bucket
      // exactly: float/double always are; int32-and-below always are;
      // long/decimal(scale 0) are iff the domain sits strictly inside
      // +/-2^53 (at the bound two neighbours already share a double);
      // decimals up to 15 significant digits round-trip uniquely; wider
      // decimals can collapse at ANY magnitude (e.g. decimal(38,18) ulps)
      val safe = (1L << 53).toDouble
      val boundsInsideSafe =
        stats.finiteLo.forall(math.abs(_) < safe) &&
          stats.finiteHi.forall(math.abs(_) < safe)
      val lossy = d.select(col).schema.head.dataType match {
        case org.apache.spark.sql.types.LongType => !boundsInsideSafe
        case t: org.apache.spark.sql.types.DecimalType =>
          if (t.scale == 0) !boundsInsideSafe else t.precision > 15
        case _ => false
      }
      if (n == 0) dd.drop(vk).withColumn(pr, F.lit(null).cast(
        if (includeBreaks) "struct<breakpoint:double,category:string>" else "string"))
      else if (lossy) {
        // keep the rank-based spelling (exact at any dtype); cut VALUES are
        // unreliable in this domain, so only explicit labels are supported
        require(labels.isDefined && !includeBreaks,
          "qcut: values outside the exact double domain (int64 beyond 2^53, wide " +
            "decimals) support only explicit labels without include_breaks")
        val ls = labels.get
        val prr = Scan.fresh("r")
        val ranked = Scan.withPercentRank(dd.drop(vk), col, prr)
        def below(q: Double) =
          if (leftClosed) F.col(prr) < q else F.col(prr) <= q
        val first = F.when(F.col(prr).isNull, F.lit(null))
          .when(below(quantiles.head), ls.head)
        val mid = quantiles.indices.drop(1).foldLeft(first)((acc, i) =>
          acc.when(below(quantiles(i)), ls(i)))
        ranked.withColumn(pr, mid.otherwise(ls.last)).drop(prr)
      } else {
        // NaN domains stay on this path. Spark comparison semantics treat
        // NaN as GREATER than every value (and NaN == NaN): a finite v
        // satisfies v <= NaN, so a NaN cut (quantile landing in the NaN
        // region) sends every finite value to that bucket — exactly the
        // percent-rank rule (all finite pr's sit below the NaN region);
        // NaN values fail v <= finite-cut and fall through to the right
        // later bucket. (Do NOT port this chain to IEEE semantics where
        // v <= NaN is false — the buckets would invert.)
        val ranks = quantiles.map(q => math.floor(q * (n - 1)).toLong)
        val cutsAll = ranks.map(stats.at)
        // duplicate quantile VALUES merge their buckets (polars
        // allow_duplicates; without it polars raises DuplicateError)
        val cuts = cutsAll.distinct
        if (!allowDuplicates && cuts.size != cutsAll.size)
          throw new IllegalArgumentException(
            "qcut: duplicate quantile values (polars DuplicateError) — pass " +
              "allowDuplicates = true to merge the duplicate buckets")
        val lbls = labels.map { ls =>
          // polars validates labels against the FINAL bin count, so when
          // allow_duplicates merges buckets an explicit label list raises
          // ShapeError — truncating the tail would silently relabel the
          // bucket ending at a later cut with an earlier label
          require(ls.size == cuts.size + 1,
            s"qcut: ${cuts.size + 1} labels required after duplicate " +
              s"quantile values merged buckets, got ${ls.size} " +
              "(polars ShapeError)")
          ls
        }.getOrElse {
          val pts = Double.NegativeInfinity +: cuts :+ Double.PositiveInfinity
          pts.sliding(2).map { case Seq(a, b) =>
            if (leftClosed) s"[${Expr.fmtBreak(a)}, ${Expr.fmtBreak(b)})"
            else s"(${Expr.fmtBreak(a)}, ${Expr.fmtBreak(b)}]" }.toSeq
        }
        def below(cut: Double) =
          if (leftClosed) F.col(vk) < cut else F.col(vk) <= cut
        def pick(vals: Seq[Any]): Column = {
          val first = F.when(F.col(vk).isNull, F.lit(null))
            .when(below(cuts.head), vals.head)
          cuts.indices.drop(1).foldLeft(first)((acc, i) =>
            acc.when(below(cuts(i)), vals(i))).otherwise(vals.last)
        }
        val out =
          if (!includeBreaks) pick(lbls)
          else F.struct(
            pick(cuts :+ Double.PositiveInfinity).cast("double").as("breakpoint"),
            pick(lbls).as("category"))
        dd.withColumn(pr, out).drop(vk)
      }
    }, Seq(pr))
    // the prep emits the FINISHED value (label or {breakpoint, category}
    // struct) — cut values are data-dependent, so the default break labels
    // can only be built inside the prep where the quantiles are known
    Expr(meta.outputName.fold(F.col(pr))(nm => F.col(pr).as(nm)),
      requiresIndex, preps :+ prep)
  }
  /** Insertion index keeping sorted order = count of smaller elements
    * (reference expr.rb:1500 search_sorted; side "any" — the reference
    * default — may return any valid index, so left is a legal answer).
    * Nulls sort FIRST (polars: null is smallest) and count toward every
    * insertion index. Aggregation context. */
  def searchSorted(v: Any, side: String = "any"): Expr = {
    require(Set("any", "left", "right")(side),
      s"search_sorted: side must be any|left|right, got '$side'")
    aggMap { c =>
      val cmp = if (side == "right") c <= F.lit(v) else c < F.lit(v)
      F.coalesce(F.sum(F.when(c.isNull, 1L).when(cmp, 1L)), F.lit(0L))
    }
  }
  /** Row indices of each group's members (reference expr.rb:701 agg_groups). */
  def aggGroups: Expr = {
    // polars names the output after the SOURCE column (expr.rb agg_groups
    // golden) — the spelling itself references only the hidden row index
    val base = Expr(
      F.sort_array(F.collect_list(F.col(graft.kernel.RowIndex.name))),
      requiresIndex = true, preps)
    meta.outputName.fold(base)(base.alias)
  }
  /** Expanding-window aggregate (reference expr.rb:6684 cumulative_eval).
    * `kind` names how per-bucket partials of `agg` merge across the
    * distributed scan (sum|min|max|product; counts merge as sum) — any
    * aggregate with a decomposable merge runs fully distributed; compose
    * several scans for derived forms (expanding mean = scan(sum)/scan(count),
    * see Queries4.qCumulativeEval). A non-decomposable kind has no
    * distributed expanding spelling and is deliberately not offered: the
    * round-9 arbitrary-aggregate overload planned Window.orderBy(idx) over
    * the whole frame — all data through one task — and was removed. */
  def cumulativeEval(agg: Column => Column, kind: String): Expr =
    scanned((d, out) => Scan.running(d, col, out, agg, kind)).copy(keyed =
      Some(KeyedForm { keys =>
        val in = keyedInput("cumulative_eval", keys)
        val w = keyedIdxW(keys).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Expr(agg(in.col).over(w), requiresIndex = true, in.preps)
      }))
  // ---- ewm_mean/std/var (reference expr.rb:6381-6444): the EWM kernel
  //      (keyless: distributed affine-carry composition; keyed: streaming
  //      per-group recursion) routed through the prep machinery so the Expr
  //      spelling composes with select/with_columns and `.over(keys)` ----
  def ewmMean(com: Option[Double] = None, span: Option[Double] = None,
              halfLife: Option[Double] = None, alpha: Option[Double] = None,
              adjust: Boolean = true, minPeriods: Int = 1,
              ignoreNulls: Boolean = true): Expr =
    ewmExpr("mean", com, span, halfLife, alpha, adjust, minPeriods, ignoreNulls)
  def ewmStd(com: Option[Double] = None, span: Option[Double] = None,
             halfLife: Option[Double] = None, alpha: Option[Double] = None,
             adjust: Boolean = true, minPeriods: Int = 1,
             ignoreNulls: Boolean = true): Expr =
    ewmExpr("std", com, span, halfLife, alpha, adjust, minPeriods, ignoreNulls)
  def ewmVar(com: Option[Double] = None, span: Option[Double] = None,
             halfLife: Option[Double] = None, alpha: Option[Double] = None,
             adjust: Boolean = true, minPeriods: Int = 1,
             ignoreNulls: Boolean = true): Expr =
    ewmExpr("var", com, span, halfLife, alpha, adjust, minPeriods, ignoreNulls)
  private def ewmExpr(out: String, com: Option[Double], span: Option[Double],
                      halfLife: Option[Double], alpha: Option[Double],
                      adjust: Boolean, minPeriods: Int,
                      ignoreNulls: Boolean): Expr = {
    val a = graft.kernel.Ewm.alphaFrom(com, span, halfLife, alpha)
    // each spelling gets its OWN output/prep key: the global and every
    // keyed invocation must not collide (preps dedupe by key, so a shared
    // name would silently serve the first-built result to both)
    def kernelPrep(res: String, inputCol: Column, by: Seq[String]): Prep = {
      val in = Scan.fresh("x")
      Prep(res, d => graft.kernel.Ewm.ewm(
          d.withColumn(in, inputCol), in, graft.kernel.RowIndex.name, by,
          a, adjust, minPeriods, Seq(out), ignoreNulls)
        .withColumnRenamed(s"${in}_ewm_$out", res).drop(in), Seq(res))
    }
    def global(inputCol: Column, inPreps: Seq[Prep]): Expr = {
      val res = Scan.fresh("x")
      Expr(F.col(res), requiresIndex = true, inPreps :+ kernelPrep(res, inputCol, Nil))
    }
    global(col, preps).copy(keyed = Some(KeyedForm { keys =>
      val in = keyedInput("ewm_" + out, keys)
      if (keys.isEmpty) global(in.col, in.preps) // over() with no keys = keyless kernel
      else {
        // the kernel takes by-COLUMN NAMES: materialize each key expression
        // into a helper column first (keys may be arbitrary expressions)
        val res = Scan.fresh("x")
        val keyNames = keys.map(_ => Scan.fresh("k"))
        val keyPrep = Prep(keyNames.head,
          d => keys.zip(keyNames).foldLeft(d) { case (dd, (k, n)) =>
            dd.withColumn(n, k)
          }, keyNames)
        Expr(F.col(res), requiresIndex = true,
          in.preps ++ Seq(keyPrep, kernelPrep(res, in.col, keyNames)))
      }
    }))
  }
  /** Weighted rolling sum: collect the frame window + HOF dot product with
    * literal weights (reference expr.rb rolling weights:). */
  def rollingSumWeighted(weights: Seq[Double], minPeriods: Int = 1): Expr = {
    val n = weights.size
    rollingScanned(n)((v, w) => {
      val vals = F.collect_list(v).over(w)
      val wArr = F.array(weights.map(F.lit): _*)
      val dot = F.aggregate(
        F.zip_with(vals, F.slice(wArr, F.lit(1), F.size(vals)), (x, wt) => x * wt),
        F.lit(0.0), (acc, x) => acc + x)
      F.when(F.size(vals) >= math.max(minPeriods, n), dot)
    })
  }
  /** Dtype min/max literals (reference expr.rb:5942 lower_bound/upper_bound). */
  // polars lower/upper_bound are UNIT series (expr.rb:5930 golden renders
  // shape (1,1)) — spelled as an aggregate over the literal so a bare
  // select returns one row, not a per-row broadcast
  def lowerBound(dt: DataType): Expr = Expr(F.first(F.lit(dt match {
    case org.apache.spark.sql.types.LongType => Long.MinValue
    case org.apache.spark.sql.types.IntegerType => Int.MinValue
    case org.apache.spark.sql.types.ShortType => Short.MinValue
    case org.apache.spark.sql.types.ByteType => Byte.MinValue
    case org.apache.spark.sql.types.DoubleType => Double.NegativeInfinity
    case org.apache.spark.sql.types.FloatType => Float.NegativeInfinity
  })))
  def upperBound(dt: DataType): Expr = Expr(F.first(F.lit(dt match {
    case org.apache.spark.sql.types.LongType => Long.MaxValue
    case org.apache.spark.sql.types.IntegerType => Int.MaxValue
    case org.apache.spark.sql.types.ShortType => Short.MaxValue
    case org.apache.spark.sql.types.ByteType => Byte.MaxValue
    case org.apache.spark.sql.types.DoubleType => Double.PositiveInfinity
    case org.apache.spark.sql.types.FloatType => Float.PositiveInfinity
  })))

  // ---- reference-name spellings (expr.rb named operators & arc-trig) ----
  // polars exposes both operator and named forms; named forms matter for
  // fold/reduce-style call sites that pass methods by name.
  def add(o: Expr): Expr = this + o
  def add(v: Any): Expr = this + Expr.lit(v)
  def sub(o: Expr): Expr = this - o
  def mul(o: Expr): Expr = this * o
  def truediv(o: Expr): Expr = this / o
  def mod(o: Expr): Expr = this % o
  def neg: Expr = map(c => -c)
  def eq(o: Expr): Expr = this === o
  def ne(o: Expr): Expr = this !== o
  def gt(o: Expr): Expr = this > o
  def ge(o: Expr): Expr = this >= o
  def lt(o: Expr): Expr = this < o
  def le(o: Expr): Expr = this <= o
  def arcsin: Expr = asin
  def arccos: Expr = acos
  def arctan: Expr = atan
  def arcsinh: Expr = asinh
  def arccosh: Expr = acosh
  def arctanh: Expr = atanh
  def isNot: Expr = not                  // deprecated reference alias of NOT
  def isUnique: Expr = isUniqueMask
  def isFirst: Expr = isFirstDistinct    // deprecated alias (expr.rb is_first)
  def isLast: Expr = isLastDistinct
  /** `variance` under the reference's short name is not expressible —
    * `var` is a Scala keyword; use [[variance]]. */
  def varSamp(ddof: Int = 1): Expr = variance(ddof)
  /** Explode a list column to rows (reference expr.rb explode/flatten —
    * flatten is its documented alias). Changes cardinality: valid in a
    * select over list columns, same as Spark's explode. */
  def explode: Expr = flatten
  /** explode/flatten: length-changing Generate in select; inside
    * group_by().agg it CONCATENATES the group's lists into one
    * (reference expr.rb:2858 flatten golden) — collect_list over the
    * agg path's partition-sorted groups keeps row order. A NULL list
    * contributes one null ELEMENT (polars' explode emits a null row for
    * it; bare collect_list would drop the entry), so null lists coalesce
    * to a one-null array first — Catalyst coerces array(null) to the
    * list's element type. */
  def flatten: Expr = Expr(F.explode(col), requiresIndex, preps, None,
    Some(GroupAggForm(KeyedForm(_ => Expr(col, requiresIndex, preps)),
      c => F.flatten(F.collect_list(F.coalesce(c, F.array(F.lit(null))))),
      orderSensitive = true)))
  def keepName: Expr = name.keep
  def mapAlias(f: String => String): Expr =
    meta.outputName.fold(this)(n => alias(f(n)))
  def prefix(p: String): Expr = mapAlias(p + _)
  def suffix(s: String): Expr = mapAlias(_ + s)

  // ---- namespaces ----
  def str: StrNS = new StrNS(this)
  def dt: DtNS = new DtNS(this)
  def list: ListNS = new ListNS(this)
  def arr: ListNS = new ListNS(this) // fixed-width arrays share ArrayType ops
  def bin: BinNS = new BinNS(this)
  def cat: CatNS = new CatNS(this)
  def struct: StructNS = new StructNS(this)
  def name: NameNS = new NameNS(this)
  def meta: MetaNS = new MetaNS(this)
  /** polars default output naming (select/agg without an explicit alias):
    * the left-most referenced column's name; "literal" for pure literals.
    * Star/regex selectors pass through untouched — aliasing them would
    * collapse the expansion. A caller's .alias re-applies on top. */
  private[graft] def defaultNamed: Expr = {
    val m = meta
    // star / regex selectors expand to MANY columns — aliasing would
    // collapse the expansion (and F.col("*") is an UnresolvedStar node, so
    // outputName is None: it must be checked before the literal fallback)
    if (m.hasMultipleOutputs || m.isRegexProjection) this
    else m.outputName match {
      case Some(n) if n != "*" && !n.startsWith("^") => alias(n)
      case None => alias("literal")
      case _ => this
    }
  }
}

object Expr {
  def lit(v: Any): Expr = v match {
    case e: Expr   => e
    case c: Column => Expr(c)
    case x         => Expr(F.lit(x))
  }
  /** Order-preserving union of two preparation lists (dedup by key). */
  private[graft] def mergePreps(a: Seq[Prep], b: Seq[Prep]): Seq[Prep] =
    (a ++ b).distinctBy(_.key)
  /** polars break-label formatting: inf spelled `inf`, integral breaks
    * without the `.0` (expr.rb:2530 cut golden: `(-inf, -1]`). */
  private[expr] def fmtBreak(d: Double): String =
    if (d.isNegInfinity) "-inf"
    else if (d.isPosInfinity) "inf"
    else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** NaN→null on float/double, identity otherwise (see [[graft.ext.NanToNull]]). */
  private[graft] def nanSkipped(c: Column): Column =
    org.apache.spark.sql.GraftInternalOps.column(
      graft.ext.NanToNull(org.apache.spark.sql.GraftInternalOps.expression(c)))
  /** Boolean→int pass-through for polars' numeric bool aggregation
    * (see [[graft.ext.BoolToInt]]); identity on every other dtype. */
  private[graft] def boolAsInt(c: Column): Column =
    org.apache.spark.sql.GraftInternalOps.column(
      graft.ext.BoolToInt(org.apache.spark.sql.GraftInternalOps.expression(c)))
  /** Selector expansion at bind time (polars expands `all`/`^regex$`
    * selectors per matching column BEFORE evaluating the op chain —
    * expr.rb:365, functions/lazy.rb:928): returns one expr per matching
    * schema column with the selector leaf tree-substituted, or None when
    * the expr carries no selector. Top-level alias names containing the
    * selector token substitute too, so `all.sum.suffix("_s")` comes out
    * `A_s`/`B_s`. Only PREP-FREE exprs expand — a scan prep's closure
    * captures the unexpanded column, so those raise a directed error
    * telling the caller to expand explicitly. */
  private[graft] def expandSelector(e: Expr, schemaCols: Seq[String],
                                    excludeCols: Seq[String] = Nil): Option[Seq[Expr]] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}
    val G = org.apache.spark.sql.GraftInternalOps
    val tree = G.catalystExpression(e.col)
    var selector: Option[String] = None
    tree.foreach {
      case a: UnresolvedAttribute
          if a.name == "*" || (a.name.startsWith("^") && a.name.endsWith("$")) =>
        selector = selector.orElse(Some(a.name))
      case _: UnresolvedStar => selector = selector.orElse(Some("*"))
      case _ =>
    }
    selector.map { sel =>
      // a bare column projection (select(all)) needs no op rewrite and is
      // prep-free by construction; anything op-chained with preps cannot
      // retarget its prep closures
      require(e.preps.isEmpty,
        s"selector '$sel' under an order-dependent op cannot expand at bind " +
          "time (the op already captured the selector); expand explicitly — " +
          "df.columns.map(c => col(c).<op>)")
      val re = if (sel == "*") None else Some(sel.r)
      val targets = schemaCols
        .filter(c => re.fold(true)(r => r.findFirstIn(c).isDefined))
        .filterNot(excludeCols.contains)
      targets.map { c =>
        val substituted = tree.transformUp {
          case a: UnresolvedAttribute
              if a.name == sel || (sel == "*" && a.name == "*") =>
            UnresolvedAttribute.quoted(c)
          case _: UnresolvedStar if sel == "*" => UnresolvedAttribute.quoted(c)
        }
        val renamed = substituted.transformUp {
          case al: Alias if al.name.contains(sel) =>
            Alias(al.child, al.name.replace(sel, c))()
        }
        Expr(G.column(renamed), e.requiresIndex)
      }
    }
  }

  /** Sorted per-group list with polars null placement (expr.rb:1310 agg
    * golden): collect through structs so nulls survive collect_list, split
    * nulls out, sort the values, and re-attach nulls on the requested end.
    * Direction-independent null-first default matches polars. */
  private[graft] def sortedListAgg(c: Column, descending: Boolean,
                                   nullsLast: Boolean): Column = {
    val xs = F.transform(F.collect_list(F.struct(c.as("x"))), s => s.getField("x"))
    val nulls = F.filter(xs, x => x.isNull)
    val vals = F.sort_array(F.filter(xs, x => x.isNotNull))
    val core = if (descending) F.reverse(vals) else vals
    if (nullsLast) F.concat(core, nulls) else F.concat(nulls, core)
  }
  /** Dtype-preserving product aggregate (see [[graft.ext.GraftProduct]]). */
  private[graft] def productAgg(c: Column): Column =
    org.apache.spark.sql.GraftInternalOps.column(
      graft.ext.GraftProduct(org.apache.spark.sql.GraftInternalOps.expression(c))
        .toAggregateExpression())
  /** Window a possibly-composite aggregate column over `w`: bare aggregates
    * window whole; composites (coalesce-wrapped sums, std(ddof:)) window
    * each embedded aggregate; aggregate-free columns window whole. */
  private[graft] def windowed(c: Column, w: WindowSpec): Column =
    org.apache.spark.sql.GraftInternalOps
      .windowCompositeAggregates(c, w).getOrElse(c.over(w))
  /** A pure-literal expression (foldable catalyst tree, no preps). The
    * alias is stripped first: an aliased literal converts to an
    * UnresolvedAlias whose `foldable` throws pre-analysis. */
  private[graft] def isConstant(e: Expr): Boolean =
    e.preps.isEmpty && e.keyed.isEmpty && e.groupAgg.isEmpty &&
      (try org.apache.spark.sql.GraftInternalOps.catalystExpression(
         org.apache.spark.sql.GraftInternalOps.stripAlias(e.col)).foldable
       catch { case scala.util.control.NonFatal(_) => false })
  /** polars' implicit-implode eligibility: an aggregate-free, non-constant
    * elementwise expression in an agg position (`agg(col("v") * 2)`)
    * evaluates per group in row order and returns a LIST per group, while
    * constants broadcast as scalars. ONE shared predicate — GroupBy.agg,
    * the rolling fixed/index spelling, and the calendar directed error all
    * consult it, so a change to the rule cannot silently diverge per path. */
  private[graft] def isImplicitImplode(e: Expr): Boolean =
    e.preps.isEmpty && e.keyed.isEmpty && e.groupAgg.isEmpty &&
      !isConstant(e) &&
      org.apache.spark.sql.GraftInternalOps.provablyAggregateFree(e.col)
  /** Quantile of an already-sorted array column with polars' interpolation
    * modes (shared by the rolling-quantile family). */
  private[expr] def quantileOfSorted(sorted: Column, q: Double,
                                     interpolation: String): Column = {
    val h = F.lit(q) * (F.size(sorted) - 1).cast("double")
    val lo = F.element_at(sorted, F.floor(h).cast("int") + 1)
    val hi = F.element_at(sorted, F.ceil(h).cast("int") + 1)
    interpolation match {
      case "linear"   => lo + (hi - lo) * (h - F.floor(h))
      case "lower"    => lo
      case "higher"   => hi
      case "midpoint" => (lo + hi) / 2.0
      case "nearest"  => F.when(h - F.floor(h) >= 0.5, hi).otherwise(lo) // half rounds AWAY from zero (polars)
    }
  }
  /** Rescale a sample std/var to an arbitrary ddof (Polars allows ddof 0..n). */
  private[graft] def ddofScale(sampStat: Column, n: Column, ddof: Int, isStd: Boolean): Column =
    if (ddof == 1) sampStat
    else {
      val varSamp = if (isStd) sampStat * sampStat else sampStat
      val rescaled = varSamp * (n - 1).cast("double") / (n - ddof).cast("double")
      if (isStd) F.sqrt(rescaled) else rescaled
    }
}
