package graft.api

import org.apache.spark.sql.{Column, functions => F, DataFrame => SDF}
import org.apache.spark.sql.expressions.Window
import graft.expr.Expr
import graft.kernel.{DurationDsl, RowIndex, Scan}

/** group_by surface (reference: lib/polars/group_by.rb, lazy_group_by.rb).
  * Thin declarative layer over `RelationalGroupedDataset` — Catalyst supplies
  * partial (map-side) aggregation automatically, so nothing imperative here.
  */
final class GroupBy[Self](sdf: SDF, keys: Seq[Column], mk0: SDF => Self,
                          maintainOrder: Boolean = false) {

  /** polars group_by(maintain_order: true): groups come out in first-
    * appearance row order. Implemented as a generic post-step so every agg
    * path (shortcuts, plain aggs, keyed forms) gets it: one extra
    * (keys -> min row-idx) aggregate null-safe-joined back, sort, drop —
    * the "more expensive than a default group by" cost the reference
    * documents. */
  private def ordered(out: SDF): SDF = {
    if (!maintainOrder) return out
    // alias name, else the column-leaf name for plain cols (rootAliasName is
    // None for those); genuinely unnamed expression keys are rejected —
    // Column.toString is not a reliable output-column name to join back on
    val keyNames = keys.map(k =>
      org.apache.spark.sql.GraftInternalOps.rootAliasName(k)
        .orElse(Option(graft.expr.Expr(k)).filter(_.meta.isColumn).flatMap(_.meta.outputName))
        .getOrElse(throw new IllegalArgumentException(
          "group_by(maintain_order): keys must be named columns or aliased expressions")))
    val ord = "__graft_grp_ord__"
    val d = RowIndex.attach(sdf)
    // rename the order-frame's keys BEFORE joining: both sides descend from
    // the same source relation, so a drop-by-column-reference after the join
    // resolves ambiguously (it removed the LEFT key in testing)
    val firstIdx0 = d.groupBy(keys: _*)
      .agg(F.min(F.col(RowIndex.name)).as(ord))
    val firstIdx = keyNames.foldLeft(firstIdx0)((f, n) =>
      f.withColumnRenamed(n, s"__graft_k_$n"))
    val cond = keyNames.map(n => out(n) <=> firstIdx(s"__graft_k_$n")).reduce(_ && _)
    out.join(firstIdx, cond, "left")
      .drop(keyNames.map(n => s"__graft_k_$n"): _*)
      .orderBy(F.col(ord)).drop(ord)
  }
  private val mk: SDF => Self = d => mk0(ordered(d))

  def agg(exprs00: Expr*): Self = {
    require(exprs00.nonEmpty)
    // polars selector semantics in agg: `all`/`^regex$` expand per
    // NON-KEY column (agg(Polars.all.sum) sums every other column —
    // guide_test.rb quickstart)
    val aggKeyNames = keys.flatMap(k =>
      org.apache.spark.sql.GraftInternalOps.rootAliasName(k))
    val exprs0 = exprs00.flatMap(e =>
      Expr.expandSelector(e,
        sdf.columns.toSeq.filterNot(_ == graft.kernel.RowIndex.name),
        excludeCols = aggKeyNames).getOrElse(Seq(e)))
    // polars' implicit implode: an aggregate-free elementwise expression in
    // agg (`agg(col("v"))`, `agg(col("v") * 2)`) evaluates per group in row
    // order and returns a LIST per group. Spelled as an identity keyed form
    // so the per-group branch's ordered null-preserving struct-collect
    // applies (collect_list would drop nulls and shuffle order). Constants
    // stay scalars (polars broadcasts a literal per group).
    val exprs = exprs0.map { e0 =>
      // classify on the raw expr (an Alias would mask Literal-constant
      // detection), materialize under the polars default name
      val e = e0.defaultNamed
      if (Expr.isImplicitImplode(e0))
        e.copy(keyed = Some(graft.expr.KeyedForm(_ => Expr(e.col, e.requiresIndex))))
      else e
    }
    // Order-dependent exprs (shift/cum_*/fill/rank/rolling/... without
    // `over`) follow polars' agg semantics: evaluated PER GROUP in row
    // order, returning a LIST per group (reference group_by.rb agg docs) —
    // and an AGGREGATE on top of one (shift(1).sum) evaluates op-then-
    // aggregate per group, a scalar. The KeyedForm/GroupAggForm supply the
    // per-key spellings; the windowed column materializes pre-aggregation.
    // Exprs that still carry raw scan preps (a scanned op wrapped by a
    // construct with no per-group spelling, e.g. inside when/then branches
    // or horizontal aggs) cannot be evaluated per group and are rejected —
    // the global scan would silently compute the wrong scope.
    require(exprs.forall(e => e.keyed.isDefined || e.groupAgg.isDefined || e.preps.isEmpty),
      "group_by().agg: an order-dependent op is wrapped in a construct with no " +
        "per-group spelling (e.g. a when/then branch or horizontal agg); " +
        "materialize the op per key first with with_column(op.over(keys)) and " +
        "aggregate the new column")
    val perGroup = exprs.zipWithIndex
      .filter { case (e, _) => e.keyed.isDefined || e.groupAgg.isDefined }
    // polars raises DuplicateError on colliding output names (group keys
    // lead the output frame, so an agg output named like a key collides
    // too); un-aliased plain aggregates materialize under Spark's own
    // sum(v)/avg(v) names and never collide this way
    val keyNames = keys.map(k =>
      org.apache.spark.sql.GraftInternalOps.rootAliasName(k).getOrElse(k.toString))
    def requireDistinctNames(names: Seq[String]): Unit = {
      val clash = names.diff(names.distinct).distinct ++
        names.intersect(keyNames).distinct
      require(clash.isEmpty,
        s"group_by().agg: duplicate output column names ${clash.mkString(", ")} — " +
          "alias the expressions distinctly")
    }
    if (perGroup.isEmpty) {
      requireDistinctNames(exprs.flatMap(e =>
        org.apache.spark.sql.GraftInternalOps.rootAliasName(e.col)))
      // order-sensitive aggs (agg_groups, implode in row order) reference the
      // dense row index — attach it when any expression asks for it
      val base0 = if (exprs.exists(_.requiresIndex)) RowIndex.attachDense(sdf) else sdf
      mk(base0.groupBy(keys: _*).agg(exprs.head.col, exprs.tail.map(_.col): _*))
    } else {
      // resolve every keyed form FIRST: whether the frame needs the hidden
      // row index depends on what the forms reference
      val kes = perGroup.map { case (e, i) =>
        val ke =
          try e.groupAgg.map(_.keyed).getOrElse(e.keyed.get).mk(keys)
          catch {
            // keyed forms raise with .over(keys)-oriented wording; re-frame
            // for the agg surface the user actually touched
            case ex: UnsupportedOperationException =>
              throw new UnsupportedOperationException(
                s"group_by().agg: this expression cannot be spelled per group — ${ex.getMessage}")
          }
        (e, i, ke)
      }
      // ROW-ORDER-dependent forms (shift/cum/implode — ke.requiresIndex, or
      // a per-group LIST collection, which sorts by the index, or an
      // order-sensitive group aggregate like flatten's list concatenation —
      // groupAgg.orderSensitive): attach the dense index, hash-partition by
      // the keys, and sort by (keys, row-idx) so every group lands whole in
      // one partition in row order — the scalar branch's order-sensitive
      // aggregates iterate partition order and the final aggregation needs
      // no further exchange. Plain (non-per-group) exprs that reference the
      // row index themselves (implode/gather/agg_groups of a bare column)
      // must also force the attach — their columns would otherwise fail to
      // resolve. VALUE-ordered forms only (the element-mode quantiles rank
      // by (keys, value)): skip the index entirely — attachDense
      // materializes the scan as an un-prunable RDD and its row-order sort
      // is dead work when every window imposes its own ordering; the
      // windows' ENSURE_REQUIREMENTS exchange (AQE-coalescible) partitions
      // by the keys on its own.
      val perGroupIdx = perGroup.map(_._2).toSet
      val plainNeedsIdx = exprs.zipWithIndex.exists { case (e, i) =>
        !perGroupIdx(i) && e.requiresIndex
      }
      val needsIdx = plainNeedsIdx || kes.exists { case (e, _, ke) =>
        ke.requiresIndex || e.groupAgg.isEmpty || e.groupAgg.exists(_.orderSensitive)
      }
      var d =
        if (needsIdx)
          RowIndex.attachDense(sdf).repartition(keys: _*)
            .sortWithinPartitions(keys :+ F.col(RowIndex.name): _*)
        else sdf
      // helper columns batch into ONE projection after all preps: several
      // per-group exprs sharing a window spec (the 4 element-mode quantiles
      // of q_quantile_modes rank by the same (keys, value) order) then plan
      // ONE Window node per distinct spec via CollapseWindow — the previous
      // sequential withColumn chain interleaved a Project between every
      // Window pair, blocking the merge and re-sorting per expression
      val helperCols = Seq.newBuilder[Column]
      val tmp = kes.map { case (e, i, ke) =>
        d = ke.preps.distinctBy(_.key).foldLeft(d)((dd, p) => p.build(dd))
        val name = s"__graft_agg${i}__"
        helperCols += org.apache.spark.sql.GraftInternalOps.stripAlias(ke.col).as(name)
        // output name: a user alias on an aggregate-of-scanned is composed
        // into the agg closure (possibly under later casts), so probe the
        // composed aggregate for the FIRST alias anywhere in its tree; fall
        // back to the inner op's source column name
        val out = e.groupAgg
          .flatMap(g => org.apache.spark.sql.GraftInternalOps.firstAliasName(g.full(F.col(name))))
          .filterNot(_.startsWith("__graft_"))
          .orElse(ke.meta.outputName)
          .getOrElse(s"column_$i")
        i -> (name, out)
      }.toMap
      d = d.select(F.col("*") +: helperCols.result(): _*)
      // polars raises DuplicateError on colliding output names. Per-group
      // names are checked against each other AND against explicitly-aliased
      // plain aggregates (un-aliased plain aggs materialize under Spark's
      // own sum(v)/avg(v) names and never collide this way)
      val pgNames = tmp.values.map(_._2).toSeq
      val plainAliased = exprs.zipWithIndex
        .filterNot { case (_, i) => tmp.contains(i) }
        .flatMap { case (e, _) => org.apache.spark.sql.GraftInternalOps.rootAliasName(e.col) }
      requireDistinctNames(pgNames ++ plainAliased)
      val aggCols = exprs.zipWithIndex.map { case (e, i) =>
        tmp.get(i) match {
          case Some((helper, out)) =>
            e.groupAgg match {
              case Some(g) =>
                org.apache.spark.sql.GraftInternalOps.stripAlias(g.full(F.col(helper))).as(out)
              case None =>
                // collect in row order: unique idx makes the struct sort total
                F.transform(
                  F.array_sort(F.collect_list(
                    F.struct(F.col(RowIndex.name).as("i"), F.col(helper).as("x")))),
                  s => s.getField("x")).as(out)
            }
          case None => e.col
        }
      }
      mk(d.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*))
    }
  }

  private def aggAll(f: Column => Column, suffix: String = "",
                     boolAsInt: Boolean = false, base: SDF = sdf): Self = {
    val keyNames = keys.map(_.toString).toSet
    val others = sdf.columns.filterNot(c => keyNames.contains(c) || c == RowIndex.name)
    val aggs = others.map { c =>
      val col0 = F.col(c)
      // polars numericizes booleans under sum/mean/median (fraction true);
      // Spark's avg/sum reject BooleanType outright
      val col =
        if (boolAsInt && sdf.schema(c).dataType ==
          org.apache.spark.sql.types.BooleanType) col0.cast("int")
        else col0
      f(col).as(c + suffix)
    }
    mk(base.groupBy(keys: _*).agg(aggs.head, aggs.tail.toIndexedSeq: _*))
  }
  /** first/last pick the ROW-ORDER first/last value per group (min_by /
    * max_by on the hidden row index) — a bare F.first over a hash aggregate
    * is whatever partition order the shuffle produced, which only looks
    * right single-partition. */
  private def pickByIndex(firstRow: Boolean): Self = {
    val d = RowIndex.attach(sdf)
    aggAll(c => if (firstRow) F.min_by(c, F.col(RowIndex.name))
                else F.max_by(c, F.col(RowIndex.name)), base = d)
  }
  def first(): Self = pickByIndex(firstRow = true)
  def last(): Self = pickByIndex(firstRow = false)
  // the Expr spellings, so the shortcuts share Expr.sum/min/max semantics:
  // all-null groups sum to 0 (expr.rb:2713) and NaN is skipped by extrema
  // unless the group is all-NaN (advisor r12)
  def sum(): Self = aggAll(c => F.coalesce(F.sum(c), F.lit(0)), boolAsInt = true)
  def min(): Self = aggAll(c => F.coalesce(F.min(Expr.nanSkipped(c)), F.min(c)))
  def max(): Self = aggAll(c => F.coalesce(F.max(Expr.nanSkipped(c)), F.max(c)))
  def mean(): Self = aggAll(F.avg, boolAsInt = true)
  def median(): Self = aggAll(c => F.median(c), boolAsInt = true)
  def nUnique(): Self = aggAll(c => F.countDistinct(c))
  /** reference group_by.rb:571: quantile(q, interpolation: "nearest")
    * delegates to agg(all.quantile(...)) — the Expr route, so element
    * modes get the scale-safe two-pass rank selection, not a per-group
    * buffer. (The previous spelling was `percentile` = linear, a silent
    * interpolation divergence from the reference default.) */
  def quantile(q: Double, interpolation: String = "nearest"): Self = {
    val keyNames = keys.map(_.toString).toSet
    val others = sdf.columns.filterNot(c => keyNames.contains(c) || c == RowIndex.name)
    agg(others.toIndexedSeq.map(c =>
      graft.expr.Expr(F.col(c)).quantile(q, interpolation).alias(c)): _*)
  }
  def count(): Self = mk(sdf.groupBy(keys: _*).agg(F.count(F.lit(1)).as("count")))
  def len(): Self = count()

  /** head/tail per group (reference: group_by.rb:254,305) —
    * `row_number over (partition by keys order by row-idx) <= n`. */
  def head(n: Int): Self = slicePerGroup(n, fromStart = true)
  def tail(n: Int): Self = slicePerGroup(n, fromStart = false)
  /** head/tail emit MULTIPLE rows per group, so maintain_order must sort by
    * the per-ROW index directly — the generic ordered() post-step keys on
    * the group's single first-appearance index, which ties within a group
    * and would return its rows in arbitrary relative order. */
  private def slicePerGroup(n: Int, fromStart: Boolean): Self = {
    val d = RowIndex.attach(sdf)
    val ord = if (fromStart) F.col(RowIndex.name).asc else F.col(RowIndex.name).desc
    val w = Window.partitionBy(keys: _*).orderBy(ord)
    val kept = d.withColumn("__rn__", F.row_number().over(w))
      .filter(F.col("__rn__") <= n).drop("__rn__")
    mk0(if (maintainOrder) kept.orderBy(F.col(RowIndex.name)).drop(RowIndex.name)
        else kept.drop(RowIndex.name))
  }
}

/** Frame-level rolling(index_column:, period:, offset:, closed:) — each
  * row's aggregate over its time window (reference: lazy_frame.rb:1161-1181,
  * rolling_group_by.rb). The window is `(t+offset, t+offset+period]` with
  * polars' defaults offset = -period, closed = "right" (endpoint
  * inclusivity per `closed`). Range-frame window over µs epoch: one shuffle
  * on the by-keys, no self-join; open endpoints shift the inclusive Spark
  * range bound by 1 µs (epoch µs is integral, so this is exact).
  *
  * KEYLESS rolling is also distributed: with bucket width P >= the
  * window's farthest backward/forward reach, a probe row's window can only
  * touch the adjacent buckets, so each bucket's rows ride into the next
  * (and, for forward-reaching offsets, previous) bucket as flagged phantom
  * rows and the range window runs per bucket: one balanced hash shuffle on
  * the time-bucket, <= 3x row volume, never a global single-partition
  * sort. Same phantom-carry shape as [[graft.kernel.Scan.rollingApply]],
  * bucketed by time instead of rows. */
object RollingGroupBy {
  /** True when the expression's root (alias-stripped) is a bare `count`
    * aggregate — empty-window value 0, not null. */
  private[api] def rootIsCount(e: Expr): Boolean = rootFn(e) == Some("count")
  /** True when the root is graft's polars-sum spelling `coalesce(sum(x), …)`
    * — the sum identity must survive an empty window the same way count's 0
    * does (expr.rb:2713: polars sums an empty slice to 0). */
  private[api] def rootIsSum(e: Expr): Boolean = {
    // casts are transparent: DecimalDiscipline.decSum spells
    // cast(coalesce(sum(cast(x)))) and must keep the empty-window identity
    // the bare coalesce(sum(x)) spelling gets (advisor r12)
    def stripCasts(x: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = x match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast => stripCasts(c.child)
      case other => other
    }
    stripCasts(org.apache.spark.sql.GraftInternalOps.catalystExpression(
      org.apache.spark.sql.GraftInternalOps.stripAlias(e.col))) match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("coalesce") =>
        f.arguments.headOption.exists {
          case g: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
            g.nameParts.map(_.toLowerCase) == Seq("sum")
          case c: org.apache.spark.sql.catalyst.expressions.Cast =>
            stripCasts(c) match {
              case g: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
                g.nameParts.map(_.toLowerCase) == Seq("sum")
              case _ => false
            }
          case _ => false
        }
      case _ => false
    }
  }
  private def rootFn(e: Expr): Option[String] =
    org.apache.spark.sql.GraftInternalOps.catalystExpression(
      org.apache.spark.sql.GraftInternalOps.stripAlias(e.col)) match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        Some(f.nameParts.map(_.toLowerCase).mkString("."))
      case _ => None
    }
}

final class RollingGroupBy[Self](sdf: SDF, indexColumn: String, period: String,
                                 by: Seq[String], mk: SDF => Self,
                                 offset: Option[String] = None,
                                 closed: String = "right") {
  /** polars shape: rolling().agg returns ONLY index + by + aggregates
    * (reference lazy_frame.rb:1152 golden — the other input columns are
    * dropped). The full-frame form lives on as [[aggKeep]]. */
  def agg(exprs: (String, Expr)*): Self = {
    val keep = ((indexColumn +: by) ++ exprs.map(_._1)).distinct
    mk(aggSdf(exprs).select(keep.map(F.col): _*))
  }
  /** Extended form: every input column survives next to the rolling
    * aggregates (withColumn semantics) — beyond the reference, used where a
    * per-row id must ride along with per-row windows. */
  def aggKeep(exprs: (String, Expr)*): Self = mk(aggSdf(exprs))

  private def aggSdf(exprs: Seq[(String, Expr)]): SDF = {
    val d = DurationDsl.parse(period)
    require(d.months > 0 || (d.months == 0 && (d.totalNanos > 0 || d.indexCount > 0)),
      s"rolling: period must be positive, got '$period'")
    require(Set("left", "right", "both", "none")(closed),
      s"rolling: closed must be left|right|both|none, got '$closed'")
    if (d.isCalendar) return aggCalendar(d, exprs)
    // fixed/index windows evaluate aggs as range-frame window functions —
    // overlapping frames have no per-window evaluation point for kernel ops
    // (ewm, cum_*, shift, rank), so a composed chain raises a DIRECTED error
    // rather than an unresolved-prep-column analysis exception. Calendar
    // periods DO evaluate such chains (explicit window enumeration +
    // GroupBy delegation).
    exprs.foreach { case (n, e) =>
      require(e.preps.isEmpty,
        s"rolling().agg: '$n' composes a kernel op (ewm/cum/shift/rank) " +
          "inside a fixed-duration window — range frames cannot evaluate it " +
          "per window; materialize the op first with with_columns and " +
          "aggregate the materialized column, or use a calendar period " +
          "(per-window evaluation)")
    }
    // "Ni" periods roll over an INTEGER index column (reference
    // lazy_frame.rb:1103-1106): window units are the index values themselves
    val isIndex = d.indexCount != 0
    if (isIndex) require(d.weeks == 0 && d.days == 0 && d.nanos == 0,
      "rolling: a period mixing index counts ('Ni') with time units is not valid")
    val p = if (isIndex) d.indexCount else d.totalMicros
    val off = offset.map { o =>
      val od = DurationDsl.parse(o)
      require(!od.isCalendar, "rolling: calendar offset requires a calendar period")
      if (isIndex) {
        require(od.totalNanos == 0,
          "rolling: offset must use index counts ('Ni') with an index period")
        od.indexCount
      } else {
        require(od.indexCount == 0,
          "rolling: offset must use time units with a temporal period")
        od.totalMicros
      }
    }.getOrElse(-p)
    // window = (t+off, t+off+p] adjusted per `closed`; Spark range frames
    // are inclusive on both bounds
    val loIncl = if (closed == "left" || closed == "both") off else off + 1
    val hiIncl = if (closed == "right" || closed == "both") off + p else off + p - 1
    // 'Ni' periods require a genuinely integral index — a silent cast would
    // turn a timestamp into epoch seconds (plausible-looking nonsense) or a
    // string into null (every row in the null peer group)
    if (isIndex) require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(sdf.schema(indexColumn).dataType),
      s"rolling: an index-count period ('Ni') requires an integer index column; " +
        s"'$indexColumn' is ${sdf.schema(indexColumn).dataType.simpleString}")
    val epoch =
      if (isIndex) F.col(indexColumn).cast("long")
      else F.unix_micros(F.col(indexColumn).cast("timestamp"))
    // polars' implicit implode inside rolling windows: an aggregate-free
    // elementwise expr collects to a per-window LIST in index order —
    // null-preserving struct-collect sorted by (epoch, value); rows tied on
    // the index value order by value (polars' rolling contract wants a
    // sorted, effectively unique index — exact ties are outside it)
    def spelling(e: Expr): org.apache.spark.sql.expressions.WindowSpec => Column =
      if (Expr.isImplicitImplode(e))
        w => F.transform(
          F.array_sort(F.collect_list(
            F.struct(epoch.as("o"), e.col.as("x"))).over(w)),
          s => s.getField("x"))
      else w => org.apache.spark.sql.GraftInternalOps
        // composite aggregates (std(ddof:), coalesce-wrapped sums) window
        // each embedded aggregate over the rolling frame; bare columns and
        // plain aggregates window whole, as before
        .windowCompositeAggregates(e.col, w).getOrElse(e.col.over(w))
    if (by.nonEmpty) {
      val w = Window.partitionBy(by.map(F.col): _*).orderBy(epoch)
        .rangeBetween(loIncl, hiIncl)
      // fresh names first, rename at the end: every agg must see the
      // ORIGINAL columns — a sequential withColumn would let an agg named
      // after an existing column shadow it for the aggs that follow
      val fresh = exprs.map { case (n, e) => (n, e, Scan.fresh("ro")) }
      val built = fresh.foldLeft(sdf) { case (acc, (_, e, fn)) =>
        acc.withColumn(fn, spelling(e)(w)) }
      fresh.foldLeft(built) { case (acc, (n, _, fn)) =>
        acc.withColumn(n, F.col(fn)).drop(fn) }
    } else {
      // keyless: the shared time-bucket phantom-carry kernel (null-epoch
      // rows get no phantom copy and keep their null peer-group frame —
      // documented at the kernel)
      graft.kernel.Scan.rollingByApplyMulti(sdf, epoch, loIncl, hiIncl,
        exprs.map { case (n, e) => n -> spelling(e) })
    }
  }

  /** Calendar-month trailing windows (`1mo`/`1q`/`1y` — reference duration
    * DSL lazy_frame.rb:1198-1219, rolling docs lazy_frame.rb:1161-1181).
    * Month lengths vary, so a fixed-offset range frame cannot express
    * `[t - 1mo, t]`; this is the distributed range-join shape instead:
    *
    *   - bucket rows by `floor(months_since_epoch / m)` — a window start
    *     `t - m months` keeps its month arithmetic exact (day clamping
    *     preserves the month), so it ALWAYS lands in bucket b-1; each probe
    *     row explodes into join buckets {b-1, b} and equi-joins candidate
    *     rows (plus the by-keys), with the µs range check as the join
    *     residual;
    *   - aggregate per probe row id (the aggregate exprs see the original
    *     column names on the candidate side), restoring the probe's own
    *     columns via first() — no join-back pass.
    *
    * Two balanced shuffles (bucket join, row-id aggregate), 2× probe-side
    * row volume, no data-sized single partition. Null index values drop
    * (polars' rolling contract requires a sorted non-null index column). */
  private def aggCalendar(d: graft.kernel.Duration, exprs: Seq[(String, Expr)]): SDF = {
    import graft.kernel.Scan
    require(d.isPureCalendar,
      "rolling: calendar periods must be pure month multiples (mo/q/y); " +
        "mixed calendar+fixed durations (e.g. 1mo2d) are not supported")
    require(offset.forall(o => DurationDsl.parse(o).months == -d.months &&
        DurationDsl.parse(o).isPureCalendar),
      "rolling: calendar periods support only the default offset (-period)")
    // implicit implode is spelled on the fixed/index paths only; the
    // calendar bucket-join aggregates per probe group with no window frame
    // to collect over — raise the directed error instead of Spark's opaque
    // "not an aggregate"
    exprs.foreach { case (n, e) =>
      require(!Expr.isImplicitImplode(e),
        s"rolling(calendar).agg: '$n' is an elementwise expression; per-window " +
          "lists are not supported with calendar periods — aggregate it " +
          "(e.g. .implode) or use a fixed-duration period")
      // order-dependent ops WITHOUT an aggregate on top (cum_sum, shift)
      // would produce per-window lists — same refusal as implicit implode;
      // aggregates OF such ops (shift(1).sum, ewm_mean().last) compute via
      // the GroupBy delegation below
      require(e.groupAgg.isDefined || e.preps.isEmpty,
        s"rolling(calendar).agg: '$n' is an order-dependent op with no " +
          "aggregate on top (a per-window list) — not supported with " +
          "calendar periods; aggregate it (e.g. .last, .sum) or use a " +
          "fixed-duration period")
    }
    val m = d.months
    // Join-back discipline (same as Scan.rollingByCalendar): per-probe
    // results re-attach by a synthesized row id when the layout makes ids
    // branch-stable (narrow scan-rooted plans — GraftInternalOps
    // .idStableLayout), the cheap common path; otherwise the window being a
    // pure function of (index value, by-keys) lets results compute per
    // DISTINCT probe key and join back on DATA-DERIVED columns only — an
    // id-keyed join-back over a shuffled/nondeterministic layout silently
    // misaligns (round-robin scatter orders by the pruned binary row;
    // reduce-fetch interleaving varies per execution).
    val idStable = org.apache.spark.sql.GraftInternalOps.idStableLayout(sdf)
    def monthCols(ep: Column): (Column, Column) = {
      val t = F.timestamp_micros(ep)
      val mse = ((F.year(t) - 1970) * 12 + F.month(t) - 1).cast("long")
      (F.floor(mse.cast("double") / m).cast("long"),
        F.unix_micros(t - F.expr(s"INTERVAL '$m' MONTH")))
    }
    val ep = F.unix_micros(F.col(indexColumn).cast("timestamp"))
    val jb = Scan.fresh("jb"); val ri = Scan.fresh("ri")
    val base = if (idStable) sdf.withColumn(ri, F.monotonically_increasing_id())
      else sdf
    val (ptb, plo) = monthCols(F.col("__p_ep__"))
    val probeKeys: Seq[String] =
      if (idStable) Seq("__p_ri__") else "__p_ep__" +: by.map("__p_" + _)
    val probes0 = base.select(((if (idStable) Seq(F.col(ri).as("__p_ri__")) else Nil) ++
      Seq(ep.as("__p_ep__")) ++ by.map(b => F.col(b).as("__p_" + b))).toIndexedSeq: _*)
    val probes = (if (idStable) probes0 else probes0.distinct())
      .withColumn("__p_lo__", plo)
      .withColumn(jb, F.explode(F.array(ptb - 1, ptb)))
    val (ctb, _) = monthCols(F.col("__c_ep__"))
    // the hidden index is attached to the CANDIDATE side before the join:
    // frame order = index order under rolling's sorted-index contract, so
    // the per-group sort inside the GroupBy delegation below restores the
    // time order the join shuffle destroys (the probe side never carries it
    // — probes0 selects only __p_* columns, so the join output is unambiguous)
    val right = graft.kernel.RowIndex.attachDense(sdf)
      .withColumn("__c_ep__", ep).withColumn("__c_tb__", ctb)
    // null-safe by-key equality: a null key is its own group (the fixed
    // path's Window.partitionBy groups nulls as a partition; a plain ===
    // would silently drop every null-key row from the output)
    // endpoint inclusivity per `closed`: window (t-period, t] by default
    val loCmp =
      if (closed == "left" || closed == "both") F.col("__c_ep__") >= F.col("__p_lo__")
      else F.col("__c_ep__") > F.col("__p_lo__")
    val hiCmp =
      if (closed == "right" || closed == "both") F.col("__c_ep__") <= F.col("__p_ep__")
      else F.col("__c_ep__") < F.col("__p_ep__")
    val cond = by.map(b => F.col("__p_" + b) <=> F.col(b))
      .foldLeft(F.col(jb) === F.col("__c_tb__") && loCmp && hiCmp)(_ && _)
    // agg outputs carry FRESH names through the join, then overwrite their
    // user-facing names in place — a user agg named after an existing column
    // must replace it (the fixed path's withColumn semantics), not produce
    // an ambiguous duplicate. The fresh prefix must NOT be __graft_ — the
    // GroupBy alias probe skips __graft_-prefixed aliases as internal.
    val freshOut = exprs.zipWithIndex.map { case ((n, e), i) => (n, e, s"__cal_o${i}__") }
    // aggregation delegates to the full GroupBy machinery over the joined
    // candidate rows (the same delegation group_by_dynamic uses), so
    // aggregates OF order-dependent/kernel ops (shift(1).sum, an ewm
    // chain's .last) evaluate per window in index order — the candidate
    // side's pre-join hidden index witnesses that order
    val perProbe = new GroupBy[SDF](probes.join(right, cond),
      probeKeys.map(F.col), identity)
      .agg(freshOut.map { case (_, e, fn) => e.alias(fn) }: _*)
    // LEFT join: a closed mode that excludes t itself can make a probe's
    // window empty — the row must survive (its aggregates are null); <=> so
    // null-index / null-key rows re-attach
    val joinBase = if (idStable) base else base.withColumn("__b_ep__", ep)
    val back =
      if (idStable) joinBase(ri) === perProbe("__p_ri__")
      else by.map(b => joinBase(b) <=> perProbe("__p_" + b))
        .foldLeft(joinBase("__b_ep__") <=> perProbe("__p_ep__"))(_ && _)
    val joined = joinBase.join(perProbe, back, "left")
    val renamed = freshOut.foldLeft(joined) { case (acc, (n, e, fn)) =>
      // an empty window's count is 0, not null — parity with the fixed
      // path's count().over(range frame) (other aggregates stay null over
      // an empty window in both paths). Null-INDEX rows stay null across
      // all aggregates: the calendar kernel's documented out-of-contract
      // behavior (polars requires a non-null sorted index; the fixed path
      // instead groups null-epoch rows as peers — divergence documented)
      // count AND sum carry an identity through empty windows (count 0L,
      // sum 0 coerced to the sum's own type — polars sum identity)
      val v = if (RollingGroupBy.rootIsCount(e))
          F.when(F.col(indexColumn).isNotNull, F.coalesce(F.col(fn), F.lit(0L)))
            .otherwise(F.col(fn))
        else if (RollingGroupBy.rootIsSum(e))
          F.when(F.col(indexColumn).isNotNull, F.coalesce(F.col(fn), F.lit(0)))
            .otherwise(F.col(fn))
        else F.col(fn)
      acc.withColumn(n, v).drop(fn)
    }
    renamed.drop(probeKeys: _*).drop("__b_ep__", ri)
  }
}

/** group_by_dynamic (reference: lazy_frame.rb:1416-1459, dynamic_group_by.rb).
  * `every` = stride, `period` = window length (defaults to every), `offset`
  * shifts bucket origins. Spark's `window()` yields the same multi-membership
  * sliding semantics; `_lower/_upper_boundary` come from the window struct.
  */
final class DynamicGroupBy[Self](sdf: SDF, indexColumn: String, every: String,
                                 period: Option[String], offset: Option[String],
                                 by: Seq[String], mk: SDF => Self,
                                 includeBoundaries: Boolean = false,
                                 label: String = "left",
                                 closed: String = "left",
                                 startBy: String = "window") {
  private val weekdayShiftDays = Map(
    // 1970-01-01 is a Thursday; shift the epoch origin to the named weekday
    "monday" -> 4L, "tuesday" -> 5L, "wednesday" -> 6L, "thursday" -> 0L,
    "friday" -> 1L, "saturday" -> 2L, "sunday" -> 3L)

  def agg(exprs: Expr*): Self = {
    val everyD = DurationDsl.parse(every)
    val periodD = period.map(DurationDsl.parse).getOrElse(everyD)
    def positive(d: graft.kernel.Duration) =
      d.months > 0 || (d.months == 0 && (d.totalNanos > 0 || d.indexCount > 0))
    require(positive(everyD) && positive(periodD),
      "group_by_dynamic: every/period must be positive")
    require(Set("left", "right", "datapoint")(label),
      s"group_by_dynamic: label must be left|right|datapoint, got '$label'")
    require(Set("left", "right", "both", "none")(closed),
      s"group_by_dynamic: closed must be left|right|both|none, got '$closed'")
    require(startBy == "window" || startBy == "datapoint" ||
        weekdayShiftDays.contains(startBy),
      s"group_by_dynamic: start_by must be window|datapoint|<weekday>, got '$startBy'")
    if (everyD.isCalendar || periodD.isCalendar) {
      require(startBy == "window",
        "group_by_dynamic: calendar every/period supports only start_by: \"window\"; " +
          "for datapoint/weekday origins use fixed durations or truncate-based bucketing")
      return aggCalendar(everyD, periodD, exprs)
    }
    if (everyD.indexCount != 0 || periodD.indexCount != 0) {
      // integer index column, "Ni" windows (reference lazy_frame.rb:1390-1414
      // example: idx 0..5, every "2i", period "3i") — the index values ARE
      // the window units; labels/boundaries stay integers
      def idx(d: graft.kernel.Duration, what: String): Long = {
        require(d.indexCount > 0 && d.months == 0 && d.weeks == 0 &&
            d.days == 0 && d.nanos == 0,
          s"group_by_dynamic: $what must be a pure positive index count " +
            "('Ni') when any duration uses index notation")
        d.indexCount
      }
      require(startBy == "window" || startBy == "datapoint",
        "group_by_dynamic: weekday start_by has no meaning for an integer index column")
      require(Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(sdf.schema(indexColumn).dataType),
        s"group_by_dynamic: index-count windows ('Ni') require an integer index " +
          s"column; '$indexColumn' is ${sdf.schema(indexColumn).dataType.simpleString}")
      val offI = offset.map { o =>
        val d = DurationDsl.parse(o)
        require(d.months == 0 && d.weeks == 0 && d.days == 0 && d.nanos == 0,
          "group_by_dynamic: offset must be a pure index count ('Ni') when " +
            "any duration uses index notation")
        d.indexCount
      }.getOrElse(0L)
      return aggFixed(exprs, idx(everyD, "every"), idx(periodD, "period"), offI,
        weekdayOriginUnit = 0L, t0 = F.col(indexColumn).cast("long"),
        emit = identity)
    }
    val offU = offset.map { o =>
      val d = DurationDsl.parse(o)
      require(d.indexCount == 0,
        "group_by_dynamic: an index-count offset ('Ni') requires index-count " +
          "every/period on an integer index column")
      d.totalMicros
    }.getOrElse(0L)
    aggFixed(exprs, everyD.totalMicros, periodD.totalMicros, offU,
      weekdayOriginUnit = 86400000000L,
      t0 = F.unix_micros(F.col(indexColumn).cast("timestamp")),
      emit = F.timestamp_micros)
  }

  /** Explicit candidate-start explode (the same multi-membership shape
    * F.window compiles to) so `closed` endpoint inclusivity and `start_by`
    * origins are first-class: each row's latest aligned start is
    * t - pmod(t - origin, every) (integer-exact, negative-safe); its
    * nWin+1 trailing candidates filter on the closed-mode predicate (the
    * +1 covers right/both-closed rows sitting exactly on a window end).
    * Unit-generic: µs for temporal index columns (emit = timestamp_micros),
    * raw longs for integer index columns (emit = identity). */
  private def aggFixed(exprs: Seq[Expr], everyU: Long, periodU: Long, offU: Long,
                       weekdayOriginUnit: Long, t0: Column,
                       emit: Column => Column): Self = {
    val og = Scan.fresh("og")
    // datapoint/weekday origins anchor on the FIRST DATA POINT — per
    // by-group when keys are given (polars computes dynamic windows per
    // group): keyless = a broadcast one-row scalar; keyed = a per-group min
    // joined back null-safely (a null by-key is its own group). The weekday
    // origin then snaps that first point back to the named weekday
    // (reference lazy_frame.rb start_by docs: "the Monday before the first
    // data point") — for every = 1w this coincides with the epoch-anchored
    // weekday grid, but longer strides need the datapoint anchor.
    val needsAnchor = startBy == "datapoint" || weekdayShiftDays.contains(startBy)
    val base =
      if (!needsAnchor) sdf
      else if (by.isEmpty) sdf.crossJoin(F.broadcast(sdf.agg(F.min(t0).as(og))))
      else {
        // attach the dense row index BEFORE the anchor join: a sort-merge
        // plan for the join would otherwise reorder rows, and the
        // order-dependent agg delegation downstream collects per-window
        // lists in hidden-index order — the index must witness the
        // pre-join (sorted-index contract) order, not the join's
        val idxed = graft.kernel.RowIndex.attachDense(sdf)
        val mins = sdf.groupBy(by.map(F.col): _*).agg(F.min(t0).as(og))
          .select((F.col(og) +: by.map(b => F.col(b).as(s"__og_$b"))).toIndexedSeq: _*)
        val cond = by.map(b => idxed(b) <=> mins(s"__og_$b")).reduce(_ && _)
        idxed.join(mins, cond).drop(by.map(b => s"__og_$b"): _*)
      }
    val origin: Column = (startBy match {
      case "window"    => F.lit(0L)
      case "datapoint" => F.col(og)
      case wd =>
        val snap = F.lit(weekdayShiftDays(wd) * weekdayOriginUnit)
        F.col(og) - F.pmod(F.col(og) - snap, F.lit(7L * weekdayOriginUnit))
    }) + F.lit(offU)
    val t = t0
    val nWin = ((periodU + everyU - 1) / everyU).toInt
    val ws = Scan.fresh("ws")
    val s0 = t - F.pmod(t - origin, F.lit(everyU))
    val s = F.col(ws); val e = F.col(ws) + periodU
    val member = closed match {
      case "left"  => t >= s && t < e
      case "right" => t > s && t <= e
      case "both"  => t >= s && t <= e
      case "none"  => t > s && t < e
    }
    val exploded = base
      .withColumn(ws, F.explode(F.sequence(
        s0 - nWin.toLong * everyU, s0, F.lit(everyU))))
      .filter(member)
    val groupCols = F.col(ws) +: by.map(F.col)
    // label="datapoint" names each group by its first data point (min of
    // the index values that actually fell in the window). Aggregation
    // delegates to the full GroupBy machinery over the exploded frame, so
    // order-dependent exprs (cum_sum -> per-window lists, shift(1).sum ->
    // per-window scalars) and polars' implicit implode work inside dynamic
    // windows exactly as in plain group_by — within-window row order is the
    // frame's hidden order, which group_by_dynamic's sorted-index contract
    // makes time order.
    val dpAgg = if (label == "datapoint")
      Seq(Expr(F.min(F.col(indexColumn)).as("__dp__"))) else Nil
    val out0 = new GroupBy[SDF](exploded, groupCols, identity)
      .agg(exprs ++ dpAgg: _*)
    val labeled = label match {
      case "left"      => out0.withColumn(indexColumn, emit(F.col(ws)))
      case "right"     => out0.withColumn(indexColumn, emit(F.col(ws) + periodU))
      case "datapoint" => out0.withColumn(indexColumn, F.col("__dp__"))
    }
    val out = (if (includeBoundaries)
        labeled.withColumn("_lower_boundary", emit(F.col(ws)))
          .withColumn("_upper_boundary", emit(F.col(ws) + periodU))
      else labeled).drop(ws, "__dp__", og)
    val lead = (by :+ indexColumn).map(F.col)
    mk(out.select((lead ++ out.columns.filterNot((by :+ indexColumn).contains).map(F.col)).toIndexedSeq: _*))
  }

  /** Calendar windows (`1mo`/`1q`/`1y` — reference duration DSL
    * lazy_frame.rb:1198-1219, group_by_dynamic docs lazy_frame.rb:1416-1459).
    * `F.window` needs fixed-length durations, so calendar buckets run on
    * months-since-epoch arithmetic instead (the same bucket expression as
    * dt.truncate): each row's latest epoch-aligned window start is
    * `floor((mse - offset) / every) * every + offset`; sliding membership
    * (period > every) explodes each row into its ceil(period/every)
    * candidate starts and keeps those with `ts < month_start(start+period)`
    * — the multi-membership shape `F.window` uses, spelled in month space.
    * One balanced shuffle on (window-start, by), identical to the fixed
    * path; boundaries convert back to timestamps post-aggregation. */
  private def aggCalendar(everyD: graft.kernel.Duration, periodD: graft.kernel.Duration,
                          exprs: Seq[Expr]): Self = {
    import graft.kernel.Scan
    require(everyD.isPureCalendar && periodD.isPureCalendar,
      "group_by_dynamic: calendar every/period must both be pure month " +
        "multiples (mo/q/y); mixed calendar+fixed durations are not supported")
    val offM = offset.map { o =>
      val d = DurationDsl.parse(o)
      require(d.isPureCalendar || (d.months == 0 && d.weeks == 0 && d.days == 0 && d.nanos == 0),
        "group_by_dynamic: offset with calendar windows must be a pure month multiple")
      d.months
    }.getOrElse(0L)
    val everyM = everyD.months
    val periodM = periodD.months
    val c = F.col(indexColumn).cast("timestamp")
    val mse = ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("long")
    val start0 = F.floor((mse - offM).cast("double") / everyM).cast("long") * everyM + offM
    val nWin = ((periodM + everyM - 1) / everyM).toInt
    def monthTs(mc: Column): Column =
      F.to_timestamp(F.make_date(
        (F.lit(1970) + F.floor(mc.cast("double") / 12)).cast("int"),
        F.pmod(mc, F.lit(12L)).cast("int") + 1, F.lit(1)))
    val ws = Scan.fresh("ws")
    // candidate starts ascend to start0, with ONE extra trailing candidate
    // below (right/both-closed membership can pull a row sitting exactly on
    // a window START back into the previous window — same +1 the fixed
    // path's explode carries); endpoint inclusivity per `closed`, both
    // bounds explicit (the by-construction `ts >= month_start(s)` only
    // covers the left-closed case)
    val sTs = monthTs(F.col(ws))
    val eTs = monthTs(F.col(ws) + periodM)
    val member = closed match {
      case "left"  => c >= sTs && c < eTs
      case "right" => c > sTs && c <= eTs
      case "both"  => c >= sTs && c <= eTs
      case "none"  => c > sTs && c < eTs
    }
    val exploded = sdf
      .withColumn(ws, F.explode(F.sequence(
        start0 - nWin.toLong * everyM, start0, F.lit(everyM))))
      .filter(member)
    val groupCols = F.col(ws) +: by.map(F.col)
    // same GroupBy delegation as the fixed path: order-dependent exprs and
    // implicit implode compose inside calendar windows too
    val dpAgg = if (label == "datapoint")
      Seq(Expr(F.min(F.col(indexColumn)).as("__dp__"))) else Nil
    val out0 = new GroupBy[SDF](exploded, groupCols, identity)
      .agg(exprs ++ dpAgg: _*)
    val labeled = label match {
      case "left"      => out0.withColumn(indexColumn, monthTs(F.col(ws)))
      case "right"     => out0.withColumn(indexColumn, monthTs(F.col(ws) + periodM))
      case "datapoint" => out0.withColumn(indexColumn, F.col("__dp__"))
    }
    val out = (if (includeBoundaries)
        labeled.withColumn("_lower_boundary", monthTs(F.col(ws)))
          .withColumn("_upper_boundary", monthTs(F.col(ws) + periodM))
      else labeled).drop(ws, "__dp__")
    val lead = (by :+ indexColumn).map(F.col)
    mk(out.select((lead ++ out.columns.filterNot((by :+ indexColumn).contains).map(F.col)).toIndexedSeq: _*))
  }
}
