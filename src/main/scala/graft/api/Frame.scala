package graft.api

import org.apache.spark.sql.{Column, SparkSession, functions => F, DataFrame => SDF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType
import graft.expr.Expr
import graft.kernel.RowIndex

/** polars null placement for sorts: nulls FIRST by default in BOTH
  * directions, last only when nulls_last — shared by Frame.sortBy,
  * Series.sort, and Series.argSort so the three surfaces cannot diverge. */
private[api] object SortKey {
  def of(c: Column, descending: Boolean, nullsLast: Boolean): Column =
    (descending, nullsLast) match {
      case (false, false) => c.asc_nulls_first
      case (false, true)  => c.asc_nulls_last
      case (true, false)  => c.desc_nulls_first
      case (true, true)   => c.desc_nulls_last
    }
}

/** Shared frame ops. The reference's eager `DataFrame` round-trips through the
  * lazy engine (reference: lib/polars/data_frame.rb:2364-2437 — `join` is
  * `lazy.join(...).collect`); on Spark both surfaces build the same declarative
  * plan, so `DataFrame` and `LazyFrame` share this trait and differ only in
  * materialization discipline.
  */
trait FrameOps[Self] {
  protected def sdf: SDF
  protected def make(d: SDF): Self

  def toSpark: SDF = sdf
  def schema: StructType = sdf.schema
  def columns: Seq[String] = sdf.columns.toSeq.filterNot(_ == RowIndex.name)
  def width: Int = columns.size
  def explainPlan(): String = sdf.queryExecution.optimizedPlan.toString

  /** Resolve exprs; if any needs the hidden row index, attach it first
    * (SURVEY §7 row-order discipline), then run each expression's
    * preparation stages (distributed prefix scans, broadcast scalars —
    * [[graft.kernel.Scan]]) so the exprs' helper columns exist. */
  private def withIdx(exprs: Seq[Expr])(f: SDF => SDF): SDF = {
    val needs = exprs.exists(_.requiresIndex)
    val preps = exprs.flatMap(_.preps).distinctBy(_.key)
    val base0 = if (needs) RowIndex.attach(sdf) else sdf
    // each prep's partials branch re-reads its input; with several preps
    // stacked, persist the shared base once so all branches read one
    // materialization instead of N re-executions of the upstream lineage
    val base1 = if (preps.size > 1) graft.kernel.PrepCache.persistBounded(base0) else base0
    val base = preps.foldLeft(base1)((d, p) => p.build(d))
    val out = f(base)
    val drops = (RowIndex.name +: graft.kernel.Scan.BUCKET +: graft.kernel.Scan.POS +:
      preps.flatMap(_.drops))
      .distinct.filter(out.columns.contains)
    if (drops.nonEmpty) out.drop(drops: _*) else out
  }

  // ---- projections (reference: data_frame.rb:3559,3671; lazy_frame.rb:1028,1784) ----
  def select(exprs0: Expr*): Self = {
    // polars selector semantics: `all` / `^regex$` column selectors expand
    // per matching schema column BEFORE evaluation (all.sum sums each
    // column; the op chain applies per column) — Expr.expandSelector
    // substitutes the selector leaf at bind time, where the schema is known
    val expanded = exprs0.flatMap(e =>
      graft.expr.Expr.expandSelector(e, columns).getOrElse(Seq(e)))
    val exprs = expanded.map(_.defaultNamed) // polars naming: leaf name / "literal"
    // polars DuplicateError: two exprs default-naming to the same column
    // (select(col("a"), col("a") + 1)) must fail HERE, not as a downstream
    // AMBIGUOUS_REFERENCE — Spark happily builds the duplicate projection
    val outNames = exprs.flatMap(_.meta.outputName)
    val dup = outNames.diff(outNames.distinct).distinct
    require(dup.isEmpty,
      s"select: duplicate output column names ${dup.mkString(", ")} — alias the expressions distinctly")
    make(withIdx(exprs) { d =>
      val G = org.apache.spark.sql.GraftInternalOps
      // polars frame-order guarantee: a windowed/scanned projection comes
      // back partition-grouped from the shuffle; restore row order via the
      // hidden index (Catalyst's EliminateSorts removes this sort when a
      // caller orders the result itself)
      def ordered(dd: SDF, cols: Seq[Column]): SDF =
        if (dd.columns.contains(RowIndex.name))
          dd.select((F.col(RowIndex.name) +: cols): _*).orderBy(F.col(RowIndex.name))
        else dd.select(cols: _*)
      val extracted = exprs.map(e =>
        if (G.hasBareAggregate(e.col)) Some(G.extractBareAggregates(e.col)) else None)
      val anyAgg = extracted.exists(_.isDefined)
      // a projection is the classic 1-row global aggregate ONLY when every
      // expr is a pure scalar aggregate (no residual elementwise refs)
      val allPureAgg = anyAgg && extracted.forall(_.exists {
        case (rc, _) => !G.referencesNonHelperColumns(rc)
      })
      if (!anyAgg) ordered(d, exprs.map(_.col))
      else if (allPureAgg) d.select(exprs.map(_.col): _*)
      else {
        // MIXED scalar/elementwise projection — polars broadcasts the
        // scalar aggregates against the full-length columns
        // (guide_test.rb:93 select(sum("nrs"), col("names").sort, ...)):
        // ONE global-aggregate pass computes every extracted aggregate,
        // broadcast-cross-joins back (1 row), and the projection reads the
        // helpers elementwise. Never a Window.partitionBy() global window.
        val helpers = extracted.flatMap(_.toSeq.flatMap(_._2))
        val aggRow = F.broadcast(d.agg(
          helpers.head._2.as(helpers.head._1),
          helpers.tail.map { case (n, c) => c.as(n) }: _*))
        val cols = exprs.zip(extracted).map {
          case (e, None) => e.col
          case (_, Some((rc, _))) => rc
        }
        ordered(d.crossJoin(aggRow), cols)
      }
    })
  }
  def selectNames(names: String*): Self = make(sdf.select(names.map(F.col): _*))
  def withColumns(exprs: (String, Expr)*): Self = make(withIdx(exprs.map(_._2)) { d =>
    val G = org.apache.spark.sql.GraftInternalOps
    // scalar aggregates BROADCAST in with_columns (polars guide semantics:
    // with_columns(sum("nrs").alias("nrs_sum")) adds a constant column) —
    // same one-agg-pass + broadcast cross join as the mixed select
    val extracted = exprs.map { case (n, e) =>
      if (G.hasBareAggregate(e.col)) (n, G.extractBareAggregates(e.col))
      else (n, (e.col, Seq.empty[(String, org.apache.spark.sql.Column)]))
    }
    val helpers = extracted.flatMap(_._2._2)
    val base =
      if (helpers.isEmpty) d
      else d.crossJoin(F.broadcast(d.agg(
        helpers.head._2.as(helpers.head._1),
        helpers.tail.map { case (n, c) => c.as(n) }: _*)))
    val out0 = extracted.foldLeft(base) { case (acc, (n, (c, _))) => acc.withColumn(n, c) }
    val out = if (helpers.isEmpty) out0 else out0.drop(helpers.map(_._1): _*)
    // polars frame-order guarantee (see select)
    if (out.columns.contains(RowIndex.name)) out.orderBy(F.col(RowIndex.name)) else out
  })
  def withColumn(name: String, e: Expr): Self = withColumns(name -> e)
  /** polars spelling: with_columns(exprs) names each column by its alias /
    * leaf name (replacing an existing column of that name in place). */
  def withColumns(exprs0: Seq[Expr])(implicit d: DummyImplicit): Self =
    withColumns(exprs0
      .flatMap(e => graft.expr.Expr.expandSelector(e, columns).getOrElse(Seq(e)))
      .map { e0 =>
        val e = e0.defaultNamed
        e.meta.outputName.getOrElse("literal") -> e
      }: _*)
  def withColumnsRenamed(mapping: Map[String, String]): Self =
    make(mapping.foldLeft(sdf) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  def rename(mapping: Map[String, String]): Self = withColumnsRenamed(mapping)
  def drop(names: String*): Self = make(sdf.drop(names: _*))
  // NOT sdf.na.drop: Spark's na.drop also removes NaNs; polars drop_nulls
  // drops only missing (null) — NaN is a float value (SURVEY §1.2)
  def dropNulls(): Self = dropNulls(columns)
  def dropNulls(subset: Seq[String]): Self =
    make(sdf.filter(subset.map(c => F.col(c).isNotNull).reduce(_ && _)))
  def dropNans(subset: Seq[String]): Self =
    // polars drop_nans removes NaN rows but KEEPS nulls (missing != NaN)
    make(subset.foldLeft(sdf)((d, c) =>
      d.filter(F.col(c).isNull || !F.isnan(F.col(c)))))
  def fillNull(value: Any): Self = make(value match {
    case d: Double  => sdf.na.fill(d)
    case l: Long    => sdf.na.fill(l)
    case i: Int     => sdf.na.fill(i.toLong)
    case s: String  => sdf.na.fill(s)
    case b: Boolean => sdf.na.fill(b)
  })

  /** Regex / dtype selector expansion (reference: expr.rb:365 exclude,
    * meta_expr.rb:96 regex projection) — resolved against the schema here
    * because Catalyst has no regex projection. */
  def selectRegex(pattern: String): Self = {
    val re = pattern.r
    make(sdf.select(columns.filter(c => re.findFirstIn(c).isDefined).map(F.col): _*))
  }
  def exclude(names: String*): Self = {
    // polars rule: a name anchored ^...$ is a regex (functions/lazy.rb:928)
    val (regexes, plain) = names.partition(n => n.startsWith("^") && n.endsWith("$"))
    val res = regexes.map(_.r)
    make(sdf.select(columns.filterNot(c =>
      plain.contains(c) || res.exists(_.findFirstIn(c).isDefined)).map(F.col): _*))
  }

  // ---- filter (reference: data_frame.rb:1161, lazy_frame.rb:932) ----
  def filter(pred: Expr): Self = make(withIdx(Seq(pred)) { d =>
    val out = d.filter(pred.col)
    // polars frame-order guarantee (see select) — a windowed predicate
    // (count.over(k) > 1) otherwise returns shuffle order
    if (out.columns.contains(RowIndex.name)) out.orderBy(F.col(RowIndex.name)) else out
  })
  def where(pred: Expr): Self = filter(pred)

  // ---- sort / limit (reference: data_frame.rb:1340; §2.6) ----
  def sort(by: String, descending: Boolean = false, nullsLast: Boolean = false): Self =
    sortBy(Seq(graft.Polars.col(by)), Seq(descending), nullsLast)
  def sortBy(by: Seq[Expr], descending: Seq[Boolean] = Nil, nullsLast: Boolean = false): Self = {
    val desc = if (descending.isEmpty) Seq.fill(by.size)(false) else descending
    val keys = by.zip(desc).map { case (e, d) => SortKey.of(e.col, d, nullsLast) }
    // withIdx resolves scanned sort keys (sort_by(cum_sum) etc.); the helper
    // columns drop after the sort, which preserves the ordering
    make(withIdx(by)(_.orderBy(keys: _*)))
  }
  def limit(n: Int): Self = make(sdf.limit(n))
  def head(n: Int = 5): Self = limit(n)
  /** tail = top-n by descending row index, re-sorted ascending — plans as a
    * distributed TakeOrderedAndProject (per-partition top-n + driver merge of
    * n rows per partition), not a count-over-window single-partition pass. */
  def tail(n: Int = 5): Self = {
    val d = RowIndex.attach(sdf)
    make(d.orderBy(F.col(RowIndex.name).desc).limit(n)
      .orderBy(F.col(RowIndex.name).asc).drop(RowIndex.name))
  }
  /** slice = rows [offset, offset+length) in current order — native
    * Offset+Limit operators (pushdown-friendly), no row-index materialization. */
  def slice(offset: Long, length: Long): Self =
    make(sdf.offset(offset.toInt).limit(length.toInt))
  def gatherEvery(n: Int, offset: Int = 0): Self = {
    val d = RowIndex.attachDense(sdf)
    make(d.filter((F.col(RowIndex.name) - offset) % n === 0 && F.col(RowIndex.name) >= offset)
      .drop(RowIndex.name))
  }
  def reverse: Self = {
    val d = RowIndex.attach(sdf)
    make(d.orderBy(F.col(RowIndex.name).desc).drop(RowIndex.name))
  }
  def withRowIndex(name: String = "index", offset: Long = 0): Self = {
    val d = RowIndex.attachDense(sdf)
    val renamed = d.withColumn(name, F.col(RowIndex.name) + offset).drop(RowIndex.name)
    make(renamed.select((name +: renamed.columns.filterNot(_ == name)).map(F.col): _*))
  }
  // top_k/bottom_k: nulls sort LAST in both (polars treats null as missing —
  // only included when fewer than k non-null values exist); Spark's bare asc
  // would put nulls FIRST and fill bottom_k with null rows
  def topK(k: Int, by: Expr, descending: Boolean = false): Self = // top_k = largest
    make(withIdx(Seq(by))(
      _.orderBy(if (descending) by.col.asc_nulls_last else by.col.desc_nulls_last).limit(k)))
  def bottomK(k: Int, by: Expr): Self =
    make(withIdx(Seq(by))(_.orderBy(by.col.asc_nulls_last).limit(k)))
  def sample(fraction: Double, withReplacement: Boolean = false, seed: Long = 42): Self =
    make(sdf.sample(withReplacement, fraction, seed))
  def shuffle(seed: Long = 42): Self = make(sdf.orderBy(F.rand(seed)))

  // ---- unique (reference: data_frame.rb:4093; §2.6) ----
  // defaults MATCH the reference (data_frame.rb:4093): maintain_order: true,
  // keep: "first" — the drop-in user gets polars semantics; scale-conscious
  // callers pass keep = "any", maintainOrder = false for the cheap
  // hash-aggregate spelling
  def unique(subset: Seq[String] = Nil, keep: String = "first",
             maintainOrder: Boolean = true): Self = {
    val cols = if (subset.isEmpty) columns else subset
    // maintain_order (reference data_frame.rb unique signature): surviving
    // rows come back in their original row order. The dedup windows shuffle
    // by the subset key, so an explicit re-sort on the retained row index is
    // required — the documented extra cost, charged only when asked for.
    def ordered(d: SDF): SDF =
      if (maintainOrder) d.orderBy(F.col(RowIndex.name)).drop(RowIndex.name)
      else d.drop(RowIndex.name)
    keep match {
      case "any" if !maintainOrder => make(sdf.dropDuplicates(cols))
      case "any" | "first" | "last" =>
        val d = RowIndex.attach(sdf)
        val ord = if (keep == "last") F.col(RowIndex.name).desc else F.col(RowIndex.name).asc
        val w = Window.partitionBy(cols.map(F.col): _*).orderBy(ord)
        make(ordered(d.withColumn("__rn__", F.row_number().over(w))
          .filter(F.col("__rn__") === 1).drop("__rn__")))
      case "none" =>
        val d = RowIndex.attach(sdf)
        val w = Window.partitionBy(cols.map(F.col): _*)
        make(ordered(d.withColumn("__cnt__", F.count(F.lit(1)).over(w))
          .filter(F.col("__cnt__") === 1).drop("__cnt__")))
    }
  }

  // ---- joins (reference: data_frame.rb:2364, lazy_frame.rb:1700-1748) ----
  def join(other: FrameOps[_], on: Seq[String], how: String = "inner",
           suffix: String = "_right", joinNulls: Boolean = false,
           broadcastRight: Boolean = false): Self = {
    val sparkHow = how match {
      case "inner" => "inner"; case "left" => "left"; case "right" => "right"
      case "full" | "outer" => "full_outer"
      case "semi" => "left_semi"; case "anti" => "left_anti"
      case "cross" => "cross"
    }
    val right0 = other.toSpark
    // suffix-rename right's clashing non-key columns (polars suffix semantics)
    val clashes = right0.columns.toSet.intersect(sdf.columns.toSet).diff(on.toSet)
    val right1 = clashes.foldLeft(right0)((d, c) => d.withColumnRenamed(c, c + suffix))
    val right = if (broadcastRight) F.broadcast(right1) else right1
    if (how == "cross") make(sdf.crossJoin(right))
    else if (how == "full" || how == "outer") {
      // polars full join keeps BOTH key columns — the right frame's keys
      // ride along under the suffix (reference data_frame_test.rb
      // test_join_outer: L1, L2, L1_right, R2) — so join on an explicit
      // condition, never Spark's coalescing USING form
      val rightK = on.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffix))
      val cond = on.map(c =>
        if (joinNulls) sdf(c) <=> rightK(c + suffix) else sdf(c) === rightK(c + suffix))
        .reduce(_ && _)
      make(sdf.join(rightK, cond, "full_outer"))
    }
    else if (joinNulls) {
      val cond = on.map(c => sdf(c) <=> right(c)).reduce(_ && _)
      val j = sdf.join(right, cond, sparkHow)
      make(if (Set("inner", "left", "semi", "anti").contains(how))
        on.foldLeft(j)((d, c) => d.drop(right(c))) else j)
    } else {
      val j = sdf.join(right, on, sparkHow)
      // polars column order: left frame's columns in place (keys where they
      // were), right's non-key columns appended — Spark's using-join hoists
      // the keys to the front instead
      make(if (Set("inner", "left", "right", "semi", "anti").contains(how)) {
        val rightRest =
          if (how == "semi" || how == "anti") Nil
          else right1.columns.filterNot(on.contains).toSeq
        j.select((sdf.columns ++ rightRest).map(F.col): _*)
      } else j)
    }
  }
  def joinOn(other: FrameOps[_], leftOn: Seq[String], rightOn: Seq[String],
             how: String = "inner", suffix: String = "_right"): Self = {
    val right0 = other.toSpark
    val clashes = right0.columns.toSet.intersect(sdf.columns.toSet).diff(rightOn.toSet)
    val right = clashes.foldLeft(right0)((d, c) => d.withColumnRenamed(c, c + suffix))
    val cond = leftOn.zip(rightOn).map { case (l, r) => sdf(l) === right(r) }.reduce(_ && _)
    val sparkHow = how match {
      case "full" | "outer" => "full_outer"; case "semi" => "left_semi"
      case "anti" => "left_anti"; case h => h
    }
    make(sdf.join(right, cond, sparkHow))
  }
  def crossJoin(other: FrameOps[_]): Self = make(sdf.crossJoin(other.toSpark))

  /** with_context — make another frame's columns referenceable in expressions
    * (reference: lazy_frame.rb:1821-1827). Supported pattern (the one the
    * reference's tests exercise): scalar access via aggregates of the other
    * frame — implemented as a broadcast cross join of its 1-row aggregate
    * projection, so `col("other_col_first")` etc. resolve. */
  def withContext(other: FrameOps[_], aggs: (String, Expr)*): Self = {
    val o = other.toSpark
    val aggCols = aggs.map { case (n, e) => e.col.as(n) }
    val oneRow = o.agg(aggCols.head, aggCols.tail: _*)
    make(sdf.crossJoin(F.broadcast(oneRow)))
  }

  /** merge_sorted — interleave two key-sorted frames (reference data_frame.rb:4757). */
  def mergeSorted(other: FrameOps[_], key: String): Self =
    make(sdf.unionByName(other.toSpark).orderBy(F.col(key)))

  // ---- concat-ish ----
  def vstack(other: FrameOps[_]): Self = make(sdf.unionAll(other.toSpark))
  def extend(other: FrameOps[_]): Self = vstack(other)
  /** Positional column concat (reference data_frame.rb hstack). Fast path:
    * when both sides are projections over the same base plan (the dominant
    * hstack shape), fuse into one projection over that base — a single
    * execution with no index and no shuffle. Otherwise fall back to the
    * dense-index equi-join. */
  def hstack(other: FrameOps[_]): Self =
    org.apache.spark.sql.GraftInternalOps.fusedHstack(sdf, other.toSpark) match {
      case Some(fused) => make(fused)
      case None =>
        val a = RowIndex.attachDense(sdf)
        val b = RowIndex.attachDense(other.toSpark)
        make(a.join(b, RowIndex.name).drop(RowIndex.name))
    }

  // ---- frame-level aggregates (reference: data_frame.rb:3727-3947 axis 0,
  // :4183 null_count): one-row frame, per-column; numeric-only functions
  // yield null for non-numeric columns like the reference ----
  private def aggAll(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                     numericOnly: Boolean): Self = {
    val cols = sdf.schema.fields.map { fld =>
      val ok = !numericOnly || fld.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      // polars keeps a non-aggregable column's ORIGINAL dtype with a null
      // value (data_frame.rb:4340 quantile golden: ham stays `str`), so the
      // null is typed, not a void literal
      (if (ok) f(F.col(fld.name)) else F.lit(null).cast(fld.dataType)).as(fld.name)
    }
    make(sdf.agg(cols.head, cols.tail: _*))
  }
  // Expr.sum/min/max spellings (all-null sums to 0, NaN-skipping extrema
  // with all-NaN→NaN fallback) so frame-level aggs match the expr surface
  def maxFrame: Self = aggAll(c => F.coalesce(F.max(Expr.nanSkipped(c)), F.max(c)), numericOnly = false)
  def minFrame: Self = aggAll(c => F.coalesce(F.min(Expr.nanSkipped(c)), F.min(c)), numericOnly = false)
  def sumFrame: Self = aggAll(c => F.coalesce(F.sum(c), F.lit(0)), numericOnly = true)
  def meanFrame: Self = aggAll(F.avg, numericOnly = true)
  def medianFrame: Self = aggAll(c => F.median(c), numericOnly = true)
  def stdFrame(ddof: Int = 1): Self =
    aggAll(c => Expr.ddofScale(F.stddev_samp(c), F.count(c), ddof, isStd = true), numericOnly = true)
  def varFrame(ddof: Int = 1): Self =
    aggAll(c => Expr.ddofScale(F.var_samp(c), F.count(c), ddof, isStd = false), numericOnly = true)
  def nullCount: Self = aggAll(c => F.count(F.when(c.isNull, 1)), numericOnly = false)
  /** Frame-level product (reference data_frame.rb:3968 golden): integers
    * stay i64, floats stay f64, booleans numericize to i64 (product of
    * 0/1) — Spark's product aggregate is double, so cast back per dtype. */
  def productFrame: Self = {
    import org.apache.spark.sql.types._
    val cols = sdf.schema.fields.map { fld =>
      (fld.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          F.product(F.col(fld.name)).cast(LongType)
        case BooleanType =>
          F.product(F.col(fld.name).cast(IntegerType)).cast(LongType)
        case _: NumericType => F.product(F.col(fld.name))
        case dt => F.lit(null).cast(dt)
      }).as(fld.name)
    }
    make(sdf.agg(cols.head, cols.tail.toIndexedSeq: _*))
  }
  /** Frame-level quantile (reference lazy_frame.rb:2368): every numeric
    * column to its q-quantile, f64 like polars (default interpolation
    * "nearest", same as the reference). Routes through the histogram-
    * refinement kernel (one bounds scan + geometric refinement over ALL
    * columns at once, [[graft.kernel.Quantiles]]) — the previous per-column
    * collect_list aggregate buffered every column of the whole table in
    * one row's aggregation buffers. NOTE: the kernel runs Spark jobs at
    * CALL time, so on the LazyFrame surface this is eager where the
    * reference is lazy — values are identical; documented divergence
    * (COVERAGE.md "Engine-level documented divergences"). */
  def quantileFrame(q: Double, interpolation: String = "nearest"): Self = {
    import org.apache.spark.sql.types._
    val Q = graft.kernel.Quantiles
    val numeric = sdf.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    val stats =
      if (numeric.isEmpty) Map.empty[String, Q.ColStats]
      else Q.orderStats(sdf, numeric.toSeq.map(c => Q.Req(c, Q.quantileRanks(q))))
    val cols = sdf.schema.fields.map { fld =>
      (stats.get(fld.name) match {
        case Some(st) =>
          F.lit(Q.quantileOf(st, q, interpolation).map(Double.box).orNull)
            .cast(DoubleType)
        // polars keeps a non-aggregable column's ORIGINAL dtype with a null
        // value (data_frame.rb:4340 quantile golden: ham stays `str`)
        case None => F.lit(null).cast(fld.dataType)
      }).as(fld.name)
    }
    make(sdf.sparkSession.range(1).select(cols.toIndexedSeq: _*))
  }

  /** Frame-level fill_nan (reference lazy_frame.rb:2168): replace NaN in
    * every FLOAT column; nulls are NOT NaN and pass through untouched. */
  def fillNan(v: Expr): Self = {
    import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}
    // a STRING fill promotes the float columns to str (polars supertype
    // rule — expr.rb fill_nan golden: fill_nan("zero") renders str columns
    // with "1.0"-style casts of the kept values); ANSI Spark would instead
    // try to cast the fill to double and raise
    val strFill = org.apache.spark.sql.GraftInternalOps.catalystExpression(
      org.apache.spark.sql.GraftInternalOps.stripAlias(v.col)) match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal => l.dataType == StringType
      case _ => false
    }
    val cols = sdf.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          val c = if (strFill) F.col(f.name).cast(StringType) else F.col(f.name)
          F.when(F.isnan(F.col(f.name)), v.col).otherwise(c).as(f.name)
        case _ => F.col(f.name)
      }
    }
    make(sdf.select(cols.toIndexedSeq: _*))
  }
  def fillNan(v: Any): Self = fillNan(Expr.lit(v))

  /** Frame-level fill_null(strategy:) (reference lazy_frame.rb fill_null =
    * select(all.fill_null(strategy))) — every column through the expr-level
    * strategy kernel in frame order. */
  /** Count unique rows, optionally over a column/expression subset
    * (reference data_frame.rb:3530 n_unique goldens: plain, named-column
    * subset, and expression subset). */
  def nUnique(subset: Seq[Expr] = Nil): Long = {
    val d = if (subset.isEmpty) sdf
      else sdf.select(subset.zipWithIndex.map { case (e, i) => e.col.as(s"__nu_${i}__") }: _*)
    d.distinct().count()
  }

  /** Row at an index as a value sequence (reference data_frame.rb row). */
  def row(index: Long): Seq[Any] =
    sdf.offset(index.toInt).limit(1).collect()(0).toSeq
  /** The single row matching the predicate (reference data_frame.rb
    * row(by_predicate:) — polars raises unless exactly one row matches). */
  def rowByPredicate(pred: Expr): Seq[Any] = {
    val rows = sdf.filter(pred.col).limit(2).collect()
    require(rows.length == 1,
      if (rows.isEmpty) "no rows returned by predicate"
      else "predicate <...> returned 2 or more rows")
    rows(0).toSeq
  }

  def fillNullStrategy(strategy: String): Self =
    select(columns.map(c => Expr(F.col(c)).fillNullStrategy(strategy).alias(c)): _*)

  /** shrink_dtype over every column (reference expr.rb:6751 golden):
    * integers narrow to the smallest type holding their extrema; f64
    * narrows to f32 when the extrema fit f32's range; other dtypes pass
    * through. ONE aggregate job computes every column's extrema. */
  def shrinkDtype: Self = {
    import org.apache.spark.sql.types._
    val numeric = sdf.schema.fields.filter(f =>
      f.dataType == LongType || f.dataType == IntegerType ||
        f.dataType == ShortType || f.dataType == DoubleType)
    if (numeric.isEmpty) return make(sdf)
    val aggs = numeric.flatMap(f =>
      Seq(F.min(F.col(f.name)).as(s"__lo_${f.name}__"),
        F.max(F.col(f.name)).as(s"__hi_${f.name}__")))
    val r = sdf.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    val targets: Map[String, DataType] = numeric.flatMap { f =>
      val lo = r.get(r.fieldIndex(s"__lo_${f.name}__"))
      val hi = r.get(r.fieldIndex(s"__hi_${f.name}__"))
      if (lo == null) None
      else f.dataType match {
        case LongType | IntegerType | ShortType =>
          val (l, h) = (lo.asInstanceOf[Number].longValue, hi.asInstanceOf[Number].longValue)
          Some(f.name -> (
            if (l >= Byte.MinValue && h <= Byte.MaxValue) ByteType
            else if (l >= Short.MinValue && h <= Short.MaxValue) ShortType
            else if (l >= Int.MinValue && h <= Int.MaxValue) IntegerType
            else LongType))
        case DoubleType =>
          val (l, h) = (lo.asInstanceOf[Double], hi.asInstanceOf[Double])
          if (l >= Float.MinValue.toDouble && h <= Float.MaxValue.toDouble)
            Some(f.name -> FloatType)
          else None
        case _ => None
      }
    }.toMap
    make(sdf.select(columns.map(c =>
      targets.get(c).fold(F.col(c))(t => F.col(c).cast(t).as(c))): _*))
  }

  /** Frame-level shift (reference lazy_frame.rb:1913): every column shifted
    * by `n` in frame row order (the expr-level scan kernel per column). */
  def shiftFrame(n: Int): Self =
    select(columns.map(c => Expr(F.col(c)).shift(n)): _*)
  /** Frame-level shift_and_fill (reference lazy_frame.rb:1963). The frame
    * knows each column's dtype, so a scalar fill casts PER COLUMN like
    * polars (data_frame.rb golden: shift_and_fill(1, 0) fills a str column
    * with "0") — the raw expr-level coercion would cast the str column
    * toward the fill's numeric type and raise under ANSI. */
  def shiftAndFillFrame(n: Int, fillValue: Any): Self =
    select(sdf.schema.fields.toIndexedSeq.map { f =>
      val fill: Any = (f.dataType, fillValue) match {
        case (org.apache.spark.sql.types.StringType, v) if !v.isInstanceOf[String] =>
          v.toString
        case _ => fillValue
      }
      Expr(F.col(f.name)).shiftAndFill(n, fill)
    }: _*)

  /** Frame-level interpolate (reference lazy_frame.rb:2543): linear
    * interpolation of every numeric column in frame order (ints go f64,
    * like polars); non-numeric columns pass through. */
  def interpolateFrame(): Self =
    select(columns.map { c =>
      val e = Expr(F.col(c))
      if (sdf.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        e.cast(org.apache.spark.sql.types.DoubleType).interpolate("linear").alias(c)
      else e
    }: _*)

  // ---- group by (reference: data_frame.rb:1684, group_by.rb:203) ----
  def groupBy(keys: String*): GroupBy[Self] =
    new GroupBy[Self](sdf, keys.map(F.col), make)
  def groupBy(keys: Seq[String], maintainOrder: Boolean): GroupBy[Self] =
    new GroupBy[Self](sdf, keys.map(F.col), make, maintainOrder)
  def groupByExprs(keys: Expr*): GroupBy[Self] =
    new GroupBy[Self](sdf, keys.map(_.col), make)
  def groupByExprs(keys: Seq[Expr], maintainOrder: Boolean): GroupBy[Self] =
    new GroupBy[Self](sdf, keys.map(_.col), make, maintainOrder)

  /** upsample (reference data_frame.rb:3955): fill the time axis at `every`
    * intervals between each group's own min and max; non-key columns are
    * null on inserted rows. One aggregate for the bounds, sequence-explode
    * for the grid, left join back — the grid is rows-per-group × steps,
    * never materialized on the driver. Rows whose time column is null are
    * not representable on the grid (the reference requires a sorted non-null
    * time column and errors); here they are excluded from the output. */
  def upsample(timeColumn: String, every: String, by: Seq[String] = Nil): Self = {
    val step = graft.kernel.DurationDsl.parse(every).intervalCol
    val bounds =
      if (by.isEmpty) sdf.agg(F.min(timeColumn).as("__lo__"), F.max(timeColumn).as("__hi__"))
      else sdf.groupBy(by.map(F.col): _*)
        .agg(F.min(timeColumn).as("__lo__"), F.max(timeColumn).as("__hi__"))
    val grid = bounds.select((by.map(F.col) :+
      F.explode(F.sequence(F.col("__lo__"), F.col("__hi__"), step)).as(timeColumn)): _*)
    make(grid.join(sdf, by :+ timeColumn, "left"))
  }

  /** Frame-level rolling trailing-window aggregation (reference:
    * lazy_frame.rb:1161). */
  def rolling(indexColumn: String, period: String, by: Seq[String] = Nil,
              offset: Option[String] = None, closed: String = "right"): RollingGroupBy[Self] =
    new RollingGroupBy[Self](sdf, indexColumn, period, by, make, offset, closed)

  /** group_by_dynamic — calendar/tumbling/sliding windows (reference:
    * lazy_frame.rb:1416-1459). Maps to Spark's `window()` which gives exactly
    * the multi-membership sliding semantics incl. bounds. */
  def groupByDynamic(indexColumn: String, every: String, period: Option[String] = None,
                     offset: Option[String] = None, by: Seq[String] = Nil,
                     includeBoundaries: Boolean = false,
                     label: String = "left", closed: String = "left",
                     startBy: String = "window"): DynamicGroupBy[Self] =
    new DynamicGroupBy[Self](sdf, indexColumn, every, period, offset, by, make,
      includeBoundaries, label, closed, startBy)

  // ---- explode / reshape (reference: §2.7) ----
  /** polars explode — multiple columns explode in LOCKSTEP (reference
    * data_frame.rb explode docs: all listed columns must have equal list
    * lengths per row). Divergence: a per-row length mismatch null-pads to the
    * longest list (Spark arrays_zip) instead of raising polars' ShapeError —
    * a distributed length check would cost an extra pass; pinned in spec. */
  def explode(columns: String*): Self = explodeCols(columns, None)
  /** Lockstep explode that also emits a 0-based within-list position column
    * (composition of polars explode + int_range over list idx). */
  def explodeWith(position: String, columns: String*): Self =
    explodeCols(columns, Some(position))
  private def explodeCols(columns: Seq[String], pos: Option[String]): Self = {
    require(columns.nonEmpty, "explode requires at least one column")
    val tmp = "__graft_ex__"
    val others = sdf.columns.filterNot(columns.contains).map(F.col)
    val zipped =
      if (columns.size == 1) F.col(columns.head)
      // a NULL list must null-pad like an empty one (arrays_zip returns null
      // when ANY argument is null, which would collapse the row and drop the
      // other columns' elements)
      else F.arrays_zip(columns.map(c =>
        F.coalesce(F.col(c), F.array().cast(sdf.schema(c).dataType)).as(c)).toIndexedSeq: _*)
    val gen = pos match {
      case Some(p) => F.posexplode_outer(zipped).as(Seq(p, tmp))
      case None    => F.explode_outer(zipped).as(tmp)
    }
    val ex = sdf.select((others :+ gen).toIndexedSeq: _*)
    val outCols = sdf.columns.map { c =>
      if (!columns.contains(c)) F.col(c)
      else if (columns.size == 1) F.col(tmp).as(c)
      else F.col(tmp).getField(c).as(c)
    }
    make(ex.select((outCols.toIndexedSeq ++ pos.map(F.col)): _*))
  }
  def unnest(structCol: String): Self = {
    val fields = sdf.schema(structCol).dataType.asInstanceOf[StructType].fieldNames
    // polars splices the fields IN PLACE of the struct column (reference
    // lazy_frame.rb:2607 golden: before, t_a..t_d, after), not at the end
    val cols = sdf.columns.toIndexedSeq.flatMap { c =>
      if (c == structCol) fields.toSeq.map(f => F.col(s"$structCol.$f").as(f))
      else Seq(F.col(c))
    }
    make(sdf.select(cols: _*))
  }
  def toStruct(name: String): Self =
    make(sdf.select(F.struct(sdf.columns.map(F.col).toIndexedSeq: _*).as(name)))

  /** Select columns by Spark dtype (reference dtype selectors, lib.rs:554-559). */
  def selectByDtype(dts: org.apache.spark.sql.types.DataType*): Self =
    make(sdf.select(sdf.schema.fields
      .filter(f => dts.contains(f.dataType) && f.name != RowIndex.name)
      .map(f => F.col(f.name)).toIndexedSeq: _*))
  /** name.prefix / name.suffix applied frame-wide (reference name_expr.rb). */
  def renameAll(f: String => String): Self =
    make(columns.foldLeft(sdf)((d, c) => d.withColumnRenamed(c, f(c))))
  def prefixAll(p: String): Self = renameAll(p + _)
  def suffixAll(s: String): Self = renameAll(_ + s)

  /** unpivot/melt (reference: data_frame.rb:3101). Spark 4 has Dataset.unpivot. */
  def unpivot(on: Seq[String], index: Seq[String],
              variableName: String = "variable", valueName: String = "value"): Self = {
    // polars unpivots COLUMN-major — every row of on(0) in frame order, then
    // every row of on(1), ... (reference lazy_frame.rb:2497 golden). Spark's
    // own unpivot is row-major (per-row explode), so spell it as a union of
    // one pruned projection per value column; the value dtype is coerced to
    // Spark's own unpivot supertype (schema-only probe, no extra scan).
    val target = sdf.unpivot(index.map(F.col).toArray, on.map(F.col).toArray,
      variableName, valueName).schema(valueName).dataType
    val parts = on.map { c =>
      sdf.select(index.map(F.col) ++ Seq(
        F.lit(c).as(variableName), F.col(c).cast(target).as(valueName)): _*)
    }
    make(parts.reduce(_ unionAll _))
  }

  def isEmpty: Boolean = sdf.isEmpty

  def takeEvery(n: Int, offset: Int = 0): Self = gatherEvery(n, offset) // deprecated alias
  /** Column membership (reference include?). */
  def contains(column: String): Boolean = columns.contains(column)
  /** Positional index of a column (reference get_column_index). */
  def getColumnIndex(column: String): Int = {
    val i = columns.indexOf(column)
    require(i >= 0, s"get_column_index: no column '$column'")
    i
  }
  /** Empty frame with the same schema (reference clear). */
  def clear(): Self = make(sdf.limit(0))
  /** clear(n): n all-null rows of the same schema (reference
    * data_frame.rb clear golden — `df.clear(2)` renders 2 null rows). */
  def clear(n: Int): Self = {
    val nulls = sdf.schema.fields.map(f => F.lit(null).cast(f.dataType).as(f.name))
    make(sdf.sparkSession.range(n.toLong).select(nulls.toIndexedSeq: _*))
  }
  /** As-of join against another frame (reference join_asof; backward/
    * forward/nearest, optional group keys and tolerance) — delegates to the
    * union-tag window kernel, no per-key loops. */
  def joinAsof(other: FrameOps[_], on: String, by: Seq[String] = Nil,
               strategy: String = "backward", tolerance: Option[Double] = None,
               suffix: String = "_right"): Self =
    make(graft.kernel.AsofJoin.join(sdf, other.toSpark, on, by, strategy, tolerance, suffix))
}

/** Eager frame (reference: lib/polars/data_frame.rb). */
final case class DataFrame(private val df: SDF) extends FrameOps[DataFrame] {
  protected def sdf: SDF = df
  protected def make(d: SDF): DataFrame = DataFrame(d)
  def lazyFrame: LazyFrame = LazyFrame(df)
  def height: Long = df.count()
  def shape: (Long, Int) = (height, width)
  def collectRows(): Array[org.apache.spark.sql.Row] = df.collect()
  /** Row-oriented egress (reference data_frame.rb to_hashes/rows). */
  def toMaps: Seq[Map[String, Any]] = {
    val names = df.columns
    df.collect().map(r => names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap).toSeq
  }
  /** Column egress (reference data_frame.rb get_column/get_columns/
    * to_series/dtypes). */
  def dtypes: Seq[org.apache.spark.sql.types.DataType] =
    df.schema.fields.map(_.dataType).toSeq
  def getColumn(name: String): Series = Series(name, df.select(name))
  def getColumns: Seq[Series] = df.columns.toSeq.map(getColumn)
  def toSeries(index: Int = 0): Series = getColumn(df.columns(index))
  /** Single-value egress (reference data_frame.rb:1012 item). */
  def item(): Any = {
    val rows = df.limit(2).collect()
    require(rows.length == 1 && rows(0).length == 1,
      s"item(): frame is not 1x1 (${df.columns.length} cols)")
    rows(0).get(0)
  }
  /** Stable per-row content hash over all columns (reference
    * data_frame.rb:4456 hash_rows) — codegen xxhash64, usable as a dedup or
    * partitioning key at any scale. */
  def hashRows(seed: Long = 0): Series = Series("hash_rows",
    df.select(F.xxhash64((F.lit(seed) +: df.columns.toSeq.map(F.col)): _*).as("hash_rows")))
  /** pipe (reference data_frame.rb:2792): apply a function to the frame. */
  def pipe[T](f: DataFrame => T): T = f(this)
  /** map_rows (reference data_frame.rb:2438, ext map/dataframe.rs): apply an
    * arbitrary row closure, producing rows of `schema`. Distributed
    * `Dataset.map` under a Row encoder — one pass, no driver collect — but
    * opaque to Catalyst (same trade the reference makes for Ruby-block rows);
    * prefer expression-level `withColumns`/`select` where expressible. */
  def mapRows(schema: StructType)(f: org.apache.spark.sql.Row => org.apache.spark.sql.Row): DataFrame =
    DataFrame(df.map(f)(org.apache.spark.sql.Encoders.row(schema)))
  /** Row iterator without materializing the whole frame on the driver
    * (reference each_row/iter_rows — toLocalIterator streams one partition
    * at a time). */
  def iterRows(): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
  def eachRow(f: org.apache.spark.sql.Row => Unit): Unit = iterRows().foreach(f)
  /** Remove a column, returning it alongside the remaining frame (reference
    * drop_in_place — immutable flavor). */
  def dropInPlace(name: String): (Series, DataFrame) =
    (getColumn(name), DataFrame(df.drop(name)))
  /** delete (reference): drop-if-present, returning the removed series. */
  def delete(name: String): Option[Series] =
    if (df.columns.contains(name)) Some(dropInPlace(name)._1) else None
  /** Whole-frame equality (reference equals(null_equal:)): same schema and
    * positionally identical rows. */
  def frameEquals(other: DataFrame, nullEqual: Boolean = true): Boolean = {
    if (df.schema != other.toSpark.schema) return false
    val IDX = graft.kernel.RowIndex.name
    val l = graft.kernel.RowIndex.attachDense(df)
    val r = graft.kernel.RowIndex.attachDense(other.toSpark)
    val conds = df.columns.map { c =>
      if (nullEqual) F.col(s"l.$c") <=> F.col(s"r.$c")
      else F.col(s"l.$c") === F.col(s"r.$c")
    }.reduce(_ && _)
    val j = l.as("l").join(r.as("r"), F.col(s"l.$IDX") === F.col(s"r.$IDX"), "full")
    j.filter(!F.coalesce(conds, F.lit(false))).isEmpty
  }
  /** Row-level uniqueness mask over all columns (reference is_unique /
    * is_duplicated as DataFrame methods). */
  def isUniqueRows: Series = rowCountMask(_ === 1, "is_unique")
  def isDuplicatedRows: Series = rowCountMask(_ > 1, "is_duplicated")
  private def rowCountMask(pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                           out: String): Series = {
    val IDX = graft.kernel.RowIndex.name
    Series(out, graft.kernel.RowIndex.attachDense(df)
      .withColumn("__c__", F.count(F.lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(df.columns.map(F.col): _*)))
      .orderBy(IDX).select(pred(F.col("__c__")).as(out)))
  }
  /** CSV egress as a string (reference to_csv / write_csv(nil)) —
    * driver-side by definition; use [[writeCsv]] for data at scale. */
  def toCsvString(includeHeader: Boolean = true): String = {
    val names = df.columns
    def cell(v: Any): String = v match {
      case null => ""
      case s: String if s.exists(",\"\n\r".contains(_)) =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case x => x.toString
    }
    val rows = df.collect().map(_.toSeq.map(cell).mkString(","))
    val header = if (includeHeader) Seq(names.mkString(",")) else Nil
    (header ++ rows).mkString("", "\n", "\n")
  }
  /** insert_column / replace_column (reference data_frame.rb:1587,3181) —
    * positional column surgery via the hstack fuse/zip machinery. */
  def insertColumn(index: Int, s: Series): DataFrame = {
    require(index >= 0 && index <= df.columns.length,
      s"insert_column: index $index out of range 0..${df.columns.length}")
    requireSameLength(s, "insert_column")
    val stacked = hstack(s.toFrame)
    val cols = df.columns.toSeq
    val order = (cols.take(index) :+ s.name) ++ cols.drop(index)
    stacked.select(order.map(c => Expr(F.col(c))): _*)
  }
  /** replace_column by INDEX (the reference signature, data_frame.rb:1480):
    * the new series' NAME replaces the old column's name too. */
  def replaceColumn(index: Int, s: Series): DataFrame = {
    require(index >= 0 && index < df.columns.length,
      s"replace_column: index $index out of range 0..${df.columns.length - 1}")
    requireSameLength(s, "replace_column")
    val old = df.columns(index)
    val stacked = DataFrame(df.drop(old)).hstack(s.toFrame)
    val order = df.columns.toSeq.updated(index, s.name)
    stacked.select(order.map(c => Expr(F.col(c))): _*)
  }
  /** DataFrame#replace(name, series) — replace a column's DATA keeping the
    * name (reference data_frame.rb:1049 golden). */
  def replace(name: String, s: Series): DataFrame = replaceColumn(name, s)
  def replaceColumn(name: String, s: Series): DataFrame = {
    require(df.columns.contains(name),
      s"replace_column: no column '$name' in ${df.columns.mkString("[", ", ", "]")}")
    requireSameLength(s, "replace_column")
    val stacked = DataFrame(df.drop(name)).hstack(s.rename(name).toFrame)
    stacked.select(df.columns.toSeq.map(c => Expr(F.col(c))): _*)
  }
  // the hstack fallback is an inner index join, which would silently TRUNCATE
  // on a length mismatch where polars raises ShapeError
  private def requireSameLength(s: Series, op: String): Unit = {
    val (h, sl) = (height, s.len)
    require(h == sl, s"$op: series length $sl != frame height $h")
  }
  /** Memory-surface shims (reference data_frame.rb:942,3695,4157,4530):
    * chunks = partitions on Spark; estimated size from Catalyst plan stats. */
  def nChunks: Int = df.rdd.getNumPartitions
  def rechunk(n: Int = 0): DataFrame =
    DataFrame(if (n > 0) df.repartition(n) else df.coalesce(1))
  def estimatedSize: BigInt = df.queryExecution.optimizedPlan.stats.sizeInBytes
  /** sorted-flag shims — Catalyst derives ordering from the plan itself, so
    * these are no-ops kept for API parity (reference expr.rb:6715). */
  def setSorted(column: String, descending: Boolean = false): DataFrame = this
  def flags: Map[String, Boolean] = Map.empty
  def show(n: Int = 20): Unit = df.show(n, truncate = false)
  def cache(): DataFrame = DataFrame(df.cache())
  /** write_parquet; `partitionBy` emits hive-style key=value directories so
    * downstream scans prune partitions (the 100 TB layout: partition on the
    * coarse filter keys, let the reader skip whole directories). */
  def writeParquet(path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
  def writeCsv(path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(path)
  def writeNdjson(path: String): Unit = df.write.mode("overwrite").json(path)
  /** write_json (reference io/json.rb): one JSON array document, driver-side
    * like the reference's eager writer. */
  def writeJson(path: String): Unit = {
    val doc = df.toJSON.collect().mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
  }
  def writeIpc(path: String): Unit = graft.io.ArrowIpc.write(df, path)
  def writeIpcStream(path: String): Unit = graft.io.ArrowIpc.writeStream(df, path)
  def writeAvro(path: String): Unit =
    try df.write.mode("overwrite").format("avro").save(path)
    catch { case _: org.apache.spark.sql.AnalysisException =>
      // spark-avro datasource jar absent: write a single container file via
      // avro-core (driver-side, the reference's eager write_avro semantics)
      graft.io.AvroIo.write(df, path)
    }
  /** partition_by (reference data_frame.rb:3308) — driver-side key enumeration. */
  def partitionBy(keys: Seq[String]): Map[Seq[Any], DataFrame] = {
    val distinct = df.select(keys.map(F.col): _*).distinct().collect()
    distinct.map { row =>
      val vals = keys.indices.map(row.get)
      val pred = keys.zip(vals).map { case (k, v) => F.col(k) === F.lit(v) }.reduce(_ && _)
      vals -> DataFrame(df.filter(pred))
    }.toMap
  }
  /** transpose (reference data_frame.rb:1004): rows become `column_i`
    * string columns. Executor-side: posexplode each row's stringified cells
    * → pivot on the dense row index — the data never collects to the driver
    * (only the row COUNT does, to name the output columns). A transpose is
    * only usable when the row count is modest (it becomes the column count),
    * but the column count — the output row count — can be arbitrarily wide. */
  def transpose(includeHeader: Boolean = true, headerName: String = "column",
                columnNames: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns
    val n = df.count()
    require(columnNames.isEmpty || columnNames.length == n,
      s"transpose: ${columnNames.length} column_names for $n rows")
    if (n == 0) {
      // no data rows: one header-only row per column (matches the collect-
      // based shape; nothing to distribute)
      val schema = StructType(
        if (includeHeader) Seq(org.apache.spark.sql.types.StructField(headerName, org.apache.spark.sql.types.StringType))
        else Nil)
      val data = if (includeHeader) cols.toIndexedSeq.map(c => org.apache.spark.sql.Row(c))
                 else IndexedSeq.empty[org.apache.spark.sql.Row]
      return DataFrame(spark.createDataFrame(spark.sparkContext.parallelize(data), schema))
    }
    val d = RowIndex.attachDense(df)
    val stacked = d.select(F.col(RowIndex.name).as("__ri__"),
      F.posexplode(F.array(cols.map(c => F.col(c).cast("string")): _*)).as(Seq("__ci__", "__v__")))
    val wide = stacked.groupBy("__ci__")
      .pivot("__ri__", (0L until n).map(i => i: Any))
      .agg(F.first(F.col("__v__")))
    val header =
      if (includeHeader)
        Seq(F.element_at(F.array(cols.map(F.lit): _*), F.col("__ci__").cast("int") + 1).as(headerName))
      else Nil
    // a homogeneous input keeps its dtype through the transpose (polars
    // semantics — the string cast exists only for the mixed-dtype stack)
    val uniformDt = df.schema.fields.map(_.dataType).distinct match {
      case Array(dt) => Some(dt)
      case _         => None
    }
    val out = wide.orderBy("__ci__").select(
      (header ++ (0L until n).map { i =>
        val c = uniformDt.fold(F.col(s"$i"))(dt => F.col(s"$i").cast(dt))
        c.as(if (columnNames.nonEmpty) columnNames(i.toInt) else s"column_$i")
      }): _*)
    DataFrame(out)
  }
  /** describe — the reference's exact shape (data_frame.rb:1169 golden):
    * one "describe" column + one column per input column, SEVEN rows
    * (count, null_count, mean, std, min, max, median). Numeric AND boolean
    * columns come out f64 (bools numericized: mean of true/false); other
    * dtypes come out str with mean/std/median null and min/max
    * lexicographic. count is the HEIGHT (nulls included); null_count is the
    * per-column null tally.
    *
    * Scale shape: ONE aggregation pass computes every (stat, column) cell
    * as a named aggregate (not a job per stat row), and the median comes
    * from the histogram-refinement selection kernel
    * ([[graft.kernel.Quantiles]]) — 2-3 narrow scans whose only shuffle is
    * a #buckets-sized count table, never a global sort or a
    * merge-on-one-reducer Percentile. The collected driver state is a
    * bounded #stats × #cols vector. */
  def describe(): DataFrame = {
    import org.apache.spark.sql.types._
    val allCols = df.columns.toSeq
    def dt(c: String): DataType = df.schema(c).dataType
    def isNumish(c: String): Boolean =
      dt(c).isInstanceOf[NumericType] || dt(c) == BooleanType
    def numCol(c: String): Column = F.col(c).cast(DoubleType)
    val scalarStats: Seq[(String, String => Column)] = Seq(
      "count" -> (_ => F.count(F.lit(1)).cast(DoubleType)),
      "null_count" -> (c => (F.count(F.lit(1)) - F.count(F.col(c))).cast(DoubleType)),
      "mean" -> (c => if (isNumish(c)) F.avg(numCol(c)) else F.lit(null).cast(DoubleType)),
      "std" -> (c => if (isNumish(c)) F.stddev_samp(numCol(c)) else F.lit(null).cast(DoubleType)),
      "min" -> (c => if (isNumish(c)) F.min(numCol(c)) else F.min(F.col(c)).cast(StringType)),
      "max" -> (c => if (isNumish(c)) F.max(numCol(c)) else F.max(F.col(c)).cast(StringType)))
    val aggCols = for ((st, f) <- scalarStats; c <- allCols) yield f(c).as(s"${st}__$c")
    val one = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val numish = allCols.filter(isNumish)
    val numed = numish.foldLeft(df)((d, c) => d.withColumn(c, numCol(c)))
    val medByCol: Map[String, Option[Double]] =
      if (numish.isEmpty) Map.empty
      else graft.kernel.Quantiles.interpolated(numed, numish, Seq(0.5))
        .map { case (c, vs) => c -> vs.head }
    def cell(st: String, c: String): Any = st match {
      case "median" =>
        if (isNumish(c)) medByCol.get(c).flatten.map(Double.box).orNull else null
      case _ =>
        val v = one.get(one.fieldIndex(s"${st}__$c"))
        if (isNumish(c)) v
        else if (st == "count" || st == "null_count")
          Option(v).map(x => x.asInstanceOf[Double].toLong.toString).orNull
        else v
    }
    val statNames = Seq("count", "null_count", "mean", "std", "min", "max", "median")
    val rows = statNames.map(st => org.apache.spark.sql.Row.fromSeq(
      st +: allCols.map(c => cell(st, c))))
    val schema = StructType(
      StructField("describe", StringType) +:
        allCols.map(c => StructField(c,
          if (isNumish(c)) DoubleType else StringType)))
    DataFrame(df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(rows), schema))
  }

  /** pivot (reference: data_frame.rb:2999) → groupBy(index).pivot(on).agg. */
  def pivot(on: String, index: Seq[String], values: String,
            aggregateFunction: String = "first"): DataFrame = {
    val agg: Column = aggregateFunction match {
      case "first" => F.first(F.col(values)); case "last" => F.last(F.col(values))
      case "sum" => F.sum(F.col(values)); case "min" => F.min(F.col(values))
      case "max" => F.max(F.col(values)); case "mean" => F.avg(F.col(values))
      case "median" => F.median(F.col(values)); case "len" => F.count(F.lit(1))
    }
    DataFrame(df.groupBy(index.map(F.col): _*).pivot(on).agg(agg))
  }
  /** pivot with the distinct values supplied — avoids the extra distinct scan
    * and gives deterministic output columns (preferred at scale). */
  def pivotValues(on: String, values: Seq[Any], index: Seq[String], valueCol: String,
                  aggregateFunction: String = "first"): DataFrame = {
    val agg: Column = aggregateFunction match {
      case "first" => F.first(F.col(valueCol)); case "last" => F.last(F.col(valueCol))
      case "sum" => F.sum(F.col(valueCol)); case "min" => F.min(F.col(valueCol))
      case "max" => F.max(F.col(valueCol)); case "mean" => F.avg(F.col(valueCol))
      case "median" => F.median(F.col(valueCol)); case "len" => F.count(F.lit(1))
    }
    DataFrame(df.groupBy(index.map(F.col): _*).pivot(on, values).agg(agg))
  }
  /** unstack: long→wide by chunking every `step` rows (reference:
    * data_frame.rb:3180). Small-data reshape. */
  /** unstack (reference data_frame.rb:3180): `step` is the number of ROWS
    * in the unstacked frame; each source column splits into ceil(n/step)
    * parts. `how: "vertical"` (the reference default) fills parts from
    * consecutive row BLOCKS (part j = rows [j*step, (j+1)*step));
    * "horizontal" deals rows round-robin (output row i = inputs
    * i*parts .. i*parts+parts-1) — both data_frame.rb goldens. (The
    * previous spelling transposed the two and only matched on square
    * shapes.) */
  def unstack(step: Int, how: String = "vertical", columns0: Seq[String] = Nil): DataFrame = {
    require(Set("vertical", "horizontal")(how),
      s"unstack: how must be vertical|horizontal, got '$how'")
    val cols = if (columns0.nonEmpty) columns0 else columns
    val n = df.count()
    val parts = math.max(1L, (n + step - 1) / step).toInt
    val d = RowIndex.attachDense(df)
    val (r, c) =
      if (how == "vertical")
        (F.col(RowIndex.name) % step, (F.col(RowIndex.name) / step).cast("long"))
      else
        ((F.col(RowIndex.name) / parts).cast("long"), F.col(RowIndex.name) % parts)
    val grouped = d.withColumn("__r__", r).withColumn("__c__", c)
    val aggs = cols.flatMap { col0 =>
      (0 until parts).map(j =>
        F.first(F.when(F.col("__c__") === j, F.col(col0)), ignoreNulls = true)
          .as(s"${col0}_$j"))
    }
    DataFrame(grouped.groupBy("__r__").agg(aggs.head, aggs.tail: _*)
      .orderBy("__r__").drop("__r__"))
  }

  /** to_dummies (reference: data_frame.rb:4048). */
  def toDummies(cols: Seq[String], separator: String = "_", dropFirst: Boolean = false): DataFrame = {
    var out = df
    for (c <- cols) {
      val vals = df.select(c).distinct().orderBy(c).collect().map(_.get(0)).toSeq
      val keep = if (dropFirst) vals.drop(1) else vals
      for (v <- keep)
        out = out.withColumn(s"$c$separator$v", F.when(F.col(c) === F.lit(v), 1).otherwise(0).cast("byte"))
      out = out.drop(c)
    }
    DataFrame(out)
  }
}

/** Lazy frame — Spark Datasets are already lazy logical plans; `collect`
  * materializes (reference: lib/polars/lazy_frame.rb:333). */
final case class LazyFrame(private val df: SDF) extends FrameOps[LazyFrame] {
  protected def sdf: SDF = df
  protected def make(d: SDF): LazyFrame = LazyFrame(d)
  def collect(): DataFrame = DataFrame(df)
  /** polars fetch: run the query over the first n rows OF EACH SOURCE
    * (debug semantics; reference lazy_frame.rb:769 — group_by.agg after
    * fetch(2) aggregates only the first 2 input rows), not limit-the-result. */
  def fetch(n: Int): DataFrame =
    DataFrame(org.apache.spark.sql.GraftInternalOps.limitSources(df, n))
  def cachePlan(): LazyFrame = LazyFrame(df.cache())
  def describePlan(): String = df.queryExecution.logical.toString
  def describeOptimizedPlan(): String = df.queryExecution.optimizedPlan.toString
  def sinkParquet(path: String): Unit = df.write.mode("overwrite").parquet(path)
  def sinkCsv(path: String): Unit = df.write.mode("overwrite").option("header", true).csv(path)
  def sinkNdjson(path: String): Unit = df.write.mode("overwrite").json(path)
  def sinkIpc(path: String): Unit = graft.io.ArrowIpc.write(df, path)
  def dtypes: Seq[org.apache.spark.sql.types.DataType] =
    df.schema.fields.map(_.dataType).toSeq
  def pipe[T](f: LazyFrame => T): T = f(this)
}
