package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Minimal internal-API bridge (this package placement reaches `private[sql]`
  * members).
  *
  * Dense row indexing needs two jobs over the SAME lineage — a per-partition
  * count, then the indexed map — so that shuffle outputs are reused and both
  * passes see identical partition boundaries (separate executions of a sorted
  * plan can sample different range-partition bounds). `RDD.zipWithIndex` on
  * `df.rdd` gives exactly that but converts every row to an external `Row`
  * (per-field boxing) and back. Zipping `queryExecution.toRdd` keeps rows in
  * the Tungsten binary format end to end: the only per-row cost is an
  * UnsafeRow byte copy.
  */
object GraftInternalOps {

  /** Wrap a raw Catalyst Expression as a user-facing Column (and back) —
    * needed to use graft's native expressions from library code without a
    * function-registry round trip. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's lazy ColumnNode AST into the catalyst
    * expression tree (ExpressionUtils.expression returns an opaque wrapper) —
    * needed for structural introspection (Expr.meta). */
  def catalystExpression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Remove any top-level alias so a caller can re-alias deterministically. */
  def stripAlias(c: Column): Column = {
    def strip(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = e match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => strip(a.child)
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias => strip(a.child)
      case other => other
    }
    column(strip(catalystExpression(c)))
  }

  /** Window-safe spelling for DISTINCT count aggregates: Spark rejects
    * `count(DISTINCT x) OVER w`, but `collect_set(x) OVER w` is legal and
    * `size` of it computes the same value (both ignore nulls). Returns the
    * column to window plus a wrapper to apply OUTSIDE the window — the
    * window function must be the bare aggregate, so the `size` cannot sit
    * inside it. Non-distinct aggregates pass through as (c, identity). */
  def distinctWindowSpelling(c: Column): (Column, Column => Column) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    catalystExpression(stripAlias(c)) match {
      case f: UnresolvedFunction
          if f.isDistinct && f.nameParts.map(_.toLowerCase) == Seq("count") &&
            f.arguments.size == 1 =>
        // cast to long so the op's dtype matches its group-by spelling
        // (count(distinct) returns bigint; size returns int); a root alias
        // on the original re-applies outside the wrapper
        val sized: Column => Column =
          w => org.apache.spark.sql.functions.size(w)
            .cast(org.apache.spark.sql.types.LongType)
        val wrap = rootAliasName(c) match {
          case Some(n) => sized.andThen(_.as(n))
          case None => sized
        }
        (column(f.copy(isDistinct = false, nameParts = Seq("collect_set"))), wrap)
      case _ => (c, identity)
    }
  }

  /** True when an unresolved function call resolves to a builtin aggregate
    * (the tree is unresolved at Expr-composition time, so class checks need
    * the registry's builder). */
  private def resolvesToAggregate(
      f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction): Boolean =
    f.nameParts.size == 1 && scala.util.Try {
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.lookupFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(f.nameParts.head.toLowerCase),
        f.arguments)
    }.toOption.exists {
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction => true
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => true
      case _ => false
    }

  /** True when the column contains an aggregate function NOT wrapped in a
    * window — a projection of such an expr collapses the frame to one row
    * (`select(col.str.join(","))`), so selecting the hidden row index
    * alongside it would be MISSING_GROUP_BY. Windowed aggregates are row-
    * parallel and return false. */
  def hasBareAggregate(c: Column): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions.WindowExpression
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction}
    def isAggName(f: UnresolvedFunction): Boolean = {
      val resolved = scala.util.Try {
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.lookupFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(f.nameParts.head.toLowerCase),
          f.arguments)
      }.toOption
      // unknown names are NOT aggregates: misclassifying a session UDF as
      // one would silently skip the frame-order restore for a mixed
      // UDF+scanned select; a true aggregate that slips through fails
      // loudly (MISSING_GROUP_BY) instead of reordering rows quietly
      resolved.exists {
        case _: AggregateFunction   => true
        case _: AggregateExpression => true
        case _                      => false
      }
    }
    def scan(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = e match {
      case _: WindowExpression                                        => false
      case w if w.getClass.getSimpleName == "UnresolvedWindowExpression" => false
      case f: UnresolvedFunction                                      => isAggName(f) || f.children.exists(scan)
      case _: AggregateExpression | _: AggregateFunction              => true
      case other                                                      => other.children.exists(scan)
    }
    scan(catalystExpression(c))
  }

  /** Pull every MAXIMAL non-windowed aggregate subtree out of `c`,
    * replacing each with a reference to a fresh helper column — the
    * polars scalar-broadcast rule for mixed projections
    * (`select(col("names"), sum("nrs"))`, `when(..).otherwise(r) * sum(n)`):
    * the scalars compute once in a single global aggregate pass and
    * broadcast-cross-join back against the full-length columns. Returns
    * the rewritten column plus (helperName, aggregateColumn) pairs; an
    * empty pair list means the expr had no bare aggregate. Windowed
    * aggregates stay in place (already row-parallel). */
  def extractBareAggregates(c: Column): (Column, Seq[(String, Column)]) = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
    import org.apache.spark.sql.catalyst.expressions.{Expression, WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction}
    def isAggName(f: UnresolvedFunction): Boolean = {
      val resolved = scala.util.Try {
        org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.lookupFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(f.nameParts.head.toLowerCase),
          f.arguments)
      }.toOption
      resolved.exists {
        case _: AggregateFunction   => true
        case _: AggregateExpression => true
        case _                      => false
      }
    }
    val acc = scala.collection.mutable.Buffer[(String, Column)]()
    def walk(e: Expression): Expression = e match {
      case w: WindowExpression => w
      case w if w.getClass.getSimpleName == "UnresolvedWindowExpression" => w
      case f: UnresolvedFunction if isAggName(f) =>
        val h = graft.kernel.Scan.fresh("s")
        acc += h -> column(f)
        UnresolvedAttribute.quoted(h)
      case a: AggregateExpression =>
        val h = graft.kernel.Scan.fresh("s")
        acc += h -> column(a)
        UnresolvedAttribute.quoted(h)
      case other => other.mapChildren(walk)
    }
    val rewritten = walk(catalystExpression(c))
    (column(rewritten), acc.toSeq)
  }

  /** True when the column still references a real (non-helper) input column
    * — used on [[extractBareAggregates]] output to tell a PURE scalar
    * aggregate (no residual refs: the classic 1-row global-agg select) from
    * a mixed elementwise/scalar expr that needs the broadcast join. */
  def referencesNonHelperColumns(c: Column): Boolean = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
    var found = false
    catalystExpression(c).foreach {
      case a: UnresolvedAttribute if !a.name.startsWith("__graft_") => found = true
      case _: UnresolvedStar => found = true
      case _ =>
    }
    found
  }

  /** True when the (unresolved) tree PROVABLY contains no aggregate — the
    * polars agg-surface test: an aggregate-free expression inside
    * `group_by().agg` evaluates elementwise and IMPLODES to a per-group
    * list. Conservative on purpose: a function the SQL registry cannot
    * resolve (DSL-only aggregates like `product`/`mode` surface as
    * unresolvable names) or any window expression makes this false, so
    * unknowns keep their pre-existing aggregate treatment instead of being
    * silently imploded. */
  def provablyAggregateFree(c: Column): Boolean = {
    var ok = true
    catalystExpression(c).foreach {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
        val resolved = scala.util.Try {
          org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.lookupFunction(
            org.apache.spark.sql.catalyst.FunctionIdentifier(f.nameParts.head.toLowerCase),
            f.arguments)
        }.toOption
        val nonAgg = f.nameParts.size == 1 && resolved.exists {
          case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction => false
          case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => false
          case _ => true
        }
        if (!nonAgg) ok = false
      case _: org.apache.spark.sql.catalyst.expressions.WindowExpression => ok = false
      case e if e.getClass.getSimpleName == "UnresolvedWindowExpression" => ok = false
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ok = false
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction => ok = false
      case _ =>
    }
    ok
  }

  /** Per-key broadcast spelling for a PLAIN aggregate operand reached by a
    * keyed composition — polars' `(x.shift(1) + w.sum).over(k)` broadcasts
    * the per-key sum. A bare (possibly aliased) aggregate becomes
    * `agg OVER (PARTITION BY keys)` (distinct aggregates via the
    * collect_set spelling); an aggregate buried inside larger structure has
    * no bare-window form and raises the directed error instead of dying in
    * Spark's analyzer; anything aggregate-free returns None (elementwise). */
  /** Window EVERY embedded aggregate over the keys. Polars broadcasts a
    * composite aggregate expression per key (`std(ddof: 0).over(k)` is
    * rescaled var_samp * count arithmetic; the Kleene any/all spellings mix
    * bool_or with counts), but Spark's WindowExpression child must be ONE
    * bare aggregate — so each aggregate node in the tree gets its own
    * identical window (Catalyst dedupes the repeated window spec into one
    * Window operator). Returns None when no aggregate appears (elementwise
    * or rank-family columns keep their existing whole-column spelling). */
  def windowCompositeAggregates(c: Column, keys: Seq[Column]): Option[Column] =
    windowCompositeAggregates(c,
      org.apache.spark.sql.expressions.Window.partitionBy(keys: _*))

  /** WindowSpec form — lets range-framed windows (rolling kernels) spell
    * composite aggregates (std(ddof:), null-coalesced sums) by windowing
    * each embedded aggregate over the caller's frame. */
  def windowCompositeAggregates(
      c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Option[Column] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    val expr = catalystExpression(c)
    val hasAgg = expr.exists {
      case f: UnresolvedFunction => resolvesToAggregate(f)
      case _ => false
    }
    if (!hasAgg) None
    // transformUp: post-order, so the rule never revisits the WindowExpression
    // it just built around an aggregate (top-down transform would recurse into
    // the new node's child — the same aggregate — forever)
    else Some(column(expr.transformUp {
      case f: UnresolvedFunction if resolvesToAggregate(f) =>
        val (winnable, wrap) = distinctWindowSpelling(column(f))
        catalystExpression(wrap(winnable.over(w)))
    }))
  }

  def perKeyBroadcastSpelling(c: Column, keys: Seq[Column]): Option[Column] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    val stripped = stripAlias(c)
    catalystExpression(stripped) match {
      case f: UnresolvedFunction if resolvesToAggregate(f) =>
        val (winnable, wrap) = distinctWindowSpelling(stripped)
        val windowed = wrap(winnable.over(
          org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)))
        Some(rootAliasName(c).fold(windowed)(windowed.as(_)))
      // null-coalesced aggregate (graft's polars-sum spelling
      // coalesce(sum(x), 0)): window the aggregate head, keep the literal
      // fallback outside the window — still a bare broadcastable form
      case f: UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("coalesce") &&
            f.arguments.headOption.exists {
              case g: UnresolvedFunction => resolvesToAggregate(g)
              case _ => false
            } &&
            f.arguments.tail.forall(!_.exists {
              case g: UnresolvedFunction => resolvesToAggregate(g)
              case _ => false
            }) =>
        val g = f.arguments.head.asInstanceOf[UnresolvedFunction]
        val (winnable, wrap) = distinctWindowSpelling(column(g))
        val windowed = wrap(winnable.over(
          org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)))
        val rebuilt = column(f.copy(
          arguments = catalystExpression(windowed) +: f.arguments.tail))
        Some(rootAliasName(c).fold(rebuilt)(rebuilt.as(_)))
      case e if e.exists {
          case f: UnresolvedFunction => resolvesToAggregate(f)
          case _ => false
        } =>
        throw new UnsupportedOperationException(
          "over(keys): an operand mixes an aggregate into a larger expression " +
            "with no bare per-key window form; materialize the aggregate per " +
            "key first (with_column(\"t\" -> agg.over(keys))) and compose on " +
            "the new column")
      case _ => None
    }
  }

  /** Root-level alias name only (an explicit user `.as(name)`), None for
    * everything else — used where default engine-generated names must not
    * count (e.g. duplicate-output detection over plain aggregates). */
  def rootAliasName(c: Column): Option[String] = catalystExpression(c) match {
    case a: org.apache.spark.sql.catalyst.expressions.Alias => Some(a.name)
    case _ => None
  }

  /** The first alias name anywhere in the expression tree (preorder) — a
    * user alias may sit under later elementwise transforms (cast, etc.). */
  def firstAliasName(c: Column): Option[String] = {
    def find(e: org.apache.spark.sql.catalyst.expressions.Expression): Option[String] =
      e match {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => Some(a.name)
        case other => other.children.view.flatMap(find(_)).headOption
      }
    find(catalystExpression(c))
  }

  /** Fuse an hstack of two projections over canonically-equal bases into ONE
    * projection over the shared base: hstack pairs row i of each side, and
    * when both sides are `Project(_, B)` with the same `B` (up to
    * canonicalization — any B: scan, filter, sort, join), per-row pairing is
    * exactly `Project(leftList ++ rightList, B)`. One execution, no index, no
    * shuffle, stays columnar/codegen — and sidesteps cross-execution
    * nondeterminism (re-executing a sorted base can sample different range
    * bounds). Returns None when the bases differ or output names would
    * collide (callers fall back to the dense-index join). */
  def fusedHstack(a: DataFrame, b: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeMap, AttributeReference, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    val da = a.asInstanceOf[classic.Dataset[Row]]
    val db = b.asInstanceOf[classic.Dataset[Row]]
    def split(p: LogicalPlan): (Seq[NamedExpression], LogicalPlan) = p match {
      case Project(list, c) => (list, c)
      case other => (other.output, other)
    }
    // analyzed (not optimized) plans: the optimizer pushes column pruning
    // below sorts/joins, reshaping each side's base differently — the
    // analyzed tree still has the user's Project directly over the shared
    // base, and the fused Project re-optimizes afterwards anyway
    val (la, ba) = split(da.queryExecution.analyzed)
    val (lb, bb) = split(db.queryExecution.analyzed)
    if (!ba.sameResult(bb)) return None
    val attrMap = AttributeMap(bb.output.zip(ba.output))
    val lbRemapped = lb.map(_.transform {
      case ar: AttributeReference => attrMap.getOrElse(ar, ar)
    }.asInstanceOf[NamedExpression])
    val names = (la ++ lbRemapped).map(_.name)
    if (names.distinct.size != names.size) return None
    Some(classic.Dataset.ofRows(da.sparkSession, Project(la ++ lbRemapped, ba)))
  }

  /** polars `fetch(n)` semantics: limit every LEAF relation of the plan to
    * its first n rows, so the QUERY runs over truncated sources (debug
    * semantics — reference lazy_frame.rb:769 runs group_by.agg over only the
    * first n input rows), unlike `limit(n)` which truncates the result.
    * transformUp so each leaf is wrapped exactly once. */
  def limitSources(df: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Limit, LogicalPlan}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val limited = df.queryExecution.logical.transformUp {
      case l: LeafNode => Limit(Literal(n), l): LogicalPlan
    }
    classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession], limited)
  }

  /** True when a projected `monotonically_increasing_id` over this plan is
    * BRANCH-STABLE — i.e. two differently-pruned executions of the plan (the
    * sides of a self-join) enumerate rows in the same (partition, offset)
    * layout. Holds for narrow scan-rooted plans (leaf/project/filter with
    * deterministic expressions): file scans fix row order regardless of
    * pruning. Does NOT hold once a shuffle is involved — round-robin scatter
    * orders by the pruned binary row and reduce-fetch interleaving varies
    * per execution — or when any expression is nondeterministic. Kernels
    * that join results back to their input by a synthesized id must check
    * this and fall back to data-derived join keys. */
  def idStableLayout(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LocalRelation, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    !df.asInstanceOf[classic.Dataset[Row]].queryExecution.optimizedPlan.exists {
      case p: Project => p.expressions.exists(!_.deterministic)
      case f: Filter => f.expressions.exists(!_.deterministic)
      // only FILE-backed and local leaves fix row order across executions; a
      // JDBC/datasource-v2 leaf without an ORDER BY may return rows in any
      // order per query, so its leaf passes for unstable
      case lr: LogicalRelation => !lr.relation.isInstanceOf[HadoopFsRelation]
      case _: LocalRelation => false
      case _: SubqueryAlias => false
      case _: LeafNode => true
      case _ => true
    }
  }

  /** The plan's InternalRow RDD — Tungsten-format rows for per-partition
    * imperative kernels (histogram selection). Rows are REUSED buffers: read
    * scalars only, never store a reference across `next()`. */
  def internalRows(df: DataFrame): org.apache.spark.rdd.RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** `df` with a trailing dense 0-based long index column, same row order and
    * partitioning as `df`'s execution. */
  def zipWithDenseIndex(df: DataFrame, name: String): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val schema = StructType(df.schema.fields :+ StructField(name, LongType, nullable = false))
    val zipped = ds.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      it.map { case (row, i) =>
        new JoinedRow(row.copy(), new GenericInternalRow(Array[Any](i))): InternalRow
      }
    }
    ds.sparkSession.internalCreateDataFrame(zipped, schema)
  }
}
