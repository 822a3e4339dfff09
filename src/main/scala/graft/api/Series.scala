package graft.api

import org.apache.spark.sql.{SparkSession, functions => F, DataFrame => SDF}
import org.apache.spark.sql.types._
import graft.expr.Expr

/** Named, typed 1-D column (reference: lib/polars/series.rb:35). On Spark this
  * is a one-column DataFrame with a retained name; eager accessors collect.
  * The unit of eager compute in the reference; here mostly a convenience shim —
  * distributed work should stay on frames.
  */
final case class Series(name: String, df: SDF) {
  def dtype: DataType = df.schema.head.dataType
  def len: Long = df.count()
  def toList: List[Any] = df.collect().map(r => r.get(0)).toList
  def rename(newName: String): Series = Series(newName, df.select(F.col(name).as(newName)))
  def alias(newName: String): Series = rename(newName) // reference series.rb alias
  def toFrame: DataFrame = DataFrame(df)

  /** Element-wise arithmetic between equal-length series — positional zip via
    * the dense row index (reference series.rb:148-412 operators). */
  private def zipWith(other: Series, f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                      outName: String): Series = {
    val IDX = graft.kernel.RowIndex.name
    val a = graft.kernel.RowIndex.attachDense(df)
    val b = graft.kernel.RowIndex.attachDense(other.rename("__other__").df)
    Series(outName, a.join(b, IDX).orderBy(IDX)
      .select(f(F.col(name), F.col("__other__")).as(outName)))
  }
  // polars Utf8 + Utf8 CONCATENATES (Rust ChunkedArray<Utf8> add impl);
  // the Series surface knows its dtype, so the operator is type-directed
  // here (the untyped Expr `+` stays numeric — COVERAGE.md documents
  // concat_str as the Expr-side spelling)
  def +(o: Series): Series =
    if (dtype == org.apache.spark.sql.types.StringType)
      zipWith(o, F.concat(_, _), name)
    else zipWith(o, _ + _, name)
  def -(o: Series): Series = zipWith(o, _ - _, name)
  def *(o: Series): Series = zipWith(o, _ * _, name)
  def /(o: Series): Series = zipWith(o, _ / _, name)
  // comparisons (reference series.rb ==/!=/</>/<=/>= — series and scalar
  // operands; Spark comparison semantics give polars' NaN == NaN true)
  def eqSeries(o: Series): Series = zipWith(o, _ === _, name)
  def neSeries(o: Series): Series = zipWith(o, _ =!= _, name)
  def ltSeries(o: Series): Series = zipWith(o, _ < _, name)
  def gtSeries(o: Series): Series = zipWith(o, _ > _, name)
  def leSeries(o: Series): Series = zipWith(o, _ <= _, name)
  def geSeries(o: Series): Series = zipWith(o, _ >= _, name)
  // eq_missing/ne_missing: null == null is true (reference series.rb:305)
  def eqMissing(o: Series): Series = zipWith(o, _ <=> _, name)
  def neMissing(o: Series): Series = zipWith(o, (a, b) => !(a <=> b), name)
  /** Element mask pick: where `mask` take this, else `other` (reference
    * series.rb zip_with). */
  def zipWith(mask: Series, other: Series): Series = {
    // polars raises ShapeError on a length mismatch (same discipline as
    // Series#filter) — the positional join would silently truncate to the
    // shorter series
    require(mask.len == len,
      s"Series.zip_with: mask length ${mask.len} != series length $len")
    require(other.len == len,
      s"Series.zip_with: other length ${other.len} != series length $len")
    val a = graft.kernel.RowIndex.attachDense(df)
    val m = graft.kernel.RowIndex.attachDense(mask.rename("__m__").df)
    val b = graft.kernel.RowIndex.attachDense(other.rename("__o__").df)
    Series(name, a.join(m, IDX).join(b, IDX).orderBy(IDX)
      .select(F.when(F.col("__m__"), F.col(name)).otherwise(F.col("__o__")).as(name)))
  }
  /** Dot product scalar (reference series.rb dot). */
  def dot(o: Series): Any = {
    // polars raises ShapeError on a length mismatch — the positional join
    // would silently truncate and return a wrong scalar
    require(o.len == len,
      s"Series.dot: other length ${o.len} != series length $len")
    val a = graft.kernel.RowIndex.attachDense(df)
    val b = graft.kernel.RowIndex.attachDense(o.rename("__o__").df)
    a.join(b, IDX).agg(F.sum(F.col(name) * F.col("__o__"))).collect()(0).get(0)
  }
  /** Sortedness-flag shim (reference set_sorted — Spark has no per-column
    * sortedness metadata; ordering invariants live in the plan). */
  def setSorted(descending: Boolean = false): Series = this
  /** Membership of each element in ANOTHER series' values (reference
    * series.rb is_in(Series)) — broadcast left join on the value, row
    * order restored via the dense index; never a driver-side collect. */
  def isIn(other: Series): Series = {
    val probe = F.broadcast(other.df.select(F.col(other.name).as("__v__")).distinct())
    Series(name, indexed
      .join(probe, F.col(name) <=> F.col("__v__"), "left")
      .orderBy(IDX)
      .select(F.col("__v__").isNotNull.as(name)))
  }
  /** Value replacement keeping the ORIGINAL dtype (reference series.rb
    * replace goldens: {"x"=>1} over a str series yields "1"). */
  def replace(mapping: Map[Any, Any]): Series =
    map(_.replaceValues(mapping).cast(dtype))
  def replace(old: Any, nw: Any): Series = replace(Map(old -> nw))
  def replace(olds: Seq[Any], news: Seq[Any]): Series = {
    require(olds.size == news.size, "replace: old/new length mismatch")
    replace(olds.zip(news).toMap)
  }
  def eqScalar(v: Any): Series = Series(name, df.select((F.col(name) === F.lit(v)).as(name)))
  def neScalar(v: Any): Series = Series(name, df.select((F.col(name) =!= F.lit(v)).as(name)))
  def ltScalar(v: Any): Series = Series(name, df.select((F.col(name) < F.lit(v)).as(name)))
  def gtScalar(v: Any): Series = Series(name, df.select((F.col(name) > F.lit(v)).as(name)))
  def leScalar(v: Any): Series = Series(name, df.select((F.col(name) <= F.lit(v)).as(name)))
  def geScalar(v: Any): Series = Series(name, df.select((F.col(name) >= F.lit(v)).as(name)))
  def isEmpty: Boolean = df.isEmpty
  /** One-hot encode this series (reference series.rb to_dummies). */
  def toDummies(separator: String = "_"): DataFrame =
    DataFrame(df).toDummies(Seq(name), separator)

  private def scalar(e: Expr): Any = df.select(e.col).collect()(0).get(0)
  // sum/mean/min/max through Expr so the polars semantics apply uniformly:
  // empty/all-null sum is 0 (expr.rb:2713), extrema skip NaN (expr.rb
  // goldens), and booleans numericize under sum/mean (BoolToInt)
  def sum: Any = scalar(Expr(F.col(name)).sum)
  def mean: Any = scalar(Expr(F.col(name)).mean)
  def min: Any = scalar(Expr(F.col(name)).min)
  def max: Any = scalar(Expr(F.col(name)).max)
  def median: Any = scalar(Expr(F.median(F.col(name))))
  // std/var of a non-numeric series is null, not an analysis error
  // (series_test.rb test_std: std of a str series is nil)
  def std: Any = if (!isNumeric && dtype != BooleanType) null
    else scalar(Expr(F.stddev_samp(Expr.boolAsInt(F.col(name)))))
  def variance: Any = if (!isNumeric && dtype != BooleanType) null
    else scalar(Expr(F.var_samp(Expr.boolAsInt(F.col(name)))))
  def nUnique: Long = df.select(F.countDistinct(F.col(name))).collect()(0).getLong(0)
  /** any?/all?/none? (reference series.rb:534-560): boolean aggregates;
    * ignore_nulls=false applies Kleene logic (may return null). */
  def any(ignoreNulls: Boolean = true): Any = scalar(Expr(F.col(name)).any(ignoreNulls))
  def all(ignoreNulls: Boolean = true): Any = scalar(Expr(F.col(name)).all(ignoreNulls))
  def none: Boolean = any() == false

  // dtype predicates (reference series.rb is_numeric/is_float/is_boolean/
  // is_utf8/is_datelike)
  def isNumeric: Boolean = dtype.isInstanceOf[org.apache.spark.sql.types.NumericType]
  def isFloat: Boolean = dtype == DoubleType || dtype == FloatType
  def isBoolean: Boolean = dtype == BooleanType
  def isUtf8: Boolean = dtype == StringType
  def isDatelike: Boolean = dtype == DateType || dtype == TimestampType

  // memory-surface shims (chunks = partitions on Spark)
  def chunkLengths: Seq[Long] = {
    val counts = df.rdd.mapPartitions(it => Iterator(it.size.toLong), true).collect()
    counts.toSeq
  }
  def shrinkToFit: Series = this
  /** Empty series with the same name/dtype (reference series.rb cleared). */
  def cleared: Series = Series(name, df.limit(0))

  /** sort (reference series.rb:1586 sort(reverse:, nulls_last:)): polars
    * places nulls FIRST by default in both directions; ties keep row order. */
  def sort(descending: Boolean = false, nullsLast: Boolean = false): Series =
    Series(name, indexed
      .orderBy(SortKey.of(F.col(name), descending, nullsLast), F.col(IDX).asc)
      .select(F.col(name)))
  /** top_k/bottom_k (reference series.rb:1613,1635): nulls sort last —
    * included only when fewer than k non-null values exist. */
  def topK(k: Int = 5): Series =
    Series(name, df.orderBy(F.col(name).desc_nulls_last).limit(k))
  def bottomK(k: Int = 5): Series =
    Series(name, df.orderBy(F.col(name).asc_nulls_last).limit(k))
  /** reverse (reference series.rb:2208). */
  def reverse: Series =
    Series(name, indexed.orderBy(F.col(IDX).desc).select(F.col(name)))

  /** Seeded shuffle / sample (reference series.rb shuffle/sample) — the
    * order/selection is a deterministic function of the seed and values. */
  def shuffle(seed: Long = 42): Series =
    Series(name, df.orderBy(F.xxhash64(F.lit(seed), F.col(name).cast("string"),
      F.monotonically_increasing_id())))
  def sample(fraction: Double, seed: Long = 42, withReplacement: Boolean = false): Series =
    Series(name, df.sample(withReplacement, fraction, seed))

  // route through the frame layer so scanned exprs (shift/cum/fill/rank)
  // built inside the mapper get their preps resolved
  // namespaces (reference *_name_space.rb — expression-dispatched there,
  // Series.map-forwarded here; see SeriesNamespaces.scala)
  def dt: SeriesDtNS = new SeriesDtNS(this)
  def str: SeriesStrNS = new SeriesStrNS(this)
  def list: SeriesListNS = new SeriesListNS(this)
  def arr: SeriesListNS = new SeriesListNS(this)
  def bin: SeriesBinNS = new SeriesBinNS(this)
  def cat: SeriesCatNS = new SeriesCatNS(this)
  def struct: SeriesStructNS = new SeriesStructNS(this)

  def map(e: Expr => Expr): Series =
    Series(name, DataFrame(df).select(e(Expr(F.col(name))).alias(name)).toSpark)

  /** diff with polars' null_behavior (reference series.rb diff): "ignore"
    * keeps the leading null(s); "drop" removes the first |n| rows — legal
    * here because a Series owns its own length. */
  def diff(n: Int = 1, nullBehavior: String = "ignore"): Series =
    nullBehavior match {
      case "ignore" => map(_.diff(n))
      case "drop" =>
        val d = DataFrame(df).select(Expr(F.col(name)).diff(n).alias(name))
        val dropped =
          if (n >= 0) d.slice(n.toLong, (Int.MaxValue - math.max(n, 1)).toLong)
          else { // negative periods: the TRAILING |n| rows are the nulls
            val h = d.toSpark.count()
            d.slice(0L, math.max(0L, h + n))
          }
        Series(name, dropped.toSpark)
      case other => throw new IllegalArgumentException(
        s"diff: null_behavior must be ignore|drop, got '$other'")
    }
  def cast(dt: DataType): Series = map(_.cast(dt))
  // cut/qcut on the Series surface (reference series.rb:874/930) — delegate
  // to the Expr kernels; categorical output is physically str (§1.2)
  def cut(breaks: Seq[Double], labels: Option[Seq[String]] = None,
          leftClosed: Boolean = false, includeBreaks: Boolean = false): Series = {
    val base = map(_.cut(breaks, labels, leftClosed, includeBreaks))
    // the Series surface renames the struct fields to break_point/category
    // (reference series.rb:919 struct.rename_fields) while the Expr level
    // keeps polars' documented {breakpoint, category}
    if (!includeBreaks) base else base.renameStructFields("break_point", "category")
  }
  def qcut(quantiles: Seq[Double], labels: Seq[String]): Series =
    map(_.qcut(quantiles, labels))
  def qcut(quantiles: Seq[Double], labels: Option[Seq[String]] = None,
           leftClosed: Boolean = false, allowDuplicates: Boolean = false,
           includeBreaks: Boolean = false): Series = {
    val base = map(_.qcut(quantiles, labels, leftClosed, allowDuplicates, includeBreaks))
    // series surface renames to break_point/category (series.rb:1005)
    if (!includeBreaks) base else base.renameStructFields("break_point", "category")
  }
  def qcut(k: Int, labels: Option[Seq[String]], leftClosed: Boolean,
           allowDuplicates: Boolean, includeBreaks: Boolean): Series =
    qcut((1 until k).map(_.toDouble / k), labels, leftClosed, allowDuplicates, includeBreaks)

  private def renameStructFields(names: String*): Series = {
    val st = dtype.asInstanceOf[org.apache.spark.sql.types.StructType]
    require(names.size == st.size, s"rename_fields: ${names.size} names for ${st.size} fields")
    Series(name, df.select(F.struct(
      st.fieldNames.zip(names).map { case (o, n) => F.col(name).getField(o).as(n) }: _*).as(name)))
  }

  /** drop_nulls / drop_nans (reference expr.rb:847/874 — length-changing,
    * so they live on the eager Series surface): drop_nulls keeps NaN
    * (a float VALUE); drop_nans keeps null (missing ≠ NaN, SURVEY §1.2). */
  def dropNulls: Series = Series(name, df.filter(F.col(name).isNotNull))
  def dropNans: Series =
    Series(name, df.filter(F.col(name).isNull || !F.isnan(F.col(name))))

  /** mode (reference series.rb:2585): the most frequent value(s) — can be
    * multi-valued; one hash aggregate plus a broadcast max-count filter. */
  def mode: Series = {
    val counts = df.groupBy(F.col(name)).agg(F.count(F.lit(1)).as("__n__"))
    val top = counts.agg(F.max(F.col("__n__"))).collect()(0).getLong(0)
    Series(name, counts.filter(F.col("__n__") === top).select(F.col(name)))
  }

  /** map_elements with an ARBITRARY per-element closure (reference
    * series.rb:2885; dispatcher ext/polars/src/map/series.rs:10-68). Runs as
    * a typed `Dataset.map` — distributed, one pass over the partitions, no
    * driver collect — but opaque to Catalyst, exactly like the reference's
    * Ruby-block dispatch leaves Polars' optimizer: prefer [[map]] (expression
    * form) whenever the transform is expressible. Nulls pass through without
    * invoking `f` (the reference's skip_nulls: true default). */
  def mapElements[I, O](f: I => O)(implicit ie: org.apache.spark.sql.Encoder[Option[I]],
                                   oe: org.apache.spark.sql.Encoder[Option[O]]): Series = {
    val mapped = df.select(F.col(name)).as[Option[I]](ie)
      .map((v: Option[I]) => v.map(f))(oe)
    Series(name, mapped.toDF(name))
  }

  /** map_elements returning the raw Dataset for callers that want to keep
    * composing typed transforms (reference returns a Series likewise). */
  def mapElementsStrict[I, O](f: I => O)(implicit ie: org.apache.spark.sql.Encoder[I],
                                         oe: org.apache.spark.sql.Encoder[O]): Series =
    Series(name, df.select(F.col(name)).as[I](ie).map(f)(oe).toDF(name))

  // ---- reference-surface long tail (series.rb) ----
  /** Vertical concat with another series (reference series.rb append /
    * extend; immutable here — returns the combined series). */
  def append(other: Series): Series =
    Series(name, df.unionAll(other.df.select(F.col(other.name).as(name))))
  /** Named comparison spellings (reference eq/ne/gt/ge/lt/le). */
  def eq(o: Series): Series = zipWith(o, _ === _, name)
  def ne(o: Series): Series = zipWith(o, _ =!= _, name)
  def gt(o: Series): Series = zipWith(o, _ > _, name)
  def ge(o: Series): Series = zipWith(o, _ >= _, name)
  def lt(o: Series): Series = zipWith(o, _ < _, name)
  def le(o: Series): Series = zipWith(o, _ <= _, name)
  /** Whole-series equality (reference series.rb equals(null_equal:)) —
    * positional, name-insensitive. */
  def seriesEquals(o: Series, nullEqual: Boolean = true): Boolean = {
    if (dtype != o.dtype) return false
    val l = indexed
    val r = graft.kernel.RowIndex.attachDense(o.df.select(F.col(o.name).as(name)))
    val cmp = if (nullEqual) F.col(s"l.$name") <=> F.col(s"r.$name")
              else F.col(s"l.$name") === F.col(s"r.$name")
    val j = l.as("l").join(r.as("r"), F.col(s"l.$IDX") === F.col(s"r.$IDX"), "full")
    j.filter(!F.coalesce(cmp, F.lit(false))).isEmpty
  }
  /** True when the series contains no nulls... inverted per the reference:
    * has_validity = "are there any nulls" in polars 0.41 (series.rb). */
  def hasValidity: Boolean = df.filter(F.col(name).isNull).limit(1).count() > 0
  /** Element dtype of a List series (reference series.rb inner_dtype). */
  def innerDtype: Option[DataType] = dtype match {
    case ArrayType(et, _) => Some(et)
    case _ => None
  }
  /** Time unit of the temporal physical carrier — always µs here
    * (SURVEY §1.2 long-µs-ticks mapping; reference series.rb time_unit). */
  def timeUnit: String = "us"
  /** Row-level uniqueness masks (reference is_unique/is_first/is_last). */
  // polars keeps the SERIES NAME on these masks (series.rb:2002/2029
  // goldens render "Series: 'a' [bool]"), unlike the frame-level
  // is_unique()/is_duplicated() methods which name their output
  def isUnique: Series = maskOp(F.count(F.lit(1)), _ === 1, name)
  def isDuplicated: Series = maskOp(F.count(F.lit(1)), _ > 1, name)
  def isFirstDistinct: Series = Series("is_first_distinct",
    indexed.withColumn("__rn__", F.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(F.col(name)).orderBy(F.col(IDX))))
      .orderBy(IDX).select((F.col("__rn__") === 1).as("is_first_distinct")))
  private def maskOp(agg: org.apache.spark.sql.Column,
                     pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                     out: String): Series = Series(out,
    indexed.withColumn("__c__", agg.over(
        org.apache.spark.sql.expressions.Window.partitionBy(F.col(name))))
      .orderBy(IDX).select(pred(F.col("__c__")).as(out)))
  /** Constant series from one element of this one (reference
    * new_from_index(index, length)). */
  def newFromIndex(index: Long, length: Long): Series = {
    val v = indexed.filter(F.col(IDX) === index).select(name).collect()
    require(v.nonEmpty, s"new_from_index: index $index out of bounds")
    Series(name, df.sparkSession.range(length).select(F.lit(v(0).get(0)).as(name)))
  }
  /** Set values at positions (reference scatter / set-at-idx): positional
    * left join against the replacement map — no driver-side row loop. */
  def scatter(indices: Seq[Long], values: Seq[Any]): Series = {
    require(indices.length == values.length, "scatter: indices/values length mismatch")
    import df.sparkSession.implicits._
    val repl = indices.map(_.toString).zip(values.map(v => Option(v).map(_.toString)))
      .toDF("__i__", "__v__")
      .select(F.col("__i__").cast("long").as("__i__"),
        F.col("__v__").cast(dtype).as("__v__"))
    Series(name, indexed.join(repl, F.col(IDX) === F.col("__i__"), "left")
      .orderBy(IDX)
      .select(F.when(F.col("__i__").isNotNull, F.col("__v__"))
        .otherwise(F.col(name)).as(name)))
  }
  /** Boolean-mask set (reference set(filter, value)). */
  def set(mask: Series, value: Any): Series = {
    val l = indexed
    val r = graft.kernel.RowIndex.attachDense(mask.df.select(F.col(mask.name).as("__m__")))
    Series(name, l.join(r, IDX).orderBy(IDX)
      .select(F.when(F.col("__m__"), F.lit(value)).otherwise(F.col(name)).as(name)))
  }
  /** Every n-th element (reference gather_every / take_every). */
  def gatherEvery(n: Int, offset: Int = 0): Series = {
    require(n >= 1, s"gather_every: n must be >= 1, got $n")
    Series(name, indexed.filter((F.col(IDX) - offset) % n === 0 && F.col(IDX) >= offset)
      .orderBy(IDX).select(name))
  }
  def takeEvery(n: Int, offset: Int = 0): Series = gatherEvery(n, offset)
  /** Counts per distinct value (reference lib/polars/series.rb value_counts;
    * default sort: false matches its signature — pass sort=true for the
    * count-descending order). */
  def valueCounts(sort: Boolean = false, normalize: Boolean = false): DataFrame = {
    val cname = if (normalize) "proportion" else "count"
    val counted = df.groupBy(name).agg(F.count(F.lit(1)).as("__n__"))
    val valued =
      if (normalize)
        // scalar total via broadcast 1-row cross join, not a global window
        counted.crossJoin(F.broadcast(counted.agg(F.sum("__n__").as("__tot__"))))
          .withColumn(cname, F.col("__n__") / F.col("__tot__")).drop("__tot__")
      else counted.withColumn(cname, F.col("__n__"))
    val out = valued.drop("__n__")
    DataFrame(if (sort) out.orderBy(F.col(cname).desc) else out)
  }

  private def indexed = graft.kernel.RowIndex.attachDense(df)
  private val IDX = graft.kernel.RowIndex.name

  /** Counts per distinct value in first-seen order (reference series
    * unique_counts, lib/polars/series.rb:1120). */
  def uniqueCounts: Series = Series("unique_counts",
    indexed.groupBy(F.col(name))
      .agg(F.min(F.col(IDX)).as("__fs__"), F.count(F.lit(1)).as("unique_counts"))
      .orderBy("__fs__").select("unique_counts"))

  /** take/gather by positional indices, output in the given order
    * (reference series.rb gather, alias take). */
  def gather(indices: Seq[Long]): Series = {
    import scala.jdk.CollectionConverters._
    val posSchema = StructType(Seq(
      StructField(IDX, LongType, nullable = false),
      StructField("__pos__", LongType, nullable = false)))
    val pos = df.sparkSession.createDataFrame(
      indices.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(v, i.toLong) }.asJava, posSchema)
    val joined = indexed.join(pos, IDX).orderBy("__pos__").select(name)
    // polars raises on out-of-bounds take; a silent inner-join drop would be
    // wrong data, so validate the resolved count (plan is deterministic, so
    // recomputation on later use is safe — no lingering cache)
    val got = joined.count()
    require(got == indices.length,
      s"gather: ${indices.length - got} of ${indices.length} indices out of bounds")
    Series(name, joined)
  }
  def take(indices: Seq[Long]): Series = gather(indices)

  /** ewm_mean/std/var over the series' own order (reference series.rb
    * ewm_*) — the mapPartitions kernel with the dense index as the order. */
  def ewmMean(com: Option[Double] = None, span: Option[Double] = None,
              halfLife: Option[Double] = None, alpha: Double = Double.NaN,
              adjust: Boolean = true, minPeriods: Int = 1,
              ignoreNulls: Boolean = true): Series =
    ewmOut("mean", resolveAlpha(com, span, halfLife, alpha), adjust, minPeriods, ignoreNulls)
  def ewmStd(com: Option[Double] = None, span: Option[Double] = None,
             halfLife: Option[Double] = None, alpha: Double = Double.NaN,
             adjust: Boolean = true, minPeriods: Int = 1,
             ignoreNulls: Boolean = true): Series =
    ewmOut("std", resolveAlpha(com, span, halfLife, alpha), adjust, minPeriods, ignoreNulls)
  def ewmVar(com: Option[Double] = None, span: Option[Double] = None,
             halfLife: Option[Double] = None, alpha: Double = Double.NaN,
             adjust: Boolean = true, minPeriods: Int = 1,
             ignoreNulls: Boolean = true): Series =
    ewmOut("var", resolveAlpha(com, span, halfLife, alpha), adjust, minPeriods, ignoreNulls)
  /** Reference Series#ewm_* parameterization (series.rb:3875-3897): exactly
    * one of com/span/half_life/alpha; `alpha` stays a plain Double for
    * call-site compatibility (NaN = unset). */
  private def resolveAlpha(com: Option[Double], span: Option[Double],
                           halfLife: Option[Double], alpha: Double): Double =
    graft.kernel.Ewm.alphaFrom(com, span, halfLife,
      if (alpha.isNaN) None else Some(alpha))
  private def ewmOut(out: String, alpha: Double, adjust: Boolean, minPeriods: Int,
                     ignoreNulls: Boolean): Series = {
    val r = graft.kernel.Ewm.ewm(indexed, name, IDX,
      alpha = alpha, adjust = adjust, minPeriods = minPeriods, outputs = Seq(out),
      ignoreNulls = ignoreNulls)
    Series(name, r.orderBy(IDX).select(F.col(s"${name}_ewm_$out").as(name)))
  }

  /** Indices of the first occurrence of each distinct value, ascending
    * (reference series.rb arg_unique). */
  def argUnique: Series = Series("arg_unique",
    indexed.groupBy(F.col(name)).agg(F.min(F.col(IDX)).as("arg_unique"))
      .orderBy("arg_unique").select("arg_unique"))

  /** Run-length encode into struct(len, value) rows in run order (reference
    * expr.rb:2648 rle; rle_id is the Expr-level sibling). Change flags and
    * the run-id prefix sum both go through the distributed scan kernel. */
  def rle: Series = {
    import graft.kernel.{RowIndex, Scan}
    val d0 = RowIndex.attach(df)
    val prev = Scan.shifted(d0,
      F.struct(F.lit(1).as("m"), F.col(name).as("x")), 1, "__prev__")
    val changed = F.when(F.col("__prev__").isNull, 1L)
      .when(!(F.col(name) <=> F.col("__prev__").getField("x")), 1L).otherwise(0L)
    val runs = Scan.running(prev, changed, "__run__", F.sum, "sum")
    Series("rle", runs.groupBy("__run__")
      .agg(F.count(F.lit(1)).as("len"), F.first(F.col(name)).as("value"),
        F.min(F.col(RowIndex.name)).as("__fs__"))
      .orderBy("__fs__")
      .select(F.struct(F.col("len"), F.col("value")).as("rle")))
  }

  /** Indices that would sort the series (reference series.rb arg_sort:
    * reverse:, nulls_last: — polars places nulls FIRST by default in both
    * directions; ties are stable in row order). */
  def argSort(descending: Boolean = false, nullsLast: Boolean = false): Series =
    Series("arg_sort", indexed
      .orderBy(SortKey.of(F.col(name), descending, nullsLast), F.col(IDX).asc)
      .select(F.col(IDX).as("arg_sort")))

  // arg_min/arg_max IGNORE nulls (polars: the extreme of the non-null
  // values) — Spark's bare asc sorts nulls first, which would return a
  // null row's index
  def argMin: Long = indexed.orderBy(F.col(name).asc_nulls_last, F.col(IDX).asc)
    .select(IDX).limit(1).collect()(0).getLong(0)
  def argMax: Long = indexed.orderBy(F.col(name).desc_nulls_last, F.col(IDX).asc)
    .select(IDX).limit(1).collect()(0).getLong(0)
  /** Indices of true values (reference series.rb:1994 arg_true). */
  def argTrue: Series = Series("arg_true",
    indexed.filter(F.col(name)).select(F.col(IDX).as("arg_true")).orderBy("arg_true"))

  /** Insertion index keeping sorted order (reference expr.rb:1500; side
    * "any" — the reference default — may return any valid index, so the
    * left one is a legal answer). Nulls sort FIRST (polars: null is
    * smallest), so they count toward every insertion index. */
  def searchSorted(v: Any, side: String = "any"): Long = {
    require(Set("any", "left", "right")(side),
      s"search_sorted: side must be any|left|right, got '$side'")
    val cmp = if (side == "right") F.col(name) <= F.lit(v) else F.col(name) < F.lit(v)
    val before = F.when(F.col(name).isNull, 1L).when(cmp, 1L)
    df.select(F.coalesce(F.sum(before), F.lit(0L))).collect()(0).getLong(0)
  }

  /** Append n copies of a constant (reference expr.rb:6484 extend_constant). */
  def extendConstant(v: Any, n: Int): Series = {
    val extra = df.sparkSession.range(n).select(F.lit(v).cast(dtype).as(name))
    Series(name, df.unionAll(extra))
  }

  /** Reshape into fixed-width rows (reference series.rb:2244 / expr.rb:6517
    * reshape): dims (r, c) with at most one -1 to infer, or (-1) to flatten a
    * list series back to scalars. Distributed shape: dense index → groupBy
    * (idx div c) with map-side partial collect_list, order restored inside
    * each group by the index — the only global sort is over len/c group keys,
    * never the elements themselves. */
  def reshape(dims: Seq[Long]): Series = dims match {
    case Seq(-1L) =>
      require(dtype.isInstanceOf[ArrayType], s"reshape((-1,)): series is $dtype, not a list")
      Series(name, indexed
        .select(F.col(IDX), F.posexplode_outer(F.col(name)))
        .orderBy(F.col(IDX), F.col("pos"))
        .select(F.col("col").as(name)))
    case Seq(r0, c0) =>
      require(r0 != -1 || c0 != -1, "reshape: only one dimension may be -1")
      val total = len
      val c = if (c0 == -1) { require(r0 > 0 && total % r0 == 0,
        s"cannot infer cols: $total elements into $r0 rows"); total / r0 } else c0
      val r = if (r0 == -1) { require(c0 > 0 && total % c0 == 0,
        s"cannot infer rows: $total elements into width $c0"); total / c0 } else r0
      require(r * c == total, s"cannot reshape $total elements into ($r0, $c0)")
      Series(name, indexed
        .groupBy(F.expr(s"`$IDX` div $c").as("__g__"))
        // struct-wrap before collect_list so null elements survive the agg
        .agg(F.array_sort(F.collect_list(F.struct(F.col(IDX).as("i"), F.col(name).as("v")))).as("__sv__"))
        .orderBy("__g__")
        .select(F.transform(F.col("__sv__"), x => x.getField("v")).as(name)))
    case other => throw new IllegalArgumentException(s"reshape: unsupported dims $other")
  }

  /** Cast to the smallest integer dtype that fits (reference expr.rb:6775). */
  def shrinkDtype: Series = {
    dtype match {
      case LongType =>
        val r = df.agg(F.min(F.col(name)), F.max(F.col(name))).collect()(0)
        if (r.isNullAt(0)) this
        else {
          val (lo, hi) = (r.getLong(0), r.getLong(1))
          val target: DataType =
            if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
            else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
            else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
            else LongType
          cast(target)
        }
      case _ => this
    }
  }

  // ---- eager op twins (reference series.rb) ----
  // Every Expr op is reachable through `map(_.op)`; the high-traffic ones
  // get first-class names here. Namespaces go through the same bridge:
  // `s.map(_.str.toUppercase)`, `s.map(_.dt.year)`, `s.map(_.list.sum)`.
  def abs: Series = map(_.abs)
  def ceil: Series = map(_.ceil)
  def floor: Series = map(_.floor)
  def round(decimals: Int = 0): Series = map(_.round(decimals))
  def sign: Series = map(_.sign)
  def sqrt: Series = map(_.sqrt)
  def cbrt: Series = map(_.cbrt)
  def exp: Series = map(_.exp)
  def log(base: Double = math.E): Series = map(_.log(base))
  def log10: Series = map(_.log10)
  def log1p: Series = map(_.log1p)
  def sin: Series = map(_.sin); def cos: Series = map(_.cos)
  def tan: Series = map(_.tan); def sinh: Series = map(_.sinh)
  def cosh: Series = map(_.cosh); def tanh: Series = map(_.tanh)
  def arcsin: Series = map(_.arcsin); def arccos: Series = map(_.arccos)
  def arctan: Series = map(_.arctan); def arcsinh: Series = map(_.arcsinh)
  def arccosh: Series = map(_.arccosh); def arctanh: Series = map(_.arctanh)
  def clip(lo: Any, hi: Any): Series = map(_.clip(lo, hi))
  def clipMin(lo: Any): Series = map(_.clipMin(lo))
  def clipMax(hi: Any): Series = map(_.clipMax(hi))
  def cumSum(reverse: Boolean = false): Series = map(_.cumSum(reverse))
  def cumMax(reverse: Boolean = false): Series = map(_.cumMax(reverse))
  def cumMin(reverse: Boolean = false): Series = map(_.cumMin(reverse))
  def cumProd(reverse: Boolean = false): Series = {
    // polars cum_prod keeps integer dtype (small ints promote to i64 per the
    // reference docstring note; series.rb:1345 golden renders [i64]) —
    // Spark's product aggregate is double, so cast integral inputs back
    val raw = map(_.cumProd(reverse))
    dtype match {
      case ByteType | ShortType | IntegerType | LongType => raw.cast(LongType)
      case _ => raw
    }
  }
  def cumCount(reverse: Boolean = false): Series = map(_.cumCount(reverse))
  def shift(n: Int = 1): Series = map(_.shift(n))
  def shiftAndFill(n: Int, fill: Any): Series = map(_.shiftAndFill(n, fill))
  def pctChange(n: Int = 1): Series = map(_.pctChange(n))
  def rank(method: String = "average", descending: Boolean = false): Series =
    map(_.rank(method, descending))
  def interpolate(method: String = "linear"): Series = map(_.interpolate(method))
  def forwardFill: Series = map(_.forwardFill)
  def backwardFill: Series = map(_.backwardFill)
  def fillNull(v: Any): Series = map(_.fillNull(v))
  def fillNan(v: Any): Series = map(_.fillNan(v))
  def isNull: Series = map(_.isNull)
  def isNotNull: Series = map(_.isNotNull)
  def isNan: Series = map(_.isNan)
  def isNotNan: Series = map(_.isNotNan)
  def isFinite: Series = map(_.isFinite)
  def isInfinite: Series = map(_.isInfinite)
  def isIn(values: Seq[Any]): Series = map(_.isIn(values))
  def hash(seed: Long = 0): Series = map(_.hash(seed))
  def rleId: Series = map(_.rleId)
  def peakMax: Series = map(_.peakMax)
  def peakMin: Series = map(_.peakMin)
  def explode: Series = map(_.explode)
  def rollingMin(n: Int, minPeriods: Int = 0): Series = map(_.rollingMin(n, minPeriods))
  def rollingMax(n: Int, minPeriods: Int = 0): Series = map(_.rollingMax(n, minPeriods))
  def rollingMean(n: Int, minPeriods: Int = 0): Series = map(_.rollingMean(n, minPeriods))
  def rollingSum(n: Int, minPeriods: Int = 0): Series = map(_.rollingSum(n, minPeriods))
  def rollingStd(n: Int, minPeriods: Int = 0): Series = map(_.rollingStd(n, minPeriods))
  def rollingVar(n: Int, minPeriods: Int = 0): Series = map(_.rollingVar(n, minPeriods))
  def rollingMedian(n: Int, minPeriods: Int = 0): Series = map(_.rollingMedian(n, minPeriods))
  def rollingQuantile(q: Double, n: Int, interpolation: String = "nearest",
                      minPeriods: Int = 0): Series =
    map(_.rollingQuantile(q, n, interpolation, minPeriods))
  def rollingSkew(n: Int, bias: Boolean = true): Series = map(_.rollingSkew(n, bias))
  def head(n: Int = 10): Series = Series(name, DataFrame(df).head(n).toSpark)
  def tail(n: Int = 10): Series = Series(name, DataFrame(df).tail(n).toSpark)
  def limit(n: Int = 10): Series = head(n)
  def slice(offset: Long, length: Long): Series =
    Series(name, DataFrame(df).slice(offset, length).toSpark)
  /** slice to the end (reference series.rb slice with nil length). */
  def slice(offset: Long): Series = slice(offset, len - offset)
  def unique: Series = Series(name, df.distinct())
  def nullCount: Long =
    df.select(F.count(F.when(F.col(name).isNull, 1)).as("n")).collect()(0).getLong(0)
  def product: Any = scalar(Expr(F.col(name)).product)
  // reference series.rb:1144: Series#entropy defaults normalize: FALSE
  // (the Expr surface defaults true per expr.rb:6637 — different defaults)
  def entropy(base: Double = math.E, normalize: Boolean = false): Any =
    scalar(Expr(F.col(name)).entropy(base, normalize))
  /** Whole-column quantile routes through the histogram-refinement kernel
    * ([[graft.kernel.Quantiles]]) — bounded memory and zero shuffle where
    * the Expr-level collect_list spelling would buffer the entire column
    * in one aggregation buffer. `linear` stays on Spark's exact
    * `percentile` (distinct-value-bounded, same formula). */
  def quantile(q: Double, interpolation: String = "nearest"): Any = {
    // reference error text (series_test.rb test_quantile)
    require(q >= 0.0 && q <= 1.0, "quantile should be between 0.0 and 1.0")
    if (interpolation == "linear")
      scalar(Expr(F.col(name)).quantile(q, interpolation))
    else {
      val Q = graft.kernel.Quantiles
      val st = Q.orderStats(df, Seq(Q.Req(name, Q.quantileRanks(q))))(name)
      Q.quantileOf(st, q, interpolation).map(Double.box).orNull
    }
  }
  def skew(bias: Boolean = true): Any = scalar(Expr(F.col(name)).skew(bias))
  def kurtosis(fisher: Boolean = true, bias: Boolean = true): Any =
    scalar(Expr(F.col(name)).kurtosis(fisher, bias))
  def nanMax: Any = scalar(Expr(F.col(name)).nanMax)
  def nanMin: Any = scalar(Expr(F.col(name)).nanMin)
  /** Row-aligned boolean mask filter (reference series.rb filter). */
  def filter(mask: Series): Series = {
    // polars raises ShapeError on a length mismatch; the positional join
    // would otherwise silently truncate to the shorter side (eager series —
    // the two counts are cheap relative to swallowing a caller bug)
    require(mask.len == len,
      s"Series.filter: mask length ${mask.len} != series length $len")
    val IDX = graft.kernel.RowIndex.name
    val a = graft.kernel.RowIndex.attachDense(df)
    val b = graft.kernel.RowIndex.attachDense(mask.rename("__mask__").df)
    Series(name, a.join(b, IDX).filter(F.col("__mask__")).orderBy(IDX)
      .select(F.col(name)))
  }
  /** describe (reference series.rb:651): dtype-specific stat rows. */
  def describe(): DataFrame = {
    require(len > 0, "Series must contain at least one value")
    def frame(rows: Seq[(String, Any)], valueType: org.apache.spark.sql.types.DataType): DataFrame = {
      val schema = StructType(Seq(
        StructField("statistic", StringType), StructField("value", valueType)))
      import scala.jdk.CollectionConverters._
      DataFrame(df.sparkSession.createDataFrame(
        rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, schema))
    }
    if (isNumeric) {
      def d(a: Any): Any = a match {
        case null => null
        case n: Number => n.doubleValue()
      }
      // ONE aggregation pass (the repo's describe discipline) — separate
      // min/max/nullCount/mean/std accessors would each run a full scan
      val r = df.agg(F.min(F.col(name)).as("mn"), F.max(F.col(name)).as("mx"),
        F.count(F.when(F.col(name).isNull, 1)).as("nc"),
        F.avg(F.col(name)).as("av"), F.stddev_samp(F.col(name)).as("sd"),
        F.count(F.lit(1)).as("n")).collect()(0)
      frame(Seq("min" -> d(r.get(0)), "max" -> d(r.get(1)),
        "null_count" -> r.getLong(2).toDouble, "mean" -> d(r.get(3)),
        "std" -> d(r.get(4)), "count" -> r.getLong(5).toDouble), DoubleType)
    } else if (isBoolean)
      frame(Seq(
        "sum" -> df.select(F.sum(F.col(name).cast("long"))).collect()(0).get(0),
        "null_count" -> nullCount, "count" -> len), LongType)
    else if (isUtf8)
      // unique counts null as a value (reference: unique.length)
      frame(Seq("unique" -> df.select((F.countDistinct(F.col(name)) +
          F.coalesce(F.max(F.when(F.col(name).isNull, 1L).otherwise(0L)), F.lit(0L))).as("u"))
          .collect()(0).getLong(0),
        "null_count" -> nullCount, "count" -> len), LongType)
    else if (isDatelike)
      frame(Seq("min" -> String.valueOf(min), "max" -> String.valueOf(max),
        "null_count" -> nullCount.toString, "count" -> len.toString), StringType)
    else throw new IllegalArgumentException(s"describe: unsupported dtype $dtype")
  }
}

object Series {
  /** Construct from a Scala seq (reference series.rb ctor from array). */
  def apply(name: String, values: Seq[Any])(implicit spark: SparkSession): Series = {
    import scala.jdk.CollectionConverters._
    def infer(vs: Seq[Any]): DataType = vs.collectFirst {
      case _: Int => IntegerType
      case _: Long => LongType
      case _: Double => DoubleType
      case _: Float => FloatType
      case _: Short => ShortType
      case _: Byte => ByteType
      case _: String => StringType
      case _: Boolean => BooleanType
      case _: java.sql.Date => DateType
      case _: java.sql.Timestamp => TimestampType
      case s: Seq[_] => ArrayType(infer(s))
    }.getOrElse(StringType)
    val dt: DataType = infer(values)
    val rows = values.map(v => org.apache.spark.sql.Row(v)).asJava
    Series(name, spark.createDataFrame(rows, StructType(Seq(StructField(name, dt)))))
  }
}
