package graft.testing

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Frame equality assertions + the polars box-drawing renderer (reference:
  * lib/polars/testing.rb:31-87 assert_frame_equal/assert_series_equal; the
  * renderer reproduces the `┌──┐` table format of the reference's docstring
  * golden outputs, reference lib/polars/data_frame.rb `to_s`).
  */
object Testing {

  final case class FrameMismatch(msg: String) extends AssertionError(msg)

  /** assert_frame_equal with the reference's defaults: checks schema, row
    * count, values with rtol 1e-5 / atol 1e-8 for floats; `checkRowOrder`
    * false sorts both sides by all columns first. */
  def assertFrameEqual(left: DataFrame, right: DataFrame,
                       checkRowOrder: Boolean = true, checkDtype: Boolean = true,
                       rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    if (checkDtype) {
      val (ls, rs) = (left.schema.map(f => (f.name, f.dataType)), right.schema.map(f => (f.name, f.dataType)))
      if (ls != rs) throw FrameMismatch(s"schema mismatch: $ls vs $rs")
    } else if (left.columns.toSeq != right.columns.toSeq)
      throw FrameMismatch(s"columns mismatch: ${left.columns.toSeq} vs ${right.columns.toSeq}")
    val (l, r) =
      if (checkRowOrder) (left.collect(), right.collect())
      else {
        val cols = left.columns.map(org.apache.spark.sql.functions.col).toSeq
        (left.orderBy(cols: _*).collect(), right.orderBy(cols: _*).collect())
      }
    if (l.length != r.length) throw FrameMismatch(s"row count: ${l.length} vs ${r.length}")
    l.zip(r).zipWithIndex.foreach { case ((lr, rr), i) =>
      lr.toSeq.zip(rr.toSeq).zipWithIndex.foreach { case ((a, b), c) =>
        if (!valueEq(a, b, rtol, atol))
          throw FrameMismatch(s"row $i col ${left.columns(c)}: $a != $b")
      }
    }
  }

  def assertSeriesEqual(left: graft.api.Series, right: graft.api.Series,
                        rtol: Double = 1e-5, atol: Double = 1e-8): Unit =
    assertFrameEqual(left.df, right.rename(left.name).df, rtol = rtol, atol = atol)

  /** Negated assertions (reference testing.rb assert_frame_not_equal /
    * assert_series_not_equal): raise when the inputs ARE equal. */
  def assertFrameNotEqual(left: DataFrame, right: DataFrame,
                          checkRowOrder: Boolean = true, checkDtype: Boolean = true,
                          rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    val equal =
      try { assertFrameEqual(left, right, checkRowOrder, checkDtype, rtol, atol); true }
      catch { case _: FrameMismatch => false }
    if (equal) throw FrameMismatch("frames are equal (expected not equal)")
  }
  def assertSeriesNotEqual(left: graft.api.Series, right: graft.api.Series,
                           rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    val equal =
      try { assertSeriesEqual(left, right, rtol, atol); true }
      catch { case _: FrameMismatch => false }
    if (equal) throw FrameMismatch("series are equal (expected not equal)")
  }

  private def valueEq(a: Any, b: Any, rtol: Double, atol: Double): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || math.abs(x - y) <= atol + rtol * math.abs(y)
    case (x: Float, y: Float) => valueEq(x.toDouble, y.toDouble, rtol, atol)
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => valueEq(p, q, rtol, atol) }
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x, y) => x == y
  }

  /** Render the polars-style table: shape line + box-drawing frame with the
    * `---` separator and dtype rows, matching the reference's docstring
    * golden format exactly (`test/docs_test.rb:190-209` string-compares
    * these renderings; DocExamplesSpec ports a slice of that corpus). */
  def render(df: DataFrame, maxRows: Int = 10): String = {
    val total = df.count()
    // polars shows HEAD 5 / ellipsis row / TAIL 5 for frames over maxRows
    // (date_time_expr.rb:1267 golden renders 12 rows that way), not the
    // first maxRows with a trailing ellipsis
    val over = total > maxRows
    val half = maxRows / 2
    val rows =
      if (!over) df.limit(maxRows).collect()
      else {
        val all = df.limit(Int.MaxValue - 1).collect() // render is a test aid; frames are small
        all.take(half) ++ all.takeRight(half)
      }
    val names = df.columns.toSeq
    val dtypes = df.schema.fields.map(f => dtypeName(f.dataType)).toSeq
    val cells0 = rows.map(_.toSeq.map(fmt))
    val cells =
      if (over) (cells0.take(half) :+ names.map(_ => "…")) ++ cells0.drop(half)
      else cells0
    val widths = names.indices.map { c =>
      // 3 = the `---` separator row's width floor
      (Seq(3, names(c).length, dtypes(c).length) ++ cells.map(_(c).length)).max
    }
    def line(l: String, m: String, r: String, fill: String = "─") =
      widths.map(w => fill * (w + 2)).mkString(l, m, r)
    def row(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => s" ${v.padTo(w, ' ')} " }.mkString("│", "┆", "│")
    val sb = new StringBuilder
    sb.append(s"shape: ($total, ${names.size})\n")
    sb.append(line("┌", "┬", "┐")).append('\n')
    sb.append(row(names)).append('\n')
    sb.append(row(names.map(_ => "---"))).append('\n')
    sb.append(row(dtypes)).append('\n')
    sb.append(line("╞", "╪", "╡", "═")).append('\n')
    cells.foreach(cs => sb.append(row(cs)).append('\n'))
    sb.append(line("└", "┴", "┘"))
    sb.toString
  }

  /** Render a Series in the polars format the reference docstrings golden:
    * shape line, `Series: 'name' [dtype]`, tab-indented values in brackets
    * (docs_test expands the tab to 8 spaces when comparing). Strings are
    * quoted here — unlike table CELLS, polars quotes strings in Series
    * display. */
  def renderSeries(s: graft.api.Series, maxRows: Int = 10): String = {
    val total = s.df.count()
    val over = total > maxRows
    val half = maxRows / 2
    val rows =
      if (!over) s.df.limit(maxRows).collect().map(_.get(0)).map(fmtSeries)
      else { // head 5 / … / tail 5, same as the table renderer
        val all = s.df.limit(Int.MaxValue - 1).collect().map(_.get(0))
        (all.take(half).map(fmtSeries) :+ "…") ++ all.takeRight(half).map(fmtSeries)
      }
    val sb = new StringBuilder
    sb.append(s"shape: ($total,)\n")
    sb.append(s"Series: '${s.name}' [${dtypeName(s.dtype)}]\n[\n")
    rows.foreach(v => sb.append('\t').append(v).append('\n'))
    sb.append("]")
    sb.toString
  }

  private def fmtSeries(v: Any): String = v match {
    case s: String => s""""$s""""
    case other     => fmt(other)
  }

  private def fmt(v: Any): String = v match {
    case null => "null"
    // polars fmt_str_lengths default 30: longer strings truncate to the
    // first 30 chars + ellipsis (string_expr.rb:1457 golden)
    case s: String if s.length > 30 => s.take(30) + "…"
    case s: String => s
    case d: Double =>
      if (d.isNaN) "NaN"
      else if (d == d.floor && math.abs(d) < 1e15) s"${d.toLong}.0"
      else { // polars float display: 6 decimal places, trailing zeros trimmed
        val s6 = String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
        s6.reverse.dropWhile(_ == '0').reverse match {
          case t if t.endsWith(".") => t + "0"
          case t => t
        }
      }
    case f: Float => fmt(f.toDouble)
    // Spark rows carry mutable.ArraySeq. Polars truncates list cells longer
    // than 3 elements to `[e0, e1, … eLast]` (fmt_table_cell_list_len
    // default); the golden docstrings render that form verbatim.
    // nested strings are QUOTED (polars: ["a", "b"] in a list cell, bare a
    // at top level), hence fmtSeries for elements
    case s: scala.collection.Seq[_] if s.length > 3 =>
      s"[${fmtSeries(s(0))}, ${fmtSeries(s(1))}, … ${fmtSeries(s.last)}]"
    case s: scala.collection.Seq[_] => s.map(fmtSeries).mkString("[", ", ", "]")
    // polars struct cell: fields joined with bare commas, strings quoted —
    // {1,"a",true,[1, 2]}
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(fmtSeries).mkString("{", ",", "}")
    // polars datetime[μs]: no fraction when the micros are zero, else
    // exactly six fractional digits
    case t: java.sql.Timestamp => fmtDateTime(t.toLocalDateTime)
    case t: java.time.LocalDateTime => fmtDateTime(t)
    case x => x.toString
  }

  private def fmtDateTime(t: java.time.LocalDateTime): String = {
    val base = String.format(java.util.Locale.ROOT, "%04d-%02d-%02d %02d:%02d:%02d",
      Int.box(t.getYear), Int.box(t.getMonthValue), Int.box(t.getDayOfMonth),
      Int.box(t.getHour), Int.box(t.getMinute), Int.box(t.getSecond))
    val micros = t.getNano / 1000
    if (micros == 0) base
    else base + String.format(java.util.Locale.ROOT, ".%06d", Int.box(micros))
  }

  /** Polars dtype tag for the rendered header (SURVEY §1.2 mapping table). */
  def dtypeName(dt: DataType): String = dt match {
    case LongType => "i64"
    case IntegerType => "i32"
    case ShortType => "i16"
    case ByteType => "i8"
    case DoubleType => "f64"
    case FloatType => "f32"
    case StringType => "str"
    case BooleanType => "bool"
    case DateType => "date"
    case _: TimestampType | TimestampNTZType => "datetime[μs]"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal[${d.precision},${d.scale}]"
    case ArrayType(inner, _) => s"list[${dtypeName(inner)}]"
    case s: StructType => s"struct[${s.fields.length}]"
    case d => d.simpleString
  }
}
