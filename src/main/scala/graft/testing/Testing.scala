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
    // reference message contracts (testing.rb:304,308,324,503 —
    // testing_test.rb asserts these verbatim). The column-mismatch branch
    // reproduces the reference's own variable mix-up faithfully: the
    // columns REPORTED as "in left ... but not in right" are computed as
    // right - left (testing.rb:303-305)
    if (left.columns.toSeq != right.columns.toSeq) {
      val leftNotRight = right.columns.toSeq.diff(left.columns.toSeq)
      if (leftNotRight.nonEmpty)
        throw FrameMismatch(
          s"columns ${leftNotRight.map("\"" + _ + "\"").mkString("[", ", ", "]")} " +
            "in left DataFrames, but not in right")
      val rightNotLeft = left.columns.toSeq.diff(right.columns.toSeq)
      throw FrameMismatch(
        s"columns ${rightNotLeft.map("\"" + _ + "\"").mkString("[", ", ", "]")} " +
          "in right DataFrames, but not in left")
    }
    if (checkDtype) {
      val (ls, rs) = (left.schema.map(f => (f.name, f.dataType)), right.schema.map(f => (f.name, f.dataType)))
      if (ls != rs) throw FrameMismatch(
        s"DataFrames are different (dtypes do not match)\n[left]:  $ls\n[right]: $rs")
    }
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
    if (equal) throw FrameMismatch("frames are equal") // reference testing.rb:143
  }
  def assertSeriesNotEqual(left: graft.api.Series, right: graft.api.Series,
                           rtol: Double = 1e-5, atol: Double = 1e-8): Unit = {
    val equal =
      try { assertSeriesEqual(left, right, rtol, atol); true }
      catch { case _: FrameMismatch => false }
    if (equal) throw FrameMismatch("Series are equal") // reference testing.rb:266
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
  def render(df: DataFrame, maxRows: Int = -1): String = {
    import graft.api.Config
    val rowLimit = if (maxRows > 0) maxRows else Config.maxRows
    val total = df.count()
    // polars shows HEAD 5 / ellipsis row / TAIL 5 for frames over maxRows
    // (date_time_expr.rb:1267 golden renders 12 rows that way), not the
    // first maxRows with a trailing ellipsis
    val over = total > rowLimit
    val half = rowLimit / 2
    val rows =
      if (!over) df.limit(rowLimit).collect()
      else
        // two bounded collects (head via limit, tail via offset) — never a
        // full-frame collect, so an accidentally-large frame can't OOM the
        // driver; same row-order assumption as limit itself
        df.limit(half).collect() ++ df.offset((total - half).toInt).collect()
    val allNames = df.columns.toSeq
    val allDtypes = df.schema.fields.map(f => dtypeName(f.dataType)).toSeq
    // column elision (config.rb set_tbl_cols golden: head ⌈n/2⌉, `…`, tail
    // ⌊n/2⌋; the elided column shows `…` in the name and value rows and
    // blanks in the `---`/dtype rows)
    val colOver = allNames.size > Config.maxCols
    val (keptIdx, elidedAt) =
      if (!colOver) (allNames.indices.toSeq, -1)
      else {
        val headN = (Config.maxCols + 1) / 2
        val tailN = Config.maxCols / 2
        ((0 until headN) ++ (allNames.size - tailN until allNames.size), headN)
      }
    def elide(vals: Seq[String], gap: String): Seq[String] = {
      val kept = keptIdx.map(vals)
      if (!colOver) kept else (kept.take(elidedAt) :+ gap) ++ kept.drop(elidedAt)
    }
    val inline = Config.tblColumnDataTypeInline
    val names =
      if (inline) elide(allNames.zip(allDtypes).map { case (n, d) => s"$n ($d)" }, "…")
      else elide(allNames, "…")
    val dtypes = elide(allDtypes, "")
    // the `---` separator row is blank in the elided `…` column (so that
    // column stays 1 char wide, matching the set_tbl_cols golden)
    val sepRow = elide(allNames.map(_ => "---"), "")
    val cells0 = rows.map(r => elide(r.toSeq.map(fmt), "…"))
    val cells =
      if (over) (cells0.take(half) :+ names.map(_ => "…")) ++ cells0.drop(half)
      else cells0
    // visibility toggles (config.rb set_tbl_hide_* / shape_below goldens)
    val markdown = Config.tblFormatting == "ASCII_MARKDOWN"
    val showNames = !Config.tblHideColumnNames
    val showDtypes = !inline && !Config.tblHideColumnDataTypes && !markdown
    val showSep = showNames && showDtypes && !Config.tblHideDtypeSeparator
    // widths come from the VISIBLE rows only (hide_column_names golden:
    // the bool column is 5 wide from "false", not from a hidden header)
    val widthRows: Seq[Seq[String]] =
      (if (showNames) Seq(names) else Nil) ++
        (if (showDtypes) Seq(dtypes) else Nil) ++
        (if (showSep) Seq(sepRow) else Nil) ++ cells
    val widths = names.indices.map(c => widthRows.map(v => displayWidth(v(c))).max)
    val ascii = Config.asciiTables
    val (tlc, tjc, trc, blc, bjc, brc, vOut, vIn, hFill) =
      if (ascii) ("+", "+", "+", "+", "+", "+", "|", "|", "-")
      else ("┌", "┬", "┐", "└", "┴", "┘", "│", "┆", "─")
    def line(l: String, m: String, r: String, fill: String = hFill) =
      widths.map(w => fill * (w + 2)).mkString(l, m, r)
    // ASCII_FULL_CONDENSED draws the header separator as one continuous
    // `+===+` span without junctions (config.rb set_ascii_tables golden)
    val headerSep =
      if (ascii) "+" + "=" * (widths.map(_ + 2).sum + widths.size - 1) + "+"
      else line("╞", "╪", "╡", "═")
    def pad(v: String, w: Int): String =
      if (Config.tblCellAlignment == "RIGHT") " " * (w - displayWidth(v)) + v
      else v + " " * (w - displayWidth(v))
    def rowSep(vals: Seq[String], out: String, in: String) =
      vals.zip(widths).map { case (v, w) => s" ${pad(v, w)} " }.mkString(out, in, out)
    def row(vals: Seq[String]) = rowSep(vals, vOut, vIn)
    val sb = new StringBuilder
    val shapeLine = s"shape: ($total, ${allNames.size})"
    val showShape = !Config.tblHideDataframeShape
    if (showShape && !Config.tblDataframeShapeBelow) sb.append(shapeLine).append('\n')
    if (markdown) {
      // pipe table (config.rb set_tbl_formatting ASCII_MARKDOWN golden):
      // header, |---| separator, rows — no outer border rows
      if (showNames) sb.append(rowSep(names, "|", "|")).append('\n')
      sb.append(widths.map(w => "-" * (w + 2)).mkString("|", "|", "|")).append('\n')
      cells.foreach(cs => sb.append(rowSep(cs, "|", "|")).append('\n'))
      sb.setLength(sb.length - 1) // drop trailing newline
    } else {
      sb.append(line(tlc, tjc, trc)).append('\n')
      if (showNames) sb.append(row(names)).append('\n')
      if (showSep) sb.append(row(sepRow)).append('\n')
      if (showDtypes) sb.append(row(dtypes)).append('\n')
      sb.append(headerSep).append('\n')
      cells.foreach(cs => sb.append(row(cs)).append('\n'))
      sb.append(line(blc, bjc, brc))
    }
    if (showShape && Config.tblDataframeShapeBelow) sb.append('\n').append(shapeLine)
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
      else // head 5 / … / tail 5 via two bounded collects, as the table renderer
        (s.df.limit(half).collect().map(r => fmtSeries(r.get(0))) :+ "…") ++
          s.df.offset((total - half).toInt).collect().map(r => fmtSeries(r.get(0)))
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

  /** polars table cells cap at 32 display chars (comfy-table constraint in
    * polars' fmt.rs): a longer composite cell (list/struct repr) truncates
    * to its first 30 chars + `…` — the date_ranges doc golden renders
    * `[2022-01-01, 2022-01-02, 2022-…`. Plain strings truncate earlier at
    * fmt_str_lengths, numbers/datetimes never reach the cap. */
  private def cellWidth(repr: String): String =
    if (repr.length > 32) repr.take(30) + "…" else repr

  private def fmt(v: Any): String = v match {
    case null => "null"
    // polars fmt_str_lengths default 30: longer strings truncate to the
    // first N chars + ellipsis (string_expr.rb:1457 golden; config.rb
    // set_fmt_str_lengths raises the limit)
    case s: String if s.length > graft.api.Config.fmtStrLengths =>
      s.take(graft.api.Config.fmtStrLengths) + "…"
    case s: String => s
    case d: Double =>
      // polars fmt_float (Rust polars-core fmt.rs): the gate is the LENGTH
      // of Rust's shortest-roundtrip Display string — over 9 chars, values
      // outside [1e-6, 9_999_999] render scientific `{:.4e}` (series.rb:2632
      // sin golden `1.2246e-16`, :2669 tan `1.6331e16` — no exponent sign
      // padding), in-range values render %.6f with trailing zeros trimmed;
      // at 9 chars or under, integral values get one decimal (`{:.1}`) and
      // the rest print the shortest form verbatim
      if (d.isNaN) "NaN"
      else if (d.isPosInfinity) "inf"
      else if (d.isNegInfinity) "-inf"
      else if (d == 0.0) { if (1.0 / d < 0) "-0.0" else "0.0" }
      else {
        val disp = rustDisplay(d)
        if (disp.length > 9) {
          val a = math.abs(d)
          if (a < 0.000001 || a > 9999999.0) sci4(d)
          else { // 6 decimal places, trailing zeros trimmed
            val s6 = String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
            s6.reverse.dropWhile(_ == '0').reverse match {
              case t if t.endsWith(".") => t + "0"
              case t => t
            }
          }
        } else if (d == d.floor) s"$disp.0"
        else disp
      }
    case f: Float => fmt(f.toDouble)
    // Spark rows carry mutable.ArraySeq. Polars truncates list cells longer
    // than 3 elements to `[e0, e1, … eLast]` (fmt_table_cell_list_len
    // default); the golden docstrings render that form verbatim.
    // nested strings are QUOTED (polars: ["a", "b"] in a list cell, bare a
    // at top level), hence fmtSeries for elements
    case s: scala.collection.Seq[_] if s.length > 3 =>
      cellWidth(s"[${fmtSeries(s(0))}, ${fmtSeries(s(1))}, … ${fmtSeries(s.last)}]")
    case s: scala.collection.Seq[_] =>
      cellWidth(s.map(fmtSeries).mkString("[", ", ", "]"))
    // polars struct cell: fields joined with bare commas, strings quoted —
    // {1,"a",true,[1, 2]}
    case r: org.apache.spark.sql.Row =>
      cellWidth(r.toSeq.map(fmtSeries).mkString("{", ",", "}"))
    // polars datetime[μs]: no fraction when the micros are zero, else
    // exactly six fractional digits
    case t: java.sql.Timestamp => fmtDateTime(t.toLocalDateTime)
    case t: java.time.LocalDateTime => fmtDateTime(t)
    case x => x.toString
  }

  /** Rust's f64 Display: shortest round-trip digits, decimal form at any
    * magnitude (never an exponent), integral values WITHOUT a trailing
    * `.0`. Java's Double.toString has the same shortest digits but flips
    * to E-notation outside [1e-3, 1e7) — expand via BigDecimal (exact on
    * the already-shortest digit string). */
  private def rustDisplay(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.indexOf('E') < 0) {
      if (s.endsWith(".0")) s.dropRight(2) else s
    } else {
      new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
    }
  }

  /** Rust `{:.4e}`: 4 mantissa decimals, bare exponent (no `+`, no zero
    * padding) — `1.2246e-16`, `1.6331e16`. */
  private def sci4(d: Double): String = {
    val s = String.format(java.util.Locale.ROOT, "%.4e", Double.box(d))
    val i = s.indexOf('e')
    s"${s.substring(0, i)}e${s.substring(i + 1).toInt}"
  }

  private def fmtDateTime(t: java.time.LocalDateTime): String = {
    val base = String.format(java.util.Locale.ROOT, "%04d-%02d-%02d %02d:%02d:%02d",
      Int.box(t.getYear), Int.box(t.getMonthValue), Int.box(t.getDayOfMonth),
      Int.box(t.getHour), Int.box(t.getMinute), Int.box(t.getSecond))
    val micros = t.getNano / 1000
    if (micros == 0) base
    else {
      // polars trims trailing zeros in the fractional display: 1 ms renders
      // ".001", not ".001000" (functions/as_datatype.rb duration golden)
      val frac = String.format(java.util.Locale.ROOT, "%06d", Int.box(micros))
        .reverse.dropWhile(_ == '0').reverse
      s"$base.$frac"
    }
  }

  /** Terminal display width: grapheme clusters count 1 (combining marks ride
    * their base — string_expr.rb:1253 golden pads "mañana", 7 code units, as
    * 6 columns), East-Asian wide/fullwidth clusters count 2 — matching the
    * unicode-width rules polars' table formatter uses. */
  private[graft] def displayWidth(s: String): Int = {
    val it = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    it.setText(s)
    var w = 0
    var start = it.first()
    var end = it.next()
    while (end != java.text.BreakIterator.DONE) {
      val cp = s.codePointAt(start)
      w += (if (isWide(cp)) 2 else 1)
      start = end
      end = it.next()
    }
    w
  }

  private def isWide(cp: Int): Boolean = {
    // East-Asian Wide / Fullwidth principal ranges (CJK, Hangul, kana,
    // fullwidth forms) — enough for table alignment of corpus text
    (cp >= 0x1100 && cp <= 0x115F) || (cp >= 0x2E80 && cp <= 0xA4CF) ||
    (cp >= 0xAC00 && cp <= 0xD7A3) || (cp >= 0xF900 && cp <= 0xFAFF) ||
    (cp >= 0xFE30 && cp <= 0xFE4F) || (cp >= 0xFF00 && cp <= 0xFF60) ||
    (cp >= 0xFFE0 && cp <= 0xFFE6) || (cp >= 0x20000 && cp <= 0x3FFFD)
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
    // polars renders an unconstrained precision as `*`; Spark's 38 is the
    // unconstrained maximum, so it maps to the wildcard (string_expr.rb:253)
    case d: DecimalType => s"decimal[${if (d.precision == 38) "*" else d.precision},${d.scale}]"
    case ArrayType(inner, _) => s"list[${dtypeName(inner)}]"
    case s: StructType => s"struct[${s.fields.length}]"
    case d => d.simpleString
  }
}
