package graft.api

/** Display/formatting options (reference: lib/polars/config.rb:1-530) —
  * controls the [[graft.testing.Testing.render]] table output. Scoped
  * override via `Config.withConfig`. */
object Config {
  @volatile var maxRows: Int = 10
  @volatile var maxCols: Int = 100
  @volatile var floatPrecision: Option[Int] = None
  /** ASCII table outlines instead of UTF8 box drawing (config.rb
    * set_ascii_tables / POLARS_FMT_TABLE_FORMATTING=ASCII_FULL_CONDENSED). */
  @volatile var asciiTables: Boolean = false
  /** String cell display limit before `…` truncation (config.rb
    * set_fmt_str_lengths; polars default 30). */
  @volatile var fmtStrLengths: Int = 30
  /** Cell alignment: LEFT (default) or RIGHT (config.rb set_tbl_cell_alignment). */
  @volatile var tblCellAlignment: String = "LEFT"
  /** Move the dtype inline with the column name — `name (dtype)` header, no
    * `---`/dtype rows (config.rb set_tbl_column_data_type_inline). */
  @volatile var tblColumnDataTypeInline: Boolean = false
  /** Hide the column-name header row (config.rb set_tbl_hide_column_names). */
  @volatile var tblHideColumnNames: Boolean = false
  /** Hide the dtype row (config.rb set_tbl_hide_column_data_types). */
  @volatile var tblHideColumnDataTypes: Boolean = false
  /** Hide the `---` name/dtype separator row (config.rb
    * set_tbl_hide_dtype_separator). */
  @volatile var tblHideDtypeSeparator: Boolean = false
  /** Hide the `shape: (r, c)` line (config.rb set_tbl_hide_dataframe_shape). */
  @volatile var tblHideDataframeShape: Boolean = false
  /** Print the shape line BELOW the table (config.rb
    * set_tbl_dataframe_shape_below). */
  @volatile var tblDataframeShapeBelow: Boolean = false
  /** Table style override (config.rb set_tbl_formatting): empty = the
    * asciiTables-selected style; "ASCII_MARKDOWN" = pipe-table output. */
  @volatile var tblFormatting: String = ""

  def withConfig[T](rows: Int = maxRows, cols: Int = maxCols)(f: => T): T = {
    val (pr, pc) = (maxRows, maxCols)
    maxRows = rows; maxCols = cols
    try f finally { maxRows = pr; maxCols = pc }
  }

  /** Scoped override of any display option (reference Config.new(...) block
    * form): saves every option, runs `f`, restores. */
  def scoped[T](rows: Int = maxRows, cols: Int = maxCols,
                ascii: Boolean = asciiTables, strLengths: Int = fmtStrLengths,
                cellAlignment: String = tblCellAlignment,
                dataTypeInline: Boolean = tblColumnDataTypeInline,
                hideColumnNames: Boolean = tblHideColumnNames,
                hideColumnDataTypes: Boolean = tblHideColumnDataTypes,
                hideDtypeSeparator: Boolean = tblHideDtypeSeparator,
                hideDataframeShape: Boolean = tblHideDataframeShape,
                dataframeShapeBelow: Boolean = tblDataframeShapeBelow,
                formatting: String = tblFormatting)(f: => T): T = {
    val saved = (maxRows, maxCols, asciiTables, fmtStrLengths,
      tblCellAlignment, tblColumnDataTypeInline,
      (tblHideColumnNames, tblHideColumnDataTypes, tblHideDtypeSeparator,
        tblHideDataframeShape, tblDataframeShapeBelow, tblFormatting))
    maxRows = rows; maxCols = cols; asciiTables = ascii; fmtStrLengths = strLengths
    tblCellAlignment = cellAlignment; tblColumnDataTypeInline = dataTypeInline
    tblHideColumnNames = hideColumnNames; tblHideColumnDataTypes = hideColumnDataTypes
    tblHideDtypeSeparator = hideDtypeSeparator; tblHideDataframeShape = hideDataframeShape
    tblDataframeShapeBelow = dataframeShapeBelow; tblFormatting = formatting
    try f finally {
      maxRows = saved._1; maxCols = saved._2; asciiTables = saved._3
      fmtStrLengths = saved._4; tblCellAlignment = saved._5
      tblColumnDataTypeInline = saved._6
      val h = saved._7
      tblHideColumnNames = h._1; tblHideColumnDataTypes = h._2
      tblHideDtypeSeparator = h._3; tblHideDataframeShape = h._4
      tblDataframeShapeBelow = h._5; tblFormatting = h._6
    }
  }

  def restoreDefaults(): Unit = {
    maxRows = 10; maxCols = 100; floatPrecision = None; asciiTables = false
    fmtStrLengths = 30; tblCellAlignment = "LEFT"; tblColumnDataTypeInline = false
    tblHideColumnNames = false; tblHideColumnDataTypes = false
    tblHideDtypeSeparator = false; tblHideDataframeShape = false
    tblDataframeShapeBelow = false; tblFormatting = ""
  }
}
