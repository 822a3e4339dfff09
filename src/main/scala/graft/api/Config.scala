package graft.api

/** Display/formatting options (reference: lib/polars/config.rb:1-530) —
  * controls the [[graft.testing.Testing.render]] table output. Scoped
  * override via `Config.withConfig`. */
object Config {
  @volatile var maxRows: Int = 10
  @volatile var maxCols: Int = 100
  @volatile var floatPrecision: Option[Int] = None

  def withConfig[T](rows: Int = maxRows, cols: Int = maxCols)(f: => T): T = {
    val (pr, pc) = (maxRows, maxCols)
    maxRows = rows; maxCols = cols
    try f finally { maxRows = pr; maxCols = pc }
  }

  def restoreDefaults(): Unit = { maxRows = 10; maxCols = 100; floatPrecision = None }
}
