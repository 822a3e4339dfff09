package graft.kernel

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** join_asof — nearest-key join (reference: lib/polars/lazy_frame.rb:1523-1593,
  * data_frame.rb:2234; native ext/polars/src/lazyframe/mod.rs:549).
  *
  * Spark has no built-in as-of join. Scale-aware formulation: tag + union the
  * two sides, then ONE window pass per `by`-group ordered by the key carries
  * the latest right-side values forward (`last(_, ignoreNulls)`). Cost = one
  * shuffle on the by-keys (or one global sort when `by` is empty — inherently
  * sequential semantics, same as the reference's sorted-merge requirement).
  * No union-row blowup, no range-join quadratic risk; AQE handles skewed
  * by-groups.
  *
  * `strategy`: backward (right.key <= left.key), forward (>=), nearest.
  * `tolerance`: max |left.key - right.key| in key units (pass micros for
  * timestamps via [[DurationDsl]]).
  */
object AsofJoin {
  def join(left: DataFrame, right: DataFrame, on: String,
           by: Seq[String] = Nil, strategy: String = "backward",
           tolerance: Option[Double] = None, suffix: String = "_right"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(strategy))
    if (strategy == "nearest") {
      // two passes, pick the closer match per row
      val b = join1(left, right, on, by, "backward", None, suffix, keepKey = true)
      val bk = b.withColumnRenamed("__asof_key__", "__bk__")
      val renamedCols = outputCols(left, right, on, by, suffix)
      val bPrefixed = renamedCols.foldLeft(bk)((d, c) => d.withColumnRenamed(c, c + "__b"))
      val f = join1(bPrefixed, right, on, by, "forward", None, suffix, keepKey = true)
      val keyC = F.col(on).cast("double")
      val useB = F.col("__asof_key__").isNull ||
        (F.col("__bk__").isNotNull &&
          (keyC - F.col("__bk__").cast("double")) <= (F.col("__asof_key__").cast("double") - keyC))
      val out = renamedCols.foldLeft(f) { (d, c) =>
        d.withColumn(c, F.when(useB, F.col(c + "__b")).otherwise(F.col(c))).drop(c + "__b")
      }
      applyTolerance(out.drop("__bk__"), on, renamedCols, tolerance, nearest = true)
        .drop("__asof_key__")
    } else {
      val renamedCols = outputCols(left, right, on, by, suffix)
      val j = join1(left, right, on, by, strategy, None, suffix, keepKey = true)
      applyTolerance(j, on, renamedCols, tolerance, nearest = false, forward = strategy == "forward")
        .drop("__asof_key__")
    }
  }

  private def rightValueCols(left: DataFrame, right: DataFrame, on: String, by: Seq[String]): Seq[String] =
    right.columns.toSeq.filterNot(c => c == on || by.contains(c))

  /** Output names for the right-side value columns: suffixed ONLY when they
    * clash with a left column (polars join_asof semantics). */
  private def outputCols(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
                         suffix: String): Seq[String] = {
    val leftCols = left.columns.toSet
    rightValueCols(left, right, on, by).map(c => if (leftCols.contains(c)) c + suffix else c)
  }

  private def join1(left: DataFrame, right: DataFrame, on: String, by: Seq[String],
                    strategy: String, tolerance: Option[Double], suffix: String,
                    keepKey: Boolean): DataFrame = {
    val valueCols = rightValueCols(left, right, on, by)
    // right side projected to key+by+values, values suffixed only if clashing with left
    val sfx = outputCols(left, right, on, by, suffix)
    val r = right.select((Seq(F.col(on)) ++ by.map(F.col) ++
      valueCols.zip(sfx).map { case (c, a) => F.col(c).as(a) }): _*)
      .withColumn("__asof_key__", F.col(on))
      .withColumn("__side__", F.lit(0))
    val l = left.withColumn("__side__", F.lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // backward: right rows before left rows at equal key → order (key asc, side asc)
    // forward: reverse key order, same trick
    val ord =
      if (strategy == "backward") Seq(F.col(on).asc, F.col("__side__").asc)
      else Seq(F.col(on).desc, F.col("__side__").asc)
    val fillCols = sfx :+ "__asof_key__"
    val filled =
      if (by.nonEmpty) {
        val w = Window.partitionBy(by.map(F.col): _*)
          .orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fillCols.foldLeft(unioned) { (d, c) =>
          d.withColumn(c, F.last(F.col(c), ignoreNulls = true).over(w))
        }
      } else {
        // un-keyed as-of: a global forward fill over the merge order — the
        // distributed prefix-scan kernel, not a single-partition window
        val sorted = RowIndex.reattachOrdered(unioned, ord: _*)
        Scan.fillOrdered(sorted, fillCols).drop(RowIndex.name, Scan.BUCKET)
      }
    filled.filter(F.col("__side__") === 1).drop("__side__")
  }

  private def applyTolerance(df: DataFrame, on: String, valueCols: Seq[String],
                             tolerance: Option[Double], nearest: Boolean,
                             forward: Boolean = false): DataFrame =
    tolerance match {
      case None => df
      case Some(tol) =>
        val dist =
          if (nearest) F.abs(F.col(on).cast("double") - F.col("__asof_key__").cast("double"))
          else if (forward) F.col("__asof_key__").cast("double") - F.col(on).cast("double")
          else F.col(on).cast("double") - F.col("__asof_key__").cast("double")
        val ok = F.col("__asof_key__").isNotNull && dist <= tol
        valueCols.foldLeft(df)((d, c) => d.withColumn(c, F.when(ok, F.col(c))))
    }
}
