package graft.ml

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.{LongType, StructType}

/** Sequence packing for LLM training (beyond-reference): assign documents to
  * fixed token-budget bins, the step that turns a cleaned corpus into
  * training sequences.
  */
object Packing {

  /** Linear (offset) packing: documents in `orderCol` order are laid end to
    * end on a token tape; a document's bin is the tape block its first token
    * falls in (`floor(preceding_cumsum / budget)`). Documents may straddle a
    * boundary — the reader splits, as in GPT-style span packing. The
    * exclusive cumsum runs through the distributed prefix-scan kernel
    * ([[graft.kernel.Scan.running]]): range-sort on `orderCol`, per-bucket
    * windows + a broadcast carry — no single-partition window. */
  def linearPack(df: DataFrame, tokenCountCol: String, orderCol: String,
                 budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val sorted = graft.kernel.RowIndex.reattachOrdered(df, F.col(orderCol))
    graft.kernel.Scan.running(sorted, F.col(tokenCountCol), "__offset__",
        F.sum, "sum", inclusive = false)
      .withColumn("__offset__", F.coalesce(F.col("__offset__"), F.lit(0L)))
      .withColumn("bin", F.floor(F.col("__offset__") / budget))
      .withColumn("bin_offset", F.col("__offset__") % budget)
      .drop("__offset__", graft.kernel.RowIndex.name, graft.kernel.Scan.BUCKET)
  }

  /** Greedy next-fit packing: stream documents in `orderCol` order; a
    * document that would overflow the current bin closes it and opens the
    * next (documents never straddle bins; oversized documents get a bin of
    * their own). The running `(bin, fill)` state is a sequential recurrence,
    * so like [[graft.kernel.Ewm]] this is a mapPartitions kernel: sort
    * globally, stream each partition once, then make bin ids globally unique
    * by offsetting with the per-partition bin counts (same two-pass trick as
    * zipWithIndex — one tiny driver collect of partition counts, never data).
    */
  def nextFitPack(df: DataFrame, tokenCountCol: String, orderCol: String,
                  budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val sorted = df.repartitionByRange(F.col(orderCol))
      .sortWithinPartitions(F.col(orderCol))
    val tIdx = df.schema.fieldIndex(tokenCountCol)
    // ONE persisted RDD feeds both passes: two separate .rdd conversions
    // would re-sample range boundaries and re-fetch shuffle blocks in a
    // different interleaving, so pass-1 bin counts could mismatch pass-2
    // bin assignment on orderCol ties — overlapping global bin ids. The
    // cache lives until ContextCleaner collects it (LRU-evictable).
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: bins used per partition (cheap: counts only)
    val binsPerPartition = rdd.mapPartitions { it =>
      var bins = 0L; var fill = 0L
      it.foreach { r =>
        val t = r.get(tIdx).asInstanceOf[Number].longValue()
        if (bins == 0L || fill + t > budget) { bins += 1; fill = t }
        else fill += t
      }
      Iterator.single(bins)
    }.collect()
    val offsets = binsPerPartition.scanLeft(0L)(_ + _)
    val schema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("bin", LongType, nullable = false))
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var bin = offsets(pid) - 1; var fill = 0L; var opened = false
      it.map { r =>
        val t = r.get(tIdx).asInstanceOf[Number].longValue()
        if (!opened || fill + t > budget) { bin += 1; fill = t; opened = true }
        else fill += t
        Row.fromSeq(r.toSeq :+ bin)
      }
    }
    df.sparkSession.createDataFrame(packed, schema)
  }

  /** Bin manifest for a packed frame: per bin, the document count, token
    * total, and fill ratio against the budget. */
  def binStats(packed: DataFrame, tokenCountCol: String, budget: Long): DataFrame =
    packed.groupBy(F.col("bin"))
      .agg(F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col(tokenCountCol)).as("n_tokens"))
      .withColumn("fill_ratio", F.col("n_tokens").cast("double") / budget)
}
