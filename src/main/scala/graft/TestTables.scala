package graft

import org.apache.spark.sql.{functions => F, DataFrame => SDF}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Schema-adaptive loading helpers for the driver's synthetic tables.
  *
  * The `events.ts` column has shipped in two physical spellings across
  * testdata generations: parquet TIMESTAMP(NANOS) — which Spark reads as
  * a raw Long under `spark.sql.legacy.parquet.nanosAsLong` — and native
  * timestamp[us], which Spark reads as TIMESTAMP_NTZ. Normalize both to
  * session-tz TimestampType (µs) so every query sees one shape; with the
  * UTC session tz used by Verify/Bench/tests the NTZ cast is instant-
  * preserving and hashes identically to the DuckDB oracle's epoch_us.
  */
object TestTables {
  def normalizeEventsTs(df: SDF): SDF = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    case TimestampType => df
    case _             => df.withColumn("ts", F.col("ts").cast("timestamp"))
  }
}
