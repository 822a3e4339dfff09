package graft

import org.apache.spark.sql.{DataFrame => SDF}

/** Materialize an intermediate frame to a deterministic per-SF staging path
  * and read it back.
  *
  * Used by the LSH/IVF driver queries: their SIGNATURES depend on Spark's
  * xxhash64 bit patterns, which DuckDB cannot reproduce — but the candidate
  * JOIN LOGIC (band equality, hamming blocking, bucket equality, cell
  * membership + cosine top-k) is plain relational algebra. Staging the
  * signature rows lets the DuckDB oracle re-derive the pair/top-k result from
  * the IDENTICAL rows, turning a rows-only check into a full hash-checked one.
  *
  * The driver's correctness gate runs Verify at sf0.01, so the oracle SQL
  * hardcodes `/tmp/graft_stage/sf0.01/...`; the path is keyed by the SF
  * directory name so a bench run at another SF never clobbers the staged
  * rows the oracle reads.
  */
object QueryStage {
  def stage(df: SDF, sfDir: String, name: String): SDF = {
    val sf = new java.io.File(sfDir).getName
    val path = s"/tmp/graft_stage/$sf/$name"
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
