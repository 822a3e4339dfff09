package graft

import java.nio.file.Files
import graft.streaming.Streaming
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft-stream").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("sink_parquet stream processes all available input then stops") {
    val in = tmpDir(); val out = tmpDir() + "/out"; val cp = tmpDir() + "/cp"
    val src = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
    src.coalesce(1).write.mode("overwrite").parquet(in)
    val stream = Streaming.scanParquetStream(in, src.schema)
    Streaming.sinkParquet(stream, out, cp)
    val back = spark.read.parquet(out)
    assert(back.count() == 3)
  }

  test("foreachBatch bridge sees every micro-batch") {
    val in = tmpDir(); val cp = tmpDir() + "/cp"
    val src = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    src.coalesce(1).write.mode("overwrite").parquet(in)
    var total = 0L
    Streaming.foreachBatch(Streaming.scanParquetStream(in, src.schema), cp) { (df, _) =>
      total += df.count()
    }
    assert(total == 2)
  }

  test("batched iterator chunks deterministically") {
    val df = spark.range(10).toDF("i")
    val batches = Streaming.batchedIterator(df, batchSize = 4).toSeq
    assert(batches.map(_.size) == Seq(4, 4, 2))
  }
}
