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

  test("watermarked windowed agg matches batch group_by_dynamic") {
    val in = tmpDir()
    val src = Seq(
      ("2024-01-01 00:10:00", "a", 1.0), ("2024-01-01 05:50:00", "a", 2.0),
      ("2024-01-01 06:10:00", "b", 3.0), ("2024-01-01 12:01:00", "a", 4.0))
      .toDF("ts", "k", "v").select(F.to_timestamp(F.col("ts")).as("ts"), F.col("k"), F.col("v"))
    src.coalesce(1).write.mode("overwrite").parquet(in)
    val stream = Streaming.scanParquetStream(in, src.schema)
    val windowed = Streaming.windowedAgg(stream, "ts", "6 hours", by = Seq("k"),
      aggs = Seq(F.count(F.lit(1)).as("n"), F.sum("v").as("sv")))
    val got = Streaming.runToMemory(windowed, "spec_swin")
      .select(F.col("k"), F.col("window.start").as("w"), F.col("n"), F.col("sv"))
      .orderBy("k", "w").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 2L, 3.0),
      ("a", "2024-01-01 12:00:00.0", 1L, 4.0),
      ("b", "2024-01-01 06:00:00.0", 1L, 3.0)))
  }

  test("session windows merge within gap, split at or beyond it") {
    val in = tmpDir()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(minutes: Int) = new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    // u1: 0m, 30m (merge), 91m (split: 61m > 1h gap; exactly-at-gap merges —
    // session_window's close is inclusive at prev_end)
    // u2: single event
    val src = Seq(("u1", at(0), 1.0), ("u1", at(30), 2.0), ("u1", at(91), 4.0),
      ("u2", at(10), 8.0)).toDF("user_id", "ts", "v")
    src.coalesce(1).write.mode("overwrite").parquet(in)
    val stream = Streaming.scanParquetStream(in, src.schema)
    val sessions = Streaming.sessionWindowAgg(stream, "ts", "1 hour",
      by = Seq("user_id"), aggs = Seq(F.count(F.lit(1)).as("n"), F.sum("v").as("sv")))
    val out = Streaming.runToMemory(sessions, "graft_sessions_test")
      .select(F.col("user_id"), F.col("session_window.start").as("start"), F.col("n"), F.col("sv"))
      .orderBy("user_id", "start").collect()
    assert(out.length == 3)
    assert(out(0).getString(0) == "u1" && out(0).getLong(2) == 2 && out(0).getDouble(3) == 3.0)
    assert(out(1).getString(0) == "u1" && out(1).getLong(2) == 1 && out(1).getDouble(3) == 4.0)
    assert(out(1).getTimestamp(1) == at(91)) // session start = first event of the run
    assert(out(2).getString(0) == "u2" && out(2).getLong(2) == 1 && out(2).getDouble(3) == 8.0)
  }

  test("streaming dedup within watermark drops duplicates, keeps distinct") {
    val in = tmpDir()
    val src = Seq(
      ("2024-01-01 10:00:00", "k1", 1.0), ("2024-01-01 10:05:00", "k1", 2.0),
      ("2024-01-01 10:10:00", "k2", 3.0))
      .toDF("ts", "k", "v").select(F.to_timestamp(F.col("ts")).as("ts"), F.col("k"), F.col("v"))
    src.coalesce(1).write.mode("overwrite").parquet(in)
    val stream = Streaming.scanParquetStream(in, src.schema)
    val deduped = Streaming.dedupWithinWatermark(stream, Seq("k"), "ts")
    val got = Streaming.runToMemory(deduped, "spec_sdedup", mode = "append")
      .select("k").orderBy("k").collect().map(_.getString(0))
    assert(got.toSeq == Seq("k1", "k2"))
  }

  test("rocksdb state store provider runs a windowed agg") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    Streaming.useRocksDbStateStore(spark)
    try {
      val in = tmpDir()
      val src = Seq(("2024-01-01 00:10:00", 1.0), ("2024-01-01 06:10:00", 2.0))
        .toDF("ts", "v").select(F.to_timestamp(F.col("ts")).as("ts"), F.col("v"))
      src.coalesce(1).write.mode("overwrite").parquet(in)
      val stream = Streaming.scanParquetStream(in, src.schema)
      val windowed = Streaming.windowedAgg(stream, "ts", "6 hours", by = Nil,
        aggs = Seq(F.count(F.lit(1)).as("n")))
      val got = Streaming.runToMemory(windowed, "spec_rocks")
        .select("n").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 1L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming curation cleans on arrival: PII redacted, low-quality dropped") {
    val in = tmpDir(); val out = tmpDir() + "/out"; val cp = tmpDir() + "/cp"
    val good = (1 to 60).map(i => s"word$i").mkString(" ") + " mail me at a@b.co"
    val short = "too short to keep"
    val src = Seq((1L, good), (2L, short)).toDF("doc_id", "text")
    src.coalesce(1).write.mode("overwrite").parquet(in)
    Streaming.curateStream(in, src.schema, "text", out, cp, minWords = 50)
    val cleaned = spark.read.parquet(out).collect()
    assert(cleaned.length == 1 && cleaned(0).getLong(0) == 1L)
    val text = cleaned(0).getString(1)
    assert(text.contains("[EMAIL]") && !text.contains("a@b.co"))
    // second drain with new files only processes the new arrivals
    Seq((3L, good)).toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(in)
    Streaming.curateStream(in, src.schema, "text", out, cp, minWords = 50)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("batched iterator chunks deterministically") {
    val df = spark.range(10).toDF("i")
    val batches = Streaming.batchedIterator(df, batchSize = 4).toSeq
    assert(batches.map(_.size) == Seq(4, 4, 2))
  }

  test("streaming near-dedup: cross-batch registry hit, intra-batch min-id wins, unique kept") {
    val base = tmpDir()
    val in = base + "/in"; val out = base + "/out"
    val reg = base + "/reg"; val cp = base + "/cp"
    new java.io.File(in).mkdirs()
    val textA = (1 to 60).map(i => s"albatross${i}quiver").mkString(" ")
    val textC = (1 to 60).map(i => s"gargoyle${i}plinth").mkString(" ")
    val textB = "changed " + textA.split(" ", 2)(1) // near-dup of A
    val textD = (1 to 60).map(i => s"dromedary${i}sprocket").mkString(" ")
    def wave(n: Int, rows: Seq[(Long, String)]): Unit = {
      val stagePath = base + s"/w$n"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stagePath)
      val part = new java.io.File(stagePath).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(in, f"wave$n%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      assert(dest.toFile.setLastModified(1700000000000L + n * 60000L))
    }
    wave(1, Seq((1L, textA), (2L, textC)))
    // B is a near-dup of wave-1's A (registry hit); E dups in-batch copy of D
    // with a LARGER id (intra-batch min-id owner keeps D)
    wave(2, Seq((3L, textB), (4L, textD), (5L, "prefixed " + textD.split(" ", 2)(1))))
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Streaming.nearDedupStream(in, schema, "text", "doc_id", out, reg, cp)
    val kept = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 4L))
    // every document's bands were registered — dropped ones included — and
    // each batch landed under its own batch=<id>/ directory (the name
    // exclusion that keeps a retried batch from self-colliding)
    val regBands = spark.read.parquet(reg)
    assert(regBands.columns.toSeq.sorted == Seq("band_hash", "band_idx", "batch"))
    val batchDirs = new java.io.File(reg).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(batchDirs.length == 2, batchDirs.mkString(","))
    // a third drain over the same checkpoint sees no new files and changes nothing
    Streaming.nearDedupStream(in, schema, "text", "doc_id", out, reg, cp)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("classifier stream: batch-trained model filters arriving documents") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-clfstream").toFile
    tmp.deleteOnExit()
    val (in, out, cp) = (tmp + "/in", tmp + "/out", tmp + "/cp")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(in))
    // train offline on a labeled seed set (bigram-disjoint classes)
    val seed = Seq(
      (1L, "good clean prose flows well", 1),
      (2L, "clean prose flows well today", 1),
      (3L, "zz xx qq ww vv kk", 0),
      (4L, "xx qq ww vv kk zz", 0)).toDF("doc_id", "text", "label")
    val feats = graft.ml.Sampling.hashedNgramBuckets(seed, "text", "doc_id", buckets = 256)
    val model = graft.ml.Classifier.logisticFit(
      feats, seed.select("doc_id", "label"), "doc_id", buckets = 256, epochs = 30)
    // bounded-frame twin first
    val arriving = Seq(
      (10L, "good clean prose reads well"), (11L, "qq ww vv kk zz xx"))
      .toDF("doc_id", "text")
    val keptB = Streaming.classifierTransform(arriving, "text", "doc_id", model)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(keptB == Seq(10L))
    // then the stream: same documents arriving as a file
    arriving.coalesce(1).write.parquet(in + "/w1")
    val part = new java.io.File(in + "/w1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(in, "wave1.parquet"))
    Streaming.classifierStream(in, arriving.schema, "text", "doc_id", model, out, cp)
    val kept = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(10L))
  }

  test("capPerKeyStream enforces the per-key quota ACROSS micro-batches") {
    val in = tmpDir(); val root = Files.createTempDirectory("graft-cap-root").toFile
    root.deleteOnExit()
    def wave(n: Int, rows: Seq[(String, Long)]): Unit = {
      val stage = tmpDir()
      rows.toDF("k", "id").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(in, f"wave$n%04d.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + n * 60000L)
    }
    val schema = Seq(("x", 1L)).toDF("k", "id").schema
    // one file per micro-batch so the quota state must SURVIVE batches
    def drain() = Streaming.drainToParquet(
      Streaming.capPerKeyStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
        "k", "id", cap = 3),
      root, mode = "append")
      .orderBy("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toList
    // wave 1: a has 2 of 3, intra-batch sort keeps ids 2,10 in order
    wave(1, Seq(("a", 10L), ("a", 2L), ("b", 1L)))
    assert(drain() == List(("a", 2L), ("a", 10L), ("b", 1L)))
    // wave 2: a gets ONE more (quota 3, 2 already kept), b two more
    wave(2, Seq(("a", 20L), ("a", 21L), ("b", 22L), ("b", 23L)))
    assert(drain() == List(
      ("a", 2L), ("a", 10L), ("a", 20L), ("b", 1L), ("b", 22L), ("b", 23L)))
    // wave 3: a is full — nothing more emitted for it
    wave(3, Seq(("a", 30L), ("c", 31L)))
    assert(drain() == List(
      ("a", 2L), ("a", 10L), ("a", 20L),
      ("b", 1L), ("b", 22L), ("b", 23L), ("c", 31L)))
  }

  test("drainToParquet resumes from a retained checkpoint: no-op on unchanged input, incremental on new files") {
    // complete mode (stateful windowed agg)
    val root = Files.createTempDirectory("graft-drain-root").toFile
    root.deleteOnExit()
    val in = tmpDir()
    val src = Seq(("2024-01-01 01:00:00", "a", 1.0), ("2024-01-01 02:00:00", "b", 2.0))
      .toDF("ts", "k", "v")
      .select(F.to_timestamp(F.col("ts")).as("ts"), F.col("k"), F.col("v"))
    src.coalesce(1).write.mode("append").parquet(in)
    def agg() = Streaming.windowedAgg(
      Streaming.scanParquetStream(in, src.schema), "ts", "6 hours",
      by = Seq("k"), aggs = Seq(F.count(F.lit(1)).as("n")))
    def rows() = Streaming.drainToParquet(agg(), root)
      .select(F.col("k"), F.col("n")).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows() == Seq(("a", 1L), ("b", 1L)))
    // resumed drain over unchanged input: zero new batches, retained output
    assert(rows() == Seq(("a", 1L), ("b", 1L)))
    // the resume must really RESUME — the identical plan hashes identically,
    // so the checkpoint's first offset file is untouched (no wipe+redrain)
    val off0 = new java.io.File(root, "cp/offsets/0")
    assert(off0.isFile)
    val stamp = off0.lastModified()
    assert(rows() == Seq(("a", 1L), ("b", 1L)))
    assert(off0.lastModified() == stamp, "resume wiped an unchanged query's checkpoint")
    // a new arriving file IS processed — the resume is incremental, not frozen
    Seq(("2024-01-01 03:00:00", "a", 3.0)).toDF("ts", "k", "v")
      .select(F.to_timestamp(F.col("ts")).as("ts"), F.col("k"), F.col("v"))
      .coalesce(1).write.mode("append").parquet(in)
    assert(rows() == Seq(("a", 2L), ("b", 1L)))
    // a CHANGED query over the same root must NOT serve the old query's
    // retained output: the plan-hash guard wipes checkpoint+output and the
    // new shape drains the full input fresh
    val changed = Streaming.drainToParquet(
      Streaming.windowedAgg(
        Streaming.scanParquetStream(in, src.schema), "ts", "6 hours",
        by = Seq("k"), aggs = Seq(F.sum("v").as("sv"))), root)
      .select(F.col("k"), F.col("sv")).orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(changed == Seq(("a", 4.0), ("b", 2.0)), changed.toString)

    // append mode (dedup-within-watermark): resume keeps the file-sink log
    val root2 = Files.createTempDirectory("graft-drain-root2").toFile
    root2.deleteOnExit()
    val in2 = tmpDir()
    src.coalesce(1).write.mode("append").parquet(in2)
    def dedup() = Streaming.dedupWithinWatermark(
      Streaming.scanParquetStream(in2, src.schema), Seq("k"), "ts", watermark = "10 days")
    def keys() = Streaming.drainToParquet(dedup(), root2, mode = "append")
      .select("k").orderBy("k").collect().map(_.getString(0)).toSeq
    assert(keys() == Seq("a", "b"))
    assert(keys() == Seq("a", "b")) // resumed: no re-emit, no loss
    // new file: duplicate key dropped against retained state, new key appended
    Seq(("2024-01-01 02:30:00", "a", 9.0), ("2024-01-01 02:40:00", "c", 9.0))
      .toDF("ts", "k", "v")
      .select(F.to_timestamp(F.col("ts")).as("ts"), F.col("k"), F.col("v"))
      .coalesce(1).write.mode("append").parquet(in2)
    assert(keys() == Seq("a", "b", "c"))
  }
}
