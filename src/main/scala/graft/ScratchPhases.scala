package graft
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.ml.Similarity
// TEMPORARY dev probe — not committed
object ScratchPhases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning","true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst","false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    QueryStage.reuseUnchanged = true
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime()-t0)/1e9}%7.3f s"); r
    }
    def t(s: SparkSession, name: String) = s.read.parquet(s"$dir/$name.parquet")
    SparkEntry.queries("q_ivf_rerank")(spark, dir).count()
    for (i <- 1 to 3) {
      println(s"--- run $i ---")
      val emb = t(spark, "embeddings")
      val assigned = time("ivfAssign build")(Similarity.ivfAssign(emb, "embedding", nCells = 8)
        .select(F.col("vec_id"), F.col("cell_id"), F.col("embedding").cast("array<double>").as("embedding")))
      val cells = time("stage ivf_cells")(QueryStage.stage(assigned, dir, "ivf_cells"))
      val query = time("memo query")(QueryStage.memo(dir, "ivf_query")(
        cells.filter(F.col("vec_id") === 1).select("embedding").collect()(0).getSeq[Double](0)))
      val centroids = time("memo centroids")(QueryStage.memo(dir, "ivf_centroids")(
        Similarity.sampleCentroids(emb, "embedding", 8)))
      val probeCells = time("nearestCells")(Similarity.nearestCells(centroids.toSeq, query, 3))
      time("stage probes")(QueryStage.stage(probeCells.toDF("cell_id"), dir, "ivf_probes"))
      val codebooks = time("memo codebooks")(QueryStage.memo(dir, "pq_codebooks")(
        Similarity.pqTrain(emb, "embedding", m = 8, k = 16)))
      val encoded = time("pqEncode build")(Similarity.pqEncode(emb, "embedding", "vec_id", codebooks))
      val codes = time("stage pq_codes")(QueryStage.stage(encoded, dir, "pq_codes"))
      val qPq = time("memo pq_query")(QueryStage.memo(dir, "pq_query")(
        emb.filter(F.col("vec_id") === 1).select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq))
      val lut = time("pqLut")(Similarity.pqLut(qPq, codebooks))
      val lutRows = for (j <- lut.indices; c <- lut(j).indices) yield (j + 1, c, lut(j)(c))
      time("stage pq_lut")(QueryStage.stage(lutRows.toDF("j", "code", "sq"), dir, "pq_lut"))
      val res = time("ivfPqReRank build")(Similarity.ivfPqReRank(cells, codes, "vec_id", "embedding",
        probeCells, query, lut, shortlist = 50, k = 10)
        .select(F.col("vec_id"), F.round(F.col("cosine"), 6).as("cosine"),
          F.round(F.col("adc"), 6).as("adc"))
        .orderBy(F.col("cosine").desc, F.col("vec_id")))
      time("count action")(res.count())
    }
    spark.stop()
  }
}
