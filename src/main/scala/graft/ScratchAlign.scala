package graft
import org.apache.spark.sql.{SparkSession, functions => F}
// TEMPORARY dev probe for q_align_frames (not committed): cold/warm A/B of
// the r15 PrepCache persist of the alignment-key superset, plus the aligned
// frame's OWN lineage dump (the final hstack plan hides the cache behind the
// zipWithDenseIndex RDD boundary).
object ScratchAlign {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
    def frames() = {
      val bySeg = graft.api.DataFrame(t("customer")
        .filter(F.col("c_nationkey") < 15)
        .groupBy("c_nationkey").agg(F.count(F.lit(1)).as("n_cust")))
      val byNation = graft.api.DataFrame(t("supplier")
        .filter(F.col("s_nationkey") >= 5)
        .groupBy(F.col("s_nationkey").as("c_nationkey")).agg(F.count(F.lit(1)).as("n_supp")))
      (bySeg, byNation)
    }
    // Variant A: current library path (persistBounded inside alignFrames)
    def runA(): Long = {
      val (a0, b0) = frames()
      val Seq(a, b) = Polars.alignFrames(Seq(a0, b0), "c_nationkey")
      a.hstack(graft.api.DataFrame(b.toSpark.select("n_supp")))
        .sortBy(Seq(Polars.col("c_nationkey"))).toSpark.count()
    }
    // Variant B: identical algebra, NO persist of the key superset
    def runB(): Long = {
      val (a0, b0) = frames()
      val keys = Seq(a0, b0).map(_.toSpark.select("c_nationkey")).reduce(_ unionAll _).distinct()
      val aligned = Seq(a0, b0).map(f =>
        graft.api.DataFrame(keys.join(f.toSpark, Seq("c_nationkey"), "left").orderBy("c_nationkey")))
      val Seq(a, b) = aligned
      a.hstack(graft.api.DataFrame(b.toSpark.select("n_supp")))
        .sortBy(Seq(Polars.col("c_nationkey"))).toSpark.count()
    }
    def times(label: String)(f: () => Long): Unit = {
      val cold = { val t0 = System.nanoTime(); f(); (System.nanoTime()-t0)/1e9 }
      val warm = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime()-t0)/1e9
      }.sorted
      println(f"ALIGN $label cold=${cold}%.3f warm_med=${warm(warm.size/2)}%.3f warm=${warm.map(x => f"$x%.3f").mkString(",")}")
    }
    times("A_persist")(runA)
    graft.kernel.PrepCache.clear()
    times("B_nopersist")(runB)
    // lineage dump of the aligned frame itself (not the hstack)
    val (a0, b0) = frames()
    val Seq(a, _) = Polars.alignFrames(Seq(a0, b0), "c_nationkey")
    println("=== aligned frame a lineage ===")
    a.toSpark.explain("formatted")
    spark.stop()
  }
}
