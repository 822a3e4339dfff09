package graft
import org.apache.spark.sql.SparkSession
// TEMPORARY dev probe — per-iteration pageRank cost at test-like config
object ScratchPr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning","true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = Seq((1L,2L),(1L,3L),(2L,3L),(3L,1L),(4L,1L)).toDF("src","dst")
    for (iters <- Seq(2, 4, 5, 6, 8, 10, 12)) {
      val t0 = System.nanoTime()
      graft.ml.Graph.pageRank(edges, "src", "dst", iterations = iters).collect()
      println(f"PR iters=$iters%-3d ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    spark.stop()
  }
}
