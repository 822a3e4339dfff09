package graft.api

import org.apache.spark.sql.SparkSession

/** SQL front-end (reference: lib/polars/sql_context.rb:8-192) — near 1:1 with
  * Spark temp views + `spark.sql`; both stage SQL into the same optimizer that
  * the DataFrame DSL uses.
  */
final class SQLContext(spark: SparkSession) {
  def register(name: String, frame: FrameOps[_]): SQLContext = {
    frame.toSpark.createOrReplaceTempView(name); this
  }
  def register(name: String, df: org.apache.spark.sql.DataFrame): SQLContext = {
    df.createOrReplaceTempView(name); this
  }
  def registerMany(frames: Map[String, FrameOps[_]]): SQLContext = {
    frames.foreach { case (n, f) => register(n, f) }; this
  }
  def unregister(name: String): SQLContext = { spark.catalog.dropTempView(name); this }
  def unregisterMany(names: Seq[String]): SQLContext = { names.foreach(unregister); this }
  def execute(query: String): LazyFrame = LazyFrame(spark.sql(query))
  def executeEager(query: String): DataFrame = DataFrame(spark.sql(query))
  def tables: Seq[String] = spark.catalog.listTables().collect().map(_.name).toSeq
}
