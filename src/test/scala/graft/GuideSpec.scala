package graft

import java.nio.file.Files
import graft.Polars._
import graft.api.DataFrame
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** End-to-end flows mirroring the reference's README query and user-guide
  * tests (reference: README.md:20-26, test/guide_test.rb) on equivalent
  * inline data — scan → lazy filter → group → agg → collect, window `over`,
  * join chains, describe. */
class GuideSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("README flow: read_csv → lazy → filter → group_by → agg → collect") {
    val dir = Files.createTempDirectory("guide").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "iris.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("sepal_length,sepal_width,petal_length,petal_width,species")
    Seq(
      "5.1,3.5,1.4,0.2,setosa", "4.9,3.0,1.4,0.2,setosa", "6.4,3.2,4.5,1.5,versicolor",
      "5.5,2.3,4.0,1.3,versicolor", "6.3,3.3,6.0,2.5,virginica", "4.8,3.1,1.6,0.2,setosa"
    ).foreach(w.println)
    w.close()

    val out = scanCsv(csv.getAbsolutePath)
      .filter(col("sepal_length") > 5)
      .groupBy("species")
      .agg(
        col("sepal_width").sum.alias("sum_sepal_width"),
        col("petal_length").sum.alias("sum_petal_length"))
      .sortBy(Seq(col("species")))
      .collect().toSpark.collect()

    assert(out.map(_.getString(0)).toSeq == Seq("setosa", "versicolor", "virginica"))
    assert(math.abs(out(0).getDouble(1) - 3.5) < 1e-9) // only 5.1 passes the filter
    assert(math.abs(out(1).getDouble(2) - 8.5) < 1e-9) // 4.5 + 4.0
  }

  test("guide window: agg broadcast back with over, per-group sort positions") {
    val df = DataFrame(Seq(
      ("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0), ("b", 20.0)).toDF("g", "v"))
    val out = df.withColumns(
      "g_mean" -> col("v").mean.over(col("g")),
      "g_share" -> (col("v") / col("v").sum.over(col("g"))))
      .sortBy(Seq(col("g"), col("v")))
      .toSpark.collect()
    assert(out(0).getDouble(2) == 2.0)
    assert(math.abs(out(2).getDouble(3) - 10.0 / 60.0) < 1e-9)
  }

  test("guide joins: chained equi joins with suffixed clash") {
    val people = DataFrame(Seq((1, "ann", 10), (2, "bo", 20)).toDF("id", "name", "score"))
    val extra = DataFrame(Seq((1, "x", 7), (2, "y", 9)).toDF("id", "name", "bonus"))
    val joined = people.join(extra, Seq("id"))
    assert(joined.columns == Seq("id", "name", "score", "name_right", "bonus"))
    val total = joined.withColumn("total", col("score") + col("bonus"))
      .select(col("id"), col("total")).sortBy(Seq(col("id"))).toSpark.collect()
    assert(total.map(_.getInt(1)).toSeq == Seq(17, 29))
  }

  test("describe summary shape") {
    val df = DataFrame(Seq((1.0, "x"), (2.0, "y"), (4.0, "z")).toDF("v", "s"))
    val d = df.describe().toSpark.collect()
    val stats = d.map(_.getString(0)).toSeq
    // reference shape (data_frame.rb:1169): 7 rows, header "describe",
    // numeric cols f64, str cols str (count stringified, stats null)
    assert(stats == Seq("count", "null_count", "mean", "std", "min", "max", "median"))
    val meanRow = d.find(_.getString(0) == "mean").get
    assert(math.abs(meanRow.getDouble(1) - 7.0 / 3) < 1e-9)
    assert(meanRow.isNullAt(2)) // non-numeric column
    val minRow = d.find(_.getString(0) == "min").get
    assert(minRow.getString(2) == "x")
    val countRow = d.find(_.getString(0) == "count").get
    assert(countRow.getDouble(1) == 3.0 && countRow.getString(2) == "3")
    val medRow = d.find(_.getString(0) == "median").get
    assert(medRow.getDouble(1) == 2.0)
  }

  test("renderer golden-style output for the README result shape") {
    val df = DataFrame(Seq(("setosa", 3.5)).toDF("species", "sum_sepal_width"))
    val rendered = graft.testing.Testing.render(df.toSpark)
    assert(rendered.contains("species") && rendered.contains("f64"))
    assert(rendered.contains("setosa"))
  }
}
