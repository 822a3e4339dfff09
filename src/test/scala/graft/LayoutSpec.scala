package graft

import graft.io.Layout
import org.apache.spark.sql.{functions => F}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue is the Morton interleave") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)).toDF("x", "y")
    val z = pts.select(Layout.zValue(Seq(F.col("x"), F.col("y")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(0L, 1L, 2L, 3L, 4L, 15L))
  }

  test("zValueScaled clamps out-of-range values") {
    val d = Seq(-5.0, 0.0, 50.0, 100.0, 200.0).toDF("v")
    val z = d.select(Layout.zValueScaled(Seq((F.col("v"), 0.0, 100.0)), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z.head == 0L && z.last == 15L) // clamped, not wrapped
    assert(z == z.sorted)
  }

  test("zorderWrite bounds BOTH dimensions' min/max per file") {
    val grid = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y)).toDF("x", "y")
    val p = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    p.deleteOnExit()
    val path = p.getAbsolutePath + "/t"
    Layout.zorderWrite(grid, Seq("x", "y"), path, files = 4, bits = 4,
      ranges = Some(Seq((0.0, 15.0), (0.0, 15.0))))
    val perFile = spark.read.parquet(path)
      .groupBy(F.input_file_name().as("f"))
      .agg(F.min("x").as("x0"), F.max("x").as("x1"),
        F.min("y").as("y0"), F.max("y").as("y1"))
      .collect()
    assert(perFile.length == 4)
    // a single-key sort leaves the other key's range at 16 in every file;
    // the z-curve bounds both (8 for perfectly-aligned quadrants, slop for
    // range-sampler boundaries)
    perFile.foreach { r =>
      val xr = r.getAs[Int]("x1") - r.getAs[Int]("x0") + 1
      val yr = r.getAs[Int]("y1") - r.getAs[Int]("y0") + 1
      assert(xr <= 12 && yr <= 12, s"file covers x-range $xr, y-range $yr")
    }
  }
}
