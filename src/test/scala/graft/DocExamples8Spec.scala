package graft

import graft.Polars.col
import graft.api.DataFrame
import graft.testing.Testing
import org.apache.spark.sql.types.ByteType

/** Round-12 tranche 7 of the reference `@example` golden corpus:
  * functions/as_datatype.rb format and functions/repeat.rb constructors.
  * Verbatim expected renders. */
class DocExamples8Spec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sparkForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }
  private def checkS(s: graft.api.Series, expected: String): Unit = {
    val got = Testing.renderSeries(s)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("as_datatype.rb format: placeholders fill from expressions and columns") {
    val df = DataFrame(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("a", "b"))
    check(df.select(Polars.format("foo_{}_bar_{}", col("a"), col("b")).alias("fmt")),
      """shape: (3, 1)
        |┌─────────────┐
        |│ fmt         │
        |│ ---         │
        |│ str         │
        |╞═════════════╡
        |│ foo_a_bar_1 │
        |│ foo_b_bar_2 │
        |│ foo_c_bar_3 │
        |└─────────────┘""")
  }

  test("repeat.rb repeat: str and i8 dtype forms") {
    checkS(Polars.repeatSeries("z", 3),
      "shape: (3,)\nSeries: 'repeat' [str]\n[\n\t\"z\"\n\t\"z\"\n\t\"z\"\n]")
    checkS(Polars.repeatSeries(3, 3, dtype = Some(ByteType)),
      "shape: (3,)\nSeries: 'repeat' [i8]\n[\n\t3\n\t3\n\t3\n]")
  }

  test("repeat.rb ones / zeros with an i8 dtype") {
    checkS(Polars.ones(3, ByteType),
      "shape: (3,)\nSeries: 'ones' [i8]\n[\n\t1\n\t1\n\t1\n]")
    checkS(Polars.zeros(3, ByteType),
      "shape: (3,)\nSeries: 'zeros' [i8]\n[\n\t0\n\t0\n\t0\n]")
  }
}
