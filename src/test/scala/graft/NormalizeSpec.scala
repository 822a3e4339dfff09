package graft

import graft.ml.TextAnalysis
import org.apache.spark.sql.{functions => F}

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): String =
    df.collect().head.getString(0)

  test("NFC composes decomposed accents; NFKC folds compatibility forms") {
    val d = Seq("Café  du  Monde").toDF("t") // e + combining acute
    assert(one(d.select(TextAnalysis.normalizeText(F.col("t")).as("n")))
      == "café du monde")
    // ﬁ (U+FB01 ligature) and ① (U+2460) are NFKC-only decompositions
    val k = Seq("\uFB01le \u2460").toDF("t")
    assert(one(k.select(TextAnalysis.normalizeText(F.col("t"), form = "NFKC").as("n")))
      == "file 1")
    assert(one(k.select(TextAnalysis.normalizeText(F.col("t"), form = "NFC").as("n")))
      == "\uFB01le \u2460") // NFC leaves compatibility chars alone
  }

  test("stripMarks folds accents to base letters") {
    val d = Seq("Crème Brûlée naïve").toDF("t")
    assert(one(d.select(TextAnalysis.normalizeText(F.col("t"),
      stripMarks = true).as("n"))) == "creme brulee naive")
  }

  test("normalization options: case/whitespace preserved when disabled; nulls propagate") {
    val d = Seq(("Á  B"), (null)).toDF("t")
    val out = d.select(TextAnalysis.normalizeText(F.col("t"),
      lowercase = false, collapseWhitespace = false).as("n")).collect()
    assert(out(0).getString(0) == "\u00C1  B") // composed, case+spacing kept
    assert(out(1).isNullAt(0))
  }

  test("graft_unicode_norm is SQL-registered and survives codegen") {
    graft.ext.GraftExtensions.register(spark)
    Seq("é").toDF("t").createOrReplaceTempView("norm_t")
    val r = spark.sql("SELECT graft_unicode_norm(t, 'NFC') AS n FROM norm_t")
    assert(one(r) == "\u00E9")
    // invalid form surfaces the JDK error, not silence
    intercept[Exception] {
      spark.sql("SELECT graft_unicode_norm(t, 'NOPE') FROM norm_t").collect()
    }
  }
}
