package graft

import graft.kernel.Skew
import org.apache.spark.sql.{functions => F}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of large-side rows share one hot key
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i)).toDF("k", "v")
    val small = (0L to 10L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(large, small, "k", salts = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted left join preserves unmatched rows") {
    val large = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "v")
    val small = Seq((1L, "dim")).toDF("k", "name")
    val out = Skew.saltedJoin(large, small, "k", salts = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 2)
    assert(out(1).isNullAt(out(1).fieldIndex("name")))
  }

  test("hot key actually scatters across salt buckets") {
    val large = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salt = F.pmod(F.xxhash64(large.columns.map(F.col).toSeq: _*), F.lit(8L))
    val nBuckets = large.withColumn("s", salt).select("s").distinct().count()
    assert(nBuckets > 4, s"content-hash salt should spread the hot key, got $nBuckets buckets")
  }
}
