package graft

import graft.io.Bucketed

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join and aggregate without a shuffle") {
    val facts = (1 to 2000).map(i => (i.toLong % 100, i.toDouble)).toDF("k", "v")
    val dims = (0 until 100).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    Bucketed.write(facts, "graft_spec_facts", Seq("k"), 8, sortCols = Seq("k"))
    Bucketed.write(dims, "graft_spec_dims", Seq("k"), 8, sortCols = Seq("k"))

    // hint("merge") forces sort-merge (the at-scale strategy) over broadcast
    val joined = Bucketed.table(spark, "graft_spec_facts").hint("merge")
      .join(Bucketed.table(spark, "graft_spec_dims"), "k")
    val joinPlan = joined.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange"), s"expected shuffle-free bucketed join:\n$joinPlan")
    assert(joined.count() == 2000)

    // aggregation on the bucket key is exchange-free too
    val agged = Bucketed.table(spark, "graft_spec_facts")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("sv"))
    val aggPlan = agged.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), s"expected shuffle-free bucketed agg:\n$aggPlan")
    assert(agged.count() == 100)
  }
}
