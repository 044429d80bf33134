package graft.plans

import graft.SparkSuite

/** Bucketing = the pre-shuffle co-located join (SURVEY.md brief:
  * "repartition()/bucketing for co-located joins"). Writing both sides
  * bucketed by the join key lets Spark plan a SortMergeJoin with ZERO
  * Exchange — at 100 TB this turns every repeated fact⋈fact join on the
  * same key from a full shuffle into a local merge. */
class BucketingSpec extends SparkSuite {

  test("join of two tables bucketed on the key plans no Exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    // disable broadcast (it would win at this toy size and is itself an
    // Exchange) and AQE (its toString keeps pre-optimization exchanges):
    // the interesting plan is the bucketed SortMergeJoin
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ; plan:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans; plan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle; plan:\n$plan")
    assert(joined.count() == 6000) // every lineitem matches its order
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("the same join WITHOUT bucketing pays a shuffle on each side " +
    "(the control measurement)") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (500L to 1500L).map(i => (i, s"r$i")).toDF("k", "rv")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = left.join(right, "k")
      joined.collect()
      // inspect the FINAL adaptive plan via its string form —
      // AdaptiveSparkPlanExec hides children from plan.collect, which
      // would make a node-collect assertion pass vacuously
      val plan = joined.queryExecution.executedPlan.toString
      val nShuffles = "Exchange hashpartitioning\\(k#".r
        .findAllMatchIn(plan).length
      assert(nShuffles >= 2, s"expected both sides shuffled, got:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
