package graft

import org.apache.spark.sql.functions._

import graft.io.Sources

/** Bucketing = the pay-the-shuffle-once-at-write-time strategy for
  * repeatedly-joined fact tables: two tables bucketed on the join key
  * with the same bucket count must join with ZERO shuffle exchanges.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans no ShuffleExchange") {
    val li = graft.queries.Q.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = graft.queries.Q.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Sources.writeBucketed(li, "li_bkt", "l_orderkey", 4)
    Sources.writeBucketed(o, "o_bkt", "o_orderkey", 4)
    // disable broadcast so the bucketed (shuffle-free) path is the one
    // under test, not a broadcast fallback
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
      // and it is still correct
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("bucketed group-by on the bucket key plans no ShuffleExchange") {
    val li = graft.queries.Q.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    Sources.writeBucketed(li, "li_bkt2", "l_orderkey", 4)
    try {
      val agg = spark.table("li_bkt2").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
      assert(agg.count() == li.select("l_orderkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bkt2")
    }
  }
}
