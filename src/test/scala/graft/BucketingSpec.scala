package graft

import org.apache.spark.sql.functions._
/** Bucketing = the co-located join strategy for repeated big-big joins at
  * 100 TB (SURVEY §7.2 build-prompt scale checklist): both tables bucketed by
  * the join key join WITHOUT any shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem joins with zero shuffle exchanges") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse,
    // which is gitignored; dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Tables.table(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.table(spark, sf, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === Tables.table(spark, sf, "lineitem").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
