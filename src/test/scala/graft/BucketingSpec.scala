package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY §4 / prompt posture): two tables
  * bucketed on the join key join without any Exchange — the shape that
  * makes repeated 100 TB fact-fact joins affordable.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val li = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet")
      val ord = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
      li.select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      ord.select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_b")
      val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
