package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK

/** The custom TopKPerKey operator must agree with the window
  * composition exactly and avoid the full partition sort.
  */
class TopKSpec extends SparkSpec {

  private def events = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
  }

  test("topKPerKey == window row_number composition") {
    val viaTopK = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc, col("event_id")), 3)
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id"))
    val viaWindow = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(viaTopK.count() === viaWindow.count())
    assert(viaTopK.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaTopK).count() === 0)
  }

  test("k larger than group size returns whole groups") {
    val all = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("event_id")), 1000000)
    assert(all.count() === events.count())
  }

  test("adversarial: 100k distinct keys stay within the heap-map " +
    "memory contract") {
    // memory is O(keys-in-partition · k) == the output size; 100k keys
    // × k=2 must complete and return exactly top-2 per key
    val wide = spark.range(300000L).select(
      (col("id") % 100000L).as("k"), col("id").as("v"))
    val top = TopK.perKey(wide, Seq(col("k")), Seq(col("v").desc), 2)
    assert(top.count() === 200000L, "3 rows/key pruned to top 2")
    val k0 = top.filter(col("k") === 0L).collect().map(_.getLong(1)).sorted
    assert(k0.toSeq === Seq(100000L, 200000L), "top-2 of {0,100000,200000}")
  }

  test("maxKeysPerPartition guard fails loudly on pathological " +
    "key cardinality") {
    // one partition, 100 distinct keys, cap of 10: the task must throw
    // the explicit O(keys*k) contract error instead of growing the
    // heap map unbounded toward an OOM
    val wide = spark.range(100L).repartition(1)
      .select(col("id").as("k"), col("id").as("v"))
    val guarded = TopK.perKey(wide, Seq(col("k")), Seq(col("v")), 1,
      maxKeysPerPartition = 10L)
    val e = intercept[org.apache.spark.SparkException] { guarded.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("distinct keys in one partition")),
      s"expected the TopKPerKeyExec guard message, got: $e")
    // same data under the default cap still completes
    assert(TopK.perKey(wide, Seq(col("k")), Seq(col("v")), 1).count() === 100L)
  }

  test("plan: one exchange, no Sort operator") {
    val plan = TopK.perKey(events, Seq(col("user_id")),
      Seq(col("value").desc), 3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"no partition sort expected:\n$plan")
  }
}
