package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** SparkSessionExtensions registration + streaming incremental merge. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions: graft_cosine callable from SQL") {
    // apply to the live session (builder-time withExtensions only
    // takes effect on a fresh session; getOrCreate would reuse this
    // one and stop() would tear down the JVM-shared context)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensions(spark, ext)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(r === 1.0)
    assert(spark.experimental.extraStrategies
      .exists(_ eq graft.plans.TopKStrategy))
  }

  test("streaming incremental merge+dedup equals batch distinct") {
    val store = Files.createTempDirectory("graft_inc").toString + "/store"
    val stream = Streams.eventsStream(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy_MM").as("ym"))
    Streams.incrementalMergeDedup(stream, store, "ym")
    val stored = spark.read.parquet(store)
    assert(stored.count() === 1000)
    assert(stored.select("event_id").distinct().count() === 1000)
  }
}
