package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off streaming STATE-STORE probe (`sbt "runMain
  * graft.StateProbe"`) — the evidence run behind
  * `BENCH_state_probe.json`: runs the two stateful shapes that
  * dominate the gate suite (windowed keyed aggregate;
  * dropDuplicates keyed dedup) over the sf events as AvailableNow
  * streams on the SESSION's state store (RocksDB via
  * [[GraftSession]]) and reports each query's state rows, state
  * bytes, and the RocksDB-specific counters — the numbers that
  * decide whether 100× state fits an executor. NOT part of the
  * driver contract.
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.build("graft-state-probe")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def run(name: String, df: org.apache.spark.sql.DataFrame,
            mode: String): String = {
      val q = df.writeStream.format("memory")
        .queryName(s"state_probe_$name").outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try {
        q.awaitTermination()
        val ops = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
        val rows = ops.map(_.numRowsTotal).sum
        val mem = ops.map(_.memoryUsedBytes).sum
        val sst = ops.flatMap(o =>
          Option(o.customMetrics.get("rocksdbSstFileSize"))
            .map(_.longValue())).sum
        s""""$name":{"state_rows":$rows,"state_bytes":$mem,""" +
          s""""rocksdb_sst_bytes":$sst}"""
      } finally q.stop()
    }
    val ev = graft.streaming.Streams.eventsStream(spark, sfDir)
    val agg = run("windowed_agg",
      ev.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n")), "append")
    val dedup = run("dedup",
      graft.streaming.Streams.eventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id"), "append")
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val provider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass")
    println(s"""{"metric":"state_probe","sf":"$sfDir",""" +
      s""""provider":"${provider.split('.').last}",""" +
      s"""$agg,$dedup,"load_end":${fmt(loadAvg())}}""")
  }
}
