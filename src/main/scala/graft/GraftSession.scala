package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory: every entry point (Verify, Bench,
  * PlanAudit, user code) gets the same scale posture — AQE with skew
  * handling, bounded shuffle partitions, UTC session time, and the
  * legacy nanos conf the driver's TIMESTAMP(NANOS) test tables need.
  */
object GraftSession {
  def build(appName: String = "graft",
            master: String = s"local[${sys.env.getOrElse(
              "SPARK_GRAFT_CPUS", "32")}]",
            shufflePartitions: Int =
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
           : SparkSession = {
    val s = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB state store: streaming state (stream-stream join
      // buffers, dedup key sets, mapGroupsWithState payloads) lives
      // OFF-HEAP in a native LSM instead of the default provider's
      // executor-heap HashMap — at 100x state sizes the heap-backed
      // store OOMs or GC-thrashes long before the box runs out of
      // memory, while RocksDB spills to local SSD and keeps
      // checkpointing incremental (changelog + SST files). Bounded
      // memory via the soft limit below; unbounded-by-default is how
      // a 1000-executor streaming job dies at 3am.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb." +
        "boundedMemoryUsage", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
