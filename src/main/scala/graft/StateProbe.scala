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
  * bytes, the RocksDB-specific counters, and the CHECKPOINT cost
  * shape — changelog bytes vs full-snapshot bytes per run, the
  * number that decides whether per-batch durability scales with the
  * BATCH (changelog checkpointing, the session default) or with the
  * STATE (full SST uploads). The dedup shape runs twice, changelog
  * on vs OFF, so the ledger carries the contrast on identical
  * data. NOT part of the driver contract.
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark: SparkSession = GraftSession.build("graft-state-probe")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // checkpoint-directory decomposition: changelog files are the
    // per-batch DELTA uploads; zip/sst files are snapshot uploads
    // (background cadence under changelog mode, per-commit without)
    def ckptStats(dir: String): (Long, Long, Long) = {
      var changelog = 0L; var snapshot = 0L; var nChangelogs = 0L
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root)) {
        val it = java.nio.file.Files.walk(root).iterator()
        while (it.hasNext) {
          val p = it.next()
          if (java.nio.file.Files.isRegularFile(p)) {
            val n = p.getFileName.toString
            val len = java.nio.file.Files.size(p)
            if (n.endsWith(".changelog")) {
              changelog += len; nChangelogs += 1
            } else if (n.endsWith(".zip") || n.endsWith(".sst"))
              snapshot += len
          }
        }
      }
      (changelog, snapshot, nChangelogs)
    }
    def run(name: String, df: org.apache.spark.sql.DataFrame,
            mode: String): String = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_probe_$name").toString
      val q = df.writeStream.format("memory")
        .queryName(s"state_probe_$name").outputMode(mode)
        .option("checkpointLocation", ckpt)
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
        val batches = Option(q.lastProgress).map(_.batchId + 1)
          .getOrElse(0L)
        val (cl, snap, ncl) = ckptStats(ckpt)
        s""""$name":{"state_rows":$rows,"state_bytes":$mem,""" +
          s""""rocksdb_sst_bytes":$sst,"n_batches":$batches,""" +
          s""""ckpt_changelog_bytes":$cl,""" +
          s""""ckpt_changelog_files":$ncl,""" +
          s""""ckpt_snapshot_bytes":$snap}"""
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
    // CONTRAST run: the same dedup with changelog checkpointing OFF
    // — per-commit durability becomes full SST/snapshot uploads, the
    // cost shape the session default exists to avoid
    val clKey = "spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled"
    spark.conf.set(clKey, "false")
    val dedupFull =
      try run("dedup_full_snapshot",
        graft.streaming.Streams.eventsStream(spark, sfDir)
          .withWatermark("ts", "1 hour")
          .dropDuplicates("event_id"), "append")
      finally spark.conf.set(clKey, "true")
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val provider = spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass")
    println(s"""{"metric":"state_probe","sf":"$sfDir",""" +
      s""""provider":"${provider.split('.').last}",""" +
      s""""changelog_default":${spark.conf.get(clKey)},""" +
      s"""$agg,$dedup,$dedupFull,"load_end":${fmt(loadAvg())}}""")
  }
}
