package graft

import org.apache.spark.sql.SparkSession

/** One-off DRIVER-side manifest-scale probe (`sbt "runMain
  * graft.ManifestScaleProbe [nFiles]"`) — the evidence run behind
  * the v4 sharding claim: fabricates a store whose manifest lists
  * `nFiles` (default 100k) stat-bearing entries in disjoint doc_id
  * bands (the prune never opens data files, so none exist), then
  * publishes the SAME table once more through the organic commit
  * path with a small shard size — producing a v3-encoded version and
  * a v4-encoded version of one logical snapshot — and times a
  * selective range prune against each, cold (manifest parse
  * included) and warm (parse cached). The kept sets are asserted
  * EQUAL, so the timing difference is pure planning cost: v3 walks
  * every entry's stats per query; v4 proves whole-shard skips and
  * touches only the overlapping shards. NOT part of the driver
  * contract.
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val spark: SparkSession = GraftSession.build("graft-manifest-probe")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_probe").toString + "/tbl"
    val f = new java.io.File(s"$dir/_manifests")
    f.mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType)))
    // one entry per synthetic file: 100 rows, disjoint doc_id band
    val entries = (0 until nFiles).map { i =>
      val lo = i * 100L
      val hi = lo + 99L
      f"data/c-probe/part-$i%06d.parquet\t__len:L:4096:4096;" +
        s"__rows:L:100:100;doc_id:L:$lo:$hi;doc_id:N:0:0;" +
        s"n_chars:L:1:5000;n_chars:N:0:0"
    }
    val lines = Seq("graft-snapshot-v3", schema.json, "-", "#op=probe") ++
      entries :+ ""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_manifests/v000000001.manifest"),
      lines.mkString("\n").getBytes("UTF-8"))
    // republish the same snapshot through the organic commit path
    // with sharding forced on: v2 is the v4 encoding of v1
    val prevShard = graft.io.Snapshots.shardSizeOverride
    graft.io.Snapshots.shardSizeOverride = Some(512)
    val v2 =
      try graft.io.Snapshots.setProperties(spark, dir,
        Map("probe" -> "true"))
      finally graft.io.Snapshots.shardSizeOverride = prevShard
    val refs = graft.io.Snapshots.shardRefsAt(spark, dir, v2)
    require(refs.nonEmpty, "probe: v2 must be sharded")
    // selective range: ~0.5% of the doc_id domain
    val lo = nFiles * 100L / 2
    val hi = lo + nFiles / 2
    def prune(v: Long): (Seq[String], Double) = {
      val t0 = System.nanoTime()
      val (kept, _) = graft.io.Snapshots.prunedEntries(
        spark, dir, "doc_id", lo.toDouble, hi.toDouble, Some(v))
      (kept.map(graft.io.Snapshots.relOfEntry),
        (System.nanoTime() - t0) / 1e6)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // cold = first touch in this JVM (manifest parse + shard reads);
    // warm = min of 5 repeats (parse cached, pure prune CPU)
    val (k3cold, t3cold) = prune(1L)
    val t3warm = (1 to 5).map(_ => prune(1L)._2).min
    graft.io.Snapshots.shardsLoaded.set(0L)
    graft.io.Snapshots.shardsSkipped.set(0L)
    val (k4cold, t4cold) = prune(v2)
    val loaded = graft.io.Snapshots.shardsLoaded.get()
    val skipped = graft.io.Snapshots.shardsSkipped.get()
    val t4warm = (1 to 5).map(_ => prune(v2)._2).min
    require(k3cold.toSet == k4cold.toSet && k3cold.nonEmpty,
      s"probe: kept sets diverge (${k3cold.size} vs ${k4cold.size})")
    println(s"""{"metric":"manifest_scale_probe","n_files":$nFiles,""" +
      s""""n_shards":${refs.size},"kept_files":${k3cold.size},""" +
      s""""v3_prune_cold_ms":${fmt(t3cold)},""" +
      s""""v3_prune_warm_ms":${fmt(t3warm)},""" +
      s""""v4_prune_cold_ms":${fmt(t4cold)},""" +
      s""""v4_prune_warm_ms":${fmt(t4warm)},""" +
      s""""v4_shards_loaded":$loaded,"v4_shards_skipped":$skipped}""")
  }
}

/** EXECUTED manifest-scale probe (`sbt "runMain graft.ManifestExecProbe
  * [nFiles]"`) — the end-to-end companion to [[ManifestScaleProbe]]:
  * where that probe proves PLAN-time pruning over fabricated entries,
  * this one builds a REAL table of `nFiles` (default 100k) small
  * parquet files (100 rows each, doc_id-clustered so file stats are
  * selective), publishes the same snapshot in both the v3 (inline
  * entry list) and v4 (sharded) encodings, and runs a selective
  * aggregation through the DSv2 catalog scan at each — measuring
  * what planning-only probes cannot: FileIndex hand-off, task launch
  * at pruned file count, executed files-opened, task count, and
  * driver-heap peak. The kept results are asserted equal, so every
  * delta between the two encodings is metadata-layer cost. NOT part
  * of the driver contract.
  */
object ManifestExecProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val spark: SparkSession = GraftSession.build("graft-exec-probe")
    import graft.io.Snapshots
    val wh = s"/tmp/graft_exec_probe_$nFiles"
    val tbl = s"$wh/db/t"
    val cat = "gexecprobe"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val rows = nFiles * 100L
    // fixture is content-stable and cached across runs: version 2 is
    // the v3-encoded snapshot of all rows, version 3 the v4-encoded
    // republish of the SAME snapshot
    val ready =
      try Snapshots.latestVersion(spark, tbl).exists(_ >= 3L)
      catch { case _: Exception => false }
    var buildSec = 0.0
    if (!ready) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (doc_id BIGINT, n_chars BIGINT)")
      // direct path commit: the v1 DataFrameWriter honors
      // maxRecordsPerFile (the store-write clone snapshots this
      // session conf), so 100-row files land doc_id-clustered
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "100")
      val t0 = System.nanoTime()
      val prevShard = Snapshots.shardSizeOverride
      Snapshots.shardSizeOverride = Some(Int.MaxValue / 4) // v3 at v2
      try
        Snapshots.commitAppend(
          spark.range(rows)
            .selectExpr("id AS doc_id", "(id % 5000) + 1 AS n_chars")
            .repartitionByRange(32, org.apache.spark.sql.functions
              .col("doc_id"))
            .sortWithinPartitions("doc_id"),
          tbl)
      finally Snapshots.shardSizeOverride = prevShard
      // organic republish of the identical snapshot, sharded
      val v4v = Snapshots.setProperties(spark, tbl,
        Map("probe" -> "exec"))
      require(Snapshots.shardRefsAt(spark, tbl, v4v).nonEmpty,
        "exec probe: republish must shard")
      spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      buildSec = (System.nanoTime() - t0) / 1e9
    }
    val v3v = 2L
    val v4v = Snapshots.latestVersion(spark, tbl).get
    require(Snapshots.shardRefsAt(spark, tbl, v3v).isEmpty,
      "exec probe: version 2 must be the inline (v3) encoding")
    // selective band: ~0.5% of the doc_id domain, mid-table
    val lo = rows / 2
    val hi = lo + rows / 200
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskCount.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def heapPools =
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans
        .asInstanceOf[java.util.List[
          java.lang.management.MemoryPoolMXBean]]
    def resetPeaks(): Unit = {
      System.gc()
      heapPools.forEach(p =>
        if (p.getType ==
            java.lang.management.MemoryType.HEAP) p.resetPeakUsage())
    }
    def peakMb: Long = {
      var s = 0L
      heapPools.forEach(p =>
        if (p.getType == java.lang.management.MemoryType.HEAP)
          s += p.getPeakUsage.getUsed)
      s >> 20
    }
    case class Run(planMs: Double, execMs: Double, opened: Long,
                   tasks: Long, peakMb: Long, result: Long)
    def run(v: Long): Run = {
      org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
        spark.sparkContext)
      resetPeaks()
      taskCount.set(0L)
      graft.io.SnapshotReaderFactory.filesOpened.set(0L)
      val q = s"SELECT sum(doc_id * 2) AS s FROM $cat.db.t " +
        s"VERSION AS OF $v WHERE doc_id BETWEEN $lo AND $hi"
      val t0 = System.nanoTime()
      val df = spark.sql(q)
      df.queryExecution.executedPlan // force analysis+planning+prune
      val t1 = System.nanoTime()
      val res = df.collect()(0).getLong(0)
      val t2 = System.nanoTime()
      org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
        spark.sparkContext)
      Run((t1 - t0) / 1e6, (t2 - t1) / 1e6,
        graft.io.SnapshotReaderFactory.filesOpened.get(),
        taskCount.get(), peakMb, res)
    }
    // cold = first touch in this JVM (manifest read + parse included)
    val v3cold = run(v3v)
    val v3warm = run(v3v)
    val v4cold = run(v4v)
    val v4warm = run(v4v)
    require(v3cold.result == v4cold.result &&
      v3warm.result == v4warm.result,
      s"exec probe: results diverge (${v3cold.result} vs " +
        s"${v4cold.result})")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def j(tag: String, r: Run): String =
      s""""${tag}_plan_ms":${fmt(r.planMs)},""" +
        s""""${tag}_exec_ms":${fmt(r.execMs)},""" +
        s""""${tag}_files_opened":${r.opened},""" +
        s""""${tag}_tasks":${r.tasks},""" +
        s""""${tag}_driver_peak_mb":${r.peakMb}"""
    println(s"""{"metric":"manifest_exec_probe","n_files":$nFiles,""" +
      s""""rows":$rows,"build_sec":${fmt(buildSec)},""" +
      s""""band_rows":${hi - lo + 1},""" +
      j("v3_cold", v3cold) + "," + j("v3_warm", v3warm) + "," +
      j("v4_cold", v4cold) + "," + j("v4_warm", v4warm) + "}")
  }
}
