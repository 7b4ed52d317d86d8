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
