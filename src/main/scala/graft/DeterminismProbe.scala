package graft

/** One-off shuffle-determinism probe (`sbt "runMain
  * graft.DeterminismProbe [query ...]"`) — the evidence run behind
  * the round-16 connected-components fix: runs each query N times
  * fresh (cache cleared, listener bus drained) and reports per-run
  * wall time, shuffle read/write bytes and the CC round count. The
  * repo's plan-regression methodology treats shuffle bytes as the
  * tripwire that separates plan regressions from box drift, which
  * only works when identical code on identical data shuffles
  * identical bytes — this probe PROVES that per query. NOT part of
  * the driver contract.
  */
object DeterminismProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_DET_REPS", "2").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_connected_components", "q_dedup_clusters")
    val spark = GraftSession.build("graft-determinism-probe")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val metrics = new QueryMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val per = names.map { name =>
      val runs = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
          spark.sparkContext)
        metrics.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
          spark.sparkContext)
        val (sr, sw, _) = metrics.snapshot
        (dt, sr, sw, graft.dedup.Dedup.lastClusterRounds.get())
      }
      val deterministic =
        runs.map(r => (r._2, r._3)).distinct.size == 1
      val rs = runs.map { case (dt, sr, sw, rounds) =>
        s"""{"sec":${fmt(dt)},"shuffle_read":$sr,""" +
          s""""shuffle_write":$sw,"cc_rounds":$rounds}"""
      }.mkString("[", ",", "]")
      s""""$name":{"byte_identical":$deterministic,"runs":$rs}"""
    }.mkString(",")
    println(s"""{"metric":"determinism_probe","reps":$reps,""" +
      s""""sf":"$sfDir",$per}""")
  }
}
