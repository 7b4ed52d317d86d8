package graft

/** Dumps the PER-SUPERSTEP physical plans of the iterative graph
  * gates (`sbt "runMain graft.GraphPlanProbe plans/r17 before"`) —
  * the repeated-per-round plan is the scale-relevant one and is
  * invisible in the final query plan (a projection over the last
  * checkpoint). Writes `<query>_step_<suffix>.txt`, one file per
  * gate, all supersteps concatenated. Not part of the driver
  * contract.
  */
object GraphPlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: GraphPlanProbe <outDir> <suffix>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.build("graft-graph-plan-probe")
    val gates = Seq("q_pagerank", "q_bfs_hops", "q_weighted_paths",
      "q_connected_components", "q_dedup_clusters")
    gates.foreach { name =>
      graft.graph.Graph.stepPlans.clear()
      graft.graph.Graph.captureStepPlans = true
      try SparkEntry.queries(name)(spark, sfDir).count()
      finally graft.graph.Graph.captureStepPlans = false
      val sb = new StringBuilder
      var i = 0
      graft.graph.Graph.stepPlans.forEach { p =>
        sb.append(s"===== $name cut #$i =====\n").append(p).append("\n")
        i += 1
      }
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_step_$suffix.txt"),
        sb.toString.getBytes("UTF-8"))
      println(s"wrote ${name}_step_$suffix.txt ($i cuts)")
    }
    spark.stop()
  }
}
