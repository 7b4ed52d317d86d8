package graft

/** Writes `explain("formatted")` for named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence
  * the optimization rounds commit (`sbt "runMain graft.PlanDump
  * plans/r17 before q_a q_b"`). Uses [[GraftSession]] so the dumped
  * plan is the bench's plan (same AQE/partition posture), not a
  * reduced local one. Not part of the driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.build("graft-plan-dump")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"failed: ${e.getMessage}" }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
