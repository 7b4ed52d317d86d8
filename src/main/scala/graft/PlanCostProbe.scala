package graft

import org.apache.spark.sql.SparkSession

object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.build("graft-plan-cost")
    val wh = s"/tmp/graft_exec_probe_${args.headOption.getOrElse("100000")}"
    val cat = "gplancost"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val v = graft.io.Snapshots.latestVersion(spark, s"$wh/db/t").get
    val q = s"SELECT sum(doc_id * 2) AS s FROM $cat.db.t " +
      s"VERSION AS OF $v WHERE doc_id BETWEEN 5000000 AND 5050000"
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    (1 to sys.env.getOrElse("PLANCOST_REPS", "12").toInt).foreach { i =>
      var t0 = System.nanoTime()
      val df = spark.sql(q)
      val tAnalyze = ms(t0)
      t0 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val tOpt = ms(t0)
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tExec = ms(t0)
      println(f"[plancost] rep=$i analyze=$tAnalyze%.0f optimize=$tOpt%.0f physical=$tExec%.0f")
    }
  }
}
