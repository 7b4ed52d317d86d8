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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
