package graft

/** Targeted per-query timing harness for optimization work: same
  * methodology as [[Bench]] (session warmup, two passes, min, the
  * `.count()` action, `BenchSetup` fixture split) over only the query
  * names given as args — so a single operator can be re-measured in
  * seconds instead of re-running the full 247-gate sweep. Reads the
  * same `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` contract. Not part
  * of the driver contract; [[Bench]] is unchanged.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-qbench")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val names = args.toSeq
    require(names.nonEmpty, "usage: QBench <query name>...")
    val all = SparkEntry.queries
    def pass(): Seq[(String, Double, Double)] = {
      spark.catalog.clearCache()
      names.map { n =>
        val fn = all.getOrElse(n, sys.error(s"unknown query: $n"))
        BenchSetup.drainSec()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (n, dt, math.min(BenchSetup.drainSec(), dt))
      }
    }
    // the same self-calibration probe Bench runs (min-of-3 codegen sum)
    // so a targeted measurement is normalizable against box drift —
    // this sandbox shows host-level contention (CPU steal) invisible
    // to loadavg, and an uncalibrated A/B across two QBench runs has
    // been observed to swing 2x on UNCHANGED queries
    def calibrate(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1000000000L).selectExpr("sum((id * id) % 97)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val calib0 = calibrate()
    val (p1, p2) = (pass(), pass())
    val calib1 = calibrate()
    val fmt = (v: Double) =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val line = p1.zip(p2).map { case ((n, a, sa), (_, b, sb)) =>
      val t = math.min(a, b); val s = math.min(sa, sb)
      s""""$n":{"t":${fmt(t)},"setup":${fmt(s)},"measured":${fmt(t - s)}}"""
    }.mkString("{", ",",
      s""","calib_before":${fmt(calib0)},"calib_after":${fmt(calib1)}}""")
    println(line)
    spark.stop()
  }
}
