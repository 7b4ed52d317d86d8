package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off columnar-MoR parity probe (`sbt "runMain graft.MorProbe"`)
  * — the evidence run behind `BENCH_mor_probe.json`: builds a
  * snapshot table from sf0.1 documents replicated `factor`× (the
  * sf1-scale row count), deletes ~10% of rows merge-on-read
  * (positional), and times a scan-dominated aggregate over the live
  * rows on BOTH read paths — the columnar path (positional deletes
  * applied as a zero-copy batch selection view,
  * [[graft.io.SelectedColumnVector]]) and the row path it replaced
  * (forced via the `graft.scan.forceRowRead` seam). Also times the
  * clean pre-delete table as the floor. Bench protocol: min-of-2,
  * load recorded. NOT part of the driver contract.
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val factor =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_FACTOR", "10").toInt
    val spark: SparkSession = GraftSession.build("graft-mor-probe")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val wh = s"/tmp/graft_mor_probe_x$factor"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(wh))
    val path = s"$wh/tbl"
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
    val md = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1L
    val big = (0 until factor).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * md)))
      .reduce(_ unionByName _)
    graft.io.Snapshots.commit(big, path)
    def rep(forceRow: Boolean): Double = {
      if (forceRow) sys.props("graft.scan.forceRowRead") = "true"
      try {
        val t0 = System.nanoTime()
        val r = graft.io.Snapshots.read(spark, path)
          .agg(sum("n_chars"), count(lit(1)), min("doc_id"),
            max("doc_id"), sum(length(col("text")))).collect()
        require(r.nonEmpty)
        (System.nanoTime() - t0) / 1e9
      } finally if (forceRow) {
        sys.props.remove("graft.scan.forceRowRead"); ()
      }
    }
    // INTERLEAVED A/B, median-of-5: box load drifts over seconds,
    // so back-to-back blocks of one mode each would attribute the
    // drift to whichever mode ran second — alternating reps cancel
    // it
    def ab(): (Double, Double) = {
      val cols = Array.newBuilder[Double]
      val rows = Array.newBuilder[Double]
      (1 to 5).foreach { _ =>
        cols += rep(forceRow = false)
        rows += rep(forceRow = true)
      }
      def median(a: Array[Double]): Double = {
        val s = a.sorted; s(s.length / 2)
      }
      (median(cols.result()), median(rows.result()))
    }
    val (clean, cleanRow) = ab()
    // ~10% positional deletes, scattered (every 10th doc)
    graft.io.Snapshots.deleteWhere(spark, path,
      col("doc_id") % 10 === 3L, mode = "mor")
    val (columnar, rowBased) = ab()
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"mor_probe","factor":$factor,""" +
      s""""rows":${big.count()},""" +
      s""""clean_sec":${fmt(clean)},""" +
      s""""clean_row_sec":${fmt(cleanRow)},""" +
      s""""mor_columnar_sec":${fmt(columnar)},""" +
      s""""mor_row_sec":${fmt(rowBased)},""" +
      s""""columnar_vs_row":${fmt(rowBased / math.max(columnar, 1e-9))},""" +
      s""""load_end":${fmt(loadAvg())}}""")
  }
}
