package graft

import org.apache.spark.sql.functions._

/** LIMIT / top-N pushdown evidence probe: builds one snapshot table
  * from `lineitem` at the given scale dir as eight range-disjoint
  * commits (each commit's files carry tight, non-overlapping
  * l_orderkey bounds — the layout a time/sequence-keyed 100 TB
  * ingest produces naturally), plus a PLAIN PARQUET twin of the same
  * slices, then times:
  *
  *   - `count(*) OVER (SELECT * LIMIT 1000)` — the "give me a sample"
  *     probe: the snapshot scan plans a guaranteed-prefix of files;
  *     the parquet twin opens every file.
  *   - `ORDER BY l_orderkey LIMIT 100` (both directions) — the
  *     "newest N rows" probe: the snapshot scan prunes via manifest
  *     bounds and ships per-task heaps; the parquet twin sorts the
  *     world into TakeOrdered.
  *
  * Prints ONE JSON line with wall times (min of 2), the snapshot
  * side's files-opened counts, and the full-scan baseline. Run:
  *
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PushdownProbe"
  * }}}
  */
object PushdownProbe {

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def minOf2(body: => Unit): Double =
    math.min(timed(body), timed(body))

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = GraftSession.build("graft-pushdown-probe")
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val wh = s"/tmp/graft_push_probe_$tag"
    val pq = s"/tmp/graft_push_probe_pq_$tag"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pq))
    val cat = "gpushp"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.li (l_orderkey BIGINT, " +
      "l_quantity DOUBLE, l_extendedprice DOUBLE, l_returnflag STRING)")
    // SPARK_GRAFT_PROBE_COPIES replicates the table (shifted keys,
    // so ranges stay disjoint) — the sf0.1 base is overhead-dominated
    // at sub-second walls; 10 copies puts real IO behind the numbers
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "1").toInt
    val li0 = Tables.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    val span = li0.agg(max("l_orderkey")).head().getLong(0) + 1L
    val li =
      if (copies <= 1) li0
      else (0 until copies).map(c => li0.withColumn("l_orderkey",
        col("l_orderkey") + lit(c * span))).reduce(_ unionByName _)
    val (lo, hi) = {
      val r = li.agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1) + 1L)
    }
    val slices = 8
    (0 until slices).foreach { i =>
      val a = lo + (hi - lo) * i / slices
      val b = lo + (hi - lo) * (i + 1) / slices
      val s = li.filter(col("l_orderkey") >= a &&
        col("l_orderkey") < b)
      s.createOrReplaceTempView("pushp_slice")
      spark.sql(s"INSERT INTO $cat.db.li SELECT * FROM pushp_slice")
      s.write.mode("append").parquet(pq)
    }
    spark.read.parquet(pq).createOrReplaceTempView("pushp_pq")

    def opened(body: => Unit): Long = {
      graft.io.SnapshotReaderFactory.filesOpened.set(0L)
      body
      graft.io.SnapshotReaderFactory.filesOpened.get()
    }

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    out("sf") = dir
    val nRows = spark.sql(s"SELECT count(*) FROM $cat.db.li")
      .head().getLong(0)
    out("rows") = nRows

    // full-scan baseline (non-pushable aggregate forces data IO)
    var filesTotal = 0L
    out("full_scan_sec") = minOf2 {
      filesTotal = opened(
        spark.sql(s"SELECT sum(l_orderkey * 2) FROM $cat.db.li")
          .collect())
    }
    out("files_total") = filesTotal

    def probe(name: String, snapSql: String, pqSql: String): Unit = {
      var files = 0L
      out(s"${name}_snapshot_sec") = minOf2 {
        files = opened(spark.sql(snapSql).collect())
      }
      out(s"${name}_files_opened") = files
      out(s"${name}_parquet_sec") = minOf2 {
        spark.sql(pqSql).collect()
      }
    }
    probe("limit",
      s"SELECT count(*) AS n FROM (SELECT * FROM $cat.db.li LIMIT 1000)",
      "SELECT count(*) AS n FROM (SELECT * FROM pushp_pq LIMIT 1000)")
    probe("topn_asc",
      s"SELECT l_orderkey, l_extendedprice FROM $cat.db.li " +
        "ORDER BY l_orderkey LIMIT 100",
      "SELECT l_orderkey, l_extendedprice FROM pushp_pq " +
        "ORDER BY l_orderkey LIMIT 100")
    probe("topn_desc",
      s"SELECT l_orderkey, l_extendedprice FROM $cat.db.li " +
        "ORDER BY l_orderkey DESC LIMIT 100",
      "SELECT l_orderkey, l_extendedprice FROM pushp_pq " +
        "ORDER BY l_orderkey DESC LIMIT 100")

    def j(v: Any): String = v match {
      case s: String => "\"" +
        s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      // Locale.ROOT: the f-interpolator is locale-sensitive and a
      // comma-decimal default locale would emit unparseable JSON
      case d: Double => String.format(java.util.Locale.ROOT,
        "%.3f", Double.box(d))
      case x => x.toString
    }
    println(out.map { case (k, v) => s""""$k":${j(v)}""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
