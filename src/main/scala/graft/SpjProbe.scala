package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-partitioned-join evidence probe: builds two
  * bucket(32)-aligned snapshot tables from `orders` × `lineitem` at
  * the given scale dir, then times the SAME join three ways —
  * storage-partitioned (no Exchange), shuffled (v2 bucketing off),
  * and shuffled-with-broadcast-off — printing one JSON line with
  * wall times and shuffle bytes per variant. Run:
  *
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SpjProbe"
  * }}}
  *
  * The point at 100 TB: the shuffled variant's cost GROWS with both
  * tables' size (every byte crosses the network twice), while the
  * aligned variant reads each bucket pair co-located — the delta
  * measured here is the lower bound of what the layout saves.
  */
object SpjProbe {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    ((a, (System.nanoTime() - t0) / 1e9))
  }

  private def shuffleBytes(spark: SparkSession)(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          acc.addAndGet(
            e.taskMetrics.shuffleReadMetrics.totalBytesRead)
    }
    spark.sparkContext.addSparkListener(l)
    try { body
      org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
        spark.sparkContext) }
    finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = GraftSession.build("graft-spj-probe")
    val wh = s"/tmp/graft_spj_probe_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    val cat = "gspjp"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.ord (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_totalprice DOUBLE) " +
      "PARTITIONED BY (bucket(32, o_orderkey))")
    spark.sql(s"CREATE TABLE $cat.db.li (l_orderkey BIGINT, " +
      "l_quantity DOUBLE, l_extendedprice DOUBLE) " +
      "PARTITIONED BY (bucket(32, l_orderkey))")
    Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("spjp_ord")
    Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .createOrReplaceTempView("spjp_li")
    spark.sql(s"INSERT INTO $cat.db.ord SELECT * FROM spjp_ord")
    spark.sql(s"INSERT INTO $cat.db.li SELECT * FROM spjp_li")

    val q = s"SELECT o.o_custkey, sum(l.l_extendedprice) AS rev, " +
      s"count(*) AS n FROM $cat.db.ord o JOIN $cat.db.li l " +
      "ON o.o_orderkey = l.l_orderkey GROUP BY 1"

    def run(label: String, v2: Boolean): (Double, Long, Long, Boolean) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        v2.toString)
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      var rows = 0L
      var plan = ""
      val sb = shuffleBytes(spark) {
        val df = spark.sql(q)
        rows = df.count()
        plan = df.queryExecution.executedPlan.toString
      }
      // the group-by aggregate shuffles either way; the JOIN exchange
      // is the delta under measurement
      val joinAligned = plan.contains("graft-snapshot spj")
      val (_, sec) = timed {
        spark.sql(q).write.format("noop").mode("overwrite").save()
      }
      (sec, sb, rows, joinAligned)
    }

    // warm the file cache once so variants compare compute, not IO
    val _ = run("warm", v2 = false)
    val (sSec, sBytes, sRows, _) = run("shuffled", v2 = false)
    val (aSec, aBytes, aRows, aligned) = run("aligned", v2 = true)
    require(aRows == sRows, s"row mismatch: $aRows vs $sRows")
    require(aligned, "aligned variant did not use the DSv2 scan")
    println(s"""{"probe":"spj","sf":"$dir","rows":$sRows,""" +
      s""""aligned_sec":$aSec,"shuffled_sec":$sSec,""" +
      s""""aligned_shuffle_bytes":$aBytes,""" +
      s""""shuffled_shuffle_bytes":$sBytes}""")

    // --- SKEW phase: one hot key holds ~1/3 of the fact rows, so
    // one bucket dwarfs the others. partiallyClusteredDistribution
    // keeps the hot bucket's FILES as separate tasks (the scan emits
    // per-file partitions with size/row stats) and replicates the
    // other side over them - the skewed SPJ parallelizes instead of
    // pinning one task, still with zero join Exchange.
    spark.sql(s"CREATE TABLE $cat.db.skf (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.db.skd (k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    val n = Tables.t(spark, dir, "orders").count()
    // four commits => four files per touched bucket (the split grain)
    (0 until 4).foreach { i =>
      spark.range(n / 8).selectExpr("CAST(7 AS BIGINT) AS k",
          s"CAST(id + $i AS DOUBLE) AS v")
        .union(spark.range(n / 8).selectExpr(
          s"CAST(id % 1000 AS BIGINT) AS k",
          s"CAST(id * 2 + $i AS DOUBLE) AS v"))
        .createOrReplaceTempView("spjp_skf_src")
      spark.sql(s"INSERT INTO $cat.db.skf SELECT * FROM spjp_skf_src")
    }
    spark.range(1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS w")
      .createOrReplaceTempView("spjp_skd_src")
    spark.sql(s"INSERT INTO $cat.db.skd SELECT * FROM spjp_skd_src")
    val skq = s"SELECT count(*) AS n, sum(f.v + d.w) AS s " +
      s"FROM $cat.db.skf f JOIN $cat.db.skd d ON f.k = d.k"
    def runSkew(partial: Boolean): (Double, Long, String) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing." +
        "partiallyClusteredDistribution.enabled", partial.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = spark.sql(skq)
      val (row, sec) = timed(df.head())
      (sec, row.getLong(0), df.queryExecution.executedPlan.toString)
    }
    val _ = runSkew(partial = false) // warm
    val (offSec, offRows, offPlan) = runSkew(partial = false)
    val (onSec, onRows, onPlan) = runSkew(partial = true)
    require(offRows == onRows,
      s"skew row mismatch: $offRows vs $onRows")
    require(!offPlan.contains("ShuffleExchange") &&
      !onPlan.contains("ShuffleExchange"),
      "skewed SPJ planned a join shuffle")
    println(s"""{"probe":"spj_skew","sf":"$dir","rows":$offRows,""" +
      s""""grouped_sec":$offSec,"partially_clustered_sec":$onSec}""")

    // --- SKEW x MERGE-ON-READ phase: positional deletes land on the
    // skewed fact table (the realistic CDC shape - a hot partition
    // accumulates deletes between compactions). The DV-bearing hot
    // bucket must still split under partiallyClusteredDistribution
    // (deletes force whole-FILE reads, not whole-bucket tasks) and
    // the join must stay Exchange-free and exact.
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/skf",
      org.apache.spark.sql.functions.col("v") % 5 === 0L, mode = "mor")
    val _2 = runSkew(partial = false) // warm the delete sliver
    val (moffSec, moffRows, moffPlan) = runSkew(partial = false)
    val (monSec, monRows, monPlan) = runSkew(partial = true)
    require(moffRows == monRows,
      s"skew-mor row mismatch: $moffRows vs $monRows")
    require(moffRows < offRows,
      "the mor deletes removed no joined rows - probe is not testing " +
        "the DV path")
    require(!moffPlan.contains("ShuffleExchange") &&
      !monPlan.contains("ShuffleExchange"),
      "skewed DV-bearing SPJ planned a join shuffle")
    require(monPlan.contains("graft-snapshot spj"),
      "skewed DV-bearing SPJ fell off the DSv2 scan")
    println(s"""{"probe":"spj_skew_mor","sf":"$dir","rows":$moffRows,""" +
      s""""grouped_sec":$moffSec,"partially_clustered_sec":$monSec}""")
    spark.stop()
  }
}
