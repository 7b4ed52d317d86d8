package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Manifest-backed V2 column statistics
  * ([[graft.io.SnapshotBatchScan]] `estimateStatistics.columnStats`):
  * exact per-column null counts and min/max flow from the commit-time
  * pseudo-stats into Catalyst's `attributeStats` — ANALYZE-free CBO.
  * At 100 TB this is what lets the optimizer reorder a 5-way join or
  * size a broadcast without a second full scan to gather statistics.
  * Exactness posture mirrors aggregate pushdown: any delete file,
  * missing stat, or pushed limit refuses rather than estimating.
  */
class SnapshotStatsSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_stats").toString
    val name = s"gstat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  private def withCbo[A](body: => A): A = {
    val old = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try body
    finally old match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("null counts and integral/string min-max reach attributeStats") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, s STRING)")
    // two commits so the fold spans files; 10 nulls in v; strings
    // short enough for exact 'T' bounds
    spark.range(0L, 100L).toDF("i")
      .selectExpr("CASE WHEN i < 10 THEN NULL ELSE i END AS v",
        "concat('s', lpad(cast(i AS STRING), 3, '0')) AS s")
      .createOrReplaceTempView("stats_src1")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM stats_src1")
    spark.range(100L, 200L).toDF("i")
      .selectExpr("i AS v",
        "concat('s', lpad(cast(i AS STRING), 3, '0')) AS s")
      .createOrReplaceTempView("stats_src2")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM stats_src2")
    withCbo {
      val df = spark.sql(s"SELECT v, s FROM $cat.db.t")
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(200)),
        s"rowCount missing: ${stats.rowCount}")
      val byName = stats.attributeStats.toSeq
        .map { case (a, cs) => a.name -> cs }.toMap
      val v = byName.getOrElse("v",
        fail(s"no column stats for v: ${stats.attributeStats}"))
      assert(v.nullCount.contains(BigInt(10)), s"v nullCount: $v")
      assert(v.min.contains(10L), s"v min: $v")
      assert(v.max.contains(199L), s"v max: $v")
      val s = byName.getOrElse("s",
        fail(s"no column stats for s: ${stats.attributeStats}"))
      assert(s.nullCount.contains(BigInt(0)), s"s nullCount: $s")
      assert(s.min.map(_.toString).contains("s000"), s"s min: $s")
      assert(s.max.map(_.toString).contains("s199"), s"s max: $s")
    }
  }

  test("an all-null file is exempt from the min/max fold, not a refusal") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT)")
    spark.range(5L, 25L).toDF("v")
      .createOrReplaceTempView("stats_nn_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM stats_nn_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT CAST(NULL AS BIGINT) " +
      "FROM range(7)")
    withCbo {
      val stats = spark.sql(s"SELECT v FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats
      val v = stats.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "v" => cs }
        .getOrElse(fail(s"no stats for v: ${stats.attributeStats}"))
      assert(v.nullCount.contains(BigInt(7)), s"nullCount: $v")
      assert(v.min.contains(5L) && v.max.contains(24L),
        s"min/max should ignore the all-null file: $v")
    }
  }

  test("delete files refuse column statistics (a deleted row may hold the bound)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT)")
    spark.range(0L, 50L).toDF("v")
      .createOrReplaceTempView("stats_dv_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM stats_dv_src")
    Snapshots.deleteWhere(spark, s"$wh/db/t", col("v") === 0L,
      mode = "mor")
    withCbo {
      val stats = spark.sql(s"SELECT v FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats
      assert(stats.attributeStats.isEmpty,
        s"column stats must refuse under deletes: " +
          s"${stats.attributeStats}")
      assert(stats.rowCount.isEmpty,
        s"rowCount must refuse under deletes: ${stats.rowCount}")
    }
  }

  test("analyzeNdv: distinctCount reaches attributeStats within sketch tolerance") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, grp BIGINT)")
    // 2000 rows, 500 distinct v, 40 distinct grp; two commits
    spark.range(0L, 1000L).toDF("i")
      .selectExpr("i % 500 AS v", "i % 40 AS grp")
      .createOrReplaceTempView("ndv_src1")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_src1")
    spark.range(0L, 1000L).toDF("i")
      .selectExpr("i % 500 AS v", "i % 40 AS grp")
      .createOrReplaceTempView("ndv_src2")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_src2")
    // before the analyze: no distinctCount offered
    withCbo {
      val pre = spark.sql(s"SELECT v FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "v" => cs }
      assert(pre.forall(_.distinctCount.isEmpty),
        s"distinctCount before any analyze: $pre")
    }
    Snapshots.analyzeNdv(spark, s"$wh/db/t", Seq("v", "grp"))
    withCbo {
      val stats = spark.sql(s"SELECT v, grp FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.toSeq
        .map { case (a, cs) => a.name -> cs }.toMap
      val vNdv = byName("v").distinctCount
        .getOrElse(fail(s"no NDV for v: ${byName("v")}")).toLong
      val gNdv = byName("grp").distinctCount
        .getOrElse(fail(s"no NDV for grp: ${byName("grp")}")).toLong
      // 64 registers ≈ 13% standard error; allow 3 sigma
      assert(math.abs(vNdv - 500) <= 500 * 0.40,
        s"v NDV estimate off: $vNdv vs 500")
      assert(math.abs(gNdv - 40) <= 40 * 0.40 + 4,
        s"grp NDV estimate off: $gNdv vs 40")
      // min/max still exact alongside
      assert(byName("v").min.contains(0L) &&
        byName("v").max.contains(499L))
    }
    // an append after the analyze REFUSES distinctCount (absent
    // beats stale) until the next analyze
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_src1")
    withCbo {
      val post = spark.sql(s"SELECT v FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "v" => cs }
      assert(post.forall(_.distinctCount.isEmpty),
        s"distinctCount must refuse after an unanalyzed append: $post")
    }
    val v2 = spark.sql(s"CALL $cat.system.analyze_ndv(" +
      "table => 'db.t', columns => 'v,grp')").collect().head.getLong(0)
    assert(v2 == Snapshots.latestVersion(spark, s"$wh/db/t").get)
    withCbo {
      val again = spark.sql(s"SELECT v FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
        .collectFirst { case (a, cs) if a.name == "v" => cs }
        .flatMap(_.distinctCount.map(_.toLong))
      assert(again.exists(n => math.abs(n - 500) <= 200),
        s"re-analyze did not restore NDV: $again")
    }
  }

  test("analyzeNdv: a pruned sliver reports its OWN distinct count") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, tag STRING) " +
      "PARTITIONED BY (bucket(4, v))")
    spark.range(0L, 2000L).toDF("v").selectExpr("v", "'x' AS tag")
      .createOrReplaceTempView("ndv_pr_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_pr_src")
    Snapshots.analyzeNdv(spark, s"$wh/db/t", Seq("v"))
    withCbo {
      def ndvOf(sql: String): Option[Long] =
        spark.sql(sql).queryExecution.optimizedPlan.stats
          .attributeStats.toSeq
          .collectFirst { case (a, cs) if a.name == "v" => cs }
          .flatMap(_.distinctCount.map(_.toLong))
      val full = ndvOf(s"SELECT v FROM $cat.db.t")
        .getOrElse(fail("no full-table NDV"))
      // runtime-pruned point lookup keeps ~1/4 of the files: the
      // sketch union over the sliver must shrink accordingly
      val sliver = ndvOf(s"SELECT v FROM $cat.db.t WHERE v = 17")
        .getOrElse(fail("no sliver NDV"))
      assert(sliver < full / 2,
        s"sliver NDV ($sliver) should be well below full ($full)")
    }
  }

  test("a filtered point-lookup reports the pruned sliver's statistics") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, b BIGINT) " +
      "PARTITIONED BY (bucket(4, v))")
    spark.range(0L, 1000L).toDF("v").selectExpr("v", "v * 2 AS b")
      .createOrReplaceTempView("stats_pr_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM stats_pr_src")
    withCbo {
      // the manifest point-lookup keeps one bucket: sizeInBytes must
      // reflect the sliver, so a pruned fact side can still broadcast
      val all = spark.sql(s"SELECT v, b FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      val pruned = spark.sql(
        s"SELECT v, b FROM $cat.db.t WHERE v = 17")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(pruned < all,
        s"pruned stats ($pruned) should be below full-table ($all)")
    }
  }
}
