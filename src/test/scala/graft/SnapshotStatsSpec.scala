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

  private def ndvOf(sql: String, colName: String): Option[Long] =
    spark.sql(sql).queryExecution.optimizedPlan.stats
      .attributeStats.toSeq
      .collectFirst { case (a, cs) if a.name == colName => cs }
      .flatMap(_.distinctCount.map(_.toLong))

  test("stats.ndv.auto: appends keep distinctCount serving, no manual CALL") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, s STRING) " +
      "TBLPROPERTIES ('stats.ndv.auto' = 'true')")
    spark.range(0L, 1000L).toDF("i")
      .selectExpr("i % 250 AS v", "concat('g', i % 10) AS s")
      .createOrReplaceTempView("ndv_auto_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_auto_src")
    withCbo {
      val n = ndvOf(s"SELECT v FROM $cat.db.t", "v")
        .getOrElse(fail("first auto-analyzed commit served no NDV"))
      assert(math.abs(n - 250) <= 100, s"NDV estimate off: $n vs 250")
    }
    // the r14 posture this property exists to fix: an APPEND after
    // analysis used to refuse distinctCount until a manual
    // `CALL system.analyze_ndv`; with auto on, the new files carry
    // their sketches from the commit itself
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_auto_src")
    withCbo {
      val n = ndvOf(s"SELECT v FROM $cat.db.t", "v")
        .getOrElse(fail("append under stats.ndv.auto lost the NDV"))
      assert(math.abs(n - 250) <= 100, s"NDV estimate off: $n vs 250")
      val s = ndvOf(s"SELECT s FROM $cat.db.t", "s")
        .getOrElse(fail("string column lost the NDV"))
      assert(s >= 5 && s <= 20, s"s NDV estimate off: $s vs 10")
    }
    // auto sketches and a manual analyze must MERGE (identical
    // arithmetic): re-analyzing changes nothing material
    Snapshots.analyzeNdv(spark, s"$wh/db/t", Seq("v"))
    withCbo {
      val n = ndvOf(s"SELECT v FROM $cat.db.t", "v").getOrElse(
        fail("manual analyze over auto sketches served no NDV"))
      assert(math.abs(n - 250) <= 100, s"NDV estimate off: $n")
    }
  }

  test("stats.ndv.auto: CSV column list sketches exactly those columns") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, w BIGINT) " +
      "TBLPROPERTIES ('stats.ndv.auto' = 'v')")
    spark.range(0L, 500L).toDF("i")
      .selectExpr("i % 100 AS v", "i AS w")
      .createOrReplaceTempView("ndv_csv_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_csv_src")
    withCbo {
      assert(ndvOf(s"SELECT v, w FROM $cat.db.t", "v").isDefined,
        "listed column v served no NDV")
      assert(ndvOf(s"SELECT v, w FROM $cat.db.t", "w").isEmpty,
        "unlisted column w must not carry an NDV sketch")
    }
  }

  test("stats.ndv.auto: compaction re-sketches the rewritten files") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, s STRING) " +
      "TBLPROPERTIES ('stats.ndv.auto' = 'v')")
    spark.range(0L, 400L).toDF("i")
      .selectExpr("i % 80 AS v", "'x' AS s")
      .createOrReplaceTempView("ndv_cp_src")
    (0 until 3).foreach { _ =>
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_cp_src")
    }
    Snapshots.compact(spark, s"$wh/db/t", targetFileBytes = 1L << 20)
    withCbo {
      val n = ndvOf(s"SELECT v FROM $cat.db.t", "v")
        .getOrElse(fail("compaction dropped the auto NDV sketches"))
      assert(math.abs(n - 80) <= 40, s"NDV estimate off: $n vs 80")
    }
  }

  test("equi-height histogram: skewed-predicate selectivity within 2x of truth") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT)")
    // 90% of rows hold v = 500; the rest spread uniformly over
    // 0..9999 — the shape where the uniform min/max guess is off by
    // 15x (estimates ~6% for v <= 600, truth ~91%)
    spark.range(0L, 10000L).toDF("i")
      .selectExpr(
        "CASE WHEN i % 10 < 9 THEN 500 ELSE (i * 7919) % 10000 END " +
          "AS v")
      .createOrReplaceTempView("hist_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM hist_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM hist_src")
    Snapshots.analyzeNdv(spark, s"$wh/db/t", Seq("v"))
    val truth = spark.sql(
      s"SELECT count(*) FROM $cat.db.t WHERE v <= 600")
      .head().getLong(0).toDouble
    withCbo {
      val est = spark.sql(s"SELECT v FROM $cat.db.t WHERE v <= 600")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("no CBO row estimate")).toDouble
      assert(est >= truth / 2 && est <= truth * 2,
        s"histogram estimate $est vs truth $truth (20000 rows total)")
      // and it must have beaten the uniform-range guess (~6%): the
      // histogram is load-bearing, not the min/max interpolation
      val uniform = 20000.0 * 601.0 / 10000.0
      assert(est > uniform * 4,
        s"estimate $est looks like the uniform guess ($uniform) - " +
          "histogram not consulted")
    }
    // CBO off: zero planning cost, zero stats served
    val off = spark.sql(s"SELECT v FROM $cat.db.t WHERE v <= 600")
      .queryExecution.optimizedPlan.stats
    assert(off.attributeStats.isEmpty,
      "column stats must not compute with CBO off")
  }

  test("histogram refuses after an unanalyzed append (absent beats stale)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT)")
    spark.range(0L, 1000L).toDF("v")
      .createOrReplaceTempView("hist_ref_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM hist_ref_src")
    Snapshots.analyzeNdv(spark, s"$wh/db/t", Seq("v"))
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM hist_ref_src")
    withCbo {
      val cs = spark.sql(s"SELECT v FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats.attributeStats.toSeq
        .collectFirst { case (a, s) if a.name == "v" => s }
      assert(cs.forall(_.histogram.isEmpty),
        s"histogram must refuse after an unanalyzed append: $cs")
    }
  }

  test("timestamp and date columns serve min/max and histogram to CBO") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (ts TIMESTAMP, d DATE)")
    // 90% of rows in one hour, 10% spread over a year — the uniform
    // min/max guess under-estimates a one-day window ~90x
    spark.range(0L, 10000L).toDF("i")
      .selectExpr(
        "CASE WHEN i % 10 < 9 THEN timestamp_seconds(1700000000 + " +
          "i % 3600) ELSE timestamp_seconds(1700000000 + " +
          "(i * 7919) % 31536000) END AS ts",
        "date_add(DATE'2024-01-01', cast(i % 300 AS INT)) AS d")
      .createOrReplaceTempView("ts_hist_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ts_hist_src")
    Snapshots.analyzeNdv(spark, s"$wh/db/t", Seq("ts", "d"))
    val truth = spark.sql(s"SELECT count(*) FROM $cat.db.t " +
      "WHERE ts <= timestamp_seconds(1700086400)") // +1 day
      .head().getLong(0).toDouble
    withCbo {
      val stats = spark.sql(s"SELECT ts, d FROM $cat.db.t")
        .queryExecution.optimizedPlan.stats
      val byName = stats.attributeStats.toSeq
        .map { case (a, cs) => a.name -> cs }.toMap
      assert(byName("ts").min.isDefined && byName("ts").max.isDefined,
        s"ts min/max missing: ${byName("ts")}")
      assert(byName("d").min.isDefined && byName("d").max.isDefined,
        s"d min/max missing: ${byName("d")}")
      assert(byName("ts").histogram.isDefined,
        s"ts histogram missing: ${byName("ts")}")
      assert(byName("d").histogram.isDefined,
        s"d histogram missing: ${byName("d")}")
      val est = spark.sql(s"SELECT ts FROM $cat.db.t " +
        "WHERE ts <= timestamp_seconds(1700086400)")
        .queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("no CBO row estimate")).toDouble
      assert(est >= truth / 2 && est <= truth * 2,
        s"ts-window estimate $est vs truth $truth")
    }
  }

  test("stats.ndv.auto rides atomic CTAS: the staged commit is born analyzed") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.range(0L, 800L).toDF("i").selectExpr("i % 160 AS v")
      .createOrReplaceTempView("ndv_ctas_src")
    spark.sql(s"CREATE TABLE $cat.db.t " +
      "TBLPROPERTIES ('stats.ndv.auto' = 'v') " +
      "AS SELECT v FROM ndv_ctas_src")
    withCbo {
      val n = ndvOf(s"SELECT v FROM $cat.db.t", "v")
        .getOrElse(fail("CTAS under stats.ndv.auto served no NDV"))
      assert(math.abs(n - 160) <= 80, s"NDV estimate off: $n vs 160")
    }
  }

  test("without stats.ndv.auto the refusal posture is unchanged") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT)")
    spark.range(0L, 100L).toDF("v")
      .createOrReplaceTempView("ndv_off_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM ndv_off_src")
    withCbo {
      assert(ndvOf(s"SELECT v FROM $cat.db.t", "v").isEmpty,
        "un-opted-in table must not serve distinctCount")
    }
  }
}
