package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Atomic CTAS/RTAS through the catalog's `StagingTableCatalog`
  * ([[graft.io.GraftCatalog]]): the staged write lands data files
  * with NO manifest, and `commitStagedChanges` publishes the whole
  * statement as one manifest claim — a failed statement leaves no
  * table (CREATE) and no torn state (REPLACE), and REPLACE preserves
  * history (the old table stays time-travelable).
  */
class SnapshotCtasSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_ctas").toString
    val name = s"gctas${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $name.db")
    (name, wh)
  }

  test("CREATE TABLE AS SELECT lands as ONE version with the query's rows") {
    val (cat, wh) = freshCatalog()
    spark.range(0L, 500L).toDF("v")
      .selectExpr("v", "CAST(v % 7 AS STRING) AS tag")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE $cat.db.t AS " +
      "SELECT v, tag FROM ctas_src WHERE v % 2 = 0")
    assert(Snapshots.versions(spark, s"$wh/db/t") == Seq(1L),
      "CTAS must publish exactly one version")
    val got = spark.sql(s"SELECT v, tag FROM $cat.db.t").collect()
    assert(got.length == 250)
    assert(got.forall(r => r.getLong(0) % 2 == 0 &&
      r.getString(1) == (r.getLong(0) % 7).toString))
  }

  test("partitioned CTAS: hidden transforms + properties carry into the layout") {
    val (cat, wh) = freshCatalog()
    spark.range(0L, 400L).toDF("v").selectExpr("v", "v * 3 AS w")
      .createOrReplaceTempView("ctas_part_src")
    spark.sql(s"CREATE TABLE $cat.db.t PARTITIONED BY (bucket(4, v)) " +
      "TBLPROPERTIES ('write.sort.columns' = 'w') AS " +
      "SELECT v, w FROM ctas_part_src")
    assert(Snapshots.versions(spark, s"$wh/db/t") == Seq(1L))
    // the layout is real: a point lookup prunes through the bucket
    // directories the staged write derived
    val (kept, total) =
      Snapshots.prunedEntriesEquals(spark, s"$wh/db/t", "v", 17L)
    assert(total >= 4, s"want >=4 bucket files, got $total")
    assert(kept.size < total, s"bucket prune kept ${kept.size}/$total")
    assert(Snapshots.properties(spark, s"$wh/db/t")
      .get("write.sort.columns").contains("w"))
    assert(spark.sql(s"SELECT sum(w) FROM $cat.db.t").head().getLong(0)
      == (0L until 400L).map(_ * 3).sum)
  }

  test("a failing CTAS leaves NO table and no stray visible state") {
    val (cat, wh) = freshCatalog()
    spark.range(0L, 100L).toDF("v")
      .createOrReplaceTempView("ctas_fail_src")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.t AS " +
        "SELECT assert_true(v < 50, 'boom') AS chk, v " +
        "FROM ctas_fail_src")
    }
    assert(Snapshots.latestVersion(spark, s"$wh/db/t").isEmpty,
      "a failed CTAS must not leave a table")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.t").collect())
    // and the staged files were deleted, not orphaned
    val dataDir = new org.apache.hadoop.fs.Path(s"$wh/db/t/data")
    val f = dataDir.getFileSystem(spark.sessionState.newHadoopConf())
    val leftovers =
      if (!f.exists(dataDir)) 0
      else f.listStatus(dataDir).length
    assert(leftovers == 0, s"$leftovers staged commit dirs survived")
  }

  test("REPLACE TABLE AS SELECT is one commit and preserves history") {
    val (cat, wh) = freshCatalog()
    spark.range(0L, 100L).toDF("v").selectExpr("v", "'old' AS tag")
      .createOrReplaceTempView("rtas_src1")
    spark.sql(s"CREATE TABLE $cat.db.t AS SELECT * FROM rtas_src1")
    spark.range(0L, 30L).toDF("v").selectExpr("v + 1000 AS v2")
      .createOrReplaceTempView("rtas_src2")
    // new schema, new contents, one commit
    spark.sql(s"REPLACE TABLE $cat.db.t AS SELECT v2 FROM rtas_src2")
    assert(Snapshots.versions(spark, s"$wh/db/t") == Seq(1L, 2L),
      "RTAS must be exactly one new version")
    val got = spark.sql(s"SELECT v2 FROM $cat.db.t").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (1000L until 1030L).toSeq)
    // the pre-REPLACE table is still reachable: time travel + rollback
    val old = spark.sql(
      s"SELECT v, tag FROM $cat.db.t VERSION AS OF 1").collect()
    assert(old.length == 100 && old.forall(_.getString(1) == "old"))
    // REPLACE of a missing table refuses
    val e = intercept[Exception](spark.sql(
      s"REPLACE TABLE $cat.db.nope AS SELECT v2 FROM rtas_src2"))
    assert(e.getMessage.toLowerCase.contains("table") &&
      (e.getMessage.contains("nope") ||
        e.getMessage.toLowerCase.contains("not")), e.getMessage)
  }

  test("CREATE OR REPLACE TABLE AS SELECT creates when missing, replaces when present") {
    val (cat, wh) = freshCatalog()
    spark.range(0L, 10L).toDF("v").createOrReplaceTempView("cor_src")
    spark.sql(
      s"CREATE OR REPLACE TABLE $cat.db.t AS SELECT v FROM cor_src")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head().getLong(0) == 10L)
    spark.range(0L, 4L).toDF("v").createOrReplaceTempView("cor_src2")
    spark.sql(
      s"CREATE OR REPLACE TABLE $cat.db.t AS SELECT v FROM cor_src2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head().getLong(0) == 4L)
    assert(Snapshots.versions(spark, s"$wh/db/t") == Seq(1L, 2L))
  }
}
