package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Vectorized reads under positional merge-on-read deletes
  * ([[graft.io.SelectedColumnVector]] — the zero-copy selection view
  * that keeps delete-bearing scans columnar): correctness here means
  * the selection math survives every batch-boundary shape the
  * vectorized parquet reader can produce (default batch = 4096
  * rows), because an off-by-one at a boundary silently resurrects or
  * loses exactly one row. Every test cross-checks the columnar
  * result against relational truth computed from the pre-delete
  * data.
  */
class ColumnarMorSpec extends SparkSpec {

  private def freshTable(rows: Long): (String, String) = {
    val wh = Files.createTempDirectory("graft_cmor").toString
    val cat = s"gcmor${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, s STRING, " +
      "x DOUBLE)")
    spark.range(0L, rows).toDF("v")
      .selectExpr("v",
        // nulls interleaved so the selection view's null accessors
        // are exercised, not just the primitive getters
        "CASE WHEN v % 7 = 0 THEN NULL ELSE concat('s', v) END AS s",
        "CASE WHEN v % 11 = 0 THEN NULL ELSE v * 0.5 END AS x")
      .createOrReplaceTempView("cmor_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM cmor_src")
    (cat, wh)
  }

  private def planOf(cat: String): String = {
    val df = spark.sql(s"SELECT v, s, x FROM $cat.db.t")
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("scattered positional deletes stay columnar and exact") {
    val (cat, wh) = freshTable(20000L)
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      col("v") % 3 === 0L, mode = "mor")
    assert(planOf(cat).contains("ColumnarToRow"),
      "positional-delete scan lost the columnar path")
    val survivors = spark.sql(
      s"SELECT count(*) AS n, sum(v) AS sv, count(s) AS ns, " +
        s"sum(x) AS sx FROM $cat.db.t").head()
    val live = (0L until 20000L).filterNot(_ % 3 == 0)
    assert(survivors.getLong(0) == live.size.toLong)
    assert(survivors.getLong(1) == live.sum)
    assert(survivors.getLong(2) ==
      live.count(_ % 7 != 0).toLong)
    assert(math.abs(survivors.getDouble(3) -
      live.filter(_ % 11 != 0).map(_ * 0.5).sum) < 1e-6)
  }

  test("batch-boundary deletes: first/last row of each 4096 batch") {
    val (cat, wh) = freshTable(13000L)
    // rows 0, 4095, 4096, 8191, 8192, 12287, 12288 — every edge the
    // running-position cursor must land on exactly
    val edges = Seq(0L, 4095L, 4096L, 8191L, 8192L, 12287L, 12288L)
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      col("v").isin(edges: _*), mode = "mor")
    val got = spark.sql(s"SELECT v FROM $cat.db.t")
      .collect().map(_.getLong(0)).sorted
    val want = (0L until 13000L).filterNot(edges.contains).toArray
    assert(got.length == want.length)
    assert(got.sameElements(want),
      "batch-edge deletes desynchronized the selection cursor")
  }

  test("a fully-deleted batch span emits empty batches, not garbage") {
    val (cat, wh) = freshTable(12000L)
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      col("v") >= 4000L && col("v") < 9000L, mode = "mor")
    val got = spark.sql(
      s"SELECT count(*) AS n, min(v) AS mn, max(v) AS mx, " +
        s"sum(v) AS sv FROM $cat.db.t").head()
    val live = (0L until 4000L) ++ (9000L until 12000L)
    assert(got.getLong(0) == live.size.toLong)
    assert(got.getLong(1) == 0L && got.getLong(2) == 11999L)
    assert(got.getLong(3) == live.sum)
  }

  test("stacked delete commits compose on the columnar path") {
    val (cat, wh) = freshTable(10000L)
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      col("v") % 2 === 0L, mode = "mor")
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      col("v") % 3 === 0L, mode = "mor")
    assert(planOf(cat).contains("ColumnarToRow"))
    val got = spark.sql(s"SELECT v FROM $cat.db.t WHERE v < 30")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq ==
      (0L until 30L).filter(v => v % 2 != 0 && v % 3 != 0))
  }

  test("columnar MoR result matches the row path bit-for-bit") {
    val (cat, wh) = freshTable(15000L)
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      col("v") % 5 === 1L, mode = "mor")
    val columnar = spark.sql(
      s"SELECT v, s, x FROM $cat.db.t").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    // the row path, forced through the (file, pos) metadata request
    // that disables batching — same files, same deletes
    val rowBased = graft.io.Snapshots.read(spark, s"$wh/db/t")
      .select("v", "s", "x").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    assert(columnar.sameElements(rowBased),
      "columnar and row-based MoR reads disagree")
  }
}
