package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Shallow clone (Delta CLONE SHALLOW): a new table whose v1
  * manifest references the source's files — zero data copied,
  * constant-time at any size. The clone is a real table (appends,
  * time travel, metadata ops); row-level mutations refuse until
  * compact() localizes the foreign references.
  */
class SnapshotCloneSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, sf, "documents")
  private def newStore: String =
    Files.createTempDirectory("graft_clone").toString + "/tbl"

  private def localDataBytes(path: String): Long = {
    val d = new java.io.File(s"$path/data")
    if (!d.exists()) 0L
    else d.listFiles().flatMap(_.listFiles()).map(_.length()).sum
  }

  test("clone is zero-copy: reads the source's rows with no local data files") {
    val src = newStore
    Snapshots.commit(docs, src)
    Snapshots.commitAppend(
      docs.filter(col("doc_id") === 3L)
        .withColumn("doc_id", lit(800001L)), src)
    val dst = newStore
    assert(Snapshots.cloneTable(spark, src, dst) === 1L)
    assert(localDataBytes(dst) === 0L, "clone copied data bytes")
    assert(Snapshots.read(spark, dst).count() === docs.count() + 1)
    assert(Snapshots.read(spark, dst).select(sum("doc_id")).head.getLong(0)
      === docs.select(sum("doc_id")).head.getLong(0) + 800001L)
    // metadata-only row count answers from the cloned pseudo-stats
    assert(Snapshots.rowCount(spark, dst) === docs.count() + 1)
  }

  test("clone and source diverge independently; stats pruning and schema ride along") {
    val src = newStore
    Snapshots.commit(docs, src)
    val dst = newStore
    Snapshots.cloneTable(spark, src, dst)
    // append to the CLONE: local file, source untouched
    Snapshots.commitAppend(docs.filter(col("doc_id") === 5L)
      .withColumn("doc_id", lit(900001L)), dst)
    assert(Snapshots.read(spark, dst).count() === docs.count() + 1)
    assert(Snapshots.read(spark, src).count() === docs.count())
    // append to the SOURCE: clone untouched (it pinned v1's files)
    Snapshots.commitAppend(docs.filter(col("doc_id") === 5L)
      .withColumn("doc_id", lit(900002L)), src)
    assert(Snapshots.read(spark, dst)
      .filter(col("doc_id") === 900002L).count() === 0L)
    // time travel inside the clone's own history
    assert(Snapshots.read(spark, dst, Some(1L)).count() === docs.count())
    // stats pruning still proves over the carried entry stats
    val pruned = Snapshots.readBetween(spark, dst, "doc_id", 0L, 5L)
    assert(pruned.count() ===
      docs.filter(col("doc_id").between(0L, 5L)).count())
  }

  test("clone of an older version pins that snapshot") {
    val src = newStore
    Snapshots.commit(docs.filter(col("doc_id") % 2 === 0), src)
    Snapshots.commit(docs, src) // v2 overwrite
    val dst = newStore
    Snapshots.cloneTable(spark, src, dst, Some(1L))
    assert(Snapshots.read(spark, dst).count() ===
      docs.filter(col("doc_id") % 2 === 0).count())
  }

  test("row-level mutations refuse on foreign references; compact localizes, then they work") {
    val src = newStore
    Snapshots.commit(docs, src)
    val dst = newStore
    Snapshots.cloneTable(spark, src, dst)
    val e = intercept[IllegalArgumentException](
      Snapshots.deleteWhere(spark, dst, col("doc_id") === 1L))
    assert(e.getMessage.contains("localize"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.merge(spark, dst,
        docs.filter(col("doc_id") === 2L), Seq("doc_id")))
    assert(e2.getMessage.contains("localize"), e2.getMessage)
    // compact REWRITES foreign references even when file counts say
    // no-op - localization is the point
    Snapshots.compact(spark, dst)
    assert(localDataBytes(dst) > 0L)
    val m = Snapshots.files(spark, dst).select("file").collect()
      .map(_.getString(0))
    assert(m.forall(!_.contains("://")), m.take(3).mkString(", "))
    // now mutations work; the source never changes
    Snapshots.deleteWhere(spark, dst, col("doc_id") === 1L)
    assert(Snapshots.read(spark, dst)
      .filter(col("doc_id") === 1L).count() === 0L)
    assert(Snapshots.read(spark, src)
      .filter(col("doc_id") === 1L).count() === 1L)
  }

  test("clone vacuum never touches source files; clone of a clone carries the original refs") {
    val src = newStore
    Snapshots.commit(docs, src)
    val dst = newStore
    Snapshots.cloneTable(spark, src, dst)
    Snapshots.commitAppend(docs.limit(5)
      .withColumn("doc_id", col("doc_id") + 1000000L), dst)
    Snapshots.vacuum(spark, dst, graceMs = 0L)
    assert(Snapshots.read(spark, src).count() === docs.count(),
      "vacuum on the clone touched source bytes")
    assert(Snapshots.read(spark, dst).count() === docs.count() + 5)
    val dst2 = newStore
    Snapshots.cloneTable(spark, dst, dst2)
    // the second clone's foreign refs point at BOTH stores' files and
    // reads stay exact
    assert(Snapshots.read(spark, dst2).count() === docs.count() + 5)
  }

  test("clone refusals: existing target, live delete files on the source") {
    val src = newStore
    Snapshots.commit(docs, src)
    val dst = newStore
    Snapshots.cloneTable(spark, src, dst)
    intercept[IllegalArgumentException](
      Snapshots.cloneTable(spark, src, dst))
    val src2 = newStore
    Snapshots.commit(docs, src2)
    Snapshots.deleteWhere(spark, src2, col("doc_id") === 1L,
      mode = "mor")
    val e = intercept[IllegalArgumentException](
      Snapshots.cloneTable(spark, src2, newStore))
    assert(e.getMessage.contains("delete files"), e.getMessage)
  }

  test("CALL graft.system.clone: SQL surface round-trip") {
    val wh = Files.createTempDirectory("graft_clone_cat").toString
    val cat = s"gclone${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.src (doc_id BIGINT, text STRING, " +
      "lang STRING, source STRING, n_chars BIGINT)")
    docs.createOrReplaceTempView("graft_clone_src_view")
    spark.sql(s"INSERT INTO $cat.db.src SELECT * FROM graft_clone_src_view")
    val v = spark.sql(s"CALL $cat.system.clone(source => 'db.src', " +
      "target => 'db.fork')").head.getLong(0)
    assert(v === 1L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.fork")
      .head.getLong(0) === docs.count())
    // the fork is SQL-writable (appends need no localization)
    spark.sql(s"INSERT INTO $cat.db.fork SELECT * FROM " +
      "graft_clone_src_view LIMIT 3")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.fork")
      .head.getLong(0) === docs.count() + 3)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.src")
      .head.getLong(0) === docs.count())
  }
}
