package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** Manifest min/max file skipping for RANGE / IN / prefix predicates
  * on the DSv2 scan path ([[graft.io.SnapshotBatchScan]]
  * `keptEntries` × [[graft.io.Snapshots.prunedEntriesBound]] /
  * `prunedEntriesPrefix`): a SQL `WHERE v BETWEEN a AND b` on a
  * clustered catalog table must open only the stat-overlapping
  * files — previously every file — while staying exact: the
  * residual predicate never leaves the plan, so pruning coarseness
  * can only cost IO, never rows. Every test asserts BOTH directions:
  * result exactness first, IO bound second; refusal shapes
  * (stats-less types, unconvertible values) must open everything
  * rather than guess.
  */
class SnapshotRangeSkipSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_rskip").toString
    val name = s"grskip${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  /** Four commits of 1,000 rows each with DISJOINT v ranges
    * (i*1000 until (i+1)*1000); `s` mirrors v as a sortable string
    * ("k000000".."k003999"); `ts` a TIMESTAMP mirroring v as
    * seconds (INT64-micros stats — prunes); `d` a DATE mirroring v
    * as days; `dec` a DECIMAL (no manifest stats — the refusal
    * fixture). */
  private def rangedTable(): (String, String) = {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, s STRING, " +
      "ts TIMESTAMP, d DATE, dec DECIMAL(12,2), payload STRING)")
    (0 until 4).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L).toDF("v")
        .selectExpr("v",
          "concat('k', lpad(cast(v AS STRING), 6, '0')) AS s",
          "timestamp_seconds(1700000000 + v) AS ts",
          "date_add(DATE'2020-01-01', cast(v AS INT)) AS d",
          "cast(v AS DECIMAL(12,2)) AS dec",
          "repeat('x', 20) AS payload")
        .createOrReplaceTempView("rskip_src")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM rskip_src")
    }
    (cat, wh)
  }

  private def opened[A](body: => A): (A, Long) = {
    graft.io.SnapshotReaderFactory.filesOpened.set(0L)
    val r = body
    (r, graft.io.SnapshotReaderFactory.filesOpened.get())
  }

  private def totalFiles(cat: String): Long =
    // sum() is not pushable, so this counts a genuine full data scan
    opened(spark.sql(s"SELECT sum(v * 2) FROM $cat.db.t").collect())._2

  private def runLongs(q: DataFrame): (Seq[Long], Long) = {
    val (rows, io) = opened(q.collect())
    (rows.map(_.getLong(0)).toSeq.sorted, io)
  }

  test("BETWEEN opens only the overlapping files and stays exact") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    assert(total >= 4, s"expected >=4 data files, saw $total")
    val (vs, io) = runLongs(spark.sql(
      s"SELECT v FROM $cat.db.t WHERE v BETWEEN 100 AND 199"))
    assert(vs == (100L to 199L).toSeq)
    assert(io < total, s"BETWEEN opened $io of $total files")
  }

  test("boundary-straddling BETWEEN keeps both straddled files") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    // [950, 1049] straddles the commit-0/commit-1 file boundary:
    // both files must open (prune-on-proof keeps overlap), the rest
    // must not, and no boundary row may be lost
    val (vs, io) = runLongs(spark.sql(
      s"SELECT v FROM $cat.db.t WHERE v BETWEEN 950 AND 1049"))
    assert(vs == (950L to 1049L).toSeq)
    assert(io >= 2, s"straddle pruned a boundary file (io=$io)")
    assert(io < total, s"straddle opened $io of $total files")
  }

  test("one-sided ranges prune from each end") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    val (hi, ioHi) = runLongs(spark.sql(
      s"SELECT v FROM $cat.db.t WHERE v > 3499"))
    assert(hi == (3500L to 3999L).toSeq)
    assert(ioHi < total, s"v > 3499 opened $ioHi of $total files")
    val (lo, ioLo) = runLongs(spark.sql(
      s"SELECT v FROM $cat.db.t WHERE v <= 499"))
    assert(lo == (0L to 499L).toSeq)
    assert(ioLo < total, s"v <= 499 opened $ioLo of $total files")
  }

  test("IN-list prunes to the union of point lookups") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    val (vs, io) = runLongs(spark.sql(
      s"SELECT v FROM $cat.db.t WHERE v IN (7, 3993)"))
    assert(vs == Seq(7L, 3993L))
    assert(io < total, s"IN opened $io of $total files")
  }

  test("string range and LIKE-prefix prune via string bounds") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    val q1 = spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE s BETWEEN 'k000100' AND 'k000199'")
    val (vs1, io1) = runLongs(q1)
    assert(vs1 == (100L to 199L).toSeq)
    assert(io1 < total, s"string BETWEEN opened $io1 of $total files")
    val q2 = spark.sql(
      s"SELECT v FROM $cat.db.t WHERE s LIKE 'k0039%'")
    val (vs2, io2) = runLongs(q2)
    assert(vs2 == (3900L to 3999L).toSeq)
    assert(io2 < total, s"LIKE prefix opened $io2 of $total files")
  }

  test("DATE range prunes via epoch-day stats") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    val (vs, io) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE d BETWEEN DATE'2020-04-10' AND DATE'2020-04-19'"))
    assert(vs == (100L to 109L).toSeq)
    assert(io < total, s"date BETWEEN opened $io of $total files")
  }

  test("TIMESTAMP ranges prune via the micros 'U' bounds") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    // the reference's month-windowing shape: a BETWEEN on the time
    // column opens only the overlapping commit's files
    val (vs, io) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE ts BETWEEN timestamp_seconds(1700000100) " +
      "AND timestamp_seconds(1700000199)"))
    assert(vs == (100L to 199L).toSeq)
    assert(io < total,
      s"timestamp BETWEEN opened $io of $total files")
    val (hi, ioHi) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE ts >= timestamp_seconds(1700003500)"))
    assert(hi == (3500L to 3999L).toSeq)
    assert(ioHi < total,
      s"timestamp >= opened $ioHi of $total files")
  }

  test("legacy stat-less timestamps range-prune via days(ts) directories") {
    // a store written by a pre-'U' writer (or imported INT96 files)
    // carries NO timestamp stats: the hidden-transform directory is
    // then the ONLY range proof. Simulated by republishing the
    // manifest with every 'U' segment stripped — byte-identical
    // otherwise, exactly what a legacy manifest looks like.
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    (0 until 4).foreach { d =>
      spark.range(d * 100L, (d + 1) * 100L).toDF("v")
        .selectExpr("v",
          s"timestamp_seconds(1700000000 + $d * 86400 + v % 100) " +
            "AS ts")
        .createOrReplaceTempView("rskip_leg_src")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM rskip_leg_src")
    }
    val mdir = new java.io.File(s"$wh/db/t/_manifests")
    val latest = mdir.listFiles()
      .map(_.getName).filter(_.endsWith(".manifest")).max
    val vNum = latest.stripPrefix("v").stripSuffix(".manifest").toLong
    val src = java.nio.file.Paths.get(mdir.toString, latest)
    import scala.jdk.CollectionConverters._
    val doctored = java.nio.file.Files.readAllLines(src).asScala
      .map { l =>
        val i = l.indexOf('\t')
        if (i < 0) l
        else {
          val kept = l.substring(i + 1).split(';')
            .filterNot(_.split(':') match {
              case Array(_, "U", _, _) => true
              case _ => false
            })
          l.substring(0, i) + "\t" + kept.mkString(";")
        }
      }
    assert(doctored.mkString != java.nio.file.Files
      .readAllLines(src).asScala.mkString,
      "fixture must actually strip 'U' stats")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(mdir.toString,
        f"v${vNum + 1}%09d.manifest"),
      doctored.mkString("\n").getBytes("UTF-8"))
    val total = totalFiles(cat)
    // day-2 window: only that day's directory may open
    val (vs, io) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE ts BETWEEN timestamp_seconds(1700000000 + 2 * 86400) " +
      "AND timestamp_seconds(1700000000 + 2 * 86400 + 99)"))
    assert(vs == (200L to 299L).toSeq)
    assert(io < total,
      s"dir-only timestamp range opened $io of $total files")
  }

  test("stats-less column types refuse pruning but stay exact") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    // DECIMAL columns carry no manifest stats and the literal is
    // never coerced: every file must open (prune only on proof)
    val (vs, io) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE dec >= 3500.00"))
    assert(vs == (3500L to 3999L).toSeq)
    assert(io == total,
      s"decimal range wrongly pruned ($io of $total files)")
  }

  test("null-bearing commits never lose rows to range pruning") {
    val (cat, _) = rangedTable()
    // a fifth commit: nulls interleaved with in-range values, so its
    // file stats cover the probe range AND carry nulls
    spark.sql(s"INSERT INTO $cat.db.t " +
      "SELECT CASE WHEN id % 2 = 0 THEN 150 + id END AS v, " +
      "'k-null' AS s, CAST(NULL AS TIMESTAMP) AS ts, " +
      "CAST(NULL AS DATE) AS d, CAST(NULL AS DECIMAL(12,2)) AS dec, " +
      "'p' AS payload FROM range(0, 10)")
    val (vs, _) = runLongs(spark.sql(
      s"SELECT v FROM $cat.db.t WHERE v BETWEEN 100 AND 199"))
    // 100..199 from commit 0 plus the five even-id null-commit rows
    // (150, 152, 154, 156, 158); nulls themselves never match
    assert(vs == ((100L to 199L) ++
      Seq(150L, 152L, 154L, 156L, 158L)).sorted)
    val n = spark.sql(s"SELECT count(*) AS n FROM $cat.db.t " +
      "WHERE v IS NULL").collect().head.getLong(0)
    assert(n == 5L, s"expected 5 null rows, saw $n")
  }

  test("OR of provable branches prunes to the union of survivors") {
    val (cat, _) = rangedTable()
    val total = totalFiles(cat)
    // two disjoint windows in one disjunction: only their files open
    val (vs, io) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE (v BETWEEN 100 AND 149) OR (v BETWEEN 3800 AND 3849)"))
    assert(vs == ((100L to 149L) ++ (3800L to 3849L)).toSeq)
    assert(io < total, s"OR of ranges opened $io of $total files")
    // an OR with an unprovable branch must NOT prune (the unknowable
    // side may match anywhere) — and stays exact
    val (vs2, io2) = runLongs(spark.sql(s"SELECT v FROM $cat.db.t " +
      "WHERE (v BETWEEN 100 AND 149) OR (payload != 'nope' " +
      "AND v BETWEEN 3800 AND 3849)"))
    assert(vs2 == ((100L to 149L) ++ (3800L to 3849L)).toSeq)
    assert(io2 >= io, s"unprovable OR branch over-pruned ($io2)")
  }

  test("IS NULL / IS NOT NULL prune via exact null counts") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, sparse BIGINT)")
    // commit 1+2: sparse fully null; commit 3: populated
    (0 until 2).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L).toDF("v")
        .selectExpr("v", "CAST(NULL AS BIGINT) AS sparse")
        .createOrReplaceTempView("rskip_null_src")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM rskip_null_src")
    }
    spark.range(2000L, 3000L).toDF("v")
      .selectExpr("v", "v * 3 AS sparse")
      .createOrReplaceTempView("rskip_null_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM rskip_null_src")
    val total = totalFiles(cat)
    // a predicate on the sparse column implies IsNotNull(sparse):
    // the two all-null files never open
    val q1 = spark.sql(
      s"SELECT v FROM $cat.db.t WHERE sparse > 0")
    val (rows1, io1) = opened(q1.collect())
    assert(rows1.map(_.getLong(0)).toSeq.sorted ==
      (2000L to 2999L).toSeq)
    assert(io1 < total,
      s"IsNotNull on a sparse column opened $io1 of $total files")
    // IS NULL keeps only the null-bearing files
    val q2 = spark.sql(
      s"SELECT count(*) AS n FROM $cat.db.t WHERE sparse IS NULL")
    val (rows2, io2) = opened(q2.collect())
    assert(rows2.head.getLong(0) == 2000L)
    assert(io2 < total,
      s"IS NULL opened $io2 of $total files")
    // `<=> NULL` is the same predicate in null-safe spelling
    val q3 = spark.sql(
      s"SELECT count(*) AS n FROM $cat.db.t WHERE sparse <=> NULL")
    val (rows3, io3) = opened(q3.collect())
    assert(rows3.head.getLong(0) == 2000L)
    assert(io3 < total,
      s"<=> NULL opened $io3 of $total files")
  }

  test("range pruning composes with manifest-absorbed partition filters") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.p (v BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    (0 until 4).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L).toDF("v")
        .selectExpr("v", "CASE WHEN v % 2 = 0 THEN 'en' ELSE 'fr' " +
          "END AS lang")
        .createOrReplaceTempView("rskip_part_src")
      spark.sql(s"INSERT INTO $cat.db.p SELECT * FROM rskip_part_src")
    }
    val (_, total) = opened(
      spark.sql(s"SELECT sum(v * 2) FROM $cat.db.p").collect())
    val q = spark.sql(s"SELECT v FROM $cat.db.p " +
      "WHERE lang = 'en' AND v BETWEEN 1000 AND 1999")
    val (rows, io) = opened(q.collect())
    assert(rows.map(_.getLong(0)).toSeq.sorted ==
      (1000L to 1998L by 2).toSeq)
    // the absorbed equality alone keeps one lang directory (half the
    // files); composition with the range prune must cut strictly
    // further — one commit's file of that directory, not four
    assert(io < total / 2,
      s"absorbed+range composition opened $io of $total files")
  }
}
