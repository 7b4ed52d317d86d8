package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Spark-NATIVE row-level SQL DML ([[graft.io.GraftRowLevelOperation]]):
  * DELETE / UPDATE / MERGE plan through Spark's own rewrite rules over
  * the store's (file, pos) merge-on-read rowId — positional-delete
  * entries for matched rows, ordinary data files for new/updated
  * rows, one strictly-pinned OCC commit. This suite pins the routing
  * (which statements go row-level vs metadata-only), the delta plan
  * shape, and exactness against relational replays — including shapes
  * the old strategy refused (subqueries, non-equi MERGE).
  */
class SnapshotRowLevelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, sf, "documents")

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_rl").toString
    val name = s"grl${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  private def makeDocs(cat: String, table: String): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    docs.createOrReplaceTempView("rl_src")
    spark.sql(s"CREATE TABLE $cat.db.$table (doc_id BIGINT, " +
      "text STRING, lang STRING, source STRING, n_chars BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.$table SELECT * FROM rl_src")
    table
  }

  test("metadata columns: __graft_file/__graft_pos select directly, positions are physical") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "m")
    val rows = spark.sql(s"SELECT __graft_file AS f, __graft_pos AS p, " +
      s"doc_id FROM $cat.db.m")
    val collected = rows.collect()
    assert(collected.length === docs.count())
    // every file's positions are dense 0..n-1 (whole-file reads)
    val byFile = collected.groupBy(_.getString(0))
    byFile.foreach { case (f, rs) =>
      assert(f.startsWith("data/c-"), f)
      val ps = rs.map(_.getLong(1)).sorted
      assert(ps.toSeq === (0L until ps.length).toSeq,
        s"positions of $f are not dense physical indices")
    }
    // on a MoR table the killed positions disappear but survivors
    // KEEP their physical positions (gaps, not renumbering)
    Snapshots.deleteWhere(spark, s"$wh/db/m",
      col("doc_id") % 2 === 0, mode = "mor")
    val after = spark.sql(s"SELECT __graft_file AS f, __graft_pos AS p " +
      s"FROM $cat.db.m").collect()
    assert(after.length === docs.filter(col("doc_id") % 2 =!= 0).count())
    val beforeSet = collected.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after.forall(r => beforeSet((r.getString(0), r.getLong(1)))),
      "a surviving row changed its (file, pos) identity")
  }

  test("row-level DELETE: untranslatable predicate plans WriteDelta, commits positional deletes, zero rewrites") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "d")
    val path = s"$wh/db/d"
    val v0 = Snapshots.latestVersion(spark, path).get
    val (_, _, entriesBefore, dvsBefore, _) =
      Snapshots.stateAt(spark, path, v0)
    assert(dvsBefore.isEmpty)
    // modulo does not translate to a V1 filter, so the metadata-only
    // delete cannot take it: Spark routes through the row-level path
    spark.sql(s"DELETE FROM $cat.db.d WHERE doc_id % 7 = 0")
    val v1 = Snapshots.latestVersion(spark, path).get
    assert(v1 === v0 + 1)
    val (_, _, entriesAfter, dvsAfter, _) =
      Snapshots.stateAt(spark, path, v1)
    assert(entriesAfter === entriesBefore,
      "a row-level delete rewrote data files")
    assert(dvsAfter.size === 1, s"expected ONE delete file: $dvsAfter")
    assert(Snapshots.history(spark, path).orderBy("version")
      .collect().last.getString(2) === "rowLevelDelete")
    val got = spark.sql(s"SELECT doc_id, text, lang, source, n_chars " +
      s"FROM $cat.db.d")
    val want = docs.filter(!(col("doc_id") % 7 === 0))
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    // a matching-nothing row-level delete commits NOTHING (idempotent)
    spark.sql(s"DELETE FROM $cat.db.d WHERE doc_id % 7 = 0")
    assert(Snapshots.latestVersion(spark, path).get === v1)
  }

  test("row-level DELETE with a subquery predicate (the shape the old strategy refused)") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "ds")
    spark.sql(s"DELETE FROM $cat.db.ds WHERE n_chars > " +
      s"(SELECT avg(n_chars) FROM $cat.db.ds)")
    val cut = docs.agg(avg("n_chars")).head.getDouble(0)
    val want = docs.filter(!(col("n_chars") > cut))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.ds")
      .head.getLong(0) === want.count())
    assert(Snapshots.history(spark, s"$wh/db/ds").orderBy("version")
      .collect().last.getString(2) === "rowLevelDelete")
  }

  test("simple translatable DELETE still takes the metadata-only path (no scan, no delta)") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "dm")
    spark.sql(s"DELETE FROM $cat.db.dm WHERE doc_id < 50")
    val op = Snapshots.history(spark, s"$wh/db/dm").orderBy("version")
      .collect().last.getString(2)
    assert(op === "deleteWhere",
      s"a translatable DELETE should stay metadata-routed, got $op")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.dm")
      .head.getLong(0) === docs.filter(col("doc_id") >= 50).count())
  }

  test("native SQL UPDATE: delta plan, subquery assignments work, exactness, one pinned commit") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "u")
    val path = s"$wh/db/u"
    val v0 = Snapshots.latestVersion(spark, path).get
    spark.sql(s"UPDATE $cat.db.u SET n_chars = n_chars + doc_id, " +
      "text = upper(text) WHERE n_chars < 300")
    assert(Snapshots.latestVersion(spark, path).get === v0 + 1)
    assert(Snapshots.history(spark, path).orderBy("version")
      .collect().last.getString(2) === "rowLevelUpdate")
    val got = spark.sql(s"SELECT doc_id, text, n_chars FROM $cat.db.u")
    val want = docs.select(col("doc_id"),
      when(col("n_chars") < 300, upper(col("text")))
        .otherwise(col("text")).as("text"),
      when(col("n_chars") < 300, col("n_chars") + col("doc_id"))
        .otherwise(col("n_chars")).as("n_chars"))
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    // subquery in SET: supported by the native framework
    spark.sql(s"UPDATE $cat.db.u SET n_chars = " +
      s"(SELECT max(n_chars) FROM $cat.db.u) WHERE doc_id = 0")
    val mx = spark.sql(s"SELECT max(n_chars) FROM $cat.db.u")
      .head.getLong(0)
    assert(spark.sql(
      s"SELECT n_chars FROM $cat.db.u WHERE doc_id = 0")
      .head.getLong(0) === mx)
    // time travel: the pre-update version still serves originals
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.u VERSION AS OF 2 " +
      "WHERE text = upper(text)").head.getLong(0) ===
      docs.filter(col("text") === upper(col("text"))).count())
  }

  test("native SQL MERGE: all clause kinds exact; non-equi ON now works; cardinality still refuses") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.createDataFrame(Seq((1L, "a", 10L), (2L, "b", 20L),
      (3L, "c", 30L))).toDF("id", "name", "n")
      .createOrReplaceTempView("rl_mrg_base")
    spark.sql(s"CREATE TABLE $cat.db.m (id BIGINT, name STRING, " +
      "n BIGINT)")
    spark.sql(s"INSERT INTO $cat.db.m SELECT * FROM rl_mrg_base")
    spark.sql(
      s"""MERGE INTO $cat.db.m t USING (SELECT * FROM VALUES
         |  (1L, 'x', 100L), (4L, 'd', 40L) AS s(id, name, n)) s
         |ON t.id = s.id
         |WHEN MATCHED AND t.n < 15 THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT id, name, n FROM $cat.db.m ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "x", 100L), (2L, "b", 20L),
      (3L, "c", 30L), (4L, "d", 40L)))
    assert(Snapshots.history(spark, s"$wh/db/m").orderBy("version")
      .collect().last.getString(2) === "rowLevelMerge")
    // NON-EQUI ON - the shape the old strategy refused - now
    // executes with standard SQL semantics
    spark.sql(
      s"""MERGE INTO $cat.db.m t USING (SELECT 35L AS cut) s
         |ON t.n >= s.cut
         |WHEN MATCHED THEN UPDATE SET name = 'big'""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $cat.db.m WHERE name = 'big' " +
      "ORDER BY id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 4L))
    // duplicate source matches for one target row: SQL cardinality
    // violation, enforced by Spark's own merge plan. (An
    // unconditional MATCHED DELETE alone is exempt by design -
    // deleting the same row twice is unambiguous - so the check is
    // pinned on an UPDATE clause.)
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.db.m t USING (SELECT * FROM VALUES
         |  (2L, 'p'), (2L, 'q') AS s(sid, sname)) s
         |ON t.id = s.sid
         |WHEN MATCHED THEN UPDATE SET name = s.sname""".stripMargin))
    assert(e.getMessage.toUpperCase.contains("CARDINALITY"),
      e.getMessage)
  }

  test("row-level DML composes with existing MoR deletes and with partitioned layouts, plan carries the file clustering") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    docs.createOrReplaceTempView("rl_part_src")
    spark.sql(s"CREATE TABLE $cat.db.p (doc_id BIGINT, text STRING, " +
      "lang STRING, n_chars BIGINT) PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO $cat.db.p SELECT doc_id, text, lang, " +
      "n_chars FROM rl_part_src")
    val path = s"$wh/db/p"
    // pre-existing MoR deletes: the DML scan must see only live rows
    Snapshots.deleteWhere(spark, path,
      col("doc_id") % 5 === 0, mode = "mor")
    val live = docs.filter(col("doc_id") % 5 =!= 0)
    // an update that touches two partitions
    spark.sql(s"UPDATE $cat.db.p SET n_chars = -1 " +
      "WHERE doc_id % 3 = 0 AND lang IN ('en', 'zh')")
    val want = live.select(col("doc_id"), col("text"), col("lang"),
      when(col("doc_id") % 3 === 0 && col("lang").isin("en", "zh"),
        lit(-1L)).otherwise(col("n_chars")).as("n_chars"))
    val got = spark.sql(
      s"SELECT doc_id, text, lang, n_chars FROM $cat.db.p")
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
    // updated rows moved into fresh files of their OWN partitions;
    // the untouched partitions' files were never rewritten
    val hist = Snapshots.history(spark, path).orderBy("version")
      .collect().map(_.getString(2)).toSeq
    assert(hist.last === "rowLevelUpdate")
  }

  test("the DML scan prunes at the manifest: a partition-scoped DELETE opens only that partition's files") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    docs.createOrReplaceTempView("rl_prune_src")
    spark.sql(s"CREATE TABLE $cat.db.pr (doc_id BIGINT, text STRING, " +
      "lang STRING, n_chars BIGINT) PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO $cat.db.pr SELECT doc_id, text, lang, " +
      "n_chars FROM rl_prune_src")
    val path = s"$wh/db/pr"
    val allFiles = Snapshots.stateAt(spark, path,
      Snapshots.latestVersion(spark, path).get)._3.size
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) walk(f) else Seq(f))
    val enFiles = walk(new java.io.File(s"$path/data"))
      .count(f => f.getParentFile.getName == "lang=en" &&
        f.getName.endsWith(".parquet"))
    assert(enFiles > 0)
    graft.io.SnapshotReaderFactory.filesOpened.set(0L)
    // modulo forces the row-level path; the lang equality is absorbed
    // into the kept entry set, so the whole-file DML scan reads ONE
    // partition, not the table
    spark.sql(s"DELETE FROM $cat.db.pr " +
      "WHERE lang = 'en' AND doc_id % 2 = 0")
    val opened = graft.io.SnapshotReaderFactory.filesOpened.get()
    assert(opened <= enFiles && opened < allFiles,
      s"the partition-scoped DELETE opened $opened files " +
        s"(en partition has $enFiles of $allFiles)")
    val got = spark.sql(s"SELECT count(*) FROM $cat.db.pr")
      .head.getLong(0)
    assert(got === docs.filter(
      !(col("lang") === "en" && col("doc_id") % 2 === 0)).count())
  }

  test("the delta write DECLARES clustering by rowId file and Spark PLANS it") {
    val (cat, _) = freshCatalog()
    makeDocs(cat, "pp")
    @volatile var deltaPlan: Option[String] = None
    val listener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val s = qe.executedPlan.toString
          if (s.contains("WriteDelta")) deltaPlan = Some(s)
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
    spark.listenerManager.register(listener)
    try {
      spark.sql(s"DELETE FROM $cat.db.pp WHERE doc_id % 13 = 0")
      org.apache.spark.graft.ListenerFlush
        .waitUntilEmpty(spark.sparkContext)
    } finally spark.listenerManager.unregister(listener)
    val plan = deltaPlan.getOrElse(fail("no WriteDelta plan captured"))
    // Spark planned the DECLARED distribution: an exchange clustering
    // delete rows by their target file, so each positional-delete
    // file is written by few tasks, not sprayed across all of them
    assert(plan.contains("REBALANCE_PARTITIONS_BY_COL") ||
      plan.contains("hashpartitioning"),
      s"no write-requested clustering exchange in the delta plan:\n$plan")
    assert(plan.contains(graft.io.SnapshotBatchScan.MetaFileCol),
      s"the delta exchange does not cluster on the rowId file:\n$plan")
  }

  test("copy-on-write mode: DELETE rewrites only matched files, no delete files accumulate") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    docs.createOrReplaceTempView("rl_cow_src")
    spark.sql(s"CREATE TABLE $cat.db.c (doc_id BIGINT, text STRING, " +
      "lang STRING, n_chars BIGINT) PARTITIONED BY (lang) " +
      "TBLPROPERTIES ('dml.mode' = 'copy-on-write')")
    spark.sql(s"INSERT INTO $cat.db.c SELECT doc_id, text, lang, " +
      "n_chars FROM rl_cow_src")
    val path = s"$wh/db/c"
    val v0 = Snapshots.latestVersion(spark, path).get
    val before = Snapshots.stateAt(spark, path, v0)._3
      .map(graft.io.Snapshots.relOfEntry).toSet
    // partition-scoped + modulo: row-level path, only the en
    // partition's files may be replaced
    spark.sql(s"DELETE FROM $cat.db.c " +
      "WHERE lang = 'en' AND doc_id % 2 = 0")
    val v1 = Snapshots.latestVersion(spark, path).get
    assert(v1 === v0 + 1)
    val (_, _, entriesAfter, dvs, _) = Snapshots.stateAt(spark, path, v1)
    assert(dvs.isEmpty, "copy-on-write DML must not add delete files")
    assert(Snapshots.history(spark, path).orderBy("version")
      .collect().last.getString(2) === "rowLevelDeleteCow")
    val after = entriesAfter.map(graft.io.Snapshots.relOfEntry).toSet
    val untouchedBefore = before.filterNot(_.contains("lang=en"))
    assert(untouchedBefore.subsetOf(after),
      "a file outside the matched partition was rewritten")
    assert((after -- before).forall(_.contains("lang=en")),
      "a fresh file landed outside the matched partition")
    val got = spark.sql(s"SELECT doc_id, text, lang, n_chars " +
      s"FROM $cat.db.c")
    val want = docs.select("doc_id", "text", "lang", "n_chars")
      .filter(!(col("lang") === "en" && col("doc_id") % 2 === 0))
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
  }

  test("copy-on-write UPDATE and MERGE: exact rows, replaced groups only, no dvs") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    docs.createOrReplaceTempView("rl_cowu_src")
    spark.sql(s"CREATE TABLE $cat.db.u (doc_id BIGINT, text STRING, " +
      "lang STRING, n_chars BIGINT) " +
      "TBLPROPERTIES ('dml.mode' = 'copy-on-write')")
    spark.sql(s"INSERT INTO $cat.db.u SELECT doc_id, text, lang, " +
      "n_chars FROM rl_cowu_src")
    val path = s"$wh/db/u"
    spark.sql(s"UPDATE $cat.db.u SET n_chars = n_chars * 2 " +
      "WHERE doc_id % 5 = 0")
    assert(Snapshots.history(spark, path).orderBy("version")
      .collect().last.getString(2) === "rowLevelUpdateCow")
    val wantU = docs.select(col("doc_id"), col("text"), col("lang"),
      when(col("doc_id") % 5 === 0, col("n_chars") * 2)
        .otherwise(col("n_chars")).as("n_chars"))
    val gotU = spark.sql(
      s"SELECT doc_id, text, lang, n_chars FROM $cat.db.u")
    assert(gotU.exceptAll(wantU).count() === 0L)
    assert(wantU.exceptAll(gotU).count() === 0L)
    // MERGE: update + insert through the group-based plan
    spark.sql(
      s"""MERGE INTO $cat.db.u t
         |USING (SELECT doc_id AS sid, n_chars AS sn FROM rl_cowu_src
         |       WHERE doc_id % 7 = 0) s
         |ON t.doc_id = s.sid
         |WHEN MATCHED THEN UPDATE SET text = 'merged'
         |WHEN NOT MATCHED THEN INSERT
         |  (doc_id, text, lang, n_chars)
         |  VALUES (s.sid + 9000000, 'new', 'xx', s.sn)""".stripMargin)
    assert(Snapshots.history(spark, path).orderBy("version")
      .collect().last.getString(2) === "rowLevelMergeCow")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.u " +
      "WHERE text = 'merged'").head.getLong(0) ===
      docs.filter(col("doc_id") % 7 === 0).count())
    assert(Snapshots.stateAt(spark, path,
      Snapshots.latestVersion(spark, path).get)._4.isEmpty,
      "copy-on-write merge added delete files")
    // an unknown mode refuses loudly at DML time
    spark.sql(s"ALTER TABLE $cat.db.u SET TBLPROPERTIES " +
      "('dml.mode' = 'nope')")
    val e = intercept[Exception](spark.sql(
      s"DELETE FROM $cat.db.u WHERE doc_id % 3 = 0"))
    assert(e.getMessage.contains("dml.mode"), e.getMessage)
  }

  test("copy-on-write runtime group filtering: unmatched files inside the scanned set are not rewritten") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.g (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('dml.mode' = 'copy-on-write')")
    // four separate inserts => four files, disjoint key ranges
    (0 until 4).foreach { i =>
      spark.range(i * 1000, (i + 1) * 1000).coalesce(1)
        .selectExpr("id AS k", "id * 2 AS v")
        .createOrReplaceTempView("rl_cowg_src")
      spark.sql(s"INSERT INTO $cat.db.g SELECT * FROM rl_cowg_src")
    }
    val path = s"$wh/db/g"
    val v0 = Snapshots.latestVersion(spark, path).get
    val before = Snapshots.stateAt(spark, path, v0)._3
      .map(graft.io.Snapshots.relOfEntry).toSet
    assert(before.size === 4)
    // matches rows in exactly ONE file (k in [1000, 2000))
    spark.sql(s"DELETE FROM $cat.db.g WHERE k % 2 = 1 " +
      "AND k >= 1200 AND k < 1300")
    val after = Snapshots.stateAt(spark, path,
      Snapshots.latestVersion(spark, path).get)._3
      .map(graft.io.Snapshots.relOfEntry).toSet
    val replaced = before -- after
    assert(replaced.size === 1,
      s"expected ONE rewritten file, got ${replaced.size}: the " +
        "runtime group filter (or manifest stats pruning) did not " +
        "bound the rewrite")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.g")
      .head.getLong(0) === 4000 - 50)
  }

  test("copy-on-write DML composes with EXISTING MoR deletes: rewritten groups carry live rows only") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    docs.createOrReplaceTempView("rl_cowm_src")
    spark.sql(s"CREATE TABLE $cat.db.cm (doc_id BIGINT, text STRING, " +
      "lang STRING, n_chars BIGINT) " +
      "TBLPROPERTIES ('dml.mode' = 'copy-on-write')")
    spark.sql(s"INSERT INTO $cat.db.cm SELECT doc_id, text, lang, " +
      "n_chars FROM rl_cowm_src")
    val path = s"$wh/db/cm"
    // a positional-delete backlog lands first (programmatic mor)
    Snapshots.deleteWhere(spark, path,
      col("doc_id") % 3 === 0, mode = "mor")
    val live = docs.filter(col("doc_id") % 3 =!= 0)
    // the cow update must see only live rows AND not resurrect the
    // mor-deleted ones when it rewrites the matched files
    spark.sql(s"UPDATE $cat.db.cm SET n_chars = -7 " +
      "WHERE doc_id % 4 = 2")
    val want = live.select(col("doc_id"), col("text"), col("lang"),
      when(col("doc_id") % 4 === 2, lit(-7L))
        .otherwise(col("n_chars")).as("n_chars"))
    val got = spark.sql(
      s"SELECT doc_id, text, lang, n_chars FROM $cat.db.cm")
    assert(got.exceptAll(want).count() === 0L)
    assert(want.exceptAll(got).count() === 0L)
  }

  test("row-level DML refuses when the delete sliver outgrew the shipping budget (compact first)") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "bb")
    Snapshots.deleteWhere(spark, s"$wh/db/bb",
      col("doc_id") % 2 === 0, mode = "mor")
    val old = spark.conf.getOption("spark.graft.snapshot.v2.maxDeleteBytes")
    spark.conf.set("spark.graft.snapshot.v2.maxDeleteBytes", "1")
    try {
      val e = intercept[Exception](spark.sql(
        s"DELETE FROM $cat.db.bb WHERE doc_id % 7 = 0"))
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null && m.contains("compact")),
        s"expected the compact-first refusal, got $e")
    } finally old match {
      case Some(v) =>
        spark.conf.set("spark.graft.snapshot.v2.maxDeleteBytes", v)
      case None =>
        spark.conf.unset("spark.graft.snapshot.v2.maxDeleteBytes")
    }
  }

  test("row-level commit refuses when a concurrent writer moved the table (positions would be stale)") {
    val (cat, wh) = freshCatalog()
    makeDocs(cat, "cc")
    val path = s"$wh/db/cc"
    // interloper: land an append between the DML's scan and commit
    Snapshots.onBeforePublish = () => {
      Snapshots.onBeforePublish = () => ()
      Snapshots.commitAppend(
        docs.limit(5).select(docs.columns.map(col).toSeq: _*), path)
      ()
    }
    try {
      val e = intercept[Exception](spark.sql(
        s"DELETE FROM $cat.db.cc WHERE doc_id % 11 = 0"))
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(
        _.isInstanceOf[java.util.ConcurrentModificationException]),
        s"expected a concurrent-commit refusal, got $e")
    } finally Snapshots.onBeforePublish = () => ()
    // nothing was deleted; the interloper's append is intact
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.cc")
      .head.getLong(0) === docs.count() + 5)
  }
}
