package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Branches: multi-commit isolated workspaces inside one table
  * (zero-copy fork via the clone machinery), promoted back to main
  * as ONE atomic fast-forward commit — the campaign-scale
  * write-audit-publish. Main serves untouched until the promote.
  */
class SnapshotBranchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, sf, "documents")
  private def newStore: String =
    Files.createTempDirectory("graft_branch").toString + "/tbl"

  test("branch: fork, multi-commit, main untouched, fast-forward promotes atomically") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "backfill")
    assert(Snapshots.listBranches(spark, path) === Seq("backfill"))
    val bp = Snapshots.branchPath(path, "backfill")
    // two branch commits; a third batch staged-and-dropped on main
    // proves main stayed live and independent throughout
    Snapshots.commitAppend(docs.limit(4)
      .withColumn("doc_id", col("doc_id") + 1000000L), bp)
    Snapshots.commitAppend(docs.limit(3)
      .withColumn("doc_id", col("doc_id") + 2000000L), bp)
    assert(Snapshots.read(spark, path).count() === docs.count())
    assert(Snapshots.read(spark, bp).count() === docs.count() + 7)
    // main's history has exactly one version; branch reads are a
    // first-class store (time travel works inside the branch)
    assert(Snapshots.versions(spark, path) === Seq(1L))
    assert(Snapshots.read(spark, bp, Some(1L)).count() === docs.count())
    val v = Snapshots.fastForward(spark, path, "backfill")
    assert(v === 2L)
    assert(Snapshots.read(spark, path).count() === docs.count() + 7)
    assert(Snapshots.read(spark, path)
      .filter(col("doc_id") >= 1000000L).count() === 7L)
    // one commit in main's history; the branch is consumed
    assert(Snapshots.versions(spark, path) === Seq(1L, 2L))
    assert(Snapshots.listBranches(spark, path).isEmpty)
    assert(Snapshots.history(spark, path)
      .filter(col("version") === 2L).select("operation")
      .head.getString(0).startsWith("fast-forward(branch=backfill"))
    // time travel to pre-promote main still serves
    assert(Snapshots.read(spark, path, Some(1L)).count() === docs.count())
    // vacuum keeps every promoted byte
    Snapshots.vacuum(spark, path, graceMs = 0L)
    assert(Snapshots.read(spark, path).count() === docs.count() + 7)
  }

  test("fast-forward refuses when main advanced since the fork; branch re-forks") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "exp")
    Snapshots.commitAppend(docs.limit(2)
      .withColumn("doc_id", col("doc_id") + 3000000L),
      Snapshots.branchPath(path, "exp"))
    // main moves on
    Snapshots.commitAppend(docs.limit(1)
      .withColumn("doc_id", lit(4000000L)), path)
    val e = intercept[IllegalArgumentException](
      Snapshots.fastForward(spark, path, "exp"))
    assert(e.getMessage.contains("advanced"), e.getMessage)
    assert(Snapshots.read(spark, path).count() === docs.count() + 1)
    // the branch still reads; drop abandons it without a trace
    assert(Snapshots.read(spark,
      Snapshots.branchPath(path, "exp")).count() === docs.count() + 2)
    Snapshots.dropBranch(spark, path, "exp")
    assert(Snapshots.listBranches(spark, path).isEmpty)
    assert(Snapshots.read(spark, path).count() === docs.count() + 1)
  }

  test("branch DML: localize on the branch, mutate, promote carries the rewritten state") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "fix")
    val bp = Snapshots.branchPath(path, "fix")
    // row-level DML on a fresh branch refuses until localized
    val e = intercept[IllegalArgumentException](
      Snapshots.deleteWhere(spark, bp, col("doc_id") === 1L))
    assert(e.getMessage.contains("localize"), e.getMessage)
    Snapshots.compact(spark, bp)
    Snapshots.deleteWhere(spark, bp, col("doc_id") === 1L)
    Snapshots.updateWhere(spark, bp,
      Seq("lang" -> lit("xx")), Some(col("doc_id") === 2L))
    val v = Snapshots.fastForward(spark, path, "fix")
    val main = Snapshots.read(spark, path)
    assert(main.filter(col("doc_id") === 1L).count() === 0L)
    assert(main.filter(col("doc_id") === 2L).select("lang")
      .head.getString(0) === "xx")
    assert(main.count() === docs.count() - 1)
    // and the promoted bytes survive a main vacuum
    Snapshots.vacuum(spark, path, graceMs = 0L)
    assert(Snapshots.read(spark, path).count() === docs.count() - 1)
    assert(v === 2L)
  }

  test("branch with a positional (mor) delete promotes; eq-delete markers refuse") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "mor")
    val bp = Snapshots.branchPath(path, "mor")
    Snapshots.compact(spark, bp) // localize
    Snapshots.deleteWhere(spark, bp, col("doc_id") === 5L, mode = "mor")
    Snapshots.fastForward(spark, path, "mor")
    assert(Snapshots.read(spark, path)
      .filter(col("doc_id") === 5L).count() === 0L)
    assert(Snapshots.read(spark, path).count() === docs.count() - 1)
    // eq markers carry branch-local base versions: refuse
    Snapshots.compact(spark, path) // apply the promoted dv: forks need a dv-free base
    Snapshots.createBranch(spark, path, "eq")
    val bp2 = Snapshots.branchPath(path, "eq")
    Snapshots.compact(spark, bp2)
    import spark.implicits._
    Snapshots.deleteKeysEq(spark, bp2,
      Seq(7L).toDF("doc_id"), Seq("doc_id"))
    val e = intercept[IllegalArgumentException](
      Snapshots.fastForward(spark, path, "eq"))
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
    // the documented remediation works: compact applies, promote lands
    Snapshots.compact(spark, bp2)
    Snapshots.fastForward(spark, path, "eq")
    assert(Snapshots.read(spark, path)
      .filter(col("doc_id") === 7L).count() === 0L)
  }

  test("branch schema evolution promotes: evolved columns arrive with the fast-forward") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "widen")
    val bp = Snapshots.branchPath(path, "widen")
    Snapshots.commitAppend(docs.limit(2)
      .withColumn("doc_id", col("doc_id") + 5000000L)
      .withColumn("quality", lit(0.9)), bp)
    Snapshots.fastForward(spark, path, "widen")
    val out = Snapshots.read(spark, path)
    assert(out.columns.contains("quality"))
    assert(out.filter(col("quality").isNotNull).count() === 2L)
    assert(out.count() === docs.count() + 2)
  }

  test("SQL: CALL create_branch / fast_forward / drop_branch / list_branches") {
    val wh = Files.createTempDirectory("graft_branch_cat").toString
    val cat = s"gbr${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (doc_id BIGINT, text STRING, " +
      "lang STRING, source STRING, n_chars BIGINT)")
    docs.createOrReplaceTempView("graft_branch_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM graft_branch_src")
    assert(spark.sql(s"CALL $cat.system.create_branch(" +
      "table => 'db.t', name => 'b1')").head.getLong(0) === 1L)
    assert(spark.sql(s"CALL $cat.system.list_branches(table => 'db.t')")
      .head.getString(0) === "b1")
    // a branch commit through the programmatic API on the branch path
    Snapshots.commitAppend(docs.limit(2)
      .withColumn("doc_id", col("doc_id") + 7000000L),
      Snapshots.branchPath(s"$wh/db/t", "b1"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head.getLong(0) === docs.count())
    val v = spark.sql(s"CALL $cat.system.fast_forward(" +
      "table => 'db.t', name => 'b1')").head.getLong(0)
    assert(v === 3L) // v1 = empty CREATE, v2 = INSERT, v3 = promote
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .head.getLong(0) === docs.count() + 2)
    assert(spark.sql(s"CALL $cat.system.list_branches(table => 'db.t')")
      .head.getString(0) === "")
    spark.sql(s"CALL $cat.system.create_branch(" +
      "table => 'db.t', name => 'b2')")
    assert(spark.sql(s"CALL $cat.system.drop_branch(" +
      "table => 'db.t', name => 'b2')").head.getBoolean(0))
    assert(spark.sql(s"CALL $cat.system.list_branches(table => 'db.t')")
      .head.getString(0) === "")
  }

  test("fast-forward compensation: a stolen version claim moves the dirs back, nothing lost") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "race")
    val bp = Snapshots.branchPath(path, "race")
    Snapshots.commitAppend(docs.limit(3)
      .withColumn("doc_id", col("doc_id") + 6000000L), bp)
    // simulate a CROSS-PROCESS writer winning main's next version
    // inside the promote's commit window (after the dirs moved,
    // before the claim)
    Snapshots.onBeforePromoteClaim = () => {
      Snapshots.onBeforePromoteClaim = () => ()
      val m = java.nio.file.Paths.get(
        f"$path/_manifests/v${1L}%09d.manifest")
      java.nio.file.Files.copy(m, java.nio.file.Paths.get(
        f"$path/_manifests/v${2L}%09d.manifest"))
      ()
    }
    try {
      intercept[java.util.ConcurrentModificationException](
        Snapshots.fastForward(spark, path, "race"))
    } finally Snapshots.onBeforePromoteClaim = () => ()
    // main serves the interloper's state; the branch is INTACT -
    // dirs moved back, still listed, still readable, re-promotable
    assert(Snapshots.read(spark, path).count() === docs.count())
    assert(Snapshots.listBranches(spark, path) === Seq("race"))
    assert(Snapshots.read(spark, bp).count() === docs.count() + 3)
    // clean the forged manifest and the retry lands
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      f"$path/_manifests/v${2L}%09d.manifest"))
    Snapshots.fastForward(spark, path, "race")
    assert(Snapshots.read(spark, path).count() === docs.count() + 3)
  }

  test("fast-forward compensation: a PARTIAL rename failure moves completed renames back") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "partial")
    val bp = Snapshots.branchPath(path, "partial")
    // two branch commits = two commit dirs to move; sabotage the
    // SECOND rename by planting a file at its main-side target
    Snapshots.commitAppend(docs.limit(3)
      .withColumn("doc_id", col("doc_id") + 6100000L), bp)
    Snapshots.commitAppend(docs.limit(2)
      .withColumn("doc_id", col("doc_id") + 6200000L), bp)
    val bDirs = new java.io.File(s"$bp/data").listFiles()
      .filter(_.getName.startsWith("c-")).map(_.getName).sorted
    assert(bDirs.length === 2)
    // renaming a DIRECTORY onto an existing plain FILE fails on
    // every fs; plant one at the lexicographically-last dir's target
    // (the move list preserves manifest order, but either order
    // proves the compensation: >=1 rename succeeds before one fails)
    val victim = bDirs.last
    val blocker = new java.io.File(s"$path/data/$victim")
    assert(blocker.createNewFile())
    intercept[Exception](Snapshots.fastForward(spark, path, "partial"))
    // main untouched, branch INTACT: every moved dir returned, both
    // branch commits still readable
    assert(Snapshots.read(spark, path).count() === docs.count())
    assert(Snapshots.read(spark, bp).count() === docs.count() + 5)
    // clear the conflict and the retry promotes cleanly
    assert(blocker.delete())
    Snapshots.fastForward(spark, path, "partial")
    assert(Snapshots.read(spark, path).count() === docs.count() + 5)
  }

  test("vacuum blocks on the table monitor mid-promote: moved dirs are never swept") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "sweeprace")
    val bp = Snapshots.branchPath(path, "sweeprace")
    Snapshots.commitAppend(docs.limit(4)
      .withColumn("doc_id", col("doc_id") + 6300000L), bp)
    // age every branch data file past any grace window: the moved
    // dirs arrive under main with OLD mtimes, exactly the advisor's
    // race (grace elapsed, no manifest references them yet)
    def ageAll(dir: java.io.File): Unit = {
      dir.listFiles().foreach { f =>
        f.setLastModified(System.currentTimeMillis() - 86400000L)
        if (f.isDirectory) ageAll(f)
      }
    }
    ageAll(new java.io.File(bp))
    ageAll(new java.io.File(path))
    val vacuumed = new java.util.concurrent.atomic.AtomicInteger(-1)
    val t = new java.util.concurrent.atomic.AtomicReference[Thread]()
    Snapshots.onBeforePromoteClaim = () => {
      Snapshots.onBeforePromoteClaim = () => ()
      // fire a zero-grace vacuum from ANOTHER thread while the
      // promote holds the monitor with dirs moved but unclaimed -
      // the fix makes it BLOCK until the promote publishes
      val th = new Thread(() =>
        vacuumed.set(Snapshots.vacuum(spark, path, graceMs = 0L)))
      th.start()
      t.set(th)
      Thread.sleep(300) // give an unsynchronized vacuum time to race
    }
    try Snapshots.fastForward(spark, path, "sweeprace")
    finally Snapshots.onBeforePromoteClaim = () => ()
    t.get().join(30000)
    // the promote landed with every row intact - the vacuum (which
    // ran to completion after the monitor released) swept nothing
    // the new manifest references
    assert(vacuumed.get() === 0)
    assert(Snapshots.read(spark, path).count() === docs.count() + 4)
  }

  test("branch name traversal refuses: '..' cannot address (or delete) the table") {
    val path = newStore
    Snapshots.commit(docs, path)
    Seq("..", "a/b", "", "x..\u0000").foreach { bad =>
      intercept[IllegalArgumentException](
        Snapshots.dropBranch(spark, path, bad))
      intercept[IllegalArgumentException](
        Snapshots.createBranch(spark, path, bad))
    }
    assert(Snapshots.read(spark, path).count() === docs.count())
  }

  test("a branch is SQL-readable through the graft_snapshot TVF (it is a store)") {
    val path = newStore
    Snapshots.commit(docs, path)
    Snapshots.createBranch(spark, path, "sqlread")
    val bp = Snapshots.branchPath(path, "sqlread")
    Snapshots.commitAppend(docs.limit(2)
      .withColumn("doc_id", col("doc_id") + 8000000L), bp)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensions(spark, ext)
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$bp')")
      .head.getLong(0) === docs.count() + 2)
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$path')")
      .head.getLong(0) === docs.count())
  }
}
