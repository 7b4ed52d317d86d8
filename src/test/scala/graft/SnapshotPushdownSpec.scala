package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}

/** LIMIT / ORDER-BY-LIMIT pushdown on the snapshot DSv2 scan
  * ([[graft.io.SnapshotScanBuilder.pushLimit]] / `pushTopN`): a
  * pushed LIMIT plans only a file PREFIX whose guaranteed live rows
  * cover it and caps every reader; a pushed top-N prunes files the
  * manifest min/max/null-count stats prove cannot reach the top-k
  * and bounds every task at a k-row heap. Both are PARTIAL pushdowns
  * — Spark re-applies its own limit/sort above — so every assertion
  * here is result-exactness first, IO bound second.
  */
class SnapshotPushdownSpec extends SparkSpec {

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_push").toString
    val name = s"gpush${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  /** Four commits of 1,000 rows each with DISJOINT v ranges
    * (i*1000 until (i+1)*1000), so per-file manifest bounds separate
    * cleanly; `s` is a short string key mirroring v for string-stat
    * pruning ("k000000".."k003999"). */
  private def rangedTable(): (String, String) = {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, s STRING, " +
      "payload STRING)")
    (0 until 4).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L).toDF("v")
        .selectExpr("v",
          "concat('k', lpad(cast(v AS STRING), 6, '0')) AS s",
          "repeat('x', 20) AS payload")
        .createOrReplaceTempView("push_src")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_src")
    }
    (cat, wh)
  }

  private def opened[A](body: => A): (A, Long) = {
    graft.io.SnapshotReaderFactory.filesOpened.set(0L)
    val r = body
    (r, graft.io.SnapshotReaderFactory.filesOpened.get())
  }

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("pushed LIMIT opens a file prefix, not the table") {
    val (cat, _) = rangedTable()
    // total files a full scan opens (count(*) would answer from the
    // manifest, so force data IO through a non-pushable aggregate)
    val (_, total) = opened(
      spark.sql(s"SELECT sum(v * 2) FROM $cat.db.t").collect())
    assert(total >= 4, s"expected >=4 data files, saw $total")
    // the aggregate above the limit forces EVERY scan partition to
    // run (a bare terminal LIMIT would mask pruning behind Spark's
    // incremental executeTake)
    val q = spark.sql(
      s"SELECT count(*) AS n FROM (SELECT * FROM $cat.db.t LIMIT 3)")
    val (plan, io) = opened(planOf(q))
    assert(plan.contains("pushedLimit=3"),
      s"limit not pushed to the scan:\n$plan")
    assert(io < total,
      s"pushed limit still opened $io of $total files")
    assert(q.collect().head.getLong(0) == 3L)
  }

  test("pushed LIMIT larger than one file extends the prefix and stays exact") {
    val (cat, _) = rangedTable()
    val n = spark.sql(
      s"SELECT count(*) AS n FROM (SELECT v FROM $cat.db.t LIMIT 2500)")
      .collect().head.getLong(0)
    assert(n == 2500L)
    // limit beyond the table: everything comes back
    val all = spark.sql(
      s"SELECT count(*) AS n FROM (SELECT v FROM $cat.db.t LIMIT 99999)")
      .collect().head.getLong(0)
    assert(all == 4000L)
  }

  test("pushed LIMIT over merge-on-read deletes returns only live rows") {
    val (cat, wh) = rangedTable()
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      org.apache.spark.sql.functions.col("v") % 2 === 0, mode = "mor")
    val picked = spark.sql(s"SELECT v FROM $cat.db.t LIMIT 500")
      .collect().map(_.getLong(0))
    assert(picked.length == 500)
    assert(picked.forall(_ % 2 != 0),
      "a pushed limit leaked merge-on-read-deleted rows")
    // the guaranteed-prefix math subtracts positional deletes: asking
    // for more live rows than one file holds still delivers
    val n = spark.sql(
      s"SELECT count(*) AS n FROM (SELECT v FROM $cat.db.t LIMIT 1800)")
      .collect().head.getLong(0)
    assert(n == 1800L)
  }

  test("pushed top-N ASC prunes to the low-bound files and is exact") {
    val (cat, _) = rangedTable()
    val (_, total) = opened(
      spark.sql(s"SELECT sum(v * 2) FROM $cat.db.t").collect())
    val q = spark.sql(s"SELECT v FROM $cat.db.t ORDER BY v LIMIT 5")
    val (plan, io) = opened(planOf(q))
    assert(plan.contains("pushedTopN=[v ASC]"),
      s"top-N not pushed to the scan:\n$plan")
    assert(io < total,
      s"pushed top-N still opened $io of $total files")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("pushed top-N DESC prunes to the high-bound files and is exact") {
    val (cat, _) = rangedTable()
    val (_, total) = opened(
      spark.sql(s"SELECT sum(v * 2) FROM $cat.db.t").collect())
    val q = spark.sql(
      s"SELECT v FROM $cat.db.t ORDER BY v DESC LIMIT 4")
    val (plan, io) = opened(planOf(q))
    assert(plan.contains("pushedTopN=[v DESC]"),
      s"top-N not pushed to the scan:\n$plan")
    assert(io < total,
      s"pushed top-N DESC still opened $io of $total files")
    assert(q.collect().map(_.getLong(0)).toSeq ==
      Seq(3999L, 3998L, 3997L, 3996L))
  }

  test("pushed top-N over an exact-string key prunes files") {
    val (cat, _) = rangedTable()
    val (_, total) = opened(
      spark.sql(s"SELECT sum(v * 2) FROM $cat.db.t").collect())
    val q = spark.sql(s"SELECT s FROM $cat.db.t ORDER BY s LIMIT 3")
    val (plan, io) = opened(planOf(q))
    assert(plan.contains("pushedTopN=[s ASC]"),
      s"string top-N not pushed:\n$plan")
    assert(io < total,
      s"string-stat top-N still opened $io of $total files")
    assert(q.collect().map(_.getString(0)).toSeq ==
      Seq("k000000", "k000001", "k000002"))
  }

  test("pushed top-N over TIMESTAMP and DATE keys prunes via 'U'/'L' bounds") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, ts TIMESTAMP, " +
      "d DATE)")
    (0 until 4).foreach { i =>
      spark.range(i * 1000L, (i + 1) * 1000L).toDF("v")
        .selectExpr("v", "timestamp_seconds(1700000000 + v) AS ts",
          "date_add(DATE'2020-01-01', cast(v AS INT)) AS d")
        .createOrReplaceTempView("push_ts_src")
      spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_ts_src")
    }
    val (_, total) = opened(
      spark.sql(s"SELECT sum(v * 2) FROM $cat.db.t").collect())
    // newest-rows probe: DESC top-k must read only the tail files
    val qTs = spark.sql(
      s"SELECT v FROM $cat.db.t ORDER BY ts DESC LIMIT 3")
    val (planTs, ioTs) = opened(planOf(qTs))
    assert(planTs.contains("pushedTopN=[ts DESC]"),
      s"timestamp top-N not pushed:\n$planTs")
    assert(ioTs < total,
      s"timestamp top-N still opened $ioTs of $total files")
    assert(qTs.collect().map(_.getLong(0)).toSeq ==
      Seq(3999L, 3998L, 3997L))
    val qD = spark.sql(
      s"SELECT v FROM $cat.db.t ORDER BY d ASC LIMIT 3")
    val (planD, ioD) = opened(planOf(qD))
    assert(planD.contains("pushedTopN=[d ASC]"),
      s"date top-N not pushed:\n$planD")
    assert(ioD < total,
      s"date top-N still opened $ioD of $total files")
    assert(qD.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("top-N null ordering: NULLS FIRST keeps null-bearing files, NULLS LAST outranks them") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, tag STRING)")
    // commit 1: values 100..199, no nulls; commit 2: 10 nulls plus
    // values 200..299 — under ASC NULLS FIRST the top-3 is nulls
    // from commit 2 + the smallest value from commit 1
    spark.range(100L, 200L).toDF("v")
      .selectExpr("v", "'a' AS tag")
      .createOrReplaceTempView("push_n1")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_n1")
    spark.range(0L, 110L).toDF("i")
      .selectExpr("CASE WHEN i < 10 THEN NULL ELSE i + 190 END AS v",
        "'b' AS tag")
      .createOrReplaceTempView("push_n2")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_n2")
    def vals(sql: String): Seq[Option[Long]] =
      spark.sql(sql).collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val nf = vals(s"SELECT v FROM $cat.db.t " +
      "ORDER BY v ASC NULLS FIRST LIMIT 12")
    assert(nf.take(10).forall(_.isEmpty) &&
      nf.drop(10) == Seq(Some(100L), Some(101L)),
      s"NULLS FIRST top-12 wrong: $nf")
    val nl = vals(s"SELECT v FROM $cat.db.t " +
      "ORDER BY v ASC NULLS LAST LIMIT 3")
    assert(nl == Seq(Some(100L), Some(101L), Some(102L)),
      s"NULLS LAST top-3 wrong: $nl")
    val dn = vals(s"SELECT v FROM $cat.db.t ORDER BY v DESC LIMIT 3")
    assert(dn == Seq(Some(299L), Some(298L), Some(297L)),
      s"DESC (nulls last) top-3 wrong: $dn")
    // DESC NULLS FIRST: the nulls lead
    val df2 = vals(s"SELECT v FROM $cat.db.t " +
      "ORDER BY v DESC NULLS FIRST LIMIT 11")
    assert(df2.take(10).forall(_.isEmpty) &&
      df2.drop(10) == Seq(Some(299L)),
      s"DESC NULLS FIRST top-11 wrong: $df2")
  }

  test("multi-key top-N: heap honors the full ordering") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (a BIGINT, b BIGINT)")
    spark.range(0L, 1000L).toDF("i")
      .selectExpr("i % 7 AS a", "i AS b")
      .createOrReplaceTempView("push_mk")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_mk")
    val got = spark.sql(
      s"SELECT a, b FROM $cat.db.t ORDER BY a ASC, b DESC LIMIT 6")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (0L until 1000L).map(i => (i % 7, i))
      .sortBy { case (a, b) => (a, -b) }.take(6)
    assert(got == want, s"multi-key top-N wrong: $got vs $want")
  }

  test("top-N under merge-on-read deletes skips pruning but stays exact") {
    val (cat, wh) = rangedTable()
    // kill the 20 smallest values: the old per-file bounds would
    // wrongly serve them if pruning trusted stats under deletes
    graft.io.Snapshots.deleteWhere(spark, s"$wh/db/t",
      org.apache.spark.sql.functions.col("v") < 20, mode = "mor")
    val got = spark.sql(s"SELECT v FROM $cat.db.t ORDER BY v LIMIT 5")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(20L, 21L, 22L, 23L, 24L),
      s"top-N under MoR deletes wrong: $got")
  }

  test("top-N composes with a manifest-absorbed WHERE: filtered ORDER BY LIMIT still pushes") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.range(0L, 600L).toDF("v")
      .selectExpr("v", "CASE WHEN v % 3 = 0 THEN 'en' ELSE 'fr' END " +
        "AS lang")
      .createOrReplaceTempView("push_absorb_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_absorb_src")
    // the equality on the identity partition column is CONSUMED by
    // the kept entry set (no Filter node), so Spark still offers the
    // top-N — which then prunes/heaps over the absorbed slice only
    val q = spark.sql(s"SELECT v FROM $cat.db.t WHERE lang = 'en' " +
      "ORDER BY v DESC LIMIT 4")
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(q.queryExecution.executedPlan.toString
        .contains("pushedTopN=[v DESC]"),
      s"absorbed-WHERE top-N not pushed:\n${q.queryExecution.executedPlan}")
    assert(got == Seq(597L, 594L, 591L, 588L),
      s"absorbed-WHERE top-N wrong: $got")
  }

  test("ties at the pruning bound survive: equal values across files all qualify") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (v BIGINT, src STRING)")
    // two commits whose ranges OVERLAP at v=5: top-6 spans both files
    spark.range(0L, 6L).toDF("v").selectExpr("v", "'one' AS src")
      .createOrReplaceTempView("push_t1")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_t1")
    spark.range(5L, 11L).toDF("v").selectExpr("v", "'two' AS src")
      .createOrReplaceTempView("push_t2")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM push_t2")
    val got = spark.sql(s"SELECT v FROM $cat.db.t ORDER BY v LIMIT 7")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 4L, 5L, 5L),
      s"overlapping-bound top-N wrong: $got")
  }
}
