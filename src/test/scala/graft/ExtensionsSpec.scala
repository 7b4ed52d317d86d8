package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** SparkSessionExtensions registration + streaming incremental merge. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions: graft_cosine callable from SQL") {
    // apply to the live session (builder-time withExtensions only
    // takes effect on a fresh session; getOrCreate would reuse this
    // one and stop() would tear down the JVM-shared context)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensions(spark, ext)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(r === 1.0)
    assert(spark.experimental.extraStrategies
      .exists(_ eq graft.plans.TopKStrategy))
  }

  test("graft_snapshot table-valued function: pure-SQL snapshot time travel") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensions(spark, ext)
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val path = Files.createTempDirectory("graft_tvf").toString + "/tbl"
    val v1 = graft.io.Snapshots.commit(
      docs.filter(col("doc_id") % 2 === 0), path)
    graft.io.Snapshots.tag(spark, path, "train-v1")
    graft.io.Snapshots.commitAppend(
      docs.filter(col("doc_id") % 2 === 1), path)
    val even = docs.filter(col("doc_id") % 2 === 0).count()
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$path')").count() ===
      docs.count())
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_snapshot('$path', $v1)")
      .head().getLong(0) === even)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot('$path', 'train-v1')")
      .head().getLong(0) === even)
    // joins/filters compose like any table
    val n = spark.sql(
      s"""SELECT count(*) AS n FROM graft_snapshot('$path') a
          JOIN graft_snapshot('$path', $v1) b USING (doc_id)
          WHERE a.n_chars > 100""").head().getLong(0)
    assert(n === docs.filter(col("doc_id") % 2 === 0 &&
      col("n_chars") > 100).count())
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot('$path', 'nope')").count())
    assert(e.getMessage.contains("no tag"), e.getMessage)
    // DESCRIBE HISTORY as SQL
    val ops = spark.sql(
      s"""SELECT version, operation
          FROM graft_snapshot_history('$path') ORDER BY version""")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(ops === Seq(1L -> "overwrite", 2L -> "append"), ops.toString)
    // the CHANGE FEED as SQL: v1→v2 was a pure append — every odd
    // doc arrives as an insert at commit 2, nothing else
    val feed = spark.sql(
      s"""SELECT _change_type, count(*) AS n
          FROM graft_snapshot_changes('$path', 1, 2)
          GROUP BY 1""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed === Map("insert" -> (docs.count() - even)), feed.toString)
    // the FILES metadata table as SQL: one row per manifest entry,
    // bytes from the __len pseudo-stat, stats rendered for ops eyes
    val files = spark.sql(
      s"""SELECT file, bytes, stats_min['doc_id'] AS lo,
                 stats_max['doc_id'] AS hi
          FROM graft_snapshot_files('$path')""").collect()
    assert(files.nonEmpty)
    assert(files.forall(r => r.getString(0).endsWith(".parquet") &&
      r.getLong(1) > 0L))
    assert(files.exists(r => r.getString(2) != null))
    // version argument pins the entry list
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_snapshot_files('$path', $v1)")
      .head().getLong(0) < files.length.toLong)
    // SHOW PARTITIONS with totals: per-partition rows from the
    // manifest pseudo-stats alone
    val parts = spark.sql(
      s"""SELECT partition, n_files, total_bytes, total_rows
          FROM graft_snapshot_partitions('$path')""").collect()
    assert(parts.nonEmpty)
    assert(parts.map(_.getAs[Long]("total_rows")).sum === docs.count())
    // DESCRIBE DETAIL in SQL: the one-row operational summary
    val det = spark.sql(
      s"SELECT version, n_files, total_rows " +
        s"FROM graft_snapshot_detail('$path')").head()
    assert(det.getAs[Long]("version") === 2L)
    assert(det.getAs[Long]("total_rows") === docs.count())
  }

  test("TopKRewriteRule: rank-filter window rewrites to the heap operator") {
    import spark.implicits._
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensions(spark, ext)

    val df = (0L until 1000L).map(i => (i % 20, i, (i * 37) % 101))
      .toDF("grp", "id", "score")
    df.createOrReplaceTempView("rank_src")
    val q = spark.sql(
      """SELECT grp, id, score FROM (
           SELECT *, row_number() OVER
             (PARTITION BY grp ORDER BY score DESC, id) AS rn
           FROM rank_src)
         WHERE rn <= 3""")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"),
      s"rank filter should rewrite to the bounded heap:\n$opt")
    assert(!opt.contains("Window ") && !opt.contains("WindowGroupLimit"),
      s"window AND its sorting group-limit pre-cap must be gone:\n$opt")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("Sort"),
      s"no per-partition sort may survive the rewrite:\n$phys")
    // results equal the un-rewritten window form
    val expected = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("grp").orderBy(col("score").desc, col("id"))))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(q.collect().map(_.toSeq).toSet === expected)
    assert(q.count() === 60)
  }

  test("TopKRewriteRule: keeps the window when rn is projected, " +
    "rank() is used, or k is oversized") {
    import spark.implicits._
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.Bridge.applyExtensions(spark, ext)
    (0L until 100L).map(i => (i % 5, i)).toDF("grp", "id")
      .createOrReplaceTempView("rank_src2")

    val keepsRn = spark.sql(
      """SELECT grp, id, rn FROM (
           SELECT *, row_number() OVER
             (PARTITION BY grp ORDER BY id) AS rn FROM rank_src2)
         WHERE rn <= 3""")
    assert(!keepsRn.queryExecution.optimizedPlan.toString
      .contains("TopKPerKey"), "rn in output: operator emits no rank")
    assert(keepsRn.count() === 15)

    val rankTies = spark.sql(
      """SELECT grp, id FROM (
           SELECT *, rank() OVER
             (PARTITION BY grp ORDER BY id) AS rn FROM rank_src2)
         WHERE rn <= 3""")
    assert(!rankTies.queryExecution.optimizedPlan.toString
      .contains("TopKPerKey"), "rank() can exceed k rows on ties")

    val bigK = spark.sql(
      s"""SELECT grp, id FROM (
           SELECT *, row_number() OVER
             (PARTITION BY grp ORDER BY id) AS rn FROM rank_src2)
         WHERE rn <= ${graft.plans.TopKRewriteRule.MaxK + 1}""")
    assert(!bigK.queryExecution.optimizedPlan.toString
      .contains("TopKPerKey"), "oversized k stays on the spilling sort")
  }

  test("streaming incremental merge+dedup equals batch distinct") {
    val store = Files.createTempDirectory("graft_inc").toString + "/store"
    val stream = Streams.eventsStream(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"),
        date_format(col("ts"), "yyyy_MM").as("ym"))
    Streams.incrementalMergeDedup(stream, store, "ym")
    val stored = spark.read.parquet(store)
    assert(stored.count() === 1000)
    assert(stored.select("event_id").distinct().count() === 1000)
  }
}
