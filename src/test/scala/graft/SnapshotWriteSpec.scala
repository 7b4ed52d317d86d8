package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** DSv2 write path ([[graft.io.GraftCatalog]]'s
  * `RequiresDistributionAndOrdering` + overwrite contracts): Spark's
  * write planner clusters the incoming batch by the table's own
  * transforms, so an `INSERT INTO` a bucketed table lands ONE file
  * per bucket in one Spark-planned shuffle (not task-count × bucket
  * files), and every overwrite shape — truncate, static-partition /
  * filter, dynamic — is a single atomic manifest claim.
  */
class SnapshotWriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_write").toString
    val name = s"gwr${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  private def dataFiles(tbl: String): Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).toSeq.flatten.flatMap(f =>
        if (f.isDirectory) walk(f) else Seq(f))
    walk(new java.io.File(s"$tbl/data"))
      .filter(_.getName.endsWith(".parquet"))
  }

  test("INSERT INTO a bucketed table lands ONE file per bucket (clustered write, not task-count x buckets)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.b (o_orderkey BIGINT, " +
      "o_custkey BIGINT) PARTITIONED BY (bucket(8, o_custkey))")
    // 16 source partitions: an UNclustered insert would write up to
    // 16 x 8 files (one per task per bucket dir); the committer's
    // clustering shuffle routes each bucket to ONE task
    Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").repartition(16)
      .createOrReplaceTempView("wr_src16")
    spark.sql(s"INSERT INTO $cat.db.b SELECT * FROM wr_src16")
    val files = dataFiles(s"$wh/db/b")
    assert(files.nonEmpty && files.size <= 8,
      s"expected <=8 bucket-aligned files, got ${files.size}: " +
        files.map(_.getParentFile.getName).distinct.mkString(","))
    // every bucket directory holds exactly one file
    val perDir = files.groupBy(_.getParentFile.getName)
    perDir.foreach { case (dir, fs) =>
      assert(fs.size === 1, s"$dir has ${fs.size} files")
    }
    // rows intact
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.b").head.getLong(0)
      === Tables.t(spark, sf, "orders").count())
  }

  test("write-then-SPJ loop: two freshly inserted bucketed tables join Exchange-free") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.o (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.db.c (k BIGINT, s STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    Tables.t(spark, sf, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
      .createOrReplaceTempView("wr_o_src")
    Tables.t(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("s"))
      .createOrReplaceTempView("wr_c_src")
    spark.sql(s"INSERT INTO $cat.db.o SELECT * FROM wr_o_src")
    spark.sql(s"INSERT INTO $cat.db.c SELECT * FROM wr_c_src")
    val olds = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      .map { case (k, v) =>
        val o = spark.conf.getOption(k); spark.conf.set(k, v); k -> o
      }
    try {
      val j = spark.sql(s"SELECT o.k AS k, o.v AS v, c.s AS s " +
        s"FROM $cat.db.o o JOIN $cat.db.c c ON o.k = c.k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"freshly written tables did not SPJ:\n$plan")
      assert(j.count() === Tables.t(spark, sf, "orders").count())
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("INSERT OVERWRITE PARTITION (static): only the named partition's rows are replaced, one commit") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.d (doc_id BIGINT, " +
      "n_chars BIGINT, lang STRING) PARTITIONED BY (lang)")
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars", "lang")
    docs.createOrReplaceTempView("wr_docs_src")
    spark.sql(s"INSERT INTO $cat.db.d SELECT * FROM wr_docs_src")
    val vBefore = Snapshots.latestVersion(spark, s"$wh/db/d").get
    spark.sql(s"INSERT OVERWRITE $cat.db.d PARTITION (lang = 'en') " +
      "SELECT doc_id + 9000000, n_chars " +
      "FROM wr_docs_src WHERE lang = 'en' AND doc_id % 2 = 0")
    // exactly ONE new version
    assert(Snapshots.latestVersion(spark, s"$wh/db/d").get
      === vBefore + 1L)
    val got = spark.sql(
      s"SELECT doc_id, n_chars, lang FROM $cat.db.d")
    val expect = docs.filter(col("lang") =!= "en").unionByName(
      docs.filter(col("lang") === "en" && col("doc_id") % 2 === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"),
          col("n_chars"), col("lang")))
    assert(got.exceptAll(expect).isEmpty &&
      expect.exceptAll(got).isEmpty)
  }

  test("writeTo.overwrite(condition): filter-scoped replace in one commit, untouched files carried") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.w (doc_id BIGINT, " +
      "n_chars BIGINT, lang STRING)")
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars", "lang")
    docs.createOrReplaceTempView("wr_w_src")
    spark.sql(s"INSERT INTO $cat.db.w SELECT * FROM wr_w_src")
    val replacement = docs.filter(col("n_chars") < 300)
      .select((col("doc_id") + 7000000L).as("doc_id"),
        (col("n_chars") * 10).as("n_chars"), col("lang"))
    replacement.writeTo(s"$cat.db.w")
      .overwrite(col("n_chars") < lit(3000L))
    // replacement rows (n_chars*10 >= 3000 only when >=300... all
    // land) replace exactly the matching originals
    val got = spark.sql(s"SELECT doc_id, n_chars, lang FROM $cat.db.w")
    val expect = docs.filter(coalesce(col("n_chars") >= 3000L,
        lit(true)))
      .unionByName(replacement)
    assert(got.exceptAll(expect).isEmpty &&
      expect.exceptAll(got).isEmpty,
      s"rows=${got.count()} want=${expect.count()}")
  }

  test("dynamic-partition overwrite: SQL degrades to whole-table (no V1 fallback exec); replacePartitions is the dynamic path") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.dy (doc_id BIGINT, " +
      "n_chars BIGINT, lang STRING) PARTITIONED BY (lang)")
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars", "lang")
    docs.createOrReplaceTempView("wr_dy_src")
    spark.sql(s"INSERT INTO $cat.db.dy SELECT * FROM wr_dy_src")
    // programmatic dynamic overwrite: only the batch's partitions
    // replaced, others untouched, one commit
    val v0 = Snapshots.latestVersion(spark, s"$wh/db/dy").get
    Snapshots.replacePartitions(
      docs.filter(col("lang") === "en")
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("n_chars"), col("lang")), s"$wh/db/dy")
    assert(Snapshots.latestVersion(spark, s"$wh/db/dy").get === v0 + 1)
    val got = spark.sql(s"SELECT doc_id, n_chars, lang FROM $cat.db.dy")
    val expect = docs.filter(col("lang") =!= "en").unionByName(
      docs.filter(col("lang") === "en")
        .select((col("doc_id") + 1000000L).as("doc_id"),
          col("n_chars"), col("lang")))
    assert(got.exceptAll(expect).isEmpty &&
      expect.exceptAll(got).isEmpty)
  }

  test("overwriteWhere refuses untranslatable batches and unknown columns loudly") {
    val path = Files.createTempDirectory("graft_ow").toString + "/t"
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars", "lang")
    Snapshots.commit(docs, path)
    val e = intercept[IllegalArgumentException](
      Snapshots.overwriteWhere(spark, path, col("lang") === "en",
        docs.withColumn("bogus", lit(1))))
    assert(e.getMessage.contains("bogus"))
    // happy path: one commit, predicate-scoped
    val v0 = Snapshots.latestVersion(spark, path).get
    Snapshots.overwriteWhere(spark, path, col("lang") === "en",
      docs.filter(col("lang") === "en").limit(3))
    assert(Snapshots.latestVersion(spark, path).get === v0 + 1)
    assert(Snapshots.read(spark, path).count() ===
      docs.filter(col("lang") =!= "en").count() + 3)
    // nothing-matched overwrite degenerates to a pure append
    val before = Snapshots.read(spark, path).count()
    Snapshots.overwriteWhere(spark, path,
      col("lang") === "no_such_lang", docs.limit(2))
    assert(Snapshots.read(spark, path).count() === before + 2)
  }
}
