package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** DSv2 TableCatalog over snapshot stores: pure-SQL reads, writes,
  * time travel and DDL against the same directories the programmatic
  * API serves — the SQL front door (Delta/Iceberg catalog posture).
  */
class GraftCatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, sf, "documents")

  private def freshCatalog(): String = {
    val wh = Files.createTempDirectory("graft_cat").toString
    val name = s"gcat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  test("SQL round-trip: CREATE, INSERT INTO, SELECT, VERSION AS OF, INSERT OVERWRITE") {
    val cat = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t " +
      "(doc_id BIGINT, text STRING, lang STRING, source STRING, " +
      "n_chars BIGINT)")
    docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("evens")
    docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("odds")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM evens")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM odds")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .collect()(0).getLong(0) === docs.count())
    // filters + pruning arrive through the fallback scan and stay
    // correct (Spark re-applies everything above the relation)
    assert(spark.sql(
      s"SELECT sum(n_chars) FROM $cat.db.t WHERE doc_id % 2 = 0")
      .collect()(0).getLong(0) ===
      docs.filter(col("doc_id") % 2 === 0)
        .agg(sum("n_chars")).collect()(0).getLong(0))
    // time travel: v1 = empty CREATE, v2 = first insert
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t VERSION AS OF 1")
      .collect()(0).getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t VERSION AS OF 2")
      .collect()(0).getLong(0) ===
      docs.filter(col("doc_id") % 2 === 0).count())
    // a TAG resolves as a version string
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    Snapshots.tag(spark, s"$wh/db/t", "halfway", Some(2L))
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.t VERSION AS OF 'halfway'")
      .collect()(0).getLong(0) ===
      docs.filter(col("doc_id") % 2 === 0).count())
    // INSERT OVERWRITE = a new overwrite commit; history survives
    spark.sql(s"INSERT OVERWRITE $cat.db.t SELECT * FROM evens")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t")
      .collect()(0).getLong(0) ===
      docs.filter(col("doc_id") % 2 === 0).count())
    // pre-overwrite history survives (v3 = both inserts)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.t VERSION AS OF 3")
      .collect()(0).getLong(0) === docs.count())
    // the SQL table IS a programmatic snapshot store
    assert(Snapshots.read(spark, s"$wh/db/t").count() ===
      docs.filter(col("doc_id") % 2 === 0).count())
    // SHOW TABLES and DROP TABLE resolve
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).contains("t"))
    spark.sql(s"DROP TABLE $cat.db.t")
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect().isEmpty)
  }

  test("partitioned CREATE defers its first commit; inserts land the declared layout") {
    val cat = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.p " +
      "(doc_id BIGINT, lang STRING) PARTITIONED BY (lang)")
    docs.select("doc_id", "lang").createOrReplaceTempView("dl")
    spark.sql(s"INSERT INTO $cat.db.p SELECT * FROM dl")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    // the layout is real: manifest partition pruning proves on lang
    val (kept, total) = Snapshots.prunedEntriesString(
      spark, s"$wh/db/p", "lang", "en", "en")
    assert(kept.nonEmpty && kept.size < total,
      s"no partition layout: kept ${kept.size} of $total")
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.p WHERE lang = 'en'")
      .collect()(0).getLong(0) ===
      docs.filter(col("lang") === "en").count())
    // appends keep partitioning (a second insert)
    spark.sql(s"INSERT INTO $cat.db.p SELECT doc_id + 100000, lang FROM dl")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.p")
      .collect()(0).getLong(0) === docs.count() * 2)
  }

  test("ALTER TABLE: rename, add and drop columns in SQL, history intact") {
    val cat = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.a (id BIGINT, v BIGINT)")
    spark.sql(s"SELECT 1 AS id, 10 AS v").createOrReplaceTempView("one")
    spark.sql(s"INSERT INTO $cat.db.a SELECT CAST(id AS BIGINT), " +
      "CAST(v AS BIGINT) FROM one")
    spark.sql(s"ALTER TABLE $cat.db.a RENAME COLUMN v TO score")
    assert(spark.sql(s"SELECT score FROM $cat.db.a")
      .collect()(0).getLong(0) === 10L)
    spark.sql(s"ALTER TABLE $cat.db.a ADD COLUMNS (note STRING)")
    assert(spark.sql(s"SELECT note FROM $cat.db.a")
      .collect()(0).isNullAt(0)) // existing rows null-fill
    spark.sql(s"ALTER TABLE $cat.db.a DROP COLUMN score")
    assert(spark.sql(s"SELECT * FROM $cat.db.a").columns.toSeq ===
      Seq("id", "note"))
    // every DDL step is a versioned commit: time travel reads v2's
    // schema (first insert, original names)
    assert(spark.sql(s"SELECT * FROM $cat.db.a VERSION AS OF 2")
      .columns.toSeq === Seq("id", "v"))
    // unsupported changes refuse loudly
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.a ALTER COLUMN id TYPE STRING"))
    assert(e.getMessage.toLowerCase.contains("unsupported") ||
      e.getMessage.toLowerCase.contains("not supported"), e.getMessage)
    // a multi-change statement is ALL-OR-NOTHING: adding one valid
    // and one colliding column commits neither
    val vBefore = Snapshots.latestVersion(spark,
      spark.conf.get(s"spark.sql.catalog.$cat.warehouse") + "/db/a").get
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.db.a ADD COLUMNS (fresh STRING, id STRING)"))
    val wh2 = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    assert(Snapshots.latestVersion(spark, s"$wh2/db/a").get === vBefore,
      "a failed multi-change ALTER must commit nothing")
    assert(!spark.sql(s"SELECT * FROM $cat.db.a").columns.contains("fresh"))
  }

  test("identifiers cannot escape the warehouse; NOT NULL adds refuse") {
    val cat = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    // path-traversal segments refuse everywhere a name touches disk
    val e1 = intercept[Exception](
      spark.sql(s"DROP NAMESPACE $cat.`..` CASCADE"))
    assert(e1.getMessage.contains("illegal identifier"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.db.`../../esc` (id BIGINT)"))
    assert(e2.getMessage.contains("illegal identifier"), e2.getMessage)
    // ADD COLUMN NOT NULL cannot hold (old rows null-fill): refuse,
    // never silently drop the constraint
    spark.sql(s"CREATE TABLE $cat.db.nn (id BIGINT)")
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.db.nn ADD COLUMNS (x BIGINT NOT NULL)"))
    assert(e3.getMessage.contains("NOT NULL"), e3.getMessage)
  }

  test("DELETE FROM and TRUNCATE TABLE commit copy-on-write versions") {
    val cat = freshCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.db")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    Snapshots.commit(docs, s"$wh/db/d")
    spark.sql(s"DELETE FROM $cat.db.d WHERE n_chars < 300")
    val want = docs.filter(!coalesce(col("n_chars") < 300, lit(false)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.d")
      .collect()(0).getLong(0) === want.count())
    // the delete is a versioned commit: v1 still reads complete
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.d VERSION AS OF 1")
      .collect()(0).getLong(0) === docs.count())
    // a DELETE whose predicate cannot translate exactly must refuse
    // at analysis, never partially delete (the lenient scan-path
    // translation would drop the untranslatable conjunct here)
    val nBefore = spark.sql(s"SELECT count(*) FROM $cat.db.d")
      .collect()(0).getLong(0)
    intercept[Exception](spark.sql(
      s"DELETE FROM $cat.db.d WHERE (n_chars = 1 AND text LIKE '%x%') " +
        "OR doc_id = -1"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.d")
      .collect()(0).getLong(0) === nBefore,
      "an untranslatable DELETE must delete nothing")
    spark.sql(s"TRUNCATE TABLE $cat.db.d")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.d")
      .collect()(0).getLong(0) === 0L)
    // schema survives the truncate; history intact
    assert(spark.sql(s"SELECT * FROM $cat.db.d").columns.toSeq ===
      docs.columns.toSeq)
    assert(Snapshots.read(spark, s"$wh/db/d", Some(2L)).count() ===
      want.count())
  }

  test("a table created programmatically reads through SQL, mor deletes and renames included") {
    val cat = freshCatalog()
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val path = s"$wh/db2/t2"
    Snapshots.commit(docs, path)
    Snapshots.deleteWhere(spark, path, col("n_chars") < 300, mode = "mor")
    Snapshots.renameColumn(spark, path, "n_chars", "length")
    val got = spark.sql(s"SELECT sum(length) FROM $cat.db2.t2")
      .collect()(0).getLong(0)
    val want = docs.filter(!coalesce(col("n_chars") < 300, lit(false)))
      .agg(sum("n_chars")).collect()(0).getLong(0)
    assert(got === want)
    // unknown table refuses as a proper analysis error
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(s"SELECT * FROM $cat.db2.nope").collect())
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }
}
