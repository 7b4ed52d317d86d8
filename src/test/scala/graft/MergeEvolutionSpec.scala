package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots
import graft.io.Snapshots.{WhenMatchedUpdate, WhenNotMatchedInsert, src}

/** MERGE schema evolution (Delta's withSchemaEvolution): clause
  * columns missing from the target become fresh nullable columns in
  * the merge commit — untouched files read NULL for them, inserts
  * and updates fill them, and the refusal stays loud without the
  * explicit opt-in.
  */
class MergeEvolutionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, sf, "documents")
  private def newStore: String =
    Files.createTempDirectory("graft_mev").toString + "/tbl"

  test("evolve=false keeps the loud refusal") {
    val path = newStore
    Snapshots.commit(docs, path)
    val source = docs.limit(3)
      .select(col("doc_id"), lit(0.9).as("quality"))
    val e = intercept[IllegalArgumentException](
      Snapshots.mergeInto(spark, path, source, Seq("doc_id" -> "doc_id"),
        matched = Seq(WhenMatchedUpdate(None,
          Seq("quality" -> src("quality"))))))
    assert(e.getMessage.contains("SCHEMA EVOLUTION"), e.getMessage)
  }

  test("evolve=true: update fills a new column on matches, old rows read NULL, inserts carry it") {
    val path = newStore
    Snapshots.commit(docs, path)
    val source = docs.filter(col("doc_id") < 5)
      .select(col("doc_id"),
        (col("doc_id") * 10).cast("double").as("quality"))
      .unionByName(spark.range(9000001L, 9000003L)
        .select(col("id").as("doc_id"),
          lit(-1.0).as("quality")))
    Snapshots.mergeInto(spark, path, source, Seq("doc_id" -> "doc_id"),
      matched = Seq(WhenMatchedUpdate(None,
        Seq("quality" -> src("quality")))),
      notMatched = Seq(WhenNotMatchedInsert(None,
        Seq("doc_id" -> src("doc_id"), "quality" -> src("quality")))),
      evolve = true)
    val out = Snapshots.read(spark, path)
    assert(out.schema("quality").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // matched rows got values, unmatched target rows read NULL
    assert(out.filter(col("doc_id") === 2L).select("quality")
      .head.getDouble(0) === 20.0)
    assert(out.filter(col("doc_id") === 100L).select("quality")
      .head.isNullAt(0))
    // inserted rows carry the new column (and NULL legacy columns)
    assert(out.filter(col("doc_id") === 9000001L).select("quality")
      .head.getDouble(0) === -1.0)
    assert(out.count() === docs.count() + 2)
    // time travel: v1 keeps the pre-evolution schema
    assert(!Snapshots.read(spark, path, Some(1L)).columns
      .contains("quality"))
  }

  test("evolution typing: clauses disagreeing on a type refuse; bare NULL refuses; widening reconciles") {
    val path = newStore
    Snapshots.commit(docs, path)
    val source = docs.limit(3).select(col("doc_id"),
      lit(1).as("i"), lit(5L).as("l"))
    val e = intercept[IllegalArgumentException](
      Snapshots.mergeInto(spark, path, source, Seq("doc_id" -> "doc_id"),
        matched = Seq(WhenMatchedUpdate(None,
          Seq("extra" -> src("i")))),
        notMatched = Seq(WhenNotMatchedInsert(None,
          Seq("doc_id" -> src("doc_id"),
            "extra" -> concat(src("l").cast("string"), lit("x"))))),
        evolve = true))
    assert(e.getMessage.contains("both"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Snapshots.mergeInto(spark, path, source, Seq("doc_id" -> "doc_id"),
        matched = Seq(WhenMatchedUpdate(None,
          Seq("extra" -> lit(null)))),
        evolve = true))
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
    // int in one clause, long in another -> widens to long
    Snapshots.mergeInto(spark, path, source, Seq("doc_id" -> "doc_id"),
      matched = Seq(WhenMatchedUpdate(None, Seq("extra" -> src("i")))),
      notMatched = Seq(WhenNotMatchedInsert(None,
        Seq("doc_id" -> src("doc_id"), "extra" -> src("l")))),
      evolve = true)
    assert(Snapshots.read(spark, path).schema("extra").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  // Spark's analyzer rule (ResolveMergeIntoSchemaEvolution) fires for
  // tables declaring AUTOMATIC_SCHEMA_EVOLUTION and lowers the new
  // source columns onto TableCatalog.alterTable (our metadata-only
  // ADD COLUMNS commit) before resolving the merge - the star forms
  // (UPDATE SET * / INSERT *) are the SQL evolution surface, exactly
  // as in Delta's autoMerge.
  test("SQL: MERGE WITH SCHEMA EVOLUTION INTO a catalog table") {
    val wh = Files.createTempDirectory("graft_mev_cat").toString
    val cat = s"gmev${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (doc_id BIGINT, text STRING, " +
      "lang STRING, source STRING, n_chars BIGINT)")
    docs.createOrReplaceTempView("graft_mev_target_src")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM graft_mev_target_src")
    docs.filter(col("doc_id") < 4)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), lit(0.5).cast("double").as("quality"))
      .createOrReplaceTempView("graft_mev_updates")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.t t
         USING graft_mev_updates u ON t.doc_id = u.doc_id
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""")
    val out = spark.sql(s"SELECT doc_id, quality FROM $cat.db.t")
    assert(out.schema("quality").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(out.filter(col("doc_id") === 1L).head.getDouble(1) === 0.5)
    assert(out.filter(col("doc_id") === 100L).head.isNullAt(1))
    // and WITHOUT the clause the refusal survives
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.db.t t
         USING graft_mev_updates u ON t.doc_id = u.doc_id
         WHEN MATCHED THEN UPDATE SET t.extra2 = u.quality"""))
    assert(e.getMessage.toLowerCase.contains("extra2"), e.getMessage)
  }
}
