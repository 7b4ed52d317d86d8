package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.Conform

/** The generalized r8 lesson: EVERY table reader must conform whatever
  * physical schema arrives to the engine's logical contract — not just
  * `events.ts`. This spec writes drifted fixtures (narrow ids, wide
  * embeddings, string-typed numerics, re-encoded dates) and drives
  * them through `Tables.t` and the streaming sources, pinning:
  * value-preserving drift conforms silently, lossy drift fails on the
  * first bad VALUE, semantic drift fails at PLAN time, and the
  * no-drift path is plan-identical (free).
  */
class ConformSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Stage a single-file parquet table under a fresh temp dir. */
  private def stage(df: DataFrame, table: String): String = {
    val dir = Files.createTempDirectory(s"graft_conform_$table")
    graft.io.Scratch.stageSingleParquetFile(df, dir, s"$table.parquet")
    dir.toString
  }

  test("no-drift read returns the untouched DataFrame (plan purity)") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
    assert(Conform.conform(df, Conform.contracts("documents"),
      "documents") eq df)
  }

  test("narrow ids conform to the contract losslessly") {
    val canon = Tables.t(spark, sf, "documents")
    val drifted = stage(canon.select(
      col("doc_id").cast(IntegerType).as("doc_id"), col("text"),
      col("lang"), col("source"),
      col("n_chars").cast(IntegerType).as("n_chars")), "documents")
    val got = Tables.t(spark, drifted, "documents")
    assert(got.schema === StructType(Conform.contracts("documents")
      .map(f => StructField(f.name, f.dataType, nullable = true))))
    assert(got.orderBy("doc_id").collect().toSeq ===
      canon.orderBy("doc_id").collect().toSeq)
  }

  test("wide embeddings (float64 array, int64 label) conform back") {
    val canon = Tables.t(spark, sf, "embeddings")
    val drifted = stage(canon.select(
      col("vec_id").cast(IntegerType).as("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("embedding"),
      col("label").cast(LongType).as("label")), "embeddings")
    val got = Tables.t(spark, drifted, "embeddings")
    assert(got.schema("embedding").dataType === ArrayType(FloatType))
    assert(got.schema("label").dataType === IntegerType)
    assert(got.orderBy("vec_id").collect().toSeq ===
      canon.orderBy("vec_id").collect().toSeq)
  }

  test("integral narrowing raises on the first overflowing value") {
    val canon = Tables.t(spark, sf, "embeddings")
    val drifted = stage(canon.select(col("vec_id"), col("embedding"),
      (col("label").cast(LongType) +
        when(col("vec_id") === 7, lit(1L << 40)).otherwise(lit(0L)))
        .as("label")), "embeddings")
    val got = Tables.t(spark, drifted, "embeddings")
    val e = intercept[Exception](got.collect())
    assert(e.getMessage.contains("overflows"), e.getMessage)
  }

  test("semantic drift (string where the contract is numeric) refuses at plan time") {
    val canon = Tables.t(spark, sf, "documents")
    val drifted = stage(canon.withColumn(
      "n_chars", col("n_chars").cast(StringType)), "documents")
    val e = intercept[IllegalStateException](
      Tables.t(spark, drifted, "documents"))
    assert(e.getMessage.contains("documents.n_chars"), e.getMessage)
  }

  test("missing contract column refuses at plan time; extras are dropped") {
    val canon = Tables.t(spark, sf, "documents")
    val missing = stage(canon.drop("lang"), "documents")
    val e = intercept[IllegalStateException](
      Tables.t(spark, missing, "documents"))
    assert(e.getMessage.contains("lang"), e.getMessage)

    val extra = stage(canon.withColumn("added_later", lit(1)), "documents")
    val got = Tables.t(spark, extra, "documents")
    assert(got.columns.toSeq === Conform.contracts("documents")
      .fieldNames.toSeq)
  }

  test("date-encoded and UTC-instant-encoded civil dates conform to NTZ") {
    val canon = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    // writer A stored DATE (midnight expected); writer B stored an
    // UTC-adjusted instant of the same wall time
    val asDate = stage(Tables.t(spark, sf, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast(DateType)),
      "lineitem")
    val gotDate = Tables.t(spark, asDate, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    val wantMidnight = canon
      .withColumn("l_shipdate",
        col("l_shipdate").cast(DateType).cast(TimestampNTZType))
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(gotDate.schema("l_shipdate").dataType === TimestampNTZType)
    assert(gotDate.orderBy("l_orderkey", "l_linenumber").collect().toSeq
      === wantMidnight)

    val asInstant = stage(Tables.t(spark, sf, "lineitem")
      .withColumn("l_shipdate", col("l_shipdate").cast(TimestampType)),
      "lineitem")
    val gotInstant = Tables.t(spark, asInstant, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    assert(gotInstant.schema("l_shipdate").dataType === TimestampNTZType)
    assert(gotInstant.orderBy("l_orderkey", "l_linenumber").collect()
      .toSeq ===
      canon.orderBy("l_orderkey", "l_linenumber").collect().toSeq)
  }

  test("streaming docs source conforms a drifted file (int32 ids)") {
    import org.apache.spark.sql.streaming.OutputMode
    val canon = Tables.t(spark, sf, "documents")
    val drifted = stage(canon.select(
      col("doc_id").cast(IntegerType).as("doc_id"), col("text"),
      col("lang"), col("source"),
      col("n_chars").cast(IntegerType).as("n_chars")), "documents")
    val stream = graft.streaming.Streams.docsStream(spark, drifted)
      .groupBy().agg(count(lit(1)).as("n"), sum("n_chars").as("s"),
        max("doc_id").as("m"))
    val got = graft.streaming.Streams.runToTable(
      stream, "conform_docs_stream", OutputMode.Complete()).collect()(0)
    val want = canon.groupBy().agg(count(lit(1)).as("n"),
      sum("n_chars").as("s"), max("doc_id").as("m")).collect()(0)
    assert(got === want)
  }
}
