package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** The fused Hash60Expr must be bit-identical to the built-in
  * composition (and therefore to the DuckDB oracle rule) on every
  * input class: ascii, unicode, empty, long strings, numbers-as-text.
  */
class Hash60Spec extends SparkSpec {

  test("native hash60 == conv(substr(md5)) composition, all input classes") {
    import spark.implicits._
    val inputs = Seq(
      "", "a", "the quick brown fox", "héllo wörld ünïcode ✓",
      "0", "-123456789", " leading and trailing ", "\ttabs\nnewlines",
      "x" * 10000) ++ (0 until 1000).map(i => s"doc $i token$i")
    val df = inputs.toDF("s").select(
      TextAnalysis.hash60(col("s")).as("fused"),
      TextAnalysis.hash60Hof(col("s")).as("composed"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
      s"divergence on some input: ${r.getLong(0)} vs ${r.getLong(1)}"))
    // range contract: 60 bits, never negative
    assert(rows.forall(r => r.getLong(0) >= 0L && r.getLong(0) < (1L << 60)))
  }

  test("hash60Array == transform(hash60) and native shingles == HOF " +
    "shingles on a real table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
    val cmp = docs.select(
      TextAnalysis.hash60Array(TextAnalysis.wordShinglesOfNative(col("w"), 3))
        .as("fused"),
      transform(TextAnalysis.wordShinglesOf(col("w"), 3),
        s => TextAnalysis.hash60Hof(s)).as("composed"))
    assert(cmp.filter(col("fused") =!= col("composed")).count() === 0)
    // short docs: fewer tokens than n -> both forms give empty arrays
    import spark.implicits._
    val tiny = Seq(Seq("a"), Seq.empty[String]).toDF("w")
    val t = tiny.select(
      size(TextAnalysis.wordShinglesOfNative(col("w"), 3)).as("a"),
      size(TextAnalysis.wordShinglesOf(col("w"), 3)).as("b")).collect()
    t.foreach(r => assert(r.getInt(0) === 0 && r.getInt(1) === 0))
  }

  test("hash60Array propagates null elements like the transform form") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      TextAnalysis.hash60Array(
        array(lit("a"), lit(null).cast("string"), lit("b"))).as("fused"),
      transform(array(lit("a"), lit(null).cast("string"), lit("b")),
        s => TextAnalysis.hash60Hof(s)).as("composed"))
    val r = df.collect().head
    assert(r.getSeq[Any](0) === r.getSeq[Any](1))
    assert(r.getSeq[Any](0)(1) === null, "null in -> null out")
  }

  test("native hash60 survives whole-stage codegen over a real table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      TextAnalysis.hash60(col("text")).as("fused"),
      TextAnalysis.hash60Hof(col("text")).as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() === 0)
  }
}
