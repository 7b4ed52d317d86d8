package graft

import org.apache.spark.sql.functions._
import graft.similarity.Vectors

/** The fused native cosine expression must be bit-identical to the
  * composed-built-ins form on real data (same fold order), and must
  * stay inside whole-stage codegen.
  */
class CosineExprSpec extends SparkSpec {

  private lazy val pairs = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(col("a.vec_id"), col("b.vec_id"),
        Vectors.cosine(col("a.v"), col("b.v")).as("fused"),
        Vectors.cosineHof(col("a.v"), col("b.v")).as("hof"))
  }

  test("fused == built-in composition, bit for bit") {
    val diff = pairs.filter(col("fused") =!= col("hof")).count()
    assert(diff === 0)
  }

  test("interpreted eval == codegen eval") {
    // force interpreted path by evaluating through a filter on a
    // literal-only projection collected twice; cheap sanity on a row
    import spark.implicits._
    val r = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b")).as("c"),
        Vectors.cosineHof(col("a"), col("b")).as("h"))
      .head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(math.abs(r.getDouble(0) - 10.0 / 14.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen") {
    // fused-only projection: the HOF composition is a CodegenFallback
    // and would disable codegen for any projection containing it —
    // precisely why the native expression exists
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // exchange-free shape so the pre-execution plan already shows the
    // codegen span (AQE finalizes exchange-bearing plans lazily)
    val fusedOnly = e.select(
      Vectors.cosine(col("embedding"), col("embedding")).as("c"))
    val plan = fusedOnly.queryExecution.executedPlan.toString
    // the leading `*(n)` marks a WholeStageCodegen stage in the
    // compact plan string
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_cosine.*"),
      plan)
  }
}
