package graft

import org.apache.spark.sql.functions._
import graft.similarity.Vectors

/** Micro-benchmark for the native fused expressions vs the composed
  * higher-order-function forms (`sbt "runMain graft.MicroBench"`).
  * Not part of the driver contract.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-microbench")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 500)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))

    def time(label: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    time("fused") {
      pairs.select(Vectors.cosine(col("qv"), col("v")).as("c"))
        .filter(col("c") > 2.0).count() // count() keeps all rows scored
    }
    time("hof") {
      pairs.select(Vectors.cosineHof(col("qv"), col("v")).as("c"))
        .filter(col("c") > 2.0).count()
    }

    // top-10-per-key: full window sort vs bounded heap (the shape
    // TopKRewriteRule targets). 5M rows / 100k groups, in-memory.
    import spark.implicits._
    val big = spark.range(5000000L)
      .select((col("id") % 100000L).as("grp"), col("id"),
        ((col("id") * 2654435761L) % 1000003L).as("score"))
      .cache()
    big.count() // materialize
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score"), col("id"))
    time("win-sort") {
      big.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10).drop("rn").count()
    }
    time("heap-topk") {
      graft.plans.TopK.perKey(big, Seq(col("grp")),
        Seq(col("score"), col("id")), 10).count()
    }
    big.unpersist()

    // text hot path: native WordShinglesExpr / Hash60ArrayExpr vs
    // their pure-built-in reference compositions (kept in the library
    // as cross-implementation checks) — the corpus-scan shapes every
    // dedup query runs first.
    import graft.functions.TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(TextAnalysis.tokens(col("text")).as("w")).cache()
    docs.count() // materialize
    time("shingle-gen") {
      docs.select(explode(
        TextAnalysis.wordShinglesOfNative(col("w"), 3)).as("s")).count()
    }
    time("shingle-hof") {
      docs.select(explode(
        TextAnalysis.wordShinglesOf(col("w"), 3)).as("s")).count()
    }
    time("hash-gen") {
      docs.select(explode(TextAnalysis.hash60Array(col("w"))).as("h"))
        .filter(col("h") >= 0L).count()
    }
    time("hash-hof") {
      docs.select(explode(transform(col("w"),
          s => TextAnalysis.hash60Hof(s))).as("h"))
        .filter(col("h") >= 0L).count()
    }
    docs.unpersist()
    spark.stop()
  }
}
