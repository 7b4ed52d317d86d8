package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, MinHashAgg}
import graft.functions.TextAnalysis

/** The mergeable MinHash Aggregator must produce exactly the
  * array-formulated signatures, and its merge must be order-invariant.
  */
class MinHashAggSpec extends SparkSpec {

  private val K = 8

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "totally unrelated words appear in here instead"))
      .toDF("doc_id", "text")
  }

  test("aggregator signatures == array-transform signatures") {
    import spark.implicits._
    val viaAgg = docs
      .select(col("doc_id"), explode(array_distinct(
        TextAnalysis.wordShingles(col("text"), 3))).as("s"))
      .select(col("doc_id"),
        (TextAnalysis.hash60(col("s")) % Dedup.P).as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new MinHashAgg(K).toColumn.name("sig"))
      .collect().toMap
    val viaArray = Dedup.minhashSignatures(docs, K).collect()
      .map(r => r.getLong(0) -> (1 to K).map(r.getLong).toSeq).toMap
    assert(viaAgg.view.mapValues(_.toSeq).toMap === viaArray)
  }

  test("merge is commutative; estimator behaves") {
    val a = new MinHashAgg(K)
    val s1 = Seq(11L, 22L, 33L).foldLeft(a.zero.clone())(a.reduce)
    val s2 = Seq(44L, 55L).foldLeft(a.zero.clone())(a.reduce)
    val m12 = a.merge(s1.clone(), s2.clone()).toSeq
    val m21 = a.merge(s2.clone(), s1.clone()).toSeq
    assert(m12 === m21)
    val all = Seq(11L, 22L, 33L, 44L, 55L).foldLeft(a.zero.clone())(a.reduce)
    assert(m12 === all.toSeq, "merged partials == single-pass sketch")
    assert(MinHashAgg.estimateJaccard(all.toSeq, all.toSeq) === 1.0)
  }
}
