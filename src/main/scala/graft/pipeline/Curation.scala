package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.TextAnalysis

/** End-to-end corpus curation — the composition a training-data
  * pipeline actually runs over 100 TB of raw text:
  *
  *   quality gate → exact dedup → near-dup removal → surviving corpus
  *
  * Every stage is the library's own operator: quality metrics are
  * codegen'd column expressions, exact dedup is a fingerprint groupBy,
  * near-dup pairs come from the PPJoin-filtered Jaccard join (swap in
  * `Dedup.fuzzy` for the MinHash-LSH variant at extreme scale). The
  * survivor rule is deterministic: the smallest doc_id of every
  * duplicate cluster/pair wins.
  */
object Curation {

  def curate(docs: DataFrame, minChars: Int, maxStopwordRatio: Double,
             stopwords: Seq[String], jaccardThreshold: Double,
             useLsh: Boolean = false): DataFrame = {
    val metrics = TextAnalysis.qualityMetrics(col("text"), stopwords).toMap
    val quality = docs
      .withColumn("n_chars", metrics("n_chars"))
      .withColumn("stopword_ratio", metrics("stopword_ratio"))
      .filter(col("n_chars") >= minChars &&
        col("stopword_ratio") <= maxStopwordRatio)

    // exact dedup: survivors are each fingerprint's minimal doc_id
    // (quality feeds three DAG branches — cache it; the production
    // analogue is a materialized quality-filtered table)
    quality.cache()
    val canonical = Dedup.exact(quality)
      .select(col("canonical_id").as("doc_id"))
    val exactDeduped = quality.join(canonical, "doc_id").cache()

    // near-dup removal: drop the larger id of every qualifying pair
    val pairs =
      if (useLsh) Dedup.fuzzy(exactDeduped, jaccardThreshold)
      else Dedup.jaccardPairs(exactDeduped, jaccardThreshold)
    val losers = pairs.select(col("doc_b").as("doc_id")).distinct()
    exactDeduped.join(losers, Seq("doc_id"), "left_anti")
  }
}
