package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion operators over retrieval results — the glue between
  * the lexical ([[graft.functions.TextAnalysis.bm25TopK]]) and
  * semantic ([[Vectors.cosineTopK]] / ANN) sides of a hybrid
  * retrieval stack.
  */
object Retrieval {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009), the
    * standard hybrid-search combiner: each input ranking contributes
    * `1 / (kRrf + rank)` per (query, doc) and the fused top-`k` is
    * taken over the summed score. Score-scale-free — only RANKS cross
    * the fusion boundary, so BM25 scores and cosines (incomparable
    * units) never mix, which is exactly why RRF is the default fusion
    * in production hybrid stacks. `kRrf = 60` is the paper's constant.
    *
    * Shape at 100 TB: inputs are top-k lists — each is ≤ k·|queries|
    * rows BY CONSTRUCTION, a sliver regardless of corpus size — so
    * fusion is one union + one hash aggregate on (query, doc) + the
    * bounded-heap [[graft.plans.TopK]] selection. The rank window runs
    * on ≤ k·|queries| pre-pruned rows, never the corpus.
    *
    * Determinism: contributions are quantized to fixed-point
    * nano-units (`round(10⁹/(kRrf+rank))` as long — rank is an exact
    * integer, so the quantized contribution is a pure function of
    * rank) BEFORE the sum; ordering uses the exact integer sum with a
    * doc-id tie-break. `rrf` is the nano-sum / 10⁹ rounded to 6.
    *
    * Every input must carry `(queryCol, idCol, rankCol)`; ranks
    * start at 1 (the contract of every top-k in this library).
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60,
              queryCol: String = "query_id", idCol: String = "doc_id",
              rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    val contribs = rankings.map(_.select(
      col(queryCol).as("query_id"), col(idCol).as("doc_id"),
      round(lit(1.0e9) / (lit(kRrf) + col(rankCol)), 0)
        .cast("long").as("lq")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy("query_id", "doc_id").agg(sum(col("lq")).as("s"))
    val pruned = graft.plans.TopK.perKey(fused, Seq(col("query_id")),
      Seq(col("s").desc, col("doc_id")), k)
    val w = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("doc_id"),
        round(col("s").cast("double") / 1.0e9, 6).as("rrf"), col("rank"))
  }
}
