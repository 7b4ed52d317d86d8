package graft

import org.apache.spark.sql.functions._
import graft.similarity.Vectors

/** Product quantization: deterministic grouped-Lloyd codebooks,
  * corpus encoding, and ADC top-k from codes alone.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val dims = 8
  private val m = 2
  // six distinct vectors whose subvectors are pairwise distinct
  private def corpus = Seq(
    (0L, Array(0f, 0f, 0f, 1f, 9f, 0f, 0f, 0f)),
    (1L, Array(0f, 0f, 1f, 0f, 0f, 9f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f, 0f, 0f, 9f, 0f)),
    (3L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 9f)),
    (4L, Array(5f, 5f, 0f, 0f, 3f, 3f, 0f, 0f)),
    (5L, Array(0f, 0f, 5f, 5f, 0f, 0f, 3f, 3f))
  ).toDF("vec_id", "embedding")

  test("ksub = n makes PQ exact: ADC top-k equals brute-force L2 top-k") {
    val cb = Vectors.trainPqCodebooks(corpus, m, ksub = 6, dims = dims,
      iters = 2)
    val codes = Vectors.encodePq(corpus, cb, m, dims)
    // every subvector is its own codeword -> encoding reconstructs
    // exactly and ADC distance IS the true squared L2
    val got = Vectors.pqTopK(codes, cb, corpus.filter(col("vec_id") < 2),
      k = 3, m = m, ksub = 6, dims = dims)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val c = corpus.select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("v"))
    val q = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"),
        Vectors.toDouble(col("embedding")).as("qv"))
    val brute = c.crossJoin(q)
      .select(col("query_id"), col("vec_id"),
        round(Vectors.l2Sq(col("qv"), col("v")), 6).as("dist"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rank") <= 3).orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === brute.toSeq)
    // self is nearest at distance zero
    assert(got(0) === ((0L, 0L, 0.0)))
  }

  test("codes are m ints in [0, ksub); training is deterministic") {
    val cb = Vectors.trainPqCodebooks(corpus, m, ksub = 3, dims = dims)
    val codes = Vectors.encodePq(corpus, cb, m, dims).collect()
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === m)
      assert(cs.forall(c => c >= 0 && c < 3))
    }
    val cb2 = Vectors.trainPqCodebooks(corpus, m, ksub = 3, dims = dims)
    assert(cb.orderBy("j", "code").collect().toSeq ===
      cb2.orderBy("j", "code").collect().toSeq)
  }

  test("ADC tolerates non-contiguous surviving codes (map LUT, not positional)") {
    // hand-built codebooks with a hole at code 1 (dropped empty
    // codeword): lookups must still resolve through the map
    val cb = Seq(
      (0, 0, Array(0.0, 0.0, 0.0, 0.0)),
      (0, 2, Array(5.0, 5.0, 0.0, 0.0)),
      (1, 0, Array(9.0, 0.0, 0.0, 0.0)),
      (1, 2, Array(3.0, 3.0, 0.0, 0.0))).toDF("j", "code", "c")
    val codes = Seq((0L, Array(0, 0)), (1L, Array(2, 2)))
      .toDF("vec_id", "codes")
    val got = Vectors.pqTopK(codes, cb,
      corpus.filter(col("vec_id") === 4), k = 2, m = m, ksub = 3,
      dims = dims).orderBy("rank").collect()
    assert(got.length === 2)
    // vec 1 (codes 2,2 -> reconstruction (5,5,0,0,3,3,0,0)) IS query 4
    assert(got(0).getLong(1) === 1L && got(0).getDouble(2) === 0.0)
  }

  test("ADC serving plan never touches the embeddings: codes scan + broadcast LUT + bounded heap") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = Vectors.trainPqCodebooks(emb, 4, 8, 64).localCheckpoint()
    val codes = Vectors.encodePq(emb, cb, 4, 64).localCheckpoint()
    val p = Vectors.pqTopK(codes, cb, emb.filter(col("vec_id") < 5),
      5, 4, 8, 64).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // exactly one file scan — the bounded QUERY set; the corpus side
    // is served from the checkpointed codes table
    val scans = "FileScan".r.findAllIn(p).size
    assert(scans <= 1, s"corpus must be served from codes, not files:\n$p")
  }

  test("IVF-PQ probing all clusters reduces to flat PQ; nprobe=1 prunes to the query's cluster") {
    val cen = corpus.filter(col("vec_id") < 2)
    val cb = Vectors.trainPqCodebooks(corpus, m, ksub = 6, dims = dims,
      iters = 2)
    val assign = Vectors.ivfAssignL2(corpus, cen)
    val codes = Vectors.encodePq(corpus, cb, m, dims)
    val withCluster = codes.join(assign, "vec_id")
    val queries = corpus.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // nprobe = all clusters: identical to the flat scan
    val all = rows(Vectors.ivfPqTopK(withCluster, cb, cen, queries,
      k = 6, nprobe = 2, m = m, ksub = 6, dims = dims))
    val flat = rows(Vectors.pqTopK(codes, cb, queries, k = 6, m = m,
      ksub = 6, dims = dims))
    assert(all === flat)
    // nprobe = 1: every result's cluster is the query's own cluster
    val one = Vectors.ivfPqTopK(withCluster, cb, cen, queries,
      k = 6, nprobe = 1, m = m, ksub = 6, dims = dims)
      .join(assign, "vec_id")
      .join(assign.select(col("vec_id").as("query_id"),
        col("cluster").as("qcluster")), "query_id")
    assert(one.filter(col("cluster") =!= col("qcluster")).count() === 0L)
    assert(one.count() < 12L) // strictly fewer than the 2q x 6 flat scan
  }

  test("stored IVF-PQ index serves identically and prunes partitions") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cen = emb.filter(col("vec_id") < 8)
    val idx = graft.io.Scratch.dir("graft_pqspec_idx_").toString
    Vectors.buildIvfPqIndex(emb, cen, idx, m = 4, ksub = 8, dims = 64)
    val queries = emb.filter(col("vec_id") < 3)
    val served = Vectors.ivfPqTopKIndexed(spark, idx, queries, k = 5,
      nprobe = 2)
    // identical to the in-memory composition over the same inputs
    val cb = Vectors.trainPqCodebooks(emb, 4, 8, 64)
    val codes = Vectors.encodePq(emb, cb, 4, 64)
      .join(Vectors.ivfAssignL2(emb, cen), "vec_id")
    val mem = Vectors.ivfPqTopK(codes, cb, cen, queries, k = 5,
      nprobe = 2, m = 4, ksub = 8, dims = 64)
    assert(served.orderBy("query_id", "rank").collect().toSeq ===
      mem.orderBy("query_id", "rank").collect().toSeq)
    // the codes scan must prune to the probed clusters' PARTITIONS
    val p = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(p)
      .isDefined, p)
  }

  test("refined PQ: full-corpus shortlist equals exact brute-force L2; shortlist < k refuses") {
    // a COARSE quantizer (ksub=2) whose ADC ranking genuinely errs —
    // refinement with shortlist = |corpus| must still return the
    // EXACT brute-force answer, because every candidate gets an exact
    // distance and the quantized ranking only chose the (complete)
    // shortlist
    val cb = Vectors.trainPqCodebooks(corpus, m, ksub = 2, dims = dims)
    val codes = Vectors.encodePq(corpus, cb, m, dims)
    val queries = corpus.filter(col("vec_id") < 2)
    val got = Vectors.pqTopKRefined(codes, cb, corpus, queries, k = 3,
      shortlist = 6, m = m, ksub = 2, dims = dims)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val c = corpus.select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("v"))
    val q = queries.select(col("vec_id").as("query_id"),
      Vectors.toDouble(col("embedding")).as("qv"))
    val brute = c.crossJoin(q)
      .select(col("query_id"), col("vec_id"),
        round(Vectors.l2Sq(col("v"), col("qv")), 6).as("dist"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dist"), col("vec_id"))))
      .filter(col("rank") <= 3).orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === brute.toSeq)
    // the refined distances are EXACT (self at 0.0), even though the
    // ksub=2 ADC distances are not
    assert(got(0)._3 === 0.0)
    val e = intercept[IllegalArgumentException](
      Vectors.pqTopKRefined(codes, cb, corpus, queries, k = 5,
        shortlist = 3, m = m, ksub = 2, dims = dims))
    assert(e.getMessage.contains("shortlist"), e.getMessage)
  }

  test("m must divide dims; oversized query sets refuse") {
    val e = intercept[IllegalArgumentException](
      Vectors.trainPqCodebooks(corpus, 3, 2, dims))
    assert(e.getMessage.contains("divide"), e.getMessage)
  }
}
