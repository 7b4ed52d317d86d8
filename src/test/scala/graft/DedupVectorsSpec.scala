package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.similarity.Vectors

/** Invariants for dedup + similarity operators. */
class DedupVectorsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat"), // near dup
      (3L, "completely different content with other words"),
      (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 0
      .toDF("doc_id", "text")
  }

  test("exact dedup: canonical id is min, copies counted") {
    val r = Dedup.exact(docs).collect()
      .map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r(0L) === 3L, "doc 0/1/4 collapse to canonical 0 with 3 copies")
    assert(r(2L) === 1L && r(3L) === 1L)
  }

  test("jaccard pairs: identical docs have J=1; threshold respected") {
    val pairs = Dedup.jaccardPairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs((0L, 4L)) === 1.0)
    assert(pairs.contains((0L, 2L)), "near-dup above threshold")
    assert(pairs.values.forall(_ >= 0.5))
    assert(pairs.keys.forall { case (a, b) => a < b })
    assert(!pairs.keys.exists { case (a, b) => b == 3L || a == 3L },
      "unrelated doc never pairs")
  }

  test("minhash: identical docs get identical signatures") {
    val sig = Dedup.minhashSignatures(docs, 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sig(0L) === sig(1L))
    assert(sig(0L) === sig(4L))
    assert(sig(0L) !== sig(3L))
  }

  test("fuzzy dedup: subset of exact jaccard pairs, finds exact dups") {
    val exact = Dedup.jaccardPairs(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fuzzy = Dedup.fuzzy(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fuzzy.subsetOf(exact), "LSH candidates verified by true Jaccard")
    assert(fuzzy.contains((0L, 1L)), "identical docs always collide in LSH")
  }

  test("containment: subset doc found even when Jaccard is tiny") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((0L, short), (1L, long), (2L, "unrelated text entirely " +
      "different tokens throughout")).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(d, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c.contains((0L, 1L)) && c((0L, 1L)) === 1.0,
      "short doc fully contained in long doc")
    assert(!c.contains((1L, 0L)),
      "containment is directed — the long doc is not inside the short")
    assert(!c.keys.exists { case (a, b) => a == 2L || b == 2L })
    // and Jaccard at the same threshold misses the pair entirely
    val j = Dedup.jaccardPairs(d, 0.9).count()
    assert(j === 0L, "symmetric Jaccard cannot see the subset relation")
  }

  test("repetition metrics: hand-checked ratios on a tiny doc") {
    import spark.implicits._
    val d = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = graft.functions.TextAnalysis.repetitionMetrics(d).collect().head
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Double]("ttr") === 0.5)               // {a, b} / 4
    assert(r.getAs[Double]("top_unigram_frac") === 0.75) // "a" 3/4
    assert(r.getAs[Double]("top_bigram_frac") === 2.0 / 3.0) // "a a" 2/3
  }

  test("simhash: identical docs equal, near dups close in Hamming") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(0L), sh(2L)) < hamming(sh(0L), sh(3L)),
      "near dup closer than unrelated doc")
  }

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)), // identical to 0
      (2L, Array(0.9f, 0.1f, 0.0f)), // close to 0
      (3L, Array(0.0f, 0.0f, 1.0f))) // orthogonal to 0
      .toDF("vec_id", "embedding")
  }

  test("cosine top-k: identical vector ranks first, orthogonal last") {
    val r = Vectors.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), 3)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(r.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L, 3L))
    assert(r.head.getAs[Double]("cos") === 1.0)
    assert(r.last.getAs[Double]("cos") === 0.0)
  }

  test("contamination: Bloom fallback path equals the broadcast path") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs"),
      (2L, "the quick brown fox sleeps all day long")).toDF("doc_id", "text")
    val probes = Seq((100L, "quick brown fox")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBroadcast = rows(Dedup.contamination(corpus, probes))
    // ceiling 0 forces the Bloom-prefilter + un-hinted exact join path
    val viaBloom = rows(Dedup.contamination(corpus, probes,
      maxBroadcastShingles = 0L))
    assert(viaBroadcast === viaBloom)
    assert(viaBroadcast === Map(0L -> 1L, 2L -> 1L),
      "docs 0 and 2 contain the probe trigram; doc 1 is clean")
    // the probe's distinct shuffle is evaluated ONCE per call: the
    // sizing count materializes a persisted set, and the exact join
    // reads the cache instead of re-running the shuffle
    val bloomPlan = Dedup.contamination(corpus, probes,
      maxBroadcastShingles = 0L).queryExecution.executedPlan.toString
    assert(bloomPlan.contains("InMemoryTableScan"),
      s"degraded path must join the cached probe set:\n$bloomPlan")
  }

  test("brute-force guard: oversized query set is refused with ANN hint") {
    // a query set past MaxBruteForceQueries must throw before any
    // broadcast is attempted, and the message must name the bucketed
    // alternatives; the probe itself is a bounded limit+count
    import spark.implicits._
    val big = spark.range(Vectors.MaxBruteForceQueries + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f), lit(0.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Vectors.cosineTopK(vecs, big, 3)
    }
    assert(e.getMessage.contains("annTopK"))
    val e2 = intercept[IllegalArgumentException] {
      Vectors.hardNegatives(vecs, big, 3, maxCos = 0.9)
    }
    assert(e2.getMessage.contains("ivfTopK"))
  }

  test("fuzzy dedup with r=4 bands (struct band sig, no long overflow)") {
    // arithmetic packing a·p+b overflows Long at r >= 3; the struct
    // band signature must keep exact agree-on-all-r semantics at r=4
    val fuzzy = Dedup.fuzzy(docs, 0.5, k = 8, r = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fuzzy.contains((0L, 1L)), "identical docs collide in every band")
    assert(fuzzy.contains((0L, 4L)))
    assert(!fuzzy.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc never becomes a candidate pair")
  }

  test("cosineNearDupPairs enforces the plane-count sizing rule") {
    // 1e6 vectors at target bucket 1000 need >= 10 planes; 4 is refused
    val e = intercept[IllegalArgumentException] {
      Vectors.cosineNearDupPairs(vecs, 0.9, planes = 4, dims = 3,
        expectedCorpusSize = Some(1000000L))
    }
    assert(e.getMessage.contains("planes"))
    // a compliant call runs: 4 vectors need 0 extra planes
    val ok = Vectors.cosineNearDupPairs(vecs, 0.9, planes = 4, dims = 3,
      expectedCorpusSize = Some(4L))
    assert(ok.collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((0L, 1L)))
  }

  test("lsh buckets: identical vectors land in the same bucket") {
    val b = vecs.select(col("vec_id"),
      Vectors.lshBucket(Vectors.toDouble(col("embedding")), 8, 3)
        .as("bucket")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) === b(1L))
  }

  test("ivf multi-probe: nprobe=2 recalls neighbors nprobe=1 misses") {
    // centroids 0 (x-axis) and 3 (z-axis); corpus 0,1,2 cluster on 0,
    // corpus 3 clusters on 3. A query near x probes cluster 0 first —
    // nprobe=1 can never see vec 3, nprobe=2 finds it.
    val cen = vecs.filter(col("vec_id").isin(0L, 3L))
    val q = vecs.filter(col("vec_id") === 2L)
    val p1 = Vectors.ivfTopK(vecs, q, cen, 3).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val p2 = Vectors.ivfTopK(vecs, q, cen, 3, nprobe = 2).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(p1.subsetOf(p2), "wider probe can only add candidates")
    assert(!p1.contains(3L) && p2.contains(3L),
      "the second probed cluster contributes its inverted list")
  }

  test("persisted IVF index serves identically to in-memory ivfTopK " +
    "and prunes to the probed lists") {
    val cen = vecs.filter(col("vec_id").isin(0L, 3L))
    val q = vecs.filter(col("vec_id") === 2L)
    val idx = java.nio.file.Files
      .createTempDirectory("ivf_idx_spec").toString
    Vectors.buildIvfIndex(vecs, cen, idx)
    for (np <- Seq(1, 2)) {
      val mem = Vectors.ivfTopK(vecs, q, cen, 3, nprobe = np)
      val srv = Vectors.ivfTopKIndexed(spark, idx, q, 3, nprobe = np)
      assert(srv.exceptAll(mem).count() === 0, s"nprobe=$np")
      assert(mem.exceptAll(srv).count() === 0, s"nprobe=$np")
    }
    // the nprobe=1 serve must read ONLY query 2's home cluster
    val srv1 = Vectors.ivfTopKIndexed(spark, idx, q, 3, nprobe = 1)
    srv1.collect()
    val plan = srv1.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan)
      .isDefined, s"expected a cluster partition filter:\n$plan")
  }

  test("IVF store lifecycle: incremental update ≡ single-pass build; " +
    "deletes tombstone then compact physically; guards refuse") {
    import spark.implicits._
    val cen = vecs.filter(col("vec_id").isin(0L, 3L))
    val q = vecs.filter(col("vec_id") === 2L)
    val full = java.nio.file.Files
      .createTempDirectory("ivf_lc_full").toString
    Vectors.buildIvfIndex(vecs, cen, full)
    val inc = java.nio.file.Files
      .createTempDirectory("ivf_lc_inc").toString
    Vectors.buildIvfIndex(vecs.filter(col("vec_id") <= 1), cen, inc)
    Vectors.updateIvfIndex(vecs.filter(col("vec_id") > 1), inc)
    val a = Vectors.ivfTopKIndexed(spark, full, q, 3, nprobe = 2)
    val b = Vectors.ivfTopKIndexed(spark, inc, q, 3, nprobe = 2)
    assert(b.exceptAll(a).count() === 0)
    assert(a.exceptAll(b).count() === 0)
    // guards
    val e1 = intercept[IllegalArgumentException](
      Vectors.updateIvfIndex(vecs.filter(col("vec_id") === 0), inc))
    assert(e1.getMessage.contains("already indexed"))
    // delete vec 3, serve must forget it; compact removes physically
    Vectors.deleteFromIvfIndex(spark, inc, Seq(3L).toDF("vec_id"))
    val e2 = intercept[IllegalArgumentException](
      Vectors.updateIvfIndex(vecs.filter(col("vec_id") === 3), inc))
    assert(e2.getMessage.contains("already indexed") ||
      e2.getMessage.contains("tombstoned"))
    val afterDel = Vectors.ivfTopKIndexed(spark, inc, q, 3, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(!afterDel.contains(3L))
    Vectors.compactIvfIndex(spark, inc)
    assert(!new java.io.File(s"$inc/deletes").exists())
    assert(spark.read.parquet(s"$inc/lists")
      .filter(col("vec_id") === 3L).count() === 0)
    // the small-file cleanup is the operation's purpose: one parquet
    // file per cluster dir after compaction
    new java.io.File(s"$inc/lists").listFiles()
      .filter(_.getName.startsWith("cluster=")).foreach { c =>
        assert(c.listFiles().count(_.getName.endsWith(".parquet")) === 1,
          s"cluster dir ${c.getName} not compacted to one file")
      }
    // compacting away EVERY vector must refuse, not brick the store
    val empty = java.nio.file.Files
      .createTempDirectory("ivf_lc_empty").toString
    Vectors.buildIvfIndex(vecs, cen, empty)
    Vectors.deleteFromIvfIndex(spark, empty, vecs.select("vec_id"))
    val e3 = intercept[IllegalArgumentException](
      Vectors.compactIvfIndex(spark, empty))
    assert(e3.getMessage.contains("tombstoned"))
    assert(Vectors.ivfTopKIndexed(spark, empty, q, 3).count() === 0,
      "the un-compacted all-tombstoned store still serves (empty)")
    // deleted-then-compacted id is new again
    Vectors.updateIvfIndex(vecs.filter(col("vec_id") === 3), inc)
    val back = Vectors.ivfTopKIndexed(spark, inc, q, 3, nprobe = 2)
    assert(back.exceptAll(a).count() === 0)
    assert(a.exceptAll(back).count() === 0)
  }

  test("streaming IVF ingestion: two micro-batches fold into the " +
    "store and serve like a single-pass build") {
    import org.apache.spark.sql.types._
    val cen = vecs.filter(col("vec_id").isin(0L, 3L))
    val q = vecs.filter(col("vec_id") === 2L)
    val staged = graft.io.Scratch.dir("ivf_stream_spec")
    Seq(("a", col("vec_id") <= 1), ("b", col("vec_id") > 1))
      .foreach { case (name, pred) =>
        graft.io.Scratch.stageSingleParquetFile(
          vecs.filter(pred), staged, s"$name.parquet")
      }
    val idx = graft.io.Scratch.dir("ivf_stream_spec_idx").toString
    val sq = graft.streaming.Streams.ivfIndexStream(
      graft.streaming.Streams.fileStream(spark, staged.toString,
        graft.streaming.Streams.EmbeddingsRawSchema,
        maxFilesPerTrigger = Some(1)),
      cen, idx)
    assert(sq.recentProgress.count(_.numInputRows > 0) === 2,
      "expected exactly two non-empty micro-batches")
    val full = graft.io.Scratch.dir("ivf_stream_spec_full").toString
    Vectors.buildIvfIndex(vecs, cen, full)
    val a = Vectors.ivfTopKIndexed(spark, full, q, 3, nprobe = 2)
    val b = Vectors.ivfTopKIndexed(spark, idx, q, 3, nprobe = 2)
    assert(b.exceptAll(a).count() === 0)
    assert(a.exceptAll(b).count() === 0)
  }

  test("ann top-k: same-bucket identical vector is retrieved") {
    val r = Vectors.annTopK(vecs, vecs.filter(col("vec_id") === 0), 2,
      planes = 4, dims = 3).collect()
    assert(r.map(_.getAs[Long]("vec_id")).contains(1L))
  }

  test("kmeans: separated clusters recovered, centroids move, rerun-stable") {
    import spark.implicits._
    // seeds 0 (x-axis) and 1 (y-axis); 2-5 near x, 6-9 near y
    val d = (Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))) ++
      (2L to 5L).map(i => (i, Array(0.9f, 0.1f + i * 0.01f))) ++
      (6L to 9L).map(i => (i, Array(0.1f + i * 0.01f, 0.9f))))
      .toDF("vec_id", "embedding")
    def run() = Vectors.kmeans(d, 2, 2, vecCol = "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run()
    assert((2L to 5L).forall(got(_) === 0L), "x-side joins cluster 0")
    assert((6L to 9L).forall(got(_) === 1L), "y-side joins cluster 1")
    assert(got === run(), "deterministic across reruns")
    // iters=0 degenerates to assignment against the raw seeds
    val raw = Vectors.kmeans(d, 2, 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw(0L) === 0L && raw(1L) === 1L, "seeds assign to themselves")
  }

  test("rrfFuse: both-list docs sum their reciprocal ranks, " +
    "single-list docs keep one contribution, exact-integer tie-break " +
    "by doc id, k caps the fused list") {
    import spark.implicits._
    // query 0: lexical ranks a=1 b=2 c=3; semantic ranks b=1 d=2
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = graft.similarity.Retrieval.rrfFuse(Seq(lex, sem), 10)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    def c(r: Long): Long = math.round(1.0e9 / (60 + r))
    def f(rs: Long*): Double =
      math.rint(rs.map(c).sum / 1e9 * 1e6) / 1e6
    assert(out(11L) === ((f(2, 1), 1L)),
      "doc in both lists sums 1/62 + 1/61 and wins")
    assert(out(10L) === ((f(1), 2L)) && out(12L) === ((f(3), 4L)) &&
      out(13L) === ((f(2), 3L)), s"single-list contributions: $out")
    // identical integer sums tie-break by doc id
    val t1 = Seq((0L, 20L, 1L), (0L, 21L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val tied = graft.similarity.Retrieval.rrfFuse(Seq(t1), 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(tied(20L) === 1L && tied(21L) === 2L)
    // k cap
    assert(graft.similarity.Retrieval.rrfFuse(Seq(lex, sem), 2)
      .count() === 2L)
  }

  test("ann recall probe: recall@5 = hits/5 in [0,1], and widening " +
    "the candidate pool (multiprobe) never lowers per-query recall") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_ann_recall")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size === 5, "one row per query")
    out.values.foreach { case (h, rec) =>
      assert(h >= 0 && h <= 5 && rec === h / 5.0) }
    // any exact-top-5 member inside the candidate pool ranks top-5
    // there too, so recall is monotone in the pool: probes=3 >= 1
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q5 = emb.filter(col("vec_id") < 5)
    val exact = Vectors.cosineTopK(emb, q5, 5)
      .select("query_id", "vec_id")
    def recall(probes: Int): Map[Long, Long] =
      exact.join(Vectors.annTopK(emb, q5, 5, 4, 64, probes = probes)
            .select("query_id", "vec_id"),
          Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("h")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
        .withDefaultValue(0L)
    val r1 = recall(1); val r3 = recall(3)
    (0L until 5L).foreach(q => assert(r3(q) >= r1(q),
      s"query $q: multiprobe recall ${r3(q)} < single ${r1(q)}"))
  }

  test("semanticDedup: within-cluster near-dups drop, min id survives") {
    // vecs: 0 and 1 identical (cos=1), 2 close to 0 (cos≈0.99),
    // 3 orthogonal — clusters block, larger ids of close pairs drop
    val out = Vectors.semanticDedup(vecs, 2, 1, threshold = 0.95)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(0L, 3L),
      "1 (exact dup of 0) and 2 (near dup of 0) drop; 0 and 3 survive")
  }

  test("pcaProjectK: deflation recovers a planted second direction") {
    import spark.implicits._
    // variance 10 along u=(0.6,0.8,0,0), variance 1 along w=(0,0,1,0)
    val pts = (for {
      (t, i) <- Seq(-4.0, -2.0, 2.0, 4.0).zipWithIndex
      (sgn, j) <- Seq(-1.0, 1.0).zipWithIndex
    } yield ((i * 2 + j).toLong, Array(
      (t * 0.6).toFloat, (t * 0.8).toFloat, sgn.toFloat, 0f)))
      .toDF("vec_id", "embedding")
    val got = Vectors.pcaProjectK(pts, dims = 4, iters = 10, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    for {
      (t, i) <- Seq(-4.0, -2.0, 2.0, 4.0).zipWithIndex
      (sgn, j) <- Seq(-1.0, 1.0).zipWithIndex
    } {
      val (pc1, pc2) = got((i * 2 + j).toLong)
      assert(math.abs(math.abs(pc1) - math.abs(t)) < 1e-3,
        s"pc1 of t=$t came out $pc1")
      assert(math.abs(math.abs(pc2) - 1.0) < 1e-3,
        s"pc2 of s=$sgn came out $pc2")
    }
    // k out of range refuses
    val e = intercept[IllegalArgumentException](
      Vectors.pcaProjectK(pts, dims = 4, iters = 2, k = 5))
    assert(e.getMessage.contains("k="), e.getMessage)
  }

  test("pcaProject recovers a planted principal direction") {
    import spark.implicits._
    // points t·(0.6, 0.8) + the constant offset (5, 5): after mean-
    // centering, variance lives entirely along (0.6, 0.8), so |pc1|
    // must equal |t| and the projections must stay proportional
    val ts = Seq(-2.0, -1.0, 1.0, 2.0)
    val pts = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array((5.0 + t * 0.6).toFloat, (5.0 + t * 0.8).toFloat))
    }.toDF("vec_id", "embedding")
    val got = Vectors.pcaProject(pts, dims = 2, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ts.zipWithIndex.foreach { case (t, i) =>
      assert(math.abs(math.abs(got(i.toLong)) - math.abs(t)) < 1e-4,
        s"projection of t=$t came out ${got(i.toLong)}")
    }
    // one consistent sign across the set (±t, never mixed)
    val signs = ts.zipWithIndex.map { case (t, i) =>
      math.signum(got(i.toLong)) * math.signum(t) }
    assert(signs.distinct.size === 1, signs.toString)
    // deterministic across partitionings
    val again = Vectors.pcaProject(pts.repartition(3), dims = 2, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === got)
    // degenerate corpus refuses (all-identical vectors: zero variance)
    val flat = Seq((0L, Array(1f, 1f)), (1L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Vectors.pcaProject(flat, dims = 2, iters = 2).collect())
    assert(e.getMessage.contains("zero-variance"), e.getMessage)
  }
}
