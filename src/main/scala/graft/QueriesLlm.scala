package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.dedup.Dedup
import graft.similarity.Vectors
import graft.streaming.Streams
import org.apache.spark.sql.streaming.OutputMode

/** LLM-training-data pipeline queries over `documents` / `embeddings`:
  * text analysis, exact + fuzzy dedup, SimHash, and similarity search.
  * Every hash is md5-derived (TextAnalysis.hash60) so the DuckDB
  * oracles reproduce results bit-for-bit.
  */
private[graft] object QueriesLlm {

  import Tables.t

  private val Stopwords = Seq("the", "a")
  private val LangMarkers = Seq(
    "en" -> Seq("the", "a"), "de" -> Seq("der", "die"),
    "es" -> Seq("el", "la"), "fr" -> Seq("le", "les"))
  private val MinhashK = 8
  private val JaccardThreshold = 0.5
  /** CCNet gate: src0-src2 is the "trusted" slice the bigram LM trains
    * on; the fixed cross-entropy cuts are placed inside the observed
    * sf0.001-sf0.1 score range so all three buckets populate.
    */
  private val PerplexityRefSources = Seq("src0", "src1", "src2")
  /** BM25 query strings over the corpus's SQL-flavored vocabulary;
    * repeated 'merge merge' exercises the DISTINCT-query-term rule.
    */
  private val Bm25QueryFixture: Seq[(Long, String)] = Seq(
    0L -> "hash join merge merge", 1L -> "window sort order",
    2L -> "fast scan filter")
  private val PerplexityHeadMax = 3.40
  private val PerplexityMiddleMax = 3.47

  /** Ranked BPE merges fixture (training a merges table is offline;
    * applying one is the engine's job). Multi-level merges (table ←
    * tab+le ← ta+b ← t+a) and rank-over-position cases (er before or
    * in "order") make the gate discriminate greedy lowest-rank-first
    * semantics from naive left-to-right merging.
    */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "l" -> "e", "tab" -> "le", "s" -> "c",
    "sc" -> "a", "sca" -> "n", "e" -> "r", "o" -> "r", "q" -> "u",
    "a" -> "g", "ag" -> "g", "s" -> "t", "r" -> "e", "a" -> "m")

  // --- text analysis ---------------------------------------------------

  def tokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))

  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val metrics = TextAnalysis.qualityMetrics(col("text"), Stopwords)
      .map { case (name, c) => c.as(name) }
    t(s, dir, "documents").select(col("doc_id") +: metrics: _*)
  }

  def langId(s: SparkSession, dir: String): DataFrame = {
    val scores = TextAnalysis.langScores(col("text"), LangMarkers)
    t(s, dir, "documents").select(
      col("doc_id") +: scores.map { case (n, c) => c.as(n) } :+
        TextAnalysis.langPredict(scores).as("predicted"): _*)
  }

  /** Gopher-style repetition quality gates (top-n-gram dominance). */
  def repetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionMetrics(t(s, dir, "documents"))

  /** C4-style normalization + the fingerprint of the cleaned text
    * (the usual dedup key: normalize first, then hash).
    */
  def textClean(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.cleanText(col("text")).as("clean"),
      TextAnalysis.hash60(TextAnalysis.cleanText(col("text")))
        .as("clean_h60"))

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.hash60(lower(col("text"))).as("h60"))

  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"))

  // --- dedup -----------------------------------------------------------

  /** Documents with synthetic duplicates injected (every 5th doc is
    * repeated under a shifted id) so exact dedup has real work.
    */
  private def dupDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 100000000L))
  }

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(dupDocs(s, dir))

  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(t(s, dir, "documents"), JaccardThreshold)

  def minhashSig(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(t(s, dir, "documents"), MinhashK)

  def dedupFuzzy(s: SparkSession, dir: String): DataFrame =
    Dedup.fuzzy(t(s, dir, "documents"), JaccardThreshold, MinhashK)

  def simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(t(s, dir, "documents"))

  /** Directed containment pairs over the dup-injected corpus (full
    * copies guarantee containment-1.0 pairs in both directions).
    */
  def containmentQ(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(dupDocs(s, dir), 0.8)

  /** Decontamination: trigram overlap vs a small probe set. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Dedup.contamination(d, d.filter(col("doc_id") < 5))
  }

  // --- similarity search ----------------------------------------------

  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.cosineTopK(emb, emb.filter(col("vec_id") < 5), 10)
  }

  /** Hard-negative mining: 5 most-similar-below-0.2 per query —
    * informative contrastive negatives, latent positives excluded.
    */
  def hardNegativesQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.hardNegatives(emb, emb.filter(col("vec_id") < 5), 5, 0.2)
  }

  /** Deterministic contrastive negative sampling (3 draws/doc). */
  def negativeSampleQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.negativeSamples(t(s, dir, "documents"), 3)

  def annLsh(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"),
      Vectors.lshBucket(Vectors.toDouble(col("embedding")), 8, 64)
        .as("bucket"))

  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.annTopK(emb, emb.filter(col("vec_id") < 5), 5, 4, 64)
  }

  /** Multiprobe LSH ANN: each query also searches 2 bit-flip buckets. */
  def annMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.annTopK(emb, emb.filter(col("vec_id") < 5), 5, 4, 64,
      probes = 3)
  }

  /** ANN quality probe: recall@5 of the LSH-bucketed top-k against
    * the brute-force ground truth — the eval every ANN deployment
    * tracks before trusting the index at scale. Composes the two
    * retrieval paths and reduces to one bounded semi-join + count
    * (both inputs are k·|queries| rows by construction).
    */
  def annRecallQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q5 = emb.filter(col("vec_id") < 5)
    val exact = Vectors.cosineTopK(emb, q5, 5, queryCount = Some(5L))
      .select("query_id", "vec_id")
    val approx = Vectors.annTopK(emb, q5, 5, 4, 64)
      .select("query_id", "vec_id")
    val hits = exact.join(approx, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    q5.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / 5.0)
          .as("recall"))
  }

  def embedNearDup(s: SparkSession, dir: String): DataFrame =
    Vectors.cosineNearDupPairs(t(s, dir, "embeddings"), 0.45, 8, 64)

  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      emb.filter(col("vec_id") < 16), 5)
  }

  /** IVF with multi-probe (nprobe=2): the recall knob exercised. */
  def ivfProbe(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.ivfTopK(emb, emb.filter(col("vec_id") < 5),
      emb.filter(col("vec_id") < 16), 5, nprobe = 2)
  }

  /** Product quantization end-to-end: deterministic grouped-Lloyd
    * codebooks (m=4 subspaces × ksub=8 codewords, one iteration),
    * corpus encoded to 4 codes/vector, and ADC top-5 for 5 example
    * queries served from the CODES table alone — the compressed-ANN
    * serving path (m ints scanned per vector, never the embeddings).
    * The oracle replays the whole train→encode→ADC pipeline in SQL.
    */
  def pqTopKQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cb = Vectors.trainPqCodebooks(emb, m = 4, ksub = 8, dims = 64)
    val codes = Vectors.encodePq(emb, cb, m = 4, dims = 64)
    Vectors.pqTopK(codes, cb, emb.filter(col("vec_id") < 5), k = 5,
      m = 4, ksub = 8, dims = 64)
  }

  /** PQ with exact refinement (FAISS IndexRefineFlat): the ADC
    * shortlist (3k candidates from the codes table) re-ranks by exact
    * full-dimension L2 against the stored vectors — quantization
    * error fixed at the top of the ranking, with the exact pass map-
    * only over the corpus (broadcast shortlist). Oracle replays
    * train→encode→ADC-shortlist→exact-re-rank.
    */
  def pqRefinedQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cb = Vectors.trainPqCodebooks(emb, m = 4, ksub = 8, dims = 64)
    val codes = Vectors.encodePq(emb, cb, m = 4, dims = 64)
    Vectors.pqTopKRefined(codes, cb, emb, emb.filter(col("vec_id") < 5),
      k = 5, shortlist = 15, m = 4, ksub = 8, dims = 64)
  }

  /** Distributed PCA by power iteration ([[Vectors.pcaProject]],
    * 3 steps): the dominant principal direction without materializing
    * a covariance matrix — per step one fused corpus pass (in-order
    * per-row dot, per-dimension QUANTIZED sum), driver state bounded
    * by dims. Oracle replays mean-centering and every step with
    * unrolled integer-sum CTEs — bit-exact, no float-order drift.
    */
  def pcaProjectQ(s: SparkSession, dir: String): DataFrame =
    Vectors.pcaProject(t(s, dir, "embeddings"), dims = 64, iters = 3)

  /** Two-component deflated PCA ([[Vectors.pcaProjectK]] k=2): the
    * second direction power-iterates on the residual corpus
    * c − (c⋅x₁)·x₁; both scores taken against the original centered
    * vectors. Oracle replays stage 1, the in-plan deflation, and
    * stage 2 — all with the same quantized-sum determinism.
    */
  def pcaTopkQ(s: SparkSession, dir: String): DataFrame =
    Vectors.pcaProjectK(t(s, dir, "embeddings"), dims = 64, iters = 3,
      k = 2)

  /** IVF-PQ composition: the L2 coarse quantizer (16 id-prefix
    * centroids) partitions the corpus; PQ codes (m=4, ksub=8)
    * compress it; queries probe their 2 nearest clusters and ADC
    * scans ONLY the probed clusters' codes. The two-stage
    * compressed-ANN shape (cluster pruning × code quantization) a
    * billion-vector serving tier runs; the oracle replays both stages.
    */
  def ivfPqQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cen = emb.filter(col("vec_id") < 16)
    val cb = Vectors.trainPqCodebooks(emb, m = 4, ksub = 8, dims = 64)
    val codes = Vectors.encodePq(emb, cb, m = 4, dims = 64)
      .join(Vectors.ivfAssignL2(emb, cen), "vec_id")
    Vectors.ivfPqTopK(codes, cb, cen, emb.filter(col("vec_id") < 5),
      k = 5, nprobe = 2, m = 4, ksub = 8, dims = 64)
  }

  /** IVF-PQ from a PERSISTED index (same parameters as [[ivfPqQ]]):
    * build the centroids + codebooks + cluster-partitioned codes
    * store, then serve from it alone — training, encoding and
    * assignment all happen at build; the serve-time codes scan prunes
    * to the probed clusters' partitions. Oracle: identical to
    * `q_ivf_pq`.
    */
  def ivfPqIndexedQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cen = emb.filter(col("vec_id") < 16)
    val idx = graft.io.Scratch.dir("graft_ivfpq_idx_").toString
    BenchSetup.section { Vectors.buildIvfPqIndex(
      emb, cen, idx, m = 4, ksub = 8, dims = 64) }
    Vectors.ivfPqTopKIndexed(s, idx, emb.filter(col("vec_id") < 5),
      k = 5, nprobe = 2)
  }

  /** IVF from a PERSISTED index (same centroids/queries/nprobe as
    * [[ivfProbe]]): build the centroid + partitioned inverted-list
    * store, then serve from it alone — the lists scan prunes to the
    * probed clusters' partitions and assignment is never redone at
    * query time. Oracle: identical to `q_ivf_probe`.
    */
  def ivfIndexed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idx = graft.io.Scratch.dir("graft_ivf_idx_").toString
    BenchSetup.section { Vectors.buildIvfIndex(
      emb, emb.filter(col("vec_id") < 16), idx) }
    Vectors.ivfTopKIndexed(s, idx, emb.filter(col("vec_id") < 5), 5,
      nprobe = 2)
  }

  /** End-to-end corpus curation: quality gate → exact dedup → near-dup
    * removal (greedy smallest-id survivor).
    */
  def curation(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.curate(
      t(s, dir, "documents").select("doc_id", "text", "lang"),
      minChars = 100, maxStopwordRatio = 0.3, stopwords = Stopwords,
      jaccardThreshold = JaccardThreshold)
      .select("doc_id", "lang", "n_chars")

  /** Training-mixture rates: full src0, half src1, quarter src2,
    * tenth src3; all other sources dropped.
    */
  private val MixRates = Map(
    "src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1)

  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation
      .stratifiedSample(t(s, dir, "documents"), MixRates)
      .select("doc_id", "source")

  def packSequences(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.packSequences(t(s, dir, "documents"), 512)

  /** Capstone composition — the full raw-corpus → training-mixture
    * flow: quality gate → exact dedup → near-dup removal → stratified
    * source mixing → token-budget sequence packing, every stage the
    * library's own operator.
    */
  def trainingMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val curated = graft.pipeline.Curation.curate(
      docs.select("doc_id", "text", "lang"),
      minChars = 100, maxStopwordRatio = 0.3, stopwords = Stopwords,
      jaccardThreshold = JaccardThreshold)
      .select("doc_id", "text")
    val withSource = curated.join(docs.select("doc_id", "source"), "doc_id")
    graft.pipeline.Curation.packSequences(
      graft.pipeline.Curation.stratifiedSample(withSource, MixRates), 512)
  }

  // --- PII / line dedup / lexical stats / quantization -----------------

  /** Deterministic PII-bearing text derived from doc_id — the synthetic
    * corpus contains no PII, so both engines graft the same emails,
    * phones, and IPs onto each document before redacting.
    */
  private def piiSynth: Column = concat(
    lit("contact u"), col("doc_id").cast("string"),
    lit("@mail"), (col("doc_id") % 7).cast("string"),
    lit(".org ip 10."), (col("doc_id") % 256).cast("string"),
    lit(".3."), (col("doc_id") % 100).cast("string"),
    lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
    lit("-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
    lit(" "), col("text"))

  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val counts = TextAnalysis.piiCounts(piiSynth)
      .map { case (n, c) => c.as(n) }
    t(s, dir, "documents").select(
      col("doc_id") +: TextAnalysis.redactPii(piiSynth).as("clean") +:
        counts: _*)
  }

  /** Documents re-lined into 3-token lines (the corpus is single-line;
    * both engines derive identical line breaks), for line-level dedup.
    */
  private def linedDocs(s: SparkSession, dir: String): DataFrame = {
    val w = TextAnalysis.tokens(col("text"))
    val nLines = ceil(size(w) / lit(3.0)).cast("int")
    t(s, dir, "documents").select(col("doc_id"),
      array_join(transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(w, i * 3 + 1, lit(3)))), "\n").as("text"))
  }

  def lineDedupQ(s: SparkSession, dir: String): DataFrame =
    Dedup.lineDedup(linedDocs(s, dir))

  /** Re-lined docs with every line echoed (text ⧺ '\n' ⧺ text), so
    * intra-doc dedup has real within-document repeats to collapse.
    */
  private def echoedDocs(s: SparkSession, dir: String): DataFrame =
    linedDocs(s, dir).select(col("doc_id"),
      concat(col("text"), lit("\n"), col("text")).as("text"))

  def intraDocDedupQ(s: SparkSession, dir: String): DataFrame =
    Dedup.intraDocLineDedup(echoedDocs(s, dir))

  def vocab(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(t(s, dir, "documents"), 100)

  /** Misra–Gries heavy-hitters sketch vs exact top tokens. The sketch
    * is ONE bounded-memory aggregate (≤ 2k counters per partial,
    * map-side combinable) over the token stream; the gate checks the
    * sketch's order-independent guarantee — every token with true
    * frequency > n/(k+1) must be in the sketch — by joining the exact
    * top-10 (whose counts far exceed n/501 on Zipfian text) against
    * sketch membership. Counts in the output come from the exact side;
    * sketch counts are merge-order-dependent and never compared.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val mg = udaf(new graft.functions.HeavyHittersAgg(500),
      org.apache.spark.sql.Encoders.STRING)
    val sketch = toks.agg(mg(col("token")).as("mg"))
    val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(10)
    top.crossJoin(broadcast(sketch))
      .select(col("token"), col("n"),
        map_contains_key(col("mg"), col("token")).as("in_sketch"))
  }

  def tfidfQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidf(t(s, dir, "documents"))

  def bigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScore(t(s, dir, "documents"))

  /** Exact duplicated-substring spans over the dup-injected corpus
    * (k = 8 token windows; injected full-document copies guarantee
    * corpus-scale repeats alongside any natural ones).
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpans(dupDocs(s, dir), 8)

  /** The spans APPLIED: duplicated ranges cut from every document of
    * the same dup-injected corpus (injected full copies come back
    * empty; partially-repeated documents keep their unique remainder).
    */
  def cutSpansQ(s: SparkSession, dir: String): DataFrame =
    Dedup.cutSpans(dupDocs(s, dir), 8)

  /** Near-dup clusters: Jaccard pairs → connected components, every
    * document labeled with its cluster's minimal member id.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    Dedup.clusters(d, Dedup.jaccardPairs(d, JaccardThreshold))
  }

  /** Johnson–Lindenstrauss random projection 64 → 8 dims. */
  def randProject(s: SparkSession, dir: String): DataFrame =
    Vectors.randomProject(t(s, dir, "embeddings"), 8, 64)

  /** Deterministic 90/5/5 train/valid/test assignment by id hash. */
  def trainSplit(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.assignSplits(t(s, dir, "documents"),
      Seq("train" -> 90, "valid" -> 95), "test")
      .select("doc_id", "split")

  /** Leakage-safe 90/5/5 split: near-dup clusters (Jaccard ≥ 0.5 →
    * connected components) assigned whole to a split, so no pair of
    * near-duplicates ever straddles the train/eval boundary.
    */
  def leakageSplitQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.pipeline.Curation.leakageSafeSplit(d,
      Dedup.jaccardPairs(d, JaccardThreshold),
      Seq("train" -> 90, "valid" -> 95), "test")
  }

  /** CCNet-style perplexity buckets: bigram LM trained on the
    * src0-src2 reference slice scores the whole corpus; fixed
    * cross-entropy thresholds split head/middle/tail.
    */
  def perplexityQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    TextAnalysis.perplexityFilter(d,
      d.filter(col("source").isin(PerplexityRefSources: _*)),
      headMax = PerplexityHeadMax, middleMax = PerplexityMiddleMax)
  }

  /** BM25 top-10 per query over the corpus (lexical retrieval — the
    * keyword complement of the ANN queries; defaults k1=1.25, b=0.75).
    */
  def bm25Q(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopK(t(s, dir, "documents"), q, 10)
  }

  /** BM25 served from a persisted index: build the postings/doclens/
    * stats store once (into a per-run temp dir), then score the SAME
    * query fixture from the store alone — no corpus scan at query
    * time. Oracle: identical to `q_bm25_topk` (the shared scoring
    * tail makes the two hash-equal by construction; this gate pins
    * that the round-trip through parquet — partition column, types,
    * stats row — loses nothing).
    */
  def bm25IndexedQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val idx = graft.io.Scratch.dir("graft_bm25_idx_").toString
    BenchSetup.section {
      TextAnalysis.buildBm25Index(t(s, dir, "documents"), idx) }
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopKIndexed(s, idx, q, 10)
  }

  /** Incremental-index BM25: build the store from HALF the corpus,
    * append the other half via [[TextAnalysis.updateBm25Index]]
    * (parquet appends into the affected postings buckets + a stats
    * fold — no rebuild), then serve the same query fixture. Oracle:
    * identical to `q_bm25_topk` over the WHOLE corpus — an index
    * maintained incrementally must be indistinguishable from one
    * built in a single pass.
    */
  def bm25UpdateQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val idx = graft.io.Scratch.dir("graft_bm25_upd_").toString
    // the half-corpus base index is FIXTURE; the gate measures the
    // incremental update + serve
    BenchSetup.section { TextAnalysis.buildBm25Index(
      docs.filter(col("doc_id") % 2 === 0), idx) }
    TextAnalysis.updateBm25Index(docs.filter(col("doc_id") % 2 === 1), idx)
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopKIndexed(s, idx, q, 10)
  }

  /** Tombstone-delete gate: index the WHOLE corpus, delete the odd
    * doc_ids, serve — results must equal a scan over the even docs
    * alone (scores included: the stats fold and the serve-time sliver
    * anti-join must make idf/avgdl forget the deleted half). The
    * compliance path every training index needs, gated without a
    * rebuild anywhere.
    */
  def bm25DeleteQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val idx = graft.io.Scratch.dir("graft_bm25_del_").toString
    BenchSetup.section { TextAnalysis.buildBm25Index(docs, idx) }
    TextAnalysis.deleteFromBm25Index(s, idx,
      docs.filter(col("doc_id") % 2 === 1).select("doc_id"))
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopKIndexed(s, idx, q, 10)
  }

  /** IVF incremental maintenance: build on the even vec_ids, append
    * the odd ones against the STORED centroids, serve — must equal
    * the in-memory probe over the whole corpus (assignment geometry
    * is fixed at build, so incremental and single-pass agree exactly).
    */
  def ivfUpdateQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idx = graft.io.Scratch.dir("graft_ivf_upd_").toString
    BenchSetup.section { Vectors.buildIvfIndex(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") < 16), idx) }
    Vectors.updateIvfIndex(emb.filter(col("vec_id") % 2 === 1), idx)
    Vectors.ivfTopKIndexed(s, idx, emb.filter(col("vec_id") < 5), 5,
      nprobe = 2)
  }

  /** IVF tombstone deletes: index everything, delete the odd
    * vec_ids, serve — results must equal the probe over the even
    * vectors alone, while deleted vectors remain valid
    * query-by-example inputs (queries are caller-supplied vectors,
    * not store lookups).
    */
  def ivfDeleteQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val idx = graft.io.Scratch.dir("graft_ivf_del_").toString
    BenchSetup.section { Vectors.buildIvfIndex(
      emb, emb.filter(col("vec_id") < 16), idx) }
    Vectors.deleteFromIvfIndex(s, idx,
      emb.filter(col("vec_id") % 2 === 1).select("vec_id"))
    Vectors.ivfTopKIndexed(s, idx, emb.filter(col("vec_id") < 5), 5,
      nprobe = 2)
  }

  /** Streaming IVF ingestion: embeddings arrive as two files, one per
    * micro-batch — first builds the store against the fixed centroid
    * table, second appends against the STORED centroids; serving
    * equals the in-memory probe over everything.
    */
  def streamIvfQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val staged = graft.io.Scratch.dir("graft_stream_ivf_")
    // staged arriving files are FIXTURE (see streamIndexQ)
    BenchSetup.section {
      Seq(("even", col("vec_id") % 2 === 0),
          ("odd", col("vec_id") % 2 === 1)).foreach { case (name, pred) =>
        graft.io.Scratch.stageSingleParquetFile(
          emb.filter(pred), staged, s"$name.parquet")
      }
    }
    val idx = graft.io.Scratch.dir("graft_stream_ivf_idx_").toString
    Streams.ivfIndexStream(
      Streams.fileStream(s, staged.toString, Streams.EmbeddingsRawSchema,
        maxFilesPerTrigger = Some(1)),
      emb.filter(col("vec_id") < 16), idx)
    Vectors.ivfTopKIndexed(s, idx, emb.filter(col("vec_id") < 5), 5,
      nprobe = 2)
  }

  /** Streaming IVF tombstone deletes — the vector twin of
    * [[streamIndexDeleteQ]]: the corpus streams in as two add batches
    * ([[Streams.ivfIndexStream]]), then a CDC delete stream
    * ([[Streams.ivfIndexCdcStream]], op='d' rows) tombstones the odd
    * vec_ids. Serving must equal the probe over the even half alone —
    * same oracle as the batch `q_ivf_delete` gate, now reached
    * through streaming maintenance end-to-end.
    */
  def streamIvfDeleteQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val staged = graft.io.Scratch.dir("graft_stream_ivfdel_")
    // staged arriving files are FIXTURE (see streamIndexQ)
    BenchSetup.section {
      Seq(("even", col("vec_id") % 2 === 0),
          ("odd", col("vec_id") % 2 === 1)).foreach { case (name, pred) =>
        graft.io.Scratch.stageSingleParquetFile(
          emb.filter(pred), staged, s"$name.parquet")
      }
    }
    val idx = graft.io.Scratch.dir("graft_stream_ivfdel_idx_").toString
    Streams.ivfIndexStream(
      Streams.fileStream(s, staged.toString, Streams.EmbeddingsRawSchema,
        maxFilesPerTrigger = Some(1)),
      emb.filter(col("vec_id") < 16), idx)
    val delStaged = graft.io.Scratch.dir("graft_stream_ivfdel_ops_")
    val cdcSchema = org.apache.spark.sql.types.StructType(
      Streams.EmbeddingsRawSchema.fields :+
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType))
    graft.io.Scratch.stageSingleParquetFile(
      emb.filter(col("vec_id") % 2 === 1)
        .withColumn("op", lit("d")),
      delStaged, "deletes.parquet")
    Streams.ivfIndexCdcStream(
      Streams.fileStream(s, delStaged.toString, cdcSchema,
        maxFilesPerTrigger = Some(1)),
      emb.filter(col("vec_id") < 16), idx)
    Vectors.ivfTopKIndexed(s, idx, emb.filter(col("vec_id") < 5), 5,
      nprobe = 2)
  }

  /** Streaming-ingestion capstone: the corpus arrives as TWO parquet
    * files consumed one per micro-batch (`maxFilesPerTrigger=1`), and
    * [[Streams.bm25IndexStream]] folds each batch into the persisted
    * index (first builds, second appends). Serving from the final
    * store must equal the whole-corpus scan — the continuously-
    * maintained retrieval index, gated end-to-end through the real
    * file source.
    */
  def streamIndexQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val staged = graft.io.Scratch.dir("graft_stream_idx_docs_")
    // staging the arriving files is FIXTURE; the gate measures the
    // streaming build/update ingestion
    BenchSetup.section {
      Seq(("even", col("doc_id") % 2 === 0),
          ("odd", col("doc_id") % 2 === 1)).foreach { case (name, pred) =>
        graft.io.Scratch.stageSingleParquetFile(
          docs.filter(pred), staged, s"$name.parquet")
      }
    }
    val idx = graft.io.Scratch.dir("graft_stream_idx_").toString
    Streams.bm25IndexStream(
      Streams.fileStream(s, staged.toString, Streams.DocsRawSchema,
        maxFilesPerTrigger = Some(1)),
      idx)
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopKIndexed(s, idx, q, 10)
  }

  /** Streaming tombstone deletes for the persisted BM25 index: the
    * corpus streams in as two add batches ([[Streams.bm25IndexStream]]
    * — build then append), then a CDC delete stream
    * ([[Streams.bm25IndexCdcStream]], op='d' rows) tombstones every
    * doc_id % 3 == 0 through the same file-source machinery. Serving
    * must equal a scan over the survivors alone — scores included
    * (idf/avgdl forget the deleted third immediately), with no
    * rebuild and no consistency window.
    */
  def streamIndexDeleteQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val staged = graft.io.Scratch.dir("graft_stream_idxdel_docs_")
    // staged arriving files are FIXTURE (see streamIndexQ)
    BenchSetup.section {
      Seq(("even", col("doc_id") % 2 === 0),
          ("odd", col("doc_id") % 2 === 1)).foreach { case (name, pred) =>
        graft.io.Scratch.stageSingleParquetFile(
          docs.filter(pred), staged, s"$name.parquet")
      }
    }
    val idx = graft.io.Scratch.dir("graft_stream_idxdel_").toString
    Streams.bm25IndexStream(
      Streams.fileStream(s, staged.toString, Streams.DocsRawSchema,
        maxFilesPerTrigger = Some(1)),
      idx)
    val delStaged = graft.io.Scratch.dir("graft_stream_idxdel_ops_")
    val cdcSchema = org.apache.spark.sql.types.StructType(
      Streams.DocsRawSchema.fields :+
        org.apache.spark.sql.types.StructField("op",
          org.apache.spark.sql.types.StringType))
    graft.io.Scratch.stageSingleParquetFile(
      docs.filter(col("doc_id") % 3 === 0)
        .select(docs.columns.map(col).toSeq: _*)
        .withColumn("op", lit("d")),
      delStaged, "deletes.parquet")
    Streams.bm25IndexCdcStream(
      Streams.fileStream(s, delStaged.toString, cdcSchema,
        maxFilesPerTrigger = Some(1)), idx)
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopKIndexed(s, idx, q, 10)
  }

  /** Index-lifecycle capstone: build half, append the rest
    * incrementally, COMPACT the accumulated small files, then serve —
    * the full build → update → compact → query cycle a production
    * index lives through, with the whole-corpus scan as the oracle
    * (compaction must change file layout only, never a result).
    */
  def bm25CompactQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val idx = graft.io.Scratch.dir("graft_bm25_cmp_").toString
    // the fragmented index (build + incremental update) is FIXTURE;
    // the gate measures the compaction + serve
    BenchSetup.section {
      TextAnalysis.buildBm25Index(
        docs.filter(col("doc_id") % 2 === 0), idx)
      TextAnalysis.updateBm25Index(
        docs.filter(col("doc_id") % 2 === 1), idx)
    }
    TextAnalysis.compactBm25Index(s, idx)
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    TextAnalysis.bm25TopKIndexed(s, idx, q, 10)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    * top-10 and the brute-force cosine top-10 (doc i ↔ embedding i;
    * query ids 0-2 carry both a query string and a query vector).
    */
  def hybridRrfQ(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = Bm25QueryFixture.toDF("query_id", "qtext")
    val lex = TextAnalysis.bm25TopK(t(s, dir, "documents"), q, 10)
    val emb = t(s, dir, "embeddings")
    val sem = Vectors.cosineTopK(emb, emb.filter(col("vec_id") < 3), 10,
        queryCount = Some(3L))
      .withColumnRenamed("vec_id", "doc_id")
    graft.similarity.Retrieval.rrfFuse(Seq(lex, sem), 10)
  }

  /** Streaming MinHash-LSH near-dup candidates over the arriving
    * documents table; the DISTINCT emitted pair set equals batch
    * `lshCandidates` (the oracle replays the batch banding).
    */
  def streamNearDupQ(s: SparkSession, dir: String): DataFrame =
    Streams.runToTable(
      Streams.streamingNearDupCandidates(Streams.docsStream(s, dir)),
      "strm_neardup_" + dir.replaceAll("[^a-zA-Z0-9]", "_"),
      OutputMode.Append()).distinct()

  /** Train the linear quality classifier in-engine: 3 full-batch
    * logistic GD steps, labels = the src0-src2 "trusted" slice.
    */
  def trainClassifierQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.trainLinearModel(t(s, dir, "documents"),
      col("source").isin(PerplexityRefSources: _*), nBuckets = 64)

  /** The trained weights served through the inference path — the full
    * label → train → score loop as one plan.
    */
  def trainedScoreQ(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val w = TextAnalysis.trainLinearModel(d,
        col("source").isin(PerplexityRefSources: _*), nBuckets = 64)
      .withColumnRenamed("w6", "w10")
    TextAnalysis.scoreLinearModel(d, w, nBuckets = 64,
      quantScale = 1000000.0)
  }

  /** Token-budget mixture: hash-order prefix per source until the
    * budget fills. All three budgets bite partially at sf0.1 (src2
    * holds ~14k tokens there); the budget-exceeds-source branch is
    * pinned by CurationSpec instead.
    */
  def tokenBudgetMixQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.tokenBudgetMix(t(s, dir, "documents"),
      Map("src0" -> 200L, "src1" -> 100L, "src2" -> 10000L))

  /** Epoch-1 deterministic shuffle into 8 shards (training order). */
  def shuffleShardsQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation
      .deterministicShuffle(t(s, dir, "documents"), 8, epoch = 1)
      .select("doc_id", "shard", "pos")

  /** Dataset-card rollup: per-source corpus statistics. */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        countDistinct("lang").as("n_langs"))

  /** Per-source quota cap: at most 5 docs per source, lowest ids win
    * (bounded-heap TopKPerKey, no window sort).
    */
  def quotaSampleQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.quotaSample(t(s, dir, "documents"), 5)
      .select("doc_id", "source")

  /** Deterministic Efraimidis–Spirakis weighted sample (k=50): the
    * training-mixture draw — sources src0-2 weighted 4×, src3-4
    * weighted 2×, the rest 1×, reproducible across engines/reruns.
    */
  def weightedSampleQ(s: SparkSession, dir: String): DataFrame = {
    val w = when(col("source").isin("src0", "src1", "src2"), 4.0)
      .when(col("source").isin("src3", "src4"), 2.0)
      .otherwise(1.0)
    graft.pipeline.Curation.weightedSample(
      t(s, dir, "documents").select("doc_id", "source"), w, 50)
  }

  /** Weighted quota: best 3 ES draws per source (weights as in
    * [[weightedSampleQ]]) — "cap every source, prefer the weighted".
    */
  def weightedQuotaQ(s: SparkSession, dir: String): DataFrame = {
    val w = when(col("source").isin("src0", "src1", "src2"), 4.0)
      .when(col("source").isin("src3", "src4"), 2.0)
      .otherwise(1.0)
    graft.pipeline.Curation.weightedQuotaSample(
      t(s, dir, "documents").select("doc_id", "source"), w, 3)
  }

  /** Overlapping token-window chunking (window 32, stride 24) — the
    * RAG / context-window preprocessing step, map-only.
    */
  def chunkDocsQ(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Curation.chunkDocuments(t(s, dir, "documents"), 32, 24)

  /** Inverted-index build: token → document frequency + a bounded
    * posting sample (the 10 lowest doc ids via the bounded-heap
    * TopKPerKey — a full posting materialization at 100 TB shards by
    * token range instead of collecting unbounded lists per key).
    */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text"))))
        .as("token"))
    val dfreq = toks.groupBy("token")
      .agg(count(lit(1)).as("df")) // (doc, token) pairs are distinct
    val postings = graft.plans.TopK.perKey(toks, Seq(col("token")),
        Seq(col("doc_id")), 10)
      .groupBy("token")
      .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
        .as("postings"))
    dfreq.join(postings, "token")
  }

  /** Vocabulary dictionary encoding: dense token ids in global
    * sorted order via the range-partition + zipWithIndex path (no
    * single-task `row_number` bottleneck).
    */
  def dictEncode(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    TextAnalysis.dictionaryEncode(toks, "token")
      .withColumnsRenamed(Map("value" -> "token", "id" -> "token_id"))
  }

  /** Tokenizer capstone: dictionary build + tokenize-to-ids (the
    * sequence a packer would consume), ids in token order, OOV = -1.
    */
  def encodeTokensQ(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val dict = TextAnalysis.dictionaryEncode(
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("token")),
      "token")
    TextAnalysis.encodeTokens(docs, dict)
  }

  /** Real-BPE tokenizer capstone: greedy merges-table subword split
    * ([[TextAnalysis.bpeSubwords]]) → corpus subword dictionary →
    * tokenize-to-ids, ids in subword order.
    */
  def encodeTokensBpeQ(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.encodeTokensBpe(t(s, dir, "documents"), BpeMerges)

  private val BpeTrainMerges = 8
  private val QsBuckets = 64

  /** Tokenizer round trip: dictionary → encode → decode must be the
    * identity on the (single-spaced, in-vocab-by-construction) corpus
    * — the oracle is the RAW table, so a defect anywhere in
    * dictionary ranking, id assembly, or decode ordering breaks the
    * gate.
    */
  def decodeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val dict = TextAnalysis.dictionaryEncode(
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("token")),
      "token")
    TextAnalysis.decodeTokens(TextAnalysis.encodeTokens(docs, dict), dict)
  }

  /** Quality-classifier inference: a deterministic fixed-point weights
    * fixture over [[QsBuckets]] hash buckets (w10 = (bucket·37) mod 21
    * − 10 ∈ [−10, 10], pure integer arithmetic both engines replay) →
    * [[TextAnalysis.scoreLinearModel]].
    */
  def qualityScoreQ(s: SparkSession, dir: String): DataFrame = {
    val weights = s.range(QsBuckets).select(col("id").as("bucket"),
      ((col("id") * 37) % 21 - 10).as("w10"))
    TextAnalysis.scoreLinearModel(t(s, dir, "documents"), weights,
      nBuckets = QsBuckets, bias10 = 5L)
  }

  /** BPE TRAINING capstone: learn a ranked merges table from the
    * corpus itself ([[TextAnalysis.learnBpeMerges]]). The oracle
    * replays all training rounds as an unrolled chain of materialized
    * CTEs — each round one recursive re-segmentation under the merges
    * chosen so far plus one argmax.
    */
  def bpeTrainQ(s: SparkSession, dir: String): DataFrame = {
    val merges = TextAnalysis.learnBpeMerges(
      t(s, dir, "documents"), BpeTrainMerges)
    import s.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "a", "b")
  }

  /** Non-ASCII round-trip fixture: 2-byte (e-acute), 3-byte (CJK), and
    * 4-byte (emoji) UTF-8 sequences, so the byte-level gate covers
    * every UTF-8 width class beyond the corpus's ASCII text.
    */
  private val ByteBpeSuffix =
    " caf\u00e9 \u65e5\u672c\u8a9e \ud83d\ude00"

  /** BYTE-LEVEL BPE round-trip capstone: learn byte-level merges on
    * the corpus itself (non-ASCII suffix appended so multi-byte UTF-8
    * is really exercised), encode every document over the GPT-2 byte
    * alphabet, decode back, and compare against the raw table — the
    * no-OOV claim as an oracle: decode(encode(x)) must be
    * byte-identical for EVERY input, which no word-level `<unk>` path
    * can promise.
    */
  def byteBpeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"),
        lit(ByteBpeSuffix)).as("text"))
    val merges = TextAnalysis.learnBpeMerges(docs, BpeTrainMerges,
      byteLevel = true)
    docs.select(col("doc_id"),
      TextAnalysis.bpeDecodeBytes(
        TextAnalysis.bpeSubwordsBytes(col("text"), merges)).as("text"))
  }

  /** Tokenizer-ARTIFACT round-trip capstone: learn byte-level merges,
    * persist merges + vocabulary + meta as parquet tables
    * ([[TextAnalysis.saveTokenizer]]), then encode and decode every
    * document THROUGH THE STORE alone — the oracle is the raw table,
    * so a defect anywhere in artifact serialization, vocab id
    * assignment, rank ordering, or the stored-path encode/decode
    * breaks the gate. This is `q_byte_bpe_roundtrip` with a parquet
    * round trip of the tokenizer itself in the middle.
    */
  def bpeStoreRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), concat(col("text"),
        lit(ByteBpeSuffix)).as("text"))
    val merges = TextAnalysis.learnBpeMerges(docs, BpeTrainMerges,
      byteLevel = true)
    val store = graft.io.Scratch.dir("graft_bpe_store_").toString
    TextAnalysis.saveTokenizer(docs, merges, store, byteLevel = true)
    TextAnalysis.decodeTokensBpeStored(s, store,
      TextAnalysis.encodeTokensBpeStored(s, store, docs))
  }

  /** Deterministic Lloyd k-means over embeddings (k=8, one centroid
    * update) — the semantic-clustering stage of SemDeDup-style dedup.
    */
  def kmeansQ(s: SparkSession, dir: String): DataFrame =
    Vectors.kmeans(t(s, dir, "embeddings"), 8, 1)

  /** SemDeDup capstone: k-means blocking (k=16, one update) +
    * within-cluster cosine near-dup removal at 0.45.
    */
  def semanticDedupQ(s: SparkSession, dir: String): DataFrame =
    Vectors.semanticDedup(t(s, dir, "embeddings"), 16, 1, 0.45)

  def quantize(s: SparkSession, dir: String): DataFrame =
    // codes serialized to one comparable string — the driver's compare
    // sorts rows in pandas, where raw list cells are unhashable
    Vectors.quantizeMinMax(t(s, dir, "embeddings"))
      .select(col("vec_id"), col("vmin"), col("vmax"),
        array_join(transform(col("codes"), _.cast("string")), ",")
          .as("codes"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pii_redact" -> (piiRedact _),
    "q_line_dedup" -> (lineDedupQ _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_dup_spans" -> (dupSpans _),
    "q_cut_spans" -> (cutSpansQ _),
    "q_vocab" -> (vocab _),
    "q_token_mi" -> ((s: SparkSession, dir: String) =>
      graft.functions.TextAnalysis.tokenClassMi(
        t(s, dir, "documents"), k = 50)),
    "q_heavy_hitters" -> (heavyHitters _),
    "q_tfidf" -> (tfidfQ _),
    "q_bigram_lm" -> (bigramLm _),
    "q_intradoc_dedup" -> (intraDocDedupQ _),
    "q_bm25_topk" -> (bm25Q _),
    "q_bm25_indexed" -> (bm25IndexedQ _),
    "q_bm25_update" -> (bm25UpdateQ _),
    "q_bm25_compact" -> (bm25CompactQ _),
    "q_bm25_delete" -> (bm25DeleteQ _),
    "q_stream_index" -> (streamIndexQ _),
    "q_stream_index_delete" -> (streamIndexDeleteQ _),
    "q_stream_ivf" -> (streamIvfQ _),
    "q_stream_ivf_delete" -> (streamIvfDeleteQ _),
    "q_hybrid_rrf" -> (hybridRrfQ _),
    "q_shuffle_shards" -> (shuffleShardsQ _),
    "q_stream_neardup" -> (streamNearDupQ _),
    "q_train_classifier" -> (trainClassifierQ _),
    "q_ann_recall" -> (annRecallQ _),
    "q_token_budget_mix" -> (tokenBudgetMixQ _),
    "q_trained_score" -> (trainedScoreQ _),
    "q_perplexity" -> (perplexityQ _),
    "q_leakage_split" -> (leakageSplitQ _),
    "q_quantize" -> (quantize _),
    "q_rand_project" -> (randProject _),
    "q_quota_sample" -> (quotaSampleQ _),
    "q_weighted_sample" -> (weightedSampleQ _),
    "q_weighted_quota" -> (weightedQuotaQ _),
    "q_chunk_docs" -> (chunkDocsQ _),
    "q_inverted_index" -> (invertedIndex _),
    "q_dict_encode" -> (dictEncode _),
    "q_encode_tokens" -> (encodeTokensQ _),
    "q_encode_tokens_bpe" -> (encodeTokensBpeQ _),
    "q_bpe_train" -> (bpeTrainQ _),
    "q_byte_bpe_roundtrip" -> (byteBpeRoundtrip _),
    "q_bpe_store_roundtrip" -> (bpeStoreRoundtrip _),
    "q_quality_score" -> (qualityScoreQ _),
    "q_decode_roundtrip" -> (decodeRoundtrip _),
    "q_kmeans" -> (kmeansQ _),
    "q_semantic_dedup" -> (semanticDedupQ _),
    "q_train_split" -> (trainSplit _),
    "q_corpus_stats" -> (corpusStats _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_pack_sequences" -> (packSequences _),
    "q_token_count" -> (tokenCount _),
    "q_text_quality" -> (textQuality _),
    "q_repetition" -> (repetition _),
    "q_text_clean" -> (textClean _),
    "q_lang_id" -> (langId _),
    "q_fingerprint" -> (fingerprint _),
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_dedup_exact" -> (dedupExact _),
    "q_jaccard_pairs" -> (jaccardPairs _),
    "q_containment_pairs" -> (containmentQ _),
    "q_minhash_sig" -> (minhashSig _),
    "q_dedup_fuzzy" -> (dedupFuzzy _),
    "q_simhash" -> (simhash _),
    "q_contamination" -> (contamination _),
    "q_cosine_topk" -> (cosineTopK _),
    "q_hard_negatives" -> (hardNegativesQ _),
    "q_negative_sample" -> (negativeSampleQ _),
    "q_ann_lsh" -> (annLsh _),
    "q_ann_topk" -> (annTopK _),
    "q_ann_multiprobe" -> (annMultiprobe _),
    "q_embed_neardup" -> (embedNearDup _),
    "q_pq_topk" -> (pqTopKQ _),
    "q_pq_refined" -> (pqRefinedQ _),
    "q_pca_project" -> (pcaProjectQ _),
    "q_pca_topk" -> (pcaTopkQ _),
    "q_ivf_pq" -> (ivfPqQ _),
    "q_ivf_pq_indexed" -> (ivfPqIndexedQ _),
    "q_ivf_topk" -> (ivfTopK _),
    "q_ivf_probe" -> (ivfProbe _),
    "q_ivf_indexed" -> (ivfIndexed _),
    "q_ivf_update" -> (ivfUpdateQ _),
    "q_ivf_delete" -> (ivfDeleteQ _),
    "q_curation" -> (curation _),
    "q_training_mix" -> (trainingMix _))

  // --- oracles ---------------------------------------------------------

  /** Portable 60-bit md5 hash in DuckDB. */
  private def h60Sql(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** The BM25 oracle CTE chain: postings → query terms (distinct) →
    * query-term-only df → 1-row N/Σdl → fixed-point per-term micro
    * scores → per-(query, doc) sums → ranked `rk`. Mirrors
    * `TextAnalysis.bm25TopK`'s FP op order exactly (k1=1.25, b=0.75 —
    * exact binary doubles). The optional corpus predicate lands on
    * the toks CTE — the chain's ONLY corpus reference, so it threads
    * through everything (dl, post, df, N, Σdl) exactly as a physical
    * delete would; the tombstone-delete gate's oracle truth is the
    * surviving documents.
    */
  private def bm25Ctes(where: String = ""): String = {
    val pred = if (where.isEmpty) "" else s" WHERE $where"
    val vals = Bm25QueryFixture.map { case (i, q) =>
      s"(CAST($i AS BIGINT), '$q')" }.mkString(", ")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents$pred),
       dl AS (SELECT doc_id, len(w) AS dl FROM toks),
       post AS (SELECT doc_id, word, count(*) AS tf
                FROM (SELECT doc_id, unnest(w) AS word FROM toks)
                GROUP BY 1, 2),
       qt AS (SELECT query_id,
                unnest(list_distinct(string_split(qtext, ' '))) AS word
              FROM (VALUES $vals) AS q(query_id, qtext)),
       dfq AS (SELECT word, count(*) AS df
               FROM post JOIN (SELECT DISTINCT word FROM qt) USING (word)
               GROUP BY word),
       g AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sdl
             FROM dl),
       micro AS (SELECT query_id, post.doc_id,
           CAST(round(
             ln(1.0 + (CAST(n - df AS DOUBLE) + 0.5)
                    / (CAST(df AS DOUBLE) + 0.5))
             * (tf * CAST(2.25 AS DOUBLE))
             / (tf + CAST(1.25 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE) * n / sdl))
             * 1000000.0) AS BIGINT) AS lq
         FROM post JOIN qt USING (word) JOIN dfq USING (word)
           JOIN dl ON post.doc_id = dl.doc_id, g),
       sc AS (SELECT query_id, doc_id, sum(lq) AS s FROM micro
              GROUP BY 1, 2),
       rk AS (SELECT query_id, doc_id, s, row_number()
                OVER (PARTITION BY query_id ORDER BY s DESC, doc_id)
                AS rank
              FROM sc)"""
  }

  /** BM25 CTE chain shared by `q_bm25_topk` / `q_bm25_indexed` /
    * `q_bm25_update` / `q_bm25_compact` / `q_hybrid_rrf` (see
    * [[bm25Ctes]] for the structure and FP-order contract).
    */
  private lazy val Bm25Ctes: String = bm25Ctes()

  /** Classifier-training CTE chain (`q_train_classifier` /
    * `q_trained_score`): hashed-count features + 10⁶-scaled labels →
    * three unrolled full-batch logistic GD steps, every cross-row sum
    * exact-integer, mirroring `TextAnalysis.trainLinearModel`
    * (nBuckets 64, lrInv 16, label = source ∈ src0-src2). Exposes
    * `feat` and final weights `w3 (bucket, w)`.
    */
  private lazy val TrainCtes: String = {
    def sig(z: String) =
      s"""CAST(round(1000000.0 /
         (1.0 + exp(-(CAST($z AS DOUBLE) / 1000000.0)))) AS BIGINT)"""
    def upd(g: String) =
      s"CAST(round(CAST($g AS DOUBLE) / (16.0 * n)) AS BIGINT)"
    s"""feat AS (SELECT doc_id, bucket, count(*) AS cnt
          FROM (SELECT doc_id, ${h60Sql("token")} % 64 AS bucket
                FROM (SELECT doc_id,
                        unnest(string_split(text, ' ')) AS token
                      FROM documents))
          GROUP BY 1, 2),
       yl AS (SELECT doc_id,
           CAST(CASE WHEN source IN ('src0', 'src1', 'src2')
                THEN 1000000 ELSE 0 END AS BIGINT) AS y6
         FROM documents),
       nn AS (SELECT count(*) AS n FROM documents),
       g1 AS (SELECT bucket, sum((y6 - 500000) * cnt) AS g
              FROM feat JOIN yl USING (doc_id) GROUP BY 1),
       w1 AS (SELECT bucket, ${upd("g")} AS w FROM g1, nn),
       z2 AS (SELECT doc_id, sum(w * cnt) AS z
              FROM feat JOIN w1 USING (bucket) GROUP BY 1),
       s2 AS (SELECT doc_id, ${sig("z")} AS s6 FROM z2),
       g2 AS (SELECT bucket, sum((y6 - s6) * cnt) AS g
              FROM feat JOIN yl USING (doc_id) JOIN s2 USING (doc_id)
              GROUP BY 1),
       w2 AS (SELECT bucket, w1.w + ${upd("g2.g")} AS w
              FROM w1 JOIN g2 USING (bucket), nn),
       z3 AS (SELECT doc_id, sum(w * cnt) AS z
              FROM feat JOIN w2 USING (bucket) GROUP BY 1),
       s3 AS (SELECT doc_id, ${sig("z")} AS s6 FROM z3),
       g3 AS (SELECT bucket, sum((y6 - s6) * cnt) AS g
              FROM feat JOIN yl USING (doc_id) JOIN s3 USING (doc_id)
              GROUP BY 1),
       w3 AS (SELECT bucket, w2.w + ${upd("g3.g")} AS w
              FROM w2 JOIN g3 USING (bucket), nn)"""
  }

  /** Distinct word-trigram shingle CTE body. */
  private val ShinglesCte =
    """sh AS (SELECT doc_id, list_distinct(
      |  [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |   for i in generate_series(1, greatest(len(w)-2, 0))]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w
      |        FROM documents))""".stripMargin

  /** Shared CTE chain for the near-dup clustering oracles
    * (`q_dedup_clusters`, `q_leakage_split`): trigram shingles →
    * Jaccard ≥ 0.5 pairs → symmetric edge set → recursive reachability
    * → `cl` (every document labeled with its component's minimal
    * member id). Requires `WITH RECURSIVE`.
    */
  private lazy val ClusterCtes: String =
    s"""$ShinglesCte,
       inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         FROM inv a JOIN inv b
           ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       sizes AS (SELECT doc_id, len(s) AS n FROM sh),
       jac AS (SELECT doc_a, doc_b FROM pairs
         JOIN sizes sa ON sa.doc_id = doc_a
         JOIN sizes sb ON sb.doc_id = doc_b
         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM jac
                 UNION
                 SELECT doc_b AS src, doc_a AS dst FROM jac),
       reach(src, dst) AS (
         SELECT src, dst FROM edges
         UNION
         SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       cl AS (SELECT d.doc_id,
           CAST(least(d.doc_id, coalesce(min(r.dst), d.doc_id))
             AS BIGINT) AS cluster_id
         FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
         GROUP BY d.doc_id)"""

  /** Shared CTE chain for the duplicated-substring oracles
    * (`q_dup_spans`, `q_cut_spans`): dup-injected corpus → k=8 token
    * windows with positions → corpus-duplicated window starts →
    * overlap-merged span islands (`si`). Also exposes `dup` (the
    * corpus) and `tk` (tokenized docs) for downstream CTEs.
    */
  private lazy val SpanCtes: String =
    s"""dup AS (SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000000, text FROM documents
            WHERE doc_id % 5 = 0),
          tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM dup),
          wins AS (SELECT doc_id, unnest(list_transform(
              generate_series(1, greatest(len(w) - 7, 0)),
              i -> struct_pack(pos := i - 1,
                h := ${h60Sql("array_to_string(w[i : i+7], ' ')")})))
              AS pw
            FROM tk),
          ws AS (SELECT doc_id, pw.pos AS pos, pw.h AS h FROM wins),
          dh AS (SELECT h FROM ws GROUP BY h HAVING count(*) >= 2),
          ds AS (SELECT doc_id, pos FROM ws JOIN dh USING (h)),
          m AS (SELECT doc_id, pos,
              max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
            FROM ds),
          sp AS (SELECT doc_id, pos,
              CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END
                AS ns
            FROM m),
          si AS (SELECT doc_id, pos,
              sum(ns) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS UNBOUNDED PRECEDING) AS span
            FROM sp)"""

  private def minhashSql(i: Int): String = {
    val (a, b) = (Dedup.hashA(i), Dedup.hashB(i))
    s"""coalesce(list_min(list_transform(s,
       |  x -> ($a * (${h60Sql("x")} % 2147483647) + $b) % 2147483647)),
       |  2147483647) AS mh_$i""".stripMargin
  }

  /** Sequential left-fold dot product over 1-based DuckDB lists. */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce([$a[i+1] * $b[i+1]
       |  for i in generate_series(0, 63)], (x, y) -> x + y)""".stripMargin

  /** Rounded cosine over 64-dim lists (mirrors Vectors.cosine + round 6). */
  private def cosSql(a: String, b: String): String =
    s"""round(${dotSql(a, b)} /
       |  (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)""".stripMargin

  /** Deterministic Lloyd k-means CTE chain (one centroid update,
    * integer-quantized means) ending at `a1(vec_id, e, cid, ccos)` —
    * mirrors [[graft.similarity.Vectors.kmeans]].
    */
  private def kmeansCtes(k: Int): String =
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |cen0 AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < $k),
       |s0 AS (SELECT v.vec_id, v.e, cen0.cid,
       |         ${cosSql("v.e", "cen0.ce")} AS ccos
       |       FROM v CROSS JOIN cen0),
       |a0 AS (SELECT vec_id, e, cid FROM
       |        (SELECT *, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY ccos DESC, cid) AS rn FROM s0)
       |       WHERE rn = 1),
       |qd AS (SELECT cid, d,
       |         CAST(floor(e[d+1] * 1000000.0 + 0.5) AS BIGINT) AS q
       |       FROM a0 CROSS JOIN
       |         (SELECT unnest(generate_series(0, 63)) AS d)),
       |su AS (SELECT cid, d, CAST(sum(q) AS BIGINT) AS s, count(*) AS cnt
       |       FROM qd GROUP BY 1, 2),
       |cen1 AS (SELECT cid, list((CAST(s AS DOUBLE) / cnt) / 1000000.0
       |           ORDER BY d) AS ce
       |         FROM su GROUP BY cid),
       |s1 AS (SELECT v.vec_id, v.e, cen1.cid,
       |         ${cosSql("v.e", "cen1.ce")} AS ccos
       |       FROM v CROSS JOIN cen1),
       |a1 AS (SELECT vec_id, e, cid, ccos FROM
       |        (SELECT *, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY ccos DESC, cid) AS rn FROM s1)
       |       WHERE rn = 1)""".stripMargin

  private def planeSql(i: Int): String =
    s"CAST((${i}*64 + d) * 2654435761 % 1000003 AS DOUBLE) / 1000003.0 - 0.5"

  private def bucketSql(v: String): String =
    (0 until 8).map { i =>
      s"""CASE WHEN list_reduce([$v[d+1] * (${planeSql(i)})
         |  for d in generate_series(0, 63)], (x, y) -> x + y) > 0.0
         |  THEN ${1L << i} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  private def bucket4Sql(v: String): String =
    (0 until 4).map { i =>
      s"""CASE WHEN list_reduce([$v[d+1] * (${planeSql(i)})
         |  for d in generate_series(0, 63)], (x, y) -> x + y) > 0.0
         |  THEN ${1L << i} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  /** The curation pipeline's CTE chain (quality gate → exact dedup →
    * near-dup pairs), shared by q_curation and q_training_mix.
    */
  private val CurationCtes =
    """q AS (
         SELECT doc_id, text, lang, len(text) AS n_chars
         FROM documents
         WHERE len(text) >= 100
           AND CAST(len(list_filter(string_split(text, ' '),
                 x -> x = 'the' OR x = 'a')) AS DOUBLE) /
               CAST(len(string_split(text, ' ')) AS DOUBLE) <= 0.3),
       canon AS (
         SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(lower(text))),
       qd AS (SELECT q.* FROM q JOIN canon USING (doc_id)),
       sh AS (SELECT doc_id, list_distinct(
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            for i in generate_series(1, greatest(len(w)-2, 0))]) AS s
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM qd)),
       inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
       pairs AS (
         SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       jac AS (
         SELECT da, db FROM pairs
         JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = da
         JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = db
         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5)"""

  /** The PII-synthesis expression in DuckDB (mirrors [[piiSynth]]). */
  private val PiiSynthSql =
    """'contact u' || CAST(doc_id AS VARCHAR) ||
      '@mail' || CAST(doc_id % 7 AS VARCHAR) ||
      '.org ip 10.' || CAST(doc_id % 256 AS VARCHAR) ||
      '.3.' || CAST(doc_id % 100 AS VARCHAR) ||
      ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      ' ' || text"""

  /** SQL replay of [[TextAnalysis.learnBpeMerges]]: the training loop
    * unrolls into a chain of MATERIALIZED CTEs (materialization is
    * load-bearing — each stage is referenced by every later stage, and
    * inlining would re-evaluate the chain exponentially). Stage i:
    * `seg_{i-1}` re-segments the word-frequency dictionary under the
    * merges chosen so far (the same recursive min-rank-then-leftmost
    * walk as the q_encode_tokens_bpe oracle, with the rank MAP built
    * from the chosen-merge rows instead of literals), and `m_i` takes
    * the argmax adjacent pair (count desc, then (a, b) — the query's
    * exact tie-break) with the >= 2 stop rule as a HAVING.
    */
  private def bpeTrainOracleSql: String = {
    val n = BpeTrainMerges
    def segCte(i: Int): String =
      if (i == 0)
        """seg_0 AS MATERIALIZED (
          SELECT w, cnt, list_transform(generate_series(1, length(w)),
                                        x -> w[x]) AS toks
          FROM wf)"""
      else {
        val mm = (1 to i)
          .map(j => s"SELECT a, b, $j AS r FROM m_$j").mkString(" UNION ALL ")
        s"""mm_$i AS MATERIALIZED ($mm),
          rmap_$i AS MATERIALIZED (
            SELECT map(list(a || chr(1) || b ORDER BY r),
                       list(r ORDER BY r)) AS rm FROM mm_$i),
          st_$i AS (
            SELECT w, cnt, list_transform(generate_series(1, length(w)),
                                          x -> w[x]) AS toks
            FROM wf
            UNION ALL
            SELECT w, cnt,
                   toks[1:bi-1] || [toks[bi] || toks[bi+1]] || toks[bi+2:]
            FROM (SELECT w, cnt, toks,
                    CASE WHEN pmin < 99999900000
                         THEN CAST(pmin % 100000 AS INT) END AS bi
                  FROM (SELECT w, cnt, toks,
                          coalesce(list_min(list_transform(
                            generate_series(1, len(toks) - 1),
                            x -> coalesce(
                                   rm[toks[x] || chr(1) || toks[x + 1]][1],
                                   999999)::BIGINT * 100000 + x)),
                            99999900000) AS pmin
                        FROM st_$i, rmap_$i) q1) q2
            WHERE bi IS NOT NULL),
          seg_$i AS MATERIALIZED (
            SELECT w, cnt, toks FROM st_$i, rmap_$i
            WHERE coalesce(list_min(list_transform(
                    generate_series(1, len(toks) - 1),
                    x -> coalesce(rm[toks[x] || chr(1) || toks[x + 1]][1],
                                  999999))), 999999) = 999999)"""
      }
    def mCte(i: Int): String =
      s"""p_$i AS MATERIALIZED (
        SELECT toks[x] AS a, toks[x+1] AS b, cnt
        FROM seg_${i - 1},
             LATERAL (SELECT unnest(generate_series(1, len(toks)-1)) AS x)
        WHERE len(toks) >= 2),
        m_$i AS MATERIALIZED (
          SELECT a, b FROM p_$i GROUP BY a, b HAVING sum(cnt) >= 2
          ORDER BY sum(cnt) DESC, a, b LIMIT 1)"""
    val parts = Seq(
      """wf AS MATERIALIZED (
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS w
          FROM documents WHERE text IS NOT NULL)
        WHERE length(w) > 0 GROUP BY w)""",
      segCte(0)) ++
      (1 to n).flatMap(i =>
        Seq(mCte(i)) ++ (if (i < n) Seq(segCte(i)) else Nil))
    val finalSelect = (1 to n)
      .map(j => s"SELECT CAST(${j - 1} AS BIGINT) AS rank, a, b FROM m_$j")
      .mkString(" UNION ALL ")
    "WITH RECURSIVE " + parts.mkString(", ") + " " + finalSelect
  }

  /** The IVF multi-probe oracle chain, with an optional predicate on
    * the CORPUS side only (`c` — queries assign from the full `ass`):
    * the tombstone-delete gate's truth is the surviving vectors, while
    * a deleted vector remains a perfectly valid query-by-example.
    */
  /** Squared-L2 over `sub`-dim sublists, sequential fold (mirrors
    * Vectors.l2Sq).
    */
  private def l2SqSql(a: String, b: String, sub: Int): String =
    s"""list_reduce([($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1])
       |  for i in generate_series(0, ${sub - 1})], (x, y) -> x + y)"""
      .stripMargin

  /** Shared CTE block replaying PQ train (grouped Lloyd, iters=1,
    * integer-quantized means) → encode (`a1`) → per-query LUT
    * partials (`lut`). [[pqSql]] and [[ivfPqSql]] build their ADC
    * tails on it.
    */
  private def pqCtes(m: Int, ksub: Int, dims: Int, nq: Int): String = {
    val sub = dims / m
    s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |  sv AS (SELECT vec_id, j, e[j*$sub+1 : j*$sub+$sub] AS s
       |         FROM v CROSS JOIN
       |           (SELECT unnest(generate_series(0, ${m - 1})) AS j)),
       |  cb0 AS (SELECT j, CAST(vec_id AS INT) AS code, s AS c
       |          FROM sv WHERE vec_id < $ksub),
       |  s0 AS (SELECT sv.vec_id, sv.j, sv.s, cb0.code,
       |           round(${l2SqSql("sv.s", "cb0.c", sub)}, 6) AS dist
       |         FROM sv JOIN cb0 ON sv.j = cb0.j),
       |  a0 AS (SELECT vec_id, j, s, code FROM
       |          (SELECT *, row_number() OVER (PARTITION BY vec_id, j
       |             ORDER BY dist, code) AS rn FROM s0) WHERE rn = 1),
       |  qd AS (SELECT j, code, d,
       |           CAST(floor(s[d+1] * 1000000.0 + 0.5) AS BIGINT) AS q
       |         FROM a0 CROSS JOIN
       |           (SELECT unnest(generate_series(0, ${sub - 1})) AS d)),
       |  su AS (SELECT j, code, d, CAST(sum(q) AS BIGINT) AS sm,
       |           count(*) AS cnt FROM qd GROUP BY 1, 2, 3),
       |  cb1 AS (SELECT j, code,
       |            list((CAST(sm AS DOUBLE) / cnt) / 1000000.0
       |              ORDER BY d) AS c
       |          FROM su GROUP BY j, code),
       |  s1 AS (SELECT sv.vec_id, sv.j, cb1.code,
       |           round(${l2SqSql("sv.s", "cb1.c", sub)}, 6) AS dist
       |         FROM sv JOIN cb1 ON sv.j = cb1.j),
       |  a1 AS (SELECT vec_id, j, code FROM
       |          (SELECT *, row_number() OVER (PARTITION BY vec_id, j
       |             ORDER BY dist, code) AS rn FROM s1) WHERE rn = 1),
       |  qs AS (SELECT vec_id AS query_id, j, s FROM sv
       |         WHERE vec_id < $nq),
       |  lut AS (SELECT qs.query_id, qs.j, cb1.code,
       |            ${l2SqSql("qs.s", "cb1.c", sub)} AS pd
       |          FROM qs JOIN cb1 ON qs.j = cb1.j)""".stripMargin
  }

  /** Ranked ADC tail over a `pj(query_id, vec_id, pd, j)` CTE. */
  private def adcTailSql(k: Int): String =
    s"""  sc AS (SELECT query_id, vec_id,
       |           round(list_reduce(list(pd ORDER BY j),
       |             (x, y) -> x + y), 6) AS dist
       |         FROM pj GROUP BY query_id, vec_id),
       |  r AS (SELECT query_id, vec_id, dist,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY dist, vec_id) AS rank FROM sc)
       |SELECT query_id, vec_id, dist, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= $k""".stripMargin

  /** DuckDB replay of the flat-PQ pipeline (mirrors
    * Vectors.trainPqCodebooks iters=1 → encodePq → pqTopK).
    */
  private def pqSql(m: Int, ksub: Int, dims: Int, nq: Int,
                    k: Int): String =
    s"""WITH ${pqCtes(m, ksub, dims, nq)},
       |  pj AS (SELECT lut.query_id, a1.vec_id, lut.pd, a1.j
       |         FROM a1 JOIN lut ON a1.j = lut.j AND a1.code = lut.code),
       |${adcTailSql(k)}""".stripMargin

  /** One power-iteration step as DuckDB CTEs (mirrors
    * Vectors.pcaProject's quantized matvec + HALF_UP renormalization).
    */
  private def pcaStepSql(i: Int, sfx: String = "",
                         cv: String = "cv"): String = {
    val prev = if (i == 1) s"x0$sfx" else s"x${i - 1}$sfx"
    s"""dot$i$sfx AS MATERIALIZED (SELECT $cv.vec_id,
       |            list_reduce(list($cv.c * $prev.xv ORDER BY $cv.d),
       |              (a, b) -> a + b) AS dot
       |          FROM $cv JOIN $prev ON $cv.d = $prev.d
       |          GROUP BY $cv.vec_id),
       |  y$i$sfx AS MATERIALIZED (SELECT $cv.d,
       |           CAST(sum(CAST(floor($cv.c * dot$i$sfx.dot * 1000000.0
       |             + 0.5) AS BIGINT)) AS BIGINT) AS sm
       |         FROM $cv JOIN dot$i$sfx ON $cv.vec_id = dot$i$sfx.vec_id
       |         GROUP BY $cv.d),
       |  n$i$sfx AS MATERIALIZED (SELECT sqrt(list_reduce(
       |            list((CAST(sm AS DOUBLE) / 1000000.0) *
       |                 (CAST(sm AS DOUBLE) / 1000000.0) ORDER BY d),
       |            (a, b) -> a + b)) AS nrm FROM y$i$sfx),
       |  x$i$sfx AS MATERIALIZED (SELECT d, round((CAST(sm AS DOUBLE) / 1000000.0)
       |            / (SELECT nrm FROM n$i$sfx), 6) AS xv
       |          FROM y$i$sfx)""".stripMargin
  }

  /** DuckDB replay of the full power-iteration PCA projection. */
  private def pcaSql(dims: Int, iters: Int): String = {
    val steps = (1 to iters).map(i => pcaStepSql(i)).mkString(",\n  ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
       |           FROM embeddings),
       |  ds AS (SELECT unnest(generate_series(0, ${dims - 1})) AS d),
       |  ex AS MATERIALIZED (SELECT vec_id, d, e[d + 1] AS x FROM v CROSS JOIN ds),
       |  mu AS (SELECT d,
       |           (CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / count(*)) / 1000000.0 AS m
       |         FROM ex GROUP BY d),
       |  cv AS MATERIALIZED (SELECT ex.vec_id, ex.d, ex.x - mu.m AS c
       |         FROM ex JOIN mu ON ex.d = mu.d),
       |  x0 AS (SELECT d, round(1.0 / sqrt(CAST($dims AS DOUBLE)), 6)
       |           AS xv FROM ds),
       |  $steps
       |SELECT cv.vec_id,
       |  round(list_reduce(list(cv.c * x$iters.xv ORDER BY cv.d),
       |    (a, b) -> a + b), 6) + 0.0 AS pc1
       |FROM cv JOIN x$iters ON cv.d = x$iters.d
       |GROUP BY cv.vec_id""".stripMargin
  }

  /** DuckDB replay of deflated two-component PCA (mirrors
    * Vectors.pcaProjectK k=2): stage 1 as in `pcaSql`, then the
    * residual corpus c − (c⋅x)·x, stage 2 on the residual, scores for
    * BOTH components against the original centered vectors.
    */
  private def pcaTopkSql(dims: Int, iters: Int): String = {
    val steps1 = (1 to iters).map(i => pcaStepSql(i)).mkString(",\n  ")
    val steps2 = (1 to iters).map(pcaStepSql(_, "b", "cv2"))
      .mkString(",\n  ")
    val xf = s"x$iters"
    val xfb = s"x${iters}b"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
       |           FROM embeddings),
       |  ds AS (SELECT unnest(generate_series(0, ${dims - 1})) AS d),
       |  ex AS MATERIALIZED (SELECT vec_id, d, e[d + 1] AS x FROM v CROSS JOIN ds),
       |  mu AS (SELECT d,
       |           (CAST(sum(CAST(floor(x * 1000000.0 + 0.5) AS BIGINT))
       |              AS DOUBLE) / count(*)) / 1000000.0 AS m
       |         FROM ex GROUP BY d),
       |  cv AS MATERIALIZED (SELECT ex.vec_id, ex.d, ex.x - mu.m AS c
       |         FROM ex JOIN mu ON ex.d = mu.d),
       |  x0 AS (SELECT d, round(1.0 / sqrt(CAST($dims AS DOUBLE)), 6)
       |           AS xv FROM ds),
       |  $steps1,
       |  dotf AS MATERIALIZED (SELECT cv.vec_id,
       |             list_reduce(list(cv.c * $xf.xv ORDER BY cv.d),
       |               (a, b) -> a + b) AS dot
       |           FROM cv JOIN $xf ON cv.d = $xf.d GROUP BY cv.vec_id),
       |  cv2 AS MATERIALIZED (SELECT cv.vec_id, cv.d,
       |            cv.c - dotf.dot * $xf.xv AS c
       |          FROM cv JOIN $xf ON cv.d = $xf.d
       |          JOIN dotf ON cv.vec_id = dotf.vec_id),
       |  x0b AS (SELECT d, round(1.0 / sqrt(CAST($dims AS DOUBLE)), 6)
       |            AS xv FROM ds),
       |  $steps2,
       |  p1 AS (SELECT cv.vec_id,
       |           round(list_reduce(list(cv.c * $xf.xv ORDER BY cv.d),
       |             (a, b) -> a + b), 6) + 0.0 AS pc1
       |         FROM cv JOIN $xf ON cv.d = $xf.d GROUP BY cv.vec_id),
       |  p2 AS (SELECT cv.vec_id,
       |           round(list_reduce(list(cv.c * $xfb.xv ORDER BY cv.d),
       |             (a, b) -> a + b), 6) + 0.0 AS pc2
       |         FROM cv JOIN $xfb ON cv.d = $xfb.d GROUP BY cv.vec_id)
       |SELECT p1.vec_id, p1.pc1, p2.pc2
       |FROM p1 JOIN p2 ON p1.vec_id = p2.vec_id""".stripMargin
  }

  /** DuckDB replay of refined PQ (mirrors Vectors.pqTopKRefined):
    * flat ADC shortlist, then exact full-dimension L2 re-rank of the
    * shortlist against the stored vectors.
    */
  private def pqRefinedSql(m: Int, ksub: Int, dims: Int, nq: Int,
                           k: Int, shortlist: Int): String =
    s"""WITH ${pqCtes(m, ksub, dims, nq)},
       |  pj AS (SELECT lut.query_id, a1.vec_id, lut.pd, a1.j
       |         FROM a1 JOIN lut ON a1.j = lut.j AND a1.code = lut.code),
       |  sc AS (SELECT query_id, vec_id,
       |           round(list_reduce(list(pd ORDER BY j),
       |             (x, y) -> x + y), 6) AS dist
       |         FROM pj GROUP BY query_id, vec_id),
       |  shortl AS (SELECT query_id, vec_id FROM
       |          (SELECT query_id, vec_id,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY dist, vec_id) AS rn FROM sc)
       |          WHERE rn <= $shortlist),
       |  ex AS (SELECT s.query_id, s.vec_id,
       |           round(${l2SqSql("cv.e", "qv.e", dims)}, 6) AS dist
       |         FROM shortl s
       |         JOIN v qv ON qv.vec_id = s.query_id
       |         JOIN v cv ON cv.vec_id = s.vec_id),
       |  r AS (SELECT query_id, vec_id, dist,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY dist, vec_id) AS rank FROM ex)
       |SELECT query_id, vec_id, dist, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= $k""".stripMargin

  /** DuckDB replay of IVF-PQ (mirrors Vectors.ivfAssignL2 +
    * ivfPqTopK): L2 coarse quantizer over `ncen` id-prefix centroids,
    * queries probe `nprobe` clusters, ADC restricted to probed
    * clusters' members.
    */
  private def ivfPqSql(m: Int, ksub: Int, dims: Int, nq: Int, k: Int,
                       ncen: Int, nprobe: Int): String =
    s"""WITH ${pqCtes(m, ksub, dims, nq)},
       |  cenl AS (SELECT vec_id AS centroid_id, e AS ce FROM v
       |           WHERE vec_id < $ncen),
       |  ca AS (SELECT vec_id, centroid_id AS cluster FROM
       |          (SELECT v.vec_id, cenl.centroid_id,
       |             row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |               round(${l2SqSql("v.e", "cenl.ce", dims)}, 6),
       |               cenl.centroid_id) AS rn
       |           FROM v CROSS JOIN cenl) WHERE rn = 1),
       |  qp AS (SELECT query_id, centroid_id AS cluster FROM
       |          (SELECT q.vec_id AS query_id, cenl.centroid_id,
       |             row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |               round(${l2SqSql("q.e", "cenl.ce", dims)}, 6),
       |               cenl.centroid_id) AS rn
       |           FROM v q CROSS JOIN cenl WHERE q.vec_id < $nq)
       |          WHERE rn <= $nprobe),
       |  pairs AS (SELECT qp.query_id, ca.vec_id
       |            FROM qp JOIN ca ON qp.cluster = ca.cluster),
       |  pj AS (SELECT p.query_id, p.vec_id, lut.pd, a1.j
       |         FROM pairs p
       |         JOIN a1 ON a1.vec_id = p.vec_id
       |         JOIN lut ON lut.query_id = p.query_id
       |           AND lut.j = a1.j AND lut.code = a1.code),
       |${adcTailSql(k)}""".stripMargin

  private def ivfProbeSql(cPred: String = ""): String = {
    val pred = if (cPred.isEmpty) "" else s" AND $cPred"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          cen AS (SELECT vec_id AS centroid_id, e AS ce FROM v
            WHERE vec_id < 16),
          ass AS (
            SELECT vec_id, e, centroid_id,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY ccos DESC, centroid_id) AS rn
            FROM (SELECT v.vec_id, v.e, cen.centroid_id,
                    round(${dotSql("v.e", "cen.ce")} /
                      (sqrt(${dotSql("v.e", "v.e")}) *
                       sqrt(${dotSql("cen.ce", "cen.ce")})), 6) AS ccos
                  FROM v CROSS JOIN cen)),
          c AS (SELECT vec_id, e, centroid_id AS cluster FROM ass
            WHERE rn = 1$pred),
          q AS (SELECT vec_id AS query_id, e AS qe,
                  centroid_id AS cluster
                FROM ass WHERE rn <= 2 AND vec_id < 5),
          scored AS (
            SELECT query_id, c.vec_id,
              round(${dotSql("qe", "c.e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("c.e", "c.e")})),
                6) AS cos
            FROM c JOIN q USING (cluster) WHERE c.vec_id <> query_id),
          r AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5"""
  }

  private lazy val IvfProbeSql: String = ivfProbeSql()

  val oracles: Map[String, String] = {
    val eRe = TextAnalysis.EmailPattern
    val pRe = TextAnalysis.PhonePattern
    val iRe = TextAnalysis.Ipv4Pattern
    Map(
    "q_pii_redact" ->
      s"""WITH synth AS (SELECT doc_id, $PiiSynthSql AS s1 FROM documents),
          s2 AS (SELECT doc_id, s1,
              regexp_replace(s1, '$eRe', '<EMAIL>', 'g') AS t2 FROM synth),
          s3 AS (SELECT doc_id, s1, t2,
              regexp_replace(t2, '$pRe', '<PHONE>', 'g') AS t3 FROM s2)
          SELECT doc_id,
            regexp_replace(t3, '$iRe', '<IP>', 'g') AS clean,
            len(regexp_extract_all(s1, '$eRe')) AS n_emails,
            len(regexp_extract_all(t2, '$pRe')) AS n_phones,
            len(regexp_extract_all(t3, '$iRe')) AS n_ips
          FROM s3""",
    "q_line_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
         lined AS (SELECT doc_id,
             [array_to_string(w[i*3+1 : i*3+3], ' ')
              for i in generate_series(0,
                CAST(ceil(len(w) / 3.0) AS BIGINT) - 1)] AS ls
           FROM toks),
         flat AS (SELECT doc_id, unnest(list_transform(range(0, len(ls)),
             i -> struct_pack(pos := i,
                              line := ls[CAST(i + 1 AS BIGINT)]))) AS pl
           FROM lined),
         ln AS (SELECT doc_id, pl.pos AS pos, pl.line AS line FROM flat),
         win AS (SELECT doc_id, pos, line, row_number()
             OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM ln),
         reb AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
                   AS text
                 FROM win WHERE rn = 1 GROUP BY doc_id)
         SELECT d.doc_id, coalesce(reb.text, '') AS text
         FROM documents d LEFT JOIN reb ON d.doc_id = reb.doc_id""",
    "q_intradoc_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
         lined AS (SELECT doc_id,
             [array_to_string(w[i*3+1 : i*3+3], ' ')
              for i in generate_series(0,
                CAST(ceil(len(w) / 3.0) AS BIGINT) - 1)] AS ls
           FROM toks),
         echoed AS (SELECT doc_id,
             array_to_string(ls, chr(10)) || chr(10) ||
               array_to_string(ls, chr(10)) AS text
           FROM lined),
         el AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                FROM echoed),
         flat AS (SELECT doc_id, unnest(list_transform(range(0, len(ls)),
             i -> struct_pack(pos := i,
                              line := ls[CAST(i + 1 AS BIGINT)]))) AS pl
           FROM el),
         ln AS (SELECT doc_id, pl.pos AS pos, pl.line AS line FROM flat),
         firsts AS (SELECT doc_id, line, min(pos) AS pos FROM ln
                    GROUP BY doc_id, line)
         SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
         FROM firsts GROUP BY doc_id""",
    "q_bm25_topk" ->
      s"""WITH $Bm25Ctes
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    // the indexed path must equal the scan path bit-for-bit
    "q_bm25_indexed" ->
      s"""WITH $Bm25Ctes
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    // an incrementally-maintained index must be indistinguishable
    // from a single-pass build over the whole corpus
    "q_bm25_update" ->
      s"""WITH $Bm25Ctes
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    // compaction changes file layout only — build+update+compact+serve
    // still equals the whole-corpus scan
    "q_bm25_compact" ->
      s"""WITH $Bm25Ctes
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    // two-batch streaming ingestion must serve the whole corpus
    "q_stream_index" ->
      s"""WITH $Bm25Ctes
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    // streamed tombstones: serving truth is the surviving two-thirds
    "q_stream_index_delete" ->
      s"""WITH ${bm25Ctes("doc_id % 3 <> 0")}
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    // tombstoned docs must vanish from results AND from idf/avgdl —
    // the oracle's truth is the surviving half of the corpus
    "q_bm25_delete" ->
      s"""WITH ${bm25Ctes("doc_id % 2 = 0")}
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000.0, 6) AS score,
            CAST(rank AS BIGINT) AS rank
          FROM rk WHERE rank <= 10""",
    "q_hybrid_rrf" ->
      s"""WITH $Bm25Ctes,
          cv AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          cq AS (SELECT vec_id AS query_id, e AS qe FROM cv
                 WHERE vec_id < 3),
          cs AS (SELECT query_id, vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM cv, cq WHERE vec_id <> query_id),
          cr AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM cs),
          u AS (SELECT query_id, doc_id, rank FROM rk WHERE rank <= 10
                UNION ALL
                SELECT query_id, vec_id AS doc_id, rank FROM cr
                WHERE rank <= 10),
          m AS (SELECT query_id, doc_id,
              CAST(round(CAST(1000000000.0 AS DOUBLE) / (60 + rank))
                AS BIGINT) AS lq
            FROM u),
          f AS (SELECT query_id, doc_id, sum(lq) AS s FROM m
                GROUP BY 1, 2),
          fr AS (SELECT query_id, doc_id, s, row_number()
                   OVER (PARTITION BY query_id ORDER BY s DESC, doc_id)
                   AS rank
                 FROM f)
          SELECT query_id, doc_id,
            round(CAST(s AS DOUBLE) / 1000000000.0, 6) AS rrf,
            CAST(rank AS BIGINT) AS rank
          FROM fr WHERE rank <= 10""",
    "q_stream_neardup" ->
      s"""WITH $ShinglesCte,
          sig AS (SELECT doc_id,
            ${(0 until MinhashK).map(minhashSql).mkString(", ")}
            FROM sh WHERE len(s) > 0),
          bands AS (
            ${(0 until MinhashK / 2).map(j =>
              s"SELECT doc_id, $j AS band, mh_${2 * j} AS m0, " +
                s"mh_${2 * j + 1} AS m1 FROM sig")
              .mkString(" UNION ALL ")})
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.m0 = b.m0 AND a.m1 = b.m1
              AND a.doc_id < b.doc_id""",
    "q_token_budget_mix" ->
      s"""WITH tb AS (SELECT doc_id, source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            ${h60Sql("CAST(doc_id AS VARCHAR)")} AS h
          FROM documents),
          cw AS (SELECT doc_id, source, n_tokens,
            sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM tb)
          SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum
          FROM cw
          WHERE cum - n_tokens < CASE source
            WHEN 'src0' THEN 200 WHEN 'src1' THEN 100
            WHEN 'src2' THEN 10000 END""",
    "q_ann_recall" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
                     FROM embeddings),
          q AS (SELECT vec_id AS query_id, e AS qe FROM v
                WHERE vec_id < 5),
          es AS (SELECT query_id, vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM v, q WHERE vec_id <> query_id),
          er AS (SELECT query_id, vec_id FROM (
              SELECT query_id, vec_id, row_number()
                OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id)
                AS rank
              FROM es)
            WHERE rank <= 5),
          bv AS (SELECT vec_id, e, ${bucket4Sql("e")} AS bucket FROM v),
          bq AS (SELECT vec_id AS query_id, qe, bucket FROM
                 (SELECT vec_id, e AS qe, bucket FROM bv
                  WHERE vec_id < 5)),
          ascored AS (SELECT query_id, bv.vec_id AS vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM bv JOIN bq USING (bucket)
            WHERE bv.vec_id <> query_id),
          ar AS (SELECT query_id, vec_id FROM (
              SELECT query_id, vec_id, row_number()
                OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id)
                AS rank
              FROM ascored)
            WHERE rank <= 5),
          hits AS (SELECT er.query_id, count(*) AS hits
                   FROM er JOIN ar USING (query_id, vec_id) GROUP BY 1)
          SELECT q.query_id,
            CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
            CAST(coalesce(hits.hits, 0) AS DOUBLE) / 5.0 AS recall
          FROM q LEFT JOIN hits USING (query_id)""",
    "q_train_classifier" ->
      s"""WITH $TrainCtes
          SELECT bucket, w AS w6 FROM w3""",
    "q_trained_score" ->
      s"""WITH $TrainCtes,
          tb AS (SELECT doc_id, ${h60Sql("token")} % 64 AS bucket
                 FROM (SELECT doc_id,
                         unnest(string_split(text, ' ')) AS token
                       FROM documents)),
          zz AS (SELECT tb.doc_id,
              sum(coalesce(w3.w, 0)) AS z10
            FROM tb LEFT JOIN w3 USING (bucket) GROUP BY 1)
          SELECT doc_id,
            CAST(z10 AS DOUBLE) / 1000000.0 AS logit,
            round(1.0 / (1.0 + exp(-(CAST(z10 AS DOUBLE) / 1000000.0))),
              6) AS prob
          FROM zz""",
    "q_shuffle_shards" ->
      s"""WITH h AS (SELECT doc_id,
            ${h60Sql("CAST(doc_id AS VARCHAR) || '#1'")} AS h
          FROM documents)
          SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
            CAST(row_number() OVER (PARTITION BY h % 8
              ORDER BY h, doc_id) AS BIGINT) AS pos
          FROM h""",
    "q_perplexity" -> {
      val refs = PerplexityRefSources.map(s => s"'$s'").mkString(", ")
      val xent = """round(-CAST(agg.s AS DOUBLE) /
                     (CAST(agg.n_bigrams AS DOUBLE) * 1000000.0), 6)"""
      s"""WITH refd AS (SELECT string_split(text, ' ') AS w
                        FROM documents WHERE source IN ($refs)),
          rg AS (SELECT unnest([w[i] || ' ' || w[i+1]
                   for i in generate_series(1, greatest(len(w) - 1, 0))])
                   AS g FROM refd),
          c2 AS (SELECT g, count(*) AS c2 FROM rg GROUP BY g),
          cx AS (SELECT w1, count(*) AS ctx
                 FROM (SELECT unnest(w[1:len(w)-1]) AS w1 FROM refd)
                 GROUP BY w1),
          v AS (SELECT count(DISTINCT t) AS v
                FROM (SELECT unnest(w) AS t FROM refd)),
          dg AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                   for i in generate_series(1, greatest(len(w) - 1, 0))])
                   AS g
                 FROM (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents)),
          dq AS (SELECT doc_id,
              CAST(round((ln(2 * coalesce(c2.c2, 0) + 1)
                  - ln(2 * coalesce(cx.ctx, 0) + v.v)) * 1000000)
                AS BIGINT) AS lq
            FROM dg LEFT JOIN c2 USING (g)
              LEFT JOIN cx ON split_part(dg.g, ' ', 1) = cx.w1, v),
          agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lq) AS s
                  FROM dq GROUP BY doc_id)
          SELECT d.doc_id,
            coalesce(agg.n_bigrams, 0) AS n_bigrams,
            $xent AS xent,
            CASE WHEN agg.n_bigrams IS NULL THEN 'unscored'
                 WHEN $xent <= $PerplexityHeadMax THEN 'head'
                 WHEN $xent <= $PerplexityMiddleMax THEN 'middle'
                 ELSE 'tail' END AS bucket
          FROM documents d LEFT JOIN agg USING (doc_id)"""
    },
    "q_vocab" ->
      """SELECT word, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents)
         GROUP BY word ORDER BY n DESC, word LIMIT 100""",
    "q_token_mi" ->
      """WITH base AS (SELECT DISTINCT doc_id, cls, word FROM
           (SELECT doc_id, lang AS cls,
                   unnest(string_split(text, ' ')) AS word
            FROM documents)),
         nn AS (SELECT count(*) AS n FROM documents),
         nc AS (SELECT lang AS cls, count(*) AS n_c FROM documents
                GROUP BY 1),
         nt AS (SELECT word, count(*) AS n_t FROM base GROUP BY 1),
         ntc AS (SELECT word, cls, count(*) AS n_tc FROM base
                 GROUP BY 1, 2),
         grid AS (SELECT nt.word, nc.cls, nt.n_t, nc.n_c,
                    coalesce(ntc.n_tc, 0) AS n_tc, nn.n
                  FROM nt CROSS JOIN nc CROSS JOIN nn
                  LEFT JOIN ntc ON ntc.word = nt.word
                    AND ntc.cls = nc.cls),
         terms AS (SELECT word,
             CAST(floor((CASE WHEN n_tc = 0 THEN 0.0 ELSE
               (CAST(n_tc AS DOUBLE) / n) *
               ln((CAST(n_tc AS DOUBLE) * n) /
                  (CAST(n_t AS DOUBLE) * n_c)) END)
               * 1000000000000.0 + 0.5) AS BIGINT)
             + CAST(floor((CASE WHEN n_c - n_tc = 0 THEN 0.0 ELSE
               (CAST(n_c - n_tc AS DOUBLE) / n) *
               ln((CAST(n_c - n_tc AS DOUBLE) * n) /
                  (CAST(n - n_t AS DOUBLE) * n_c)) END)
               * 1000000000000.0 + 0.5) AS BIGINT) AS qmi
           FROM grid)
         SELECT word,
           round(CAST(sum(qmi) AS DOUBLE) / 1000000000000.0, 6) + 0.0
             AS mi
         FROM terms GROUP BY word
         ORDER BY mi DESC, word LIMIT 50""",
    "q_heavy_hitters" ->
      """SELECT token, count(*) AS n, TRUE AS in_sketch
         FROM (SELECT unnest(string_split(text, ' ')) AS token
               FROM documents)
         GROUP BY token ORDER BY n DESC, token LIMIT 10""",
    "q_tfidf" ->
      """WITH tf AS (SELECT doc_id, word, count(*) AS tf
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents)
           GROUP BY doc_id, word),
         idf AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT tf.doc_id, tf.word, tf.tf, idf.df,
           round(CAST(tf.tf AS DOUBLE) *
             ln(CAST(n.n_docs AS DOUBLE) / CAST(idf.df AS DOUBLE)), 6)
             AS score
         FROM tf JOIN idf USING (word), n""",
    "q_bigram_lm" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         gr AS (SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
                  for i in generate_series(1, greatest(len(w) - 1, 0))])
                  AS g FROM d),
         cnt AS (SELECT g, count(*) AS c FROM gr GROUP BY g)
         SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(c) AS BIGINT) AS score,
           CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) AS avg_count
         FROM gr JOIN cnt USING (g) GROUP BY doc_id""",
    "q_rand_project" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                     FROM embeddings)
          SELECT vec_id,
            ${(0 until 8).map(i =>
              s"""round(list_reduce([v[d+1] * (${planeSql(i)})
                 for d in generate_series(0, 63)], (x, y) -> x + y), 6)
                 AS p_$i""").mkString(", ")}
          FROM e""",
    "q_train_split" ->
      s"""SELECT doc_id,
            CASE WHEN ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
                   THEN 'train'
                 WHEN ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 95
                   THEN 'valid'
                 ELSE 'test' END AS split
          FROM documents""",
    "q_corpus_stats" ->
      """SELECT source, count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(len(text)) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         FROM documents GROUP BY 1""",
    "q_quota_sample" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source, row_number()
             OVER (PARTITION BY source ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn <= 5""",
    "q_weighted_sample" ->
      s"""WITH s AS (
           SELECT doc_id, source,
                  CASE WHEN source IN ('src0', 'src1', 'src2') THEN 4.0
                       WHEN source IN ('src3', 'src4') THEN 2.0
                       ELSE 1.0 END AS w,
                  (${h60Sql("CAST(doc_id AS VARCHAR)")} + 1)
                    / 1152921504606846976.0 AS u
           FROM documents)
         SELECT doc_id, source FROM s
         ORDER BY ln(u) / w DESC, doc_id LIMIT 50""",
    "q_dict_encode" ->
      """SELECT token, row_number() OVER (ORDER BY token) - 1
             AS token_id
         FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS token
               FROM documents WHERE text IS NOT NULL)""",
    "q_encode_tokens" ->
      """WITH w0 AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE text IS NOT NULL),
         tk0 AS (
           SELECT doc_id, unnest(list_transform(
             generate_series(1, len(w)),
             i -> struct_pack(pos := i - 1, tok := w[i]))) AS pw
           FROM w0),
         tk AS (SELECT doc_id, pw.pos AS pos, pw.tok AS token FROM tk0),
         dict AS (
           SELECT token, row_number() OVER (ORDER BY token) - 1 AS id
           FROM (SELECT DISTINCT unnest(string_split(text, ' '))
                   AS token
                 FROM documents WHERE text IS NOT NULL)),
         j AS (SELECT doc_id, pos, coalesce(id, -1) AS id
               FROM tk LEFT JOIN dict USING (token))
         SELECT doc_id,
                string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids
         FROM j GROUP BY doc_id""",
    "q_bpe_train" -> bpeTrainOracleSql,
    // the strongest kind of oracle: the round trip must reproduce the
    // raw table verbatim
    "q_decode_roundtrip" ->
      "SELECT doc_id, text FROM documents WHERE text IS NOT NULL",
    // byte-level no-OOV: the round trip through learned byte merges
    // must be byte-identical even with multi-byte UTF-8 appended
    "q_byte_bpe_roundtrip" ->
      s"""SELECT doc_id, text || '$ByteBpeSuffix' AS text
          FROM documents WHERE text IS NOT NULL""",
    // same identity, but the tokenizer travels through parquet
    // artifacts (merges/vocab/meta) between encode and decode
    "q_bpe_store_roundtrip" ->
      s"""SELECT doc_id, text || '$ByteBpeSuffix' AS text
          FROM documents WHERE text IS NOT NULL""",
    // exact long sum of fixed-point weights; FP only at logit/sigmoid
    "q_quality_score" ->
      s"""WITH w AS (SELECT b AS bucket, (b * 37) % 21 - 10 AS w10
                     FROM range($QsBuckets) t(b)),
         tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents WHERE text IS NOT NULL),
         bk AS (SELECT doc_id,
                       ${h60Sql("token")} % $QsBuckets AS bucket FROM tk),
         z AS (SELECT doc_id,
                      CAST(sum(coalesce(w10, 0)) + 5 AS BIGINT) AS z10
               FROM bk LEFT JOIN w USING (bucket) GROUP BY doc_id)
         SELECT doc_id, CAST(z10 AS DOUBLE) / 10.0 AS logit,
                round(1.0 / (1.0 + exp(-(CAST(z10 AS DOUBLE) / 10.0))), 6)
                  AS prob
         FROM z""",
    // Replays greedy lowest-rank-first BPE in SQL: the recursive CTE
    // carries each distinct word's token-list state, one merge per
    // step (rank*100000+i encodes lowest-rank-then-leftmost as a
    // single argmin); terminal states are those with no merge left.
    "q_encode_tokens_bpe" -> {
      val keys = BpeMerges
        .map { case (a, b) => s"'$a' || chr(1) || '$b'" }.mkString(", ")
      val vals = BpeMerges.indices.mkString(", ")
      s"""WITH RECURSIVE
         rmap AS (SELECT map([$keys], [$vals]) AS rm),
         w AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
               FROM documents WHERE text IS NOT NULL),
         st AS (
           SELECT word, list_transform(generate_series(1, length(word)),
                                       i -> word[i]) AS toks
           FROM w
           UNION ALL
           SELECT word,
                  toks[1:bi-1] || [toks[bi] || toks[bi+1]] || toks[bi+2:]
           FROM (SELECT word, toks,
                   CASE WHEN pmin < 99999900000
                        THEN CAST(pmin % 100000 AS INT) END AS bi
                 FROM (SELECT word, toks,
                         coalesce(list_min(list_transform(
                           generate_series(1, len(toks) - 1),
                           i -> coalesce(
                                  rm[toks[i] || chr(1) || toks[i + 1]][1],
                                  999999)::BIGINT * 100000 + i)),
                           99999900000) AS pmin
                       FROM st, rmap) q1) q2
           WHERE bi IS NOT NULL),
         bpe AS (
           SELECT word, toks FROM st, rmap
           WHERE coalesce(list_min(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> coalesce(rm[toks[i] || chr(1) || toks[i + 1]][1],
                                 999999))), 999999) = 999999),
         dict AS (
           SELECT s AS token,
                  CAST(row_number() OVER (ORDER BY s) - 1 AS BIGINT) AS id
           FROM (SELECT DISTINCT unnest(toks) AS s FROM bpe)),
         w0 AS (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents WHERE text IS NOT NULL),
         dw0 AS (SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(ws)),
                   i -> struct_pack(wpos := i, word := ws[i]))) AS pw
                 FROM w0),
         dw AS (SELECT doc_id, pw.wpos AS wpos, pw.word AS word FROM dw0),
         ex0 AS (SELECT doc_id, wpos, unnest(list_transform(
                   generate_series(1, len(toks)),
                   j -> struct_pack(j := j, s := toks[j]))) AS ps
                 FROM dw JOIN bpe USING (word)),
         ex AS (SELECT doc_id, wpos, ps.j AS j, ps.s AS s FROM ex0),
         ids AS (SELECT doc_id, wpos, j, d.id
                 FROM ex JOIN dict d ON d.token = ex.s)
         SELECT doc_id,
                string_agg(CAST(id AS VARCHAR), ',' ORDER BY wpos, j) AS ids
         FROM ids GROUP BY doc_id"""
    },
    "q_inverted_index" ->
      """WITH tk AS (
           SELECT doc_id,
                  unnest(list_distinct(string_split(text, ' '))) AS token
           FROM documents)
         SELECT token, CAST(count(*) AS BIGINT) AS df,
                array_to_string(
                  list_slice(list(doc_id ORDER BY doc_id), 1, 10),
                  ',') AS postings
         FROM tk GROUP BY token""",
    "q_weighted_quota" ->
      s"""WITH s AS (
           SELECT doc_id, source,
                  CASE WHEN source IN ('src0', 'src1', 'src2') THEN 4.0
                       WHEN source IN ('src3', 'src4') THEN 2.0
                       ELSE 1.0 END AS w,
                  (${h60Sql("CAST(doc_id AS VARCHAR)")} + 1)
                    / 1152921504606846976.0 AS u
           FROM documents),
         r AS (
           SELECT doc_id, source,
                  row_number() OVER (PARTITION BY source
                    ORDER BY ln(u) / w DESC, doc_id) AS rn
           FROM s)
         SELECT doc_id, source FROM r WHERE rn <= 3""",
    "q_chunk_docs" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks,
                  len(string_split(text, ' ')) AS n
           FROM documents WHERE text IS NOT NULL),
         c AS (
           SELECT doc_id, toks, n,
                  unnest(generate_series(0,
                    CAST((n - 1) // 24 AS BIGINT))) AS i
           FROM d)
         SELECT doc_id, CAST(i AS INT) AS chunk_id,
                array_to_string(
                  list_slice(toks, i * 24 + 1, least(i * 24 + 32, n)),
                  ' ') AS chunk_text,
                CAST(least(32, n - i * 24) AS BIGINT) AS n_tokens
         FROM c""",
    "q_kmeans" ->
      s"""WITH ${kmeansCtes(8)}
          SELECT vec_id, cid AS cluster, ccos AS cos FROM a1""",
    "q_pq_topk" -> pqSql(m = 4, ksub = 8, dims = 64, nq = 5, k = 5),
    "q_pq_refined" -> pqRefinedSql(m = 4, ksub = 8, dims = 64, nq = 5,
      k = 5, shortlist = 15),
    "q_pca_project" -> pcaSql(dims = 64, iters = 3),
    "q_pca_topk" -> pcaTopkSql(dims = 64, iters = 3),
    "q_ivf_pq" -> ivfPqSql(m = 4, ksub = 8, dims = 64, nq = 5, k = 5,
      ncen = 16, nprobe = 2),
    "q_ivf_pq_indexed" -> ivfPqSql(m = 4, ksub = 8, dims = 64, nq = 5,
      k = 5, ncen = 16, nprobe = 2),
    "q_semantic_dedup" ->
      s"""WITH ${kmeansCtes(16)},
          p AS (SELECT b.vec_id AS db
                FROM a1 a JOIN a1 b
                  ON a.cid = b.cid AND a.vec_id < b.vec_id
                WHERE ${cosSql("a.e", "b.e")} >= 0.45)
          SELECT vec_id, cid AS cluster FROM a1
          WHERE vec_id NOT IN (SELECT db FROM p)""",
    "q_dup_spans" ->
      s"""WITH $SpanCtes
          SELECT doc_id, min(pos) AS span_start,
            max(pos) + 7 AS span_end,
            max(pos) + 7 - min(pos) + 1 AS n_tokens
          FROM si GROUP BY doc_id, span""",
    "q_cut_spans" ->
      s"""WITH $SpanCtes,
          spansq AS (SELECT doc_id, min(pos) AS s0, max(pos) + 7 AS s1
            FROM si GROUP BY doc_id, span),
          tks AS (SELECT doc_id, unnest(list_transform(
              generate_series(1, len(w)),
              i -> struct_pack(pos := i - 1, tok := w[i]))) AS pt
            FROM tk),
          tp AS (SELECT doc_id, pt.pos AS pos, pt.tok AS tok FROM tks),
          keep AS (SELECT t.doc_id, t.pos, t.tok FROM tp t
            WHERE NOT EXISTS (SELECT 1 FROM spansq s
              WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.s0 AND s.s1)),
          reb AS (SELECT doc_id,
              string_agg(tok, ' ' ORDER BY pos) AS text
            FROM keep GROUP BY doc_id)
          SELECT d.doc_id, coalesce(reb.text, '') AS text
          FROM dup d LEFT JOIN reb ON d.doc_id = reb.doc_id""",
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $ClusterCtes
          SELECT doc_id, cluster_id FROM cl""",
    "q_leakage_split" ->
      s"""WITH RECURSIVE $ClusterCtes
          SELECT doc_id, cluster_id,
            CASE WHEN ${h60Sql("CAST(cluster_id AS VARCHAR)")} % 100 < 90
                   THEN 'train'
                 WHEN ${h60Sql("CAST(cluster_id AS VARCHAR)")} % 100 < 95
                   THEN 'valid'
                 ELSE 'test' END AS split
          FROM cl""",
    "q_quantize" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         m AS (SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax
               FROM e)
         SELECT vec_id, vmin, vmax,
           array_to_string(list_transform(v, x -> CASE WHEN vmax > vmin
             THEN CAST(floor((x - vmin) / (vmax - vmin) * 255 + 0.5)
                    AS BIGINT)
             ELSE 0 END), ',') AS codes
         FROM m""",
    "q_curation" ->
      s"""WITH $CurationCtes
         SELECT doc_id, lang, n_chars FROM qd
         WHERE doc_id NOT IN (SELECT db FROM jac)""",
    "q_training_mix" ->
      s"""WITH $CurationCtes,
         cur AS (SELECT doc_id FROM qd
                 WHERE doc_id NOT IN (SELECT db FROM jac)),
         ws AS (SELECT d.doc_id, d.source, d.text
                FROM documents d JOIN cur USING (doc_id)),
         samp AS (SELECT doc_id, source, text FROM ws
           WHERE (source = 'src0' AND
                    ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 100)
              OR (source = 'src1' AND
                    ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 50)
              OR (source = 'src2' AND
                    ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 25)
              OR (source = 'src3' AND
                    ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10)),
         tk AS (SELECT doc_id, source,
                  len(string_split(text, ' ')) AS n_tokens FROM samp),
         c AS (SELECT doc_id, source, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum FROM tk)
         SELECT doc_id, source, n_tokens,
                (cum - n_tokens) // 512 AS seq_no
         FROM c""",
    "q_token_count" ->
      """SELECT doc_id, len(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)) AS n_bpe_tokens
         FROM documents""",
    "q_text_quality" ->
      """SELECT doc_id, len(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(len(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) /
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '),
             x -> x = 'the' OR x = 'a')) AS DOUBLE) /
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio
         FROM documents""",
    "q_contamination" ->
      s"""WITH $ShinglesCte,
          ps AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 5),
          ds AS (SELECT doc_id, unnest(s) AS g FROM sh)
          SELECT doc_id, count(*) AS n_hits
          FROM ds JOIN ps USING (g) GROUP BY doc_id""",
    "q_text_clean" ->
      s"""WITH c AS (
            SELECT doc_id,
              trim(regexp_replace(lower(regexp_replace(text,
                '[^A-Za-z0-9 ]', ' ', 'g')), ' +', ' ', 'g')) AS clean
            FROM documents)
          SELECT doc_id, clean, ${h60Sql("clean")} AS clean_h60 FROM c""",
    "q_stratified_sample" ->
      s"""SELECT doc_id, source FROM documents
          WHERE (source = 'src0' AND
                   ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 100)
             OR (source = 'src1' AND
                   ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 50)
             OR (source = 'src2' AND
                   ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 25)
             OR (source = 'src3' AND
                   ${h60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 10)""",
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens FROM documents),
         c AS (SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t)
         SELECT doc_id, source, n_tokens,
                (cum - n_tokens) // 512 AS seq_no
         FROM c""",
    "q_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         u AS (SELECT doc_id, unnest(w) AS g FROM d),
         uc AS (SELECT doc_id, g, count(*) AS c FROM u GROUP BY 1, 2),
         ua AS (SELECT doc_id, max(c) AS top_uni,
                  CAST(sum(c) AS BIGINT) AS n_uni, count(*) AS d_uni
                FROM uc GROUP BY 1),
         b AS (SELECT doc_id, unnest(list_transform(
                 generate_series(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i + 1])) AS g
               FROM d),
         bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
         ba AS (SELECT doc_id, max(c) AS top_bi,
                  CAST(sum(c) AS BIGINT) AS n_bi
                FROM bc GROUP BY 1)
         SELECT ua.doc_id, n_uni AS n_tokens,
           CAST(d_uni AS DOUBLE) / n_uni AS ttr,
           CAST(top_uni AS DOUBLE) / n_uni AS top_unigram_frac,
           CAST(top_bi AS DOUBLE) / n_bi AS top_bigram_frac
         FROM ua JOIN ba ON ua.doc_id = ba.doc_id""",
    "q_lang_id" ->
      """WITH s AS (
           SELECT doc_id,
             len(list_filter(string_split(text, ' '),
               x -> x = 'the' OR x = 'a')) AS score_en,
             len(list_filter(string_split(text, ' '),
               x -> x = 'der' OR x = 'die')) AS score_de,
             len(list_filter(string_split(text, ' '),
               x -> x = 'el' OR x = 'la')) AS score_es,
             len(list_filter(string_split(text, ' '),
               x -> x = 'le' OR x = 'les')) AS score_fr
           FROM documents)
         SELECT doc_id, score_en, score_de, score_es, score_fr,
           CASE WHEN greatest(score_en, score_de, score_es, score_fr) = 0
                  THEN 'und'
                WHEN score_en = greatest(score_en, score_de, score_es, score_fr) THEN 'en'
                WHEN score_de = greatest(score_en, score_de, score_es, score_fr) THEN 'de'
                WHEN score_es = greatest(score_en, score_de, score_es, score_fr) THEN 'es'
                ELSE 'fr' END AS predicted
         FROM s""",
    "q_fingerprint" ->
      s"""SELECT doc_id, md5(lower(text)) AS fp,
            ${h60Sql("lower(text)")} AS h60
          FROM documents""",
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5
         FROM documents""",
    "q_dedup_exact" ->
      """WITH dup AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000000, text FROM documents WHERE doc_id % 5 = 0)
         SELECT md5(lower(text)) AS fp, min(doc_id) AS canonical_id,
           count(*) AS n_copies
         FROM dup GROUP BY 1""",
    "q_jaccard_pairs" ->
      s"""WITH $ShinglesCte,
          inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
          pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM inv a JOIN inv b
              ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          sizes AS (SELECT doc_id, len(s) AS n FROM sh)
          SELECT doc_a, doc_b,
            CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
          FROM pairs
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5""",
    "q_containment_pairs" ->
      s"""WITH dup AS (SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000000, text FROM documents
            WHERE doc_id % 5 = 0),
          sh AS (SELECT doc_id, list_distinct(
              [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
               for i in generate_series(1, greatest(len(w)-2, 0))]) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM dup)),
          inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
          pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
            FROM inv a JOIN inv b
              ON a.g = b.g AND a.doc_id <> b.doc_id
            GROUP BY 1, 2),
          sizes AS (SELECT doc_id, len(s) AS n FROM sh)
          SELECT doc_a, doc_b,
            CAST(inter AS DOUBLE) / sa.n AS containment
          FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
          WHERE CAST(inter AS DOUBLE) / sa.n >= 0.8""",
    "q_minhash_sig" ->
      s"""WITH $ShinglesCte
          SELECT doc_id,
            ${(0 until MinhashK).map(minhashSql).mkString(", ")}
          FROM sh""",
    "q_dedup_fuzzy" ->
      s"""WITH $ShinglesCte,
          sig AS (SELECT doc_id,
            ${(0 until MinhashK).map(minhashSql).mkString(", ")}
            FROM sh),
          bands AS (
            ${(0 until MinhashK / 2).map(j =>
              s"SELECT doc_id, $j AS band, mh_${2 * j} * 2147483647 + mh_${2 * j + 1} AS bsig FROM sig")
              .mkString(" UNION ALL ")}),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bsig = b.bsig
                AND a.doc_id < b.doc_id),
          scored AS (
            SELECT doc_a, doc_b,
              len(list_intersect(sa.s, sb.s)) AS inter,
              len(sa.s) AS n_a, len(sb.s) AS n_b
            FROM cand
            JOIN sh sa ON sa.doc_id = doc_a
            JOIN sh sb ON sb.doc_id = doc_b)
          SELECT doc_a, doc_b,
            CAST(inter AS DOUBLE) / (n_a + n_b - inter) AS jaccard
          FROM scored
          WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.5""",
    "q_simhash" ->
      s"""WITH toks AS (
            SELECT doc_id, ${h60Sql("t")} AS h
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM documents)),
          v AS (SELECT doc_id,
            ${(0 until 28).map(b =>
              s"sum((((h >> $b) % 2) * 2) - 1) AS v_$b").mkString(", ")}
            FROM toks GROUP BY doc_id)
          SELECT doc_id, CAST(${(0 until 28).map(b =>
            s"CASE WHEN v_$b > 0 THEN ${1L << b} ELSE 0 END")
            .mkString(" + ")} AS BIGINT) AS simhash
          FROM v""",
    "q_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
          scored AS (
            SELECT query_id, vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM v, q WHERE vec_id <> query_id),
          r AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 10""",
    "q_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
          scored AS (
            SELECT query_id, vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM v, q WHERE vec_id <> query_id),
          r AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM (SELECT * FROM scored WHERE cos < 0.2))
          SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5""",
    "q_negative_sample" ->
      s"""WITH n AS (SELECT count(*) AS cnt FROM documents),
          d AS (SELECT doc_id,
                  unnest(generate_series(0, 2)) AS draw
                FROM documents),
          h AS (SELECT doc_id, draw,
                  ${h60Sql("CAST(doc_id AS VARCHAR) || '#' || " +
                    "CAST(draw AS VARCHAR)")} AS hv
                FROM d)
          SELECT doc_id, CAST(draw AS BIGINT) AS draw,
                 CASE WHEN hv % cnt = doc_id
                      THEN (hv % cnt + 1) % cnt
                      ELSE hv % cnt END AS neg_id
          FROM h, n""",
    "q_ann_lsh" ->
      s"""SELECT vec_id, CAST(${bucketSql("e")} AS BIGINT) AS bucket
          FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)""",
    "q_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, e, ${bucketSql("e")} AS bucket
            FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings))
          SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
            round(${dotSql("a.e", "b.e")} /
              (sqrt(${dotSql("a.e", "a.e")}) * sqrt(${dotSql("b.e", "b.e")})),
              6) AS cos
          FROM v a JOIN v b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          WHERE round(${dotSql("a.e", "b.e")} /
              (sqrt(${dotSql("a.e", "a.e")}) * sqrt(${dotSql("b.e", "b.e")})),
              6) >= 0.45""",
    "q_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
          cen AS (SELECT vec_id AS centroid_id, e AS ce FROM v
            WHERE vec_id < 16),
          ass AS (
            SELECT vec_id, e, centroid_id,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY ccos DESC, centroid_id) AS rn
            FROM (SELECT v.vec_id, v.e, cen.centroid_id,
                    round(${dotSql("v.e", "cen.ce")} /
                      (sqrt(${dotSql("v.e", "v.e")}) *
                       sqrt(${dotSql("cen.ce", "cen.ce")})), 6) AS ccos
                  FROM v CROSS JOIN cen)),
          c AS (SELECT vec_id, e, centroid_id AS cluster FROM ass
            WHERE rn = 1),
          q AS (SELECT vec_id AS query_id, e AS qe, cluster FROM c
            WHERE vec_id < 5),
          scored AS (
            SELECT query_id, c.vec_id,
              round(${dotSql("qe", "c.e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("c.e", "c.e")})),
                6) AS cos
            FROM c JOIN q USING (cluster) WHERE c.vec_id <> query_id),
          r AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5""",
    "q_ivf_probe" -> IvfProbeSql,
    // served from the persisted index - must equal the in-memory probe
    "q_ivf_indexed" -> IvfProbeSql,
    // incrementally-maintained lists ≡ single-pass build
    "q_ivf_update" -> IvfProbeSql,
    // two-batch streaming ingestion ≡ the same
    "q_stream_ivf" -> IvfProbeSql,
    // streamed tombstones: probe truth is the even half
    "q_stream_ivf_delete" -> ivfProbeSql("vec_id % 2 = 0"),
    // tombstoned vectors vanish from the corpus side; queries (by
    // example) still come from the full embedding table
    "q_ivf_delete" -> ivfProbeSql("vec_id % 2 = 0"),

    "q_ann_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, e, ${bucket4Sql("e")} AS bucket
            FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
          q0 AS (SELECT vec_id AS query_id, e AS qe, bucket AS b0 FROM v
            WHERE vec_id < 5),
          q AS (SELECT query_id, qe,
                  unnest([b0, xor(b0, 1), xor(b0, 2)]) AS bucket
                FROM q0),
          scored AS (
            SELECT query_id, vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM v JOIN q USING (bucket) WHERE vec_id <> query_id),
          r AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5""",
    "q_ann_topk" ->
      s"""WITH v AS (SELECT vec_id, e, ${bucket4Sql("e")} AS bucket
            FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
          q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM v
            WHERE vec_id < 5),
          scored AS (
            SELECT query_id, vec_id,
              round(${dotSql("qe", "e")} /
                (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("e", "e")})),
                6) AS cos
            FROM v JOIN q USING (bucket) WHERE vec_id <> query_id),
          r AS (SELECT query_id, vec_id, cos,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, vec_id) AS rank
            FROM scored)
          SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5"""
  ).map { case (k, v) => k -> v.linesIterator.map(_.trim).mkString(" ") }
  }
}
