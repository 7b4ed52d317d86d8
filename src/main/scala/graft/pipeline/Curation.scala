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

  /** Deterministic stratified sampling by source — the data-mixing
    * step that turns a raw corpus into a training mixture (e.g. web
    * 50%, code 100%). Membership is decided by a portable md5-derived
    * hash of the id, NOT `rand()`/`sample()`: the same row gets the
    * same verdict on every engine, every rerun, every partitioning —
    * reproducible mixtures are a hard requirement for training-data
    * lineage. Map-only (no shuffle); rates are per-source keep
    * fractions in [0, 1] at 1% granularity; unlisted sources drop.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       sourceCol: String = "source",
                       idCol: String = "doc_id"): DataFrame = {
    val pct = TextAnalysis.hash60(col(idCol).cast("string")) % 100
    val keep = rates.foldLeft(lit(false)) { case (acc, (src, r)) =>
      acc || (col(sourceCol) === src &&
        pct < lit(math.round(r * 100).toInt))
    }
    docs.filter(keep)
  }

  /** Deterministic train/valid/test assignment: each document's split
    * is a pure function of the md5-derived hash of its id — the same
    * document lands in the same split on every engine, rerun, and
    * repartitioning, and membership never depends on row order or
    * corpus size (adding documents never moves existing ones across
    * splits — the property that keeps eval sets uncontaminated as a
    * 100 TB corpus grows). `cuts` are cumulative percent upper bounds,
    * e.g. `Seq("train" -> 90, "valid" -> 95)` + `rest = "test"`.
    * Map-only, no shuffle.
    */
  def assignSplits(docs: DataFrame, cuts: Seq[(String, Int)], rest: String,
                   idCol: String = "doc_id"): DataFrame = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted,
      s"cuts must be cumulative ascending: $cuts")
    val pct = TextAnalysis.hash60(col(idCol).cast("string")) % 100
    val split = cuts.foldRight(lit(rest): org.apache.spark.sql.Column) {
      case ((name, cut), acc) => when(pct < cut, name).otherwise(acc)
    }
    docs.withColumn("split", split)
  }

  /** Leakage-safe train/valid/test split: assign by near-dup CLUSTER,
    * not by document. A doc-id-hashed split ([[assignSplits]]) puts
    * ~10% of each document's near-duplicates in the eval set — the
    * standard train/test contamination failure: the model is scored
    * on paraphrases of its own training data. Here every document is
    * first labeled with its near-dup cluster id
    * ([[graft.dedup.Dedup.clusters]] over the supplied similarity
    * pairs), and the split hash is taken over the CLUSTER id, so a
    * cluster lands in exactly one split and no pair of near-dups ever
    * straddles the train/eval boundary.
    *
    * Determinism inherits from both parts: cluster ids are the
    * minimal member id (pure function of the edge set) and the split
    * is the md5-derived hash of that id — engine-, rerun-, and
    * partitioning-independent, and stable as the corpus grows except
    * where clusters genuinely merge. Cost beyond [[assignSplits]] is
    * the cluster labeling itself: iterative pointer jumping over the
    * near-dup SLIVER of the corpus (see [[graft.dedup.Dedup.clusters]]),
    * then one map-only split assignment.
    */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       cuts: Seq[(String, Int)], rest: String,
                       idCol: String = "doc_id"): DataFrame =
    assignSplits(Dedup.clusters(docs, pairs, idCol), cuts, rest,
      idCol = "cluster_id")

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each doc draws a uniform
    * u ∈ (0, 1] from the md5-derived hash of its id and the k docs
    * with the largest u^(1/w) win — equivalently the largest
    * ln(u)/w, which avoids the pow. Higher-weight sources are
    * proportionally likelier to survive, yet the outcome is a pure
    * function of (id, weight): same sample on every engine, rerun,
    * and partitioning — `rand()`-keyed weighted sampling is not
    * reproducible across any of those. Map-only scoring + a bounded
    * top-k (TakeOrdered, no full sort): the scan never shuffles.
    *
    * `weight` must be strictly positive for every row.
    */
  def weightedSample(docs: DataFrame, weight: org.apache.spark.sql.Column,
                     k: Int, idCol: String = "doc_id"): DataFrame = {
    // hash60 ∈ [0, 2^60); +1 → (0, 2^60] → u ∈ (0, 1], so ln(u) is
    // finite and the all-zero hash cannot produce -inf
    val u = (TextAnalysis.hash60(col(idCol).cast("string")) + 1L)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    docs.withColumn("__graft_es_key", log(u) / weight)
      .orderBy(col("__graft_es_key").desc, col(idCol))
      .limit(k)
      .drop("__graft_es_key")
  }

  /** Weighted quota sampling: the per-key form of [[weightedSample]] —
    * the k best Efraimidis–Spirakis draws within EACH key (e.g. "keep
    * 10k docs per source, quality-weighted"). Same deterministic
    * md5-hash draw; selection runs on the bounded-heap TopKPerKey
    * (one shuffle on the key, O(keys·k) memory, no window sort).
    */
  def weightedQuotaSample(docs: DataFrame,
                          weight: org.apache.spark.sql.Column, k: Int,
                          keyCol: String = "source",
                          idCol: String = "doc_id"): DataFrame = {
    val u = (TextAnalysis.hash60(col(idCol).cast("string")) + 1L)
      .cast("double") / lit(1152921504606846976.0) // 2^60
    graft.plans.TopK.perKey(
      docs.withColumn("__graft_es_key", log(u) / weight),
      Seq(col(keyCol)),
      Seq(col("__graft_es_key").desc, col(idCol)), k)
      .drop("__graft_es_key")
  }

  /** Deterministic uniform negative sampling for contrastive
    * training: each doc draws `k` pseudo-random partner ids from
    * `[0, corpusSize)` via the md5 hash of (id, draw ordinal) —
    * reproducible across engines/reruns, unlike `rand()`. A
    * self-draw steps to the next slot. Map-only apart from the 1-row
    * corpus-count broadcast.
    *
    * ASSUMES contiguous ids `0..n-1` (the usual post-dictionary-
    * encoding layout — see `TextAnalysis.dictionaryEncode`); with
    * sparse ids, map ordinals back through the dictionary.
    */
  def negativeSamples(docs: DataFrame, k: Int,
                      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val n = docs.select(count(lit(1)).as("__graft_n"))
    val h = TextAnalysis.hash60(
      concat(col(idCol).cast("string"), lit("#"),
        col("draw").cast("string")))
    docs.select(col(idCol))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("__graft_n"),
        explode(sequence(lit(0), lit(k - 1))).as("draw"))
      .select(col(idCol), col("draw").cast("long").as("draw"),
        (h % col("__graft_n")).as("__graft_neg0"), col("__graft_n"))
      .select(col(idCol), col("draw"),
        when(col("__graft_neg0") === col(idCol),
          (col("__graft_neg0") + 1L) % col("__graft_n"))
          .otherwise(col("__graft_neg0")).as("neg_id"))
  }

  /** Overlapping token-window chunking — the RAG / context-window
    * preprocessing step: each document's whitespace tokens are cut
    * into windows of `window` tokens every `stride` tokens (overlap =
    * window − stride), re-joined as chunk text with a per-doc chunk
    * ordinal and token count. Map-only (`explode` over a computed
    * `sequence`, no shuffle); output size is input · window/stride, a
    * deliberate, bounded duplication factor. A document shorter than
    * one window yields exactly one (short) chunk; null text yields
    * none.
    */
  def chunkDocuments(docs: DataFrame, window: Int, stride: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col(idCol), col("toks"), col("n"),
        explode(sequence(lit(0),
          floor((col("n") - 1) / stride).cast("int"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("toks"), col("chunk_id") * stride + 1,
          lit(window)), " ").as("chunk_text"),
        least(lit(window), col("n") - col("chunk_id") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Per-source quota cap: keep at most `cap` documents per source,
    * lowest ids first — the "no domain may dominate the mixture" rule
    * of corpus curation (cap a crawl's mega-domains before mixing).
    * Runs on the bounded-heap TopKPerKey operator: one shuffle on the
    * source key and O(sources · cap) task memory, instead of sorting
    * every group under a `row_number` window. Deterministic because
    * the id order is total.
    */
  def quotaSample(docs: DataFrame, cap: Int,
                  sourceCol: String = "source",
                  idCol: String = "doc_id"): DataFrame =
    graft.plans.TopK.perKey(docs, Seq(col(sourceCol)), Seq(col(idCol)), cap)

  /** Token-budget sequence packing: assign docs (per source, in
    * deterministic id order) to consecutive training sequences of
    * `tokenBudget` tokens — the batching step that fills fixed-length
    * context windows. `seq_no` is the doc's starting token offset
    * (prefix cumsum) divided by the budget: each doc belongs to the
    * window its first token falls in, so a boundary-straddling doc
    * overflows into the next window (concat-and-chunk semantics, as in
    * GPT-style pretraining). Exact greedy repacking is an inherently
    * sequential fold; this prefix-division rule is its deterministic,
    * one-shuffle, cluster-parallel form.
    */
  /** Shared per-source token prefix-cumsum ([[packSequences]] /
    * [[tokenBudgetMix]]): `(idCol, sourceCol, n_tokens, cum)` with
    * `cum` the running token total in `orderCols` order within each
    * source. The frame is EXPLICIT `ROWS UNBOUNDED PRECEDING`:
    * Spark's default frame with an ORDER BY is RANGE, which makes
    * order-key peers share one cum value — a silent divergence from
    * the oracles' pinned ROWS frame if a key ever duplicates. One
    * definition keeps both operators' token-count and frame contracts
    * oracle-identical.
    */
  /** withColumn CLOBBERS an existing column of the same name — a
    * caller whose docs already carry one of the names an operator
    * writes would lose data silently (and the operator's own window
    * could order by the caller's column instead of the engine's).
    * Fail loudly with the rename remediation instead.
    */
  private def requireNoClash(docs: DataFrame, names: Seq[String],
                             op: String): Unit = {
    val clash = docs.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"$op writes column(s) ${clash.toSeq.sorted.mkString(", ")} " +
        "that already exist in the input - rename them first")
  }

  private def tokenCumsum(docs: DataFrame, sourceCol: String,
                          idCol: String, textCol: String,
                          orderCols: Seq[org.apache.spark.sql.Column],
                          extra: Seq[(String, org.apache.spark.sql.Column)]
                            = Seq.empty): DataFrame = {
    // every tokenCumsum consumer (packSequences, tokenBudgetMix)
    // inherits the clobber guard for the columns this helper writes
    requireNoClash(docs,
      Seq("n_tokens", "cum") ++ extra.map(_._1), "tokenCumsum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val base = docs.select(Seq(col(idCol), col(sourceCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long")
        .as("n_tokens")) ++ extra.map { case (n, c) => c.as(n) }: _*)
    base.withColumn("cum", sum(col("n_tokens")).over(w))
  }

  def packSequences(docs: DataFrame, tokenBudget: Int,
                    sourceCol: String = "source",
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    requireNoClash(docs, Seq("seq_no"), "packSequences")
    tokenCumsum(docs, sourceCol, idCol, textCol, Seq(col(idCol)))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        expr(s"(cum - n_tokens) div $tokenBudget").as("seq_no"))
  }

  /** Deterministic global training-order shuffle: every document gets
    * a `(shard, pos)` — shard by md5-hash modulo, position by hash
    * order WITHIN the shard — so reading shards in order yields a
    * reproducible pseudorandom permutation of the corpus (the
    * shuffle-and-shard step every pretraining data writer runs;
    * `orderBy(rand())` is irreproducible and a single global sort).
    *
    * Scale shape: the hash and shard are map-only; ordering is a
    * window per SHARD — each sort is 1/`shards` of the corpus and the
    * shards sort in parallel, the same contract as writing shuffled
    * output files. No global sort, no single-task order bottleneck.
    * Adding documents changes positions only within the affected
    * shards (hash order is stable; ranks after an insertion point
    * shift — positional stability across corpus growth is what
    * [[assignSplits]]-style hashing provides, not a permutation).
    *
    * The hash is salted with `epoch`, so each training epoch gets an
    * independent deterministic permutation — the multi-epoch reshuffle
    * without `rand()`.
    */
  def deterministicShuffle(docs: DataFrame, shards: Int, epoch: Int = 0,
                           idCol: String = "doc_id"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    requireNoClash(docs, Seq("__graft_h", "shard", "pos"),
      "deterministicShuffle")
    val h = TextAnalysis.hash60(
      concat(col(idCol).cast("string"), lit(s"#$epoch")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("__graft_h"), col(idCol))
    docs.withColumn("__graft_h", h)
      .withColumn("shard", (col("__graft_h") % shards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__graft_h")
  }

  /** Token-BUDGET mixture: per source, keep documents in
    * deterministic hash order until the source's token budget fills —
    * the mixture builder when targets are token counts ("20B web,
    * 5B code"), complementing rate-based [[stratifiedSample]] (which
    * cannot hit a token total because doc lengths vary). A document
    * is kept iff the tokens accumulated BEFORE it are still under
    * budget, so the boundary-crossing doc is included (budgets are
    * met-or-slightly-exceeded, never silently under-filled) and any
    * positive budget takes at least one document. Sources without a
    * budget drop.
    *
    * Deterministic: the per-source order is the md5 hash of the doc
    * id (epoch-stable pseudorandom order — taking a hash-order prefix
    * IS a uniform sample), so the same budget yields the same
    * documents on every engine, rerun, and partitioning. Scale shape:
    * one hash + token-count projection (map-only), then ONE window
    * cumsum per source — each source sorts independently and in
    * parallel, the [[packSequences]] shape; no global sort.
    */
  def tokenBudgetMix(docs: DataFrame, budgets: Map[String, Long],
                     sourceCol: String = "source",
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(budgets.nonEmpty, "at least one source budget required")
    require(budgets.values.forall(_ >= 1L),
      s"budgets must be >= 1 token: $budgets")
    requireNoClash(docs, Seq("__graft_h", "n_tokens", "cum"),
      "tokenBudgetMix")
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (src, b)) => when(col(sourceCol) === src, b).otherwise(acc)
    }
    tokenCumsum(docs, sourceCol, idCol, textCol,
        Seq(col("__graft_h"), col(idCol)),
        extra = Seq("__graft_h" ->
          TextAnalysis.hash60(col(idCol).cast("string"))))
      .filter(col("cum") - col("n_tokens") < budget)
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("cum"))
  }

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
    // analogue is a materialized quality-filtered table). Both caches
    // outlive this call (the result is lazy), so they register with
    // CacheScope for the one-call release contract.
    graft.CacheScope.retain(quality, "curate.quality")
    val canonical = Dedup.exact(quality)
      .select(col("canonical_id").as("doc_id"))
    val exactDeduped = graft.CacheScope.retain(
      quality.join(canonical, "doc_id"), "curate.exactDeduped")

    // near-dup removal: drop the larger id of every qualifying pair
    val pairs =
      if (useLsh) Dedup.fuzzy(exactDeduped, jaccardThreshold)
      else Dedup.jaccardPairs(exactDeduped, jaccardThreshold)
    val losers = pairs.select(col("doc_b").as("doc_id")).distinct()
    exactDeduped.join(losers, Seq("doc_id"), "left_anti")
  }
}
