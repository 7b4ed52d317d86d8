package graft

import graft.pipeline.Curation

/** Corpus-curation composition invariants. */
class CurationSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog and runs far away today", "en"),
      (1L, "the quick brown fox jumps over the lazy dog and runs far away today", "en"), // exact dup
      (2L, "the quick brown fox jumps over the lazy dog and runs far away now ok", "en"), // near dup
      (3L, "completely different content with many other interesting words here too", "en"),
      (4L, "short", "en"), // fails min length
      (5L, "the a the a the a the a the a the a the a the a the a the a the a ok", "en")) // stopword spam
      .toDF("doc_id", "text", "lang")
  }

  test("curate: quality gate, exact dedup, near-dup removal compose") {
    val out = Curation.curate(docs, minChars = 20, maxStopwordRatio = 0.5,
      stopwords = Seq("the", "a"), jaccardThreshold = 0.5)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(0L, 3L),
      "doc 1 exact-dup, doc 2 near-dup, doc 4 too short, doc 5 stopword spam")
  }

  test("stratifiedSample: deterministic, rate-respecting, rerun-stable") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, s"text $i", "web"))
      .toDF("doc_id", "text", "source")
    val r1 = Curation.stratifiedSample(d, Map("web" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Curation.stratifiedSample(d, Map("web" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 === r2, "same hash verdict on every run")
    assert(r1.size > 60 && r1.size < 140, s"~50% of 200: ${r1.size}")
    assert(Curation.stratifiedSample(d, Map("other" -> 1.0)).count() === 0,
      "unlisted sources drop")
  }

  test("assignSplits: total, deterministic, stable under corpus growth") {
    import spark.implicits._
    val d1 = (0L until 100L).map(i => (i, "t")).toDF("doc_id", "text")
    val d2 = (0L until 200L).map(i => (i, "t")).toDF("doc_id", "text")
    val cuts = Seq("train" -> 90, "valid" -> 95)
    def splits(d: org.apache.spark.sql.DataFrame) =
      Curation.assignSplits(d, cuts, "test")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = splits(d1); val s2 = splits(d2)
    assert(s1.forall { case (id, sp) => s2(id) == sp },
      "growing the corpus never moves an existing doc across splits")
    assert(s2.values.toSet.subsetOf(Set("train", "valid", "test")))
    val frac = s2.values.count(_ == "train").toDouble / s2.size
    assert(frac > 0.8 && frac < 0.98, s"~90% train: $frac")
    intercept[IllegalArgumentException] {
      Curation.assignSplits(d1, Seq("a" -> 95, "b" -> 90), "c")
    }
  }

  test("leakageSafeSplit: no near-dup pair straddles the split " +
    "boundary; cluster id is the min member; singleton splits match " +
    "assignSplits on the doc's own id") {
    import spark.implicits._
    val n = 300L
    val docs = (0L until n).map(i => (i, s"t$i")).toDF("doc_id", "text")
    // 100 two-doc near-dup clusters (0,1), (2,3), ... plus 100 singles
    val pairs = (0L until 100L).map(i => (2 * i, 2 * i + 1))
      .toDF("doc_a", "doc_b")
    val cuts = Seq("train" -> 90, "valid" -> 95)
    val out = Curation.leakageSafeSplit(docs, pairs, cuts, "test")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[String]("split")))).toMap
    (0L until 100L).foreach { i =>
      assert(out(2 * i) === out(2 * i + 1),
        s"pair (${2 * i}, ${2 * i + 1}) must share cluster AND split — " +
          "a straddling near-dup pair is train/eval contamination")
      assert(out(2 * i)._1 === 2 * i, "cluster id is the min member id")
    }
    val base = Curation.assignSplits(docs, cuts, "test")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    (200L until n).foreach { i =>
      assert(out(i) === ((i, base(i))),
        "a singleton's cluster is itself, so its split is unchanged")
    }
    assert(out.values.map(_._2).toSet === Set("train", "valid", "test"),
      "all three splits populated at n=300")
  }

  test("deterministicShuffle / tokenBudgetMix refuse inputs whose " +
    "columns they would clobber") {
    import spark.implicits._
    val shadowed = Seq((1L, "t", 9)).toDF("doc_id", "text", "shard")
    val e1 = intercept[IllegalArgumentException](
      Curation.deterministicShuffle(shadowed, 4))
    assert(e1.getMessage.contains("shard"))
    val hashed = Seq((1L, "s", "t", 0L))
      .toDF("doc_id", "source", "text", "cum")
    val e2 = intercept[IllegalArgumentException](
      Curation.tokenBudgetMix(hashed, Map("s" -> 10L)))
    assert(e2.getMessage.contains("cum"))
  }

  test("deterministicShuffle: stable across reruns/partitioning, " +
    "contiguous per-shard positions, epochs give different " +
    "permutations") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, "t")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, e: Int) =
      Curation.deterministicShuffle(df, 4, e).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("shard"), r.getAs[Long]("pos")))).toMap
    val a = run(d, 1)
    assert(a === run(d, 1) && a === run(d.repartition(7), 1),
      "pure function of (id, epoch) — rerun- and partitioning-stable")
    assert(a.size === 100, "permutation is total")
    a.groupBy(_._2._1).foreach { case (shard, docs) =>
      assert(docs.values.map(_._2).toSeq.sorted ===
        (1L to docs.size).toSeq,
        s"shard $shard positions must be contiguous from 1")
    }
    val b = run(d, 0)
    assert(a !== b, "each epoch is an independent permutation")
    // shard is the salted hash mod 4, not doc_id mod 4
    assert(a.values.map(_._1).toSet === Set(0, 1, 2, 3))
  }

  test("tokenBudgetMix: budgets met-or-just-exceeded, crossing doc " +
    "included, unlisted sources drop, hash-order prefix is stable") {
    import spark.implicits._
    val d = ((0L until 50L).map(i => (i, "a b c d e", "web")) ++ // 5 tok
      (100L until 110L).map(i => (i, "x y", "code")) ++          // 2 tok
      (200L until 205L).map(i => (i, "t", "junk")) ++            // no budget
      Seq((300L, null.asInstanceOf[String], "web")))  // NULL text
      .toDF("doc_id", "text", "source")
    val out = Curation.tokenBudgetMix(d,
        Map("web" -> 23L, "code" -> 1000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2)
    assert(!bySrc.contains("junk"), "no budget, no rows")
    assert(!out.exists(_._1 == 300L),
      "NULL text drops (null n_tokens) and must not corrupt the " +
        "running sum — the oracle's len(string_split(NULL)) semantics")
    val webTok = bySrc("web").map(_._3).sum
    // 23-token budget over 5-token docs: 4 docs = 20 < 23, the 5th
    // crosses and is included → exactly 25 tokens
    assert(bySrc("web").size === 5 && webTok === 25L,
      s"met-or-just-exceeded: $webTok")
    assert(bySrc("code").size === 10,
      "a budget above the source total admits every doc")
    val again = Curation.tokenBudgetMix(d.repartition(7),
        Map("web" -> 23L, "code" -> 1000L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet === again.toSet,
      "pure function of (id, budget) — partitioning-stable")
  }

  test("quotaSample: caps each source at `cap`, lowest ids survive") {
    import spark.implicits._
    val d = ((0L until 20L).map(i => (i, "t", "big")) ++
      (100L until 103L).map(i => (i, "t", "small")))
      .toDF("doc_id", "text", "source")
    val out = Curation.quotaSample(d, 5)
      .select("doc_id", "source").collect()
      .groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(0)).sorted.toSeq).toMap
    assert(out("big") === (0L until 5L), "cap binds, min ids win")
    assert(out("small") === Seq(100L, 101L, 102L), "under-cap kept whole")
  }

  test("packSequences: prefix-offset window assignment") {
    import spark.implicits._
    // 4 docs x 4 tokens, budget 10: starting offsets 0,4,8,12 -> windows
    // 0,0,0,1 (doc 3 straddles the boundary and stays in window 0)
    val d = (1L to 4L).map(i => (i, "t t t t", "s")).toDF(
      "doc_id", "text", "source")
    val r = Curation.packSequences(d, 10).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("seq_no")).toMap
    assert(r === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("weightedSample: deterministic, partition-invariant, weight-sensitive") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = (0L until 400L).map(i =>
      (i, if (i < 200) "heavy" else "light")).toDF("doc_id", "source")
    val w = when(col("source") === "heavy", 50.0).otherwise(1.0)
    val r1 = Curation.weightedSample(d, w, 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Curation.weightedSample(d.repartition(13), w, 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 === r2, "same draw regardless of partitioning")
    assert(r1.size === 100)
    val heavy = r1.count(_ < 200L)
    // E[heavy kept] with w=50 vs 1 is near all 100; even 3 sigma off
    // stays far above 80
    assert(heavy > 80, s"50x-weighted source must dominate, got $heavy")
  }

  test("chunkDocuments: overlap, tail chunk, short doc, exact coverage") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"), // shorter than one window
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Curation.chunkDocuments(d, window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // doc 1: starts 0,3,6,9 -> 4 chunks, last one is the 1-token tail
    assert(out((1L, 0)) === ("w1 w2 w3 w4", 4L))
    assert(out((1L, 1)) === ("w4 w5 w6 w7", 4L), "1-token overlap")
    assert(out((1L, 2)) === ("w7 w8 w9 w10", 4L))
    assert(out((1L, 3)) === ("w10", 1L), "tail chunk")
    assert(out((2L, 0)) === ("a b c", 3L), "short doc = one short chunk")
    assert(!out.keySet.exists(_._1 == 3L), "null text yields no chunks")
    assert(out.size === 5)
  }

  test("chunkDocuments: stride == window means zero overlap, full cover") {
    import spark.implicits._
    val d = Seq((1L, (1 to 9).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(d, 4, 4)
      .orderBy("chunk_id").collect()
    assert(chunks.map(_.getString(2)).toSeq ===
      Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9"))
    assert(chunks.map(_.getLong(3)).sum === 9L, "every token exactly once")
  }

  test("negativeSamples: k draws per doc, never self, deterministic") {
    import spark.implicits._
    val d = (0L until 100L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val rows = Curation.negativeSamples(d, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 400)
    assert(rows.forall { case (id, _, neg) => neg != id },
      "self-draws must re-step")
    assert(rows.forall { case (_, _, neg) => neg >= 0 && neg < 100 },
      "draws land in the id range")
    val again = Curation.negativeSamples(d.repartition(7), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.toSeq === again.sorted.toSeq,
      "pure function of (id, draw, corpus size)")
  }

  test("curate with LSH variant keeps a subset of the exact survivors' complement") {
    val exact = Curation.curate(docs, 20, 0.5, Seq("the", "a"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lsh = Curation.curate(docs, 20, 0.5, Seq("the", "a"), 0.5,
      useLsh = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(lsh),
      "LSH recall <= exact recall, so it can only keep more docs")
    assert(lsh.contains(0L) && !lsh.contains(1L),
      "exact dups always collide in LSH")
  }
}
