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
