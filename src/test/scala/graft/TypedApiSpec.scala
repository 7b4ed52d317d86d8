package graft

import graft.api.Typed

/** Typed façade must agree with the untyped operators. */
class TypedApiSpec extends SparkSpec {

  private lazy val docsDf = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog today", "en"),
      (1L, "the quick brown fox jumps over the lazy dog today", "en"),
      (2L, "entirely different words in this one here now", "de"))
      .toDF("doc_id", "text", "lang")
  }

  test("documents round-trip through the typed view") {
    val ds = Typed.documents(docsDf)
    val back = ds.collect().map(d => (d.doc_id, d.lang)).sortBy(_._1)
    assert(back.toSeq === Seq((0L, "en"), (1L, "en"), (2L, "de")))
  }

  test("typed nearDups equals untyped jaccardPairs") {
    val typed = Typed.nearDups(Typed.documents(docsDf), 0.5)
      .collect().map(p => (p.doc_a, p.doc_b)).toSet
    val untyped = graft.dedup.Dedup.jaccardPairs(docsDf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(typed === untyped && typed === Set((0L, 1L)))
  }

  test("typed curate drops the duplicate, keeps the rest") {
    val out = Typed.curate(Typed.documents(docsDf), minChars = 10,
      maxStopwordRatio = 0.9, stopwords = Seq("the", "a"),
      jaccardThreshold = 0.5)
    assert(out.collect().map(_.doc_id).sorted.toSeq === Seq(0L, 2L))
  }
}
