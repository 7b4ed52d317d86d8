package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Persisted tokenizer artifacts: merges survive in rank order, the
  * stored vocabulary pins the id space, OOV is −1, and both
  * segmentation levels round-trip through the store.
  */
class TokenizerStoreSpec extends SparkSpec {

  import spark.implicits._

  private val merges = Seq("t" -> "h", "th" -> "e")

  test("merges load back in rank order") {
    val store = Files.createTempDirectory("tok_store").toString
    val docs = Seq((1L, "the then")).toDF("doc_id", "text")
    TextAnalysis.saveTokenizer(docs, merges, store)
    assert(TextAnalysis.loadTokenizerMerges(spark, store) === merges)
  }

  test("word-level store round-trips the subword token stream; unseen " +
    "tokens encode as -1") {
    val store = Files.createTempDirectory("tok_store_w").toString
    val train = Seq((1L, "the then tee")).toDF("doc_id", "text")
    TextAnalysis.saveTokenizer(train, merges, store)
    val enc = TextAnalysis.encodeTokensBpeStored(spark, store, train)
    val dec = TextAnalysis.decodeTokensBpeStored(spark, store, enc)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "the"->[the], "then"->[the,n], "tee"->[t,e,e] under these merges
    assert(dec(1L) === "the the n t e e")
    // an unseen subword on NEW data hits the stored vocab's gap
    val novel = Seq((2L, "zzz")).toDF("doc_id", "text")
    val ids = TextAnalysis.encodeTokensBpeStored(spark, store, novel)
      .collect().head.getString(1)
    // no merge applies to "zzz": three single-char subwords, each OOV
    assert(ids === "-1,-1,-1",
      "out-of-vocabulary subwords must encode as -1")
  }

  test("empty and null text survive encode as empty id sequences " +
    "(no dropped rows)") {
    val store = Files.createTempDirectory("tok_store_e").toString
    val train = Seq((1L, "the then")).toDF("doc_id", "text")
    TextAnalysis.saveTokenizer(train, merges, store, byteLevel = true)
    val docs = Seq((1L, "the"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val enc = TextAnalysis.encodeTokensBpeStored(spark, store, docs)
    assert(enc.count() === 3, "encode must not drop empty/null docs")
    val dec = TextAnalysis.decodeTokensBpeStored(spark, store, enc)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec(1L) === "the")
    assert(dec(2L) === "", "empty text round-trips to empty")
    assert(dec(3L) === "", "null text normalizes to empty, not a lost row")
  }

  test("byte-level store round-trips text byte-exactly, multi-byte " +
    "UTF-8 included") {
    val store = Files.createTempDirectory("tok_store_b").toString
    val docs = Seq((1L, "the then café 😀"))
      .toDF("doc_id", "text")
    TextAnalysis.saveTokenizer(docs, merges, store, byteLevel = true)
    val out = TextAnalysis.decodeTokensBpeStored(spark, store,
        TextAnalysis.encodeTokensBpeStored(spark, store, docs))
      .collect().head.getString(1)
    assert(out === "the then café 😀")
  }
}
