package graft

import org.apache.spark.storage.StorageLevel
import graft.dedup.Dedup
import graft.pipeline.Curation

/** The engine-held cache registry: registration, one-call release,
  * operator call-site coverage, and the retain/release race.
  */
class CacheScopeSpec extends SparkSpec {

  import spark.implicits._

  test("retain registers a tag and release unpersists everything") {
    CacheScope.release(spark) // isolate from other suites
    val df = Seq(1, 2, 3).toDF("x")
    CacheScope.retain(df, "spec.t1")
    assert(CacheScope.tags(spark).contains("spec.t1"))
    assert(df.storageLevel !== StorageLevel.NONE)
    assert(CacheScope.release(spark) >= 1)
    assert(df.storageLevel === StorageLevel.NONE)
    assert(CacheScope.tags(spark).isEmpty)
  }

  test("curate and fuzzy register their session-owned caches") {
    CacheScope.release(spark)
    val docs = Seq(
      (1L, "s", "the quick brown fox jumps over the lazy dog today"),
      (2L, "s", "the quick brown fox jumps over the lazy dog today"),
      (3L, "s", "completely different text about something else entirely"))
      .toDF("doc_id", "source", "text")
    Curation.curate(docs, minChars = 5, maxStopwordRatio = 1.0,
      stopwords = Seq("the"), jaccardThreshold = 0.8).count()
    val t1 = CacheScope.tags(spark)
    assert(t1.contains("curate.quality") &&
      t1.contains("curate.exactDeduped"))
    Dedup.fuzzy(docs, 0.8).count()
    val t2 = CacheScope.tags(spark)
    assert(t2.contains("fuzzy.shingleSets") &&
      t2.contains("fuzzy.minhashSignatures"))
    CacheScope.release(spark)
  }

  test("retain racing release never leaves an orphaned persisted frame") {
    CacheScope.release(spark)
    val frames = (0 until 64).map(i => Seq(i).toDF("x"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val retains = frames.map(df => pool.submit(new Runnable {
        def run(): Unit = { CacheScope.retain(df, "spec.race"); () }
      }))
      val releases = (0 until 16).map(_ => pool.submit(new Runnable {
        def run(): Unit = { CacheScope.release(spark); () }
      }))
      (retains ++ releases).foreach(_.get())
    } finally pool.shutdown()
    // whatever survived the concurrent releases drains with one more
    CacheScope.release(spark)
    frames.foreach(df =>
      assert(df.storageLevel === StorageLevel.NONE,
        "a retain that raced a release left its frame persisted " +
          "but untracked"))
  }
}
