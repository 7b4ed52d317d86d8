package graft

import org.apache.spark.sql.functions._
import graft.etl.BloomJoin

/** Bloom-filter join pruning invariants: exactness (no false
  * negatives survive to the result), scan-stage placement, and the
  * sizing guard.
  */
class BloomJoinSpec extends SparkSpec {

  private lazy val big = {
    import spark.implicits._
    (0L until 10000L).map(i => (i, i % 100)).toDF("k", "payload")
  }
  private lazy val dim = {
    import spark.implicits._
    (0L until 10000L by 7L).map(i => Tuple1(i)).toDF("dk")
  }

  test("semiJoin equals the exact semi join (false positives rescued)") {
    val exact = big.join(dim, col("k") === col("dk"), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    val bloomed = BloomJoin.semiJoin(big, "k", dim, "dk",
      expectedItems = 10000)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(bloomed === exact)
  }

  test("a deliberately tiny, high-fpp filter is still exact") {
    // undersized filter => many false positives; result must not change
    val exact = big.join(dim, col("k") === col("dk"), "left_semi").count()
    val bloomed = BloomJoin.semiJoin(big, "k", dim, "dk",
      expectedItems = 10, fpp = 0.5).count()
    assert(bloomed === exact)
  }

  test("no false negatives: every dim key passes mightContain") {
    val bytes = BloomJoin.buildFilter(dim, col("dk"), 10000)
    val n = dim.count()
    val passed = dim.filter(BloomJoin.mightContain(bytes, col("dk"))).count()
    assert(passed === n, "a Bloom filter never drops a present key")
  }

  test("the prefilter prunes before the join and actually drops rows") {
    val bytes = BloomJoin.buildFilter(dim, col("dk"), 10000, 0.01)
    // a file-backed scan: over a local relation Catalyst constant-folds
    // the whole filter at optimize time, which hides the plan shape
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bloom_spec").toString
    big.write.mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(BloomJoin.mightContain(bytes, col("k")))
    val kept = pruned.count()
    val matches = 10000L / 7L + 1L // multiples of 7 below 10000
    assert(kept >= matches, "no false negatives")
    // 1% fpp over ~8571 non-matching rows: expect ~86 extras, allow 10x
    assert(kept <= matches + 900,
      s"prefilter should drop most non-matching rows, kept $kept")
    // placement: the might_contain probe is a Filter directly over the
    // scan — i.e. BEFORE any exchange a downstream join would add
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"), plan.take(500))
    assert(!plan.contains("Exchange"),
      "prefilter stage must be exchange-free (scan-side pruning)")
  }

  test("semiJoin works when both sides share the same key name") {
    import spark.implicits._
    val sameName = dim.withColumnsRenamed(Map("dk" -> "k"))
    val exact = big.join(sameName, Seq("k"), "left_semi").count()
    val bloomed = BloomJoin.semiJoin(big, "k", sameName, "k",
      expectedItems = 10000).count()
    assert(bloomed === exact)
  }

  test("null probe keys are dropped, like any null join key") {
    import spark.implicits._
    val withNulls = Seq(Some(7L), Some(3L), None)
      .toDF("k")
    val out = BloomJoin.semiJoin(withNulls, "k", dim, "dk",
      expectedItems = 10000)
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("sizing guard refuses a driver-OOM-sized build") {
    val e = intercept[IllegalArgumentException] {
      BloomJoin.buildFilter(dim, col("dk"), BloomJoin.MaxExpectedItems + 1)
    }
    assert(e.getMessage.contains("bucketing"))
  }
}
