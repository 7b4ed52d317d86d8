package graft.etl

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — Spark's runtime-row-filter pattern made
  * an explicit, reusable operator.
  *
  * At 100 TB the dominant cost of `big ⋈ dim` (when `dim` is too large
  * to broadcast as a hash relation but its KEY SET still fits a few
  * megabytes of bits) is shuffling every `big` row that will never
  * find a partner. Building a Bloom filter over the dim keys and
  * filtering `big` in its SCAN stage drops non-matching rows before
  * the exchange, so the shuffle carries ≈ matches + fpp·|big| rows
  * instead of |big|. Catalyst does this automatically for some shuffle
  * joins (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only
  * within one query and only when its own heuristics fire; this
  * operator lets a pipeline build the filter ONCE (e.g. a benchmark /
  * blocklist key set) and prune many scans with it — the
  * decontamination shape of an LLM data pipeline.
  *
  * The sketch is built with `df.stat.bloomFilter` (a tree-aggregated
  * sketch — only the bits reach the driver, never rows) and probed via
  * Catalyst's own codegen'd [[BloomFilterMightContain]], so the probe
  * stays inside whole-stage codegen. Bloom filters have no false
  * negatives, so the exact join after the prefilter returns exactly
  * the un-prefiltered result; false positives only cost shuffle bytes.
  *
  * Sizing contract: ~1.2 bytes/key at 1% fpp (n·ln fpp/ln²2 bits), so
  * 100 M keys ≈ 120 MB — at that point prefer raising `fpp` or
  * bucketing both sides; `MaxExpectedItems` fails loudly before a
  * driver-OOM-sized build is attempted.
  */
object BloomJoin {

  /** Keys beyond this would make the sketch itself gigabytes — the
    * regime where a Bloom prefilter is the wrong tool (bucket/co-
    * partition instead).
    */
  val MaxExpectedItems: Long = 500000000L

  /** Build the dim-side key sketch. Returns the serialized filter —
    * reusable across many probe queries in the session.
    */
  def buildFilter(dim: DataFrame, key: Column, expectedItems: Long,
                  fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0 && expectedItems <= MaxExpectedItems,
      s"expectedItems=$expectedItems outside (0, $MaxExpectedItems]: a " +
        "larger key set needs bucketing/co-partitioning, not a Bloom probe")
    val bf = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe of `key` (an integral column) against
    * a serialized filter from [[buildFilter]]. Null keys yield null
    * (dropped by a Filter — same as any join on a null key). Uses
    * [[graft.plans.BloomContainsExpr]] rather than Catalyst's
    * `BloomFilterMightContain` so the plan string stays O(1) instead
    * of printing the whole filter as a hex literal.
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    Bridge.column(graft.plans.BloomContainsExpr(filterBytes,
      Bridge.expression(key.cast("long"))))

  /** `big LEFT SEMI JOIN dim` with the big side Bloom-pruned in its
    * scan stage. Exactly equal to the plain semi join (no false
    * negatives); the exact join rescues the fpp·|big| false positives.
    */
  def semiJoin(big: DataFrame, bigKey: String, dim: DataFrame,
               dimKey: String, expectedItems: Long,
               fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(dim, col(dimKey), expectedItems, fpp)
    // alias the dim key so bigKey == dimKey (the common case for a
    // shared key name) cannot make the join condition ambiguous
    val dimKeys = dim.select(col(dimKey).as("__graft_bloom_dim_key"))
    big.filter(mightContain(bytes, col(bigKey)))
      .join(dimKeys, col(bigKey) === col("__graft_bloom_dim_key"),
        "left_semi")
  }

  /** Deserialize a filter built by [[buildFilter]] (diagnostics /
    * spec support).
    */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
