package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Manifest bloom blocks ('B' kind): per-file bloom filters for
  * equality/IN pruning on unclustered high-NDV columns, where
  * min/max bounds prove nothing. Pins the sizing rule, the exact
  * absence proof, the false-positive rate, and the end-to-end gate
  * shapes (q_snapshot_bloom_skip / q_snapshot_shard_skip).
  */
class SnapshotBloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def newStore: String =
    Files.createTempDirectory("graft_bloom").toString + "/tbl"

  test("bloomParams: power-of-two sizing, capped, k tracks density") {
    val (m1, k1) = Snapshots.bloomParams(10)
    assert(m1 >= 64 && Integer.bitCount(m1) === 1)
    assert(k1 >= 1 && k1 <= 16)
    val (m2, _) = Snapshots.bloomParams(1000000)
    assert(m2 === Snapshots.BloomMaxBits) // cap holds manifest weight
    val (m3, k3) = Snapshots.bloomParams(500)
    assert(m3 === 8192 && k3 >= 4)
  }

  test("interleaved string ids: bloom prunes the point lookup " +
      "exactly; absent keys prune to zero files at low FPR") {
    val path = newStore
    // four commits whose jid sets interleave (id % 4 == commit):
    // every file's string bounds span the whole range
    val base = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    (0 until 4).foreach { i =>
      val part = base.select(
        concat(lit("JOB"), lpad((col("doc_id") * 4 + i).cast("string"),
          9, "0")).as("jid"), col("n_chars")).coalesce(1)
      if (i == 0) Snapshots.commit(part, path)
      else Snapshots.commitAppend(part, path)
    }
    Snapshots.setProperties(spark, path,
      Map("stats.bloom.columns" -> "jid"))
    Snapshots.analyzeNdv(spark, path, Seq("jid"))
    val n = base.count()
    // a PRESENT key: its own file kept, others pruned (modulo FPR —
    // strictly fewer than all four must survive)
    val (kept, total) = Snapshots.prunedEntriesEquals(
      spark, path, "jid", "JOB000000041") // 41 % 4 = 1 -> commit 1
    assert(total === 4)
    assert(kept.size < total,
      "bloom absence proof must prune at least one file")
    assert(Snapshots.readEquals(spark, path, "jid", "JOB000000041")
      .count() === 1L)
    // ABSENT keys: measured FPR across 200 probes stays low (the
    // sizing rule gives ~16 bits/key at this ndv)
    val probes = (0 until 200).map(i => f"NOPE$i%09d")
    val keptCounts = probes.map(p =>
      Snapshots.prunedEntriesEquals(spark, path, "jid", p)._1.size)
    val fpr = keptCounts.sum.toDouble / (probes.size * 4)
    assert(fpr < 0.05, s"bloom FPR too high: $fpr")
    // and an absent-key READ is exactly empty regardless of pruning
    assert(Snapshots.readEquals(spark, path, "jid", "NOPE000000000")
      .count() === 0L)
  }

  test("re-analyze refreshes blooms for files appended after the " +
      "first pass; unanalyzed files are kept, never skipped") {
    val path = newStore
    val base = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    Snapshots.commit(base.select(
      concat(lit("A"), col("doc_id").cast("string")).as("jid"),
      col("n_chars")).coalesce(1), path)
    Snapshots.setProperties(spark, path,
      Map("stats.bloom.columns" -> "jid"))
    Snapshots.analyzeNdv(spark, path, Seq("jid"))
    // append WITHOUT re-analyzing: the new file has no bloom block,
    // so a lookup for its keys must keep it (prune-only-on-proof)
    Snapshots.commitAppend(base.select(
      concat(lit("B"), col("doc_id").cast("string")).as("jid"),
      col("n_chars")).coalesce(1), path)
    assert(Snapshots.readEquals(spark, path, "jid", "B7").count() === 1L)
    // re-analyze: both files carry blooms now; lookups stay exact
    Snapshots.analyzeNdv(spark, path, Seq("jid"))
    val (kept, total) = Snapshots.prunedEntriesEquals(
      spark, path, "jid", "B7")
    assert(total === 2 && kept.size === 1,
      s"expected the B file alone, kept ${kept.size} of $total")
    assert(Snapshots.readEquals(spark, path, "jid", "A7").count() === 1L)
  }

  test("gate shapes end-to-end: q_snapshot_bloom_skip and " +
      "q_snapshot_shard_skip return rows under their assertions") {
    assert(QueriesIo.snapshotBloomSkip(spark, sf).count() >= 1L)
    assert(QueriesIo.snapshotShardSkip(spark, sf).count() > 0L)
  }

  test("type widening does not weaponize stale blooms: int-hashed " +
      "blocks are skipped after int->long promotion, never trusted") {
    val path = newStore
    val base = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    // two int-typed files with interleaved values (min/max useless)
    (0 until 2).foreach { i =>
      val part = base.select(
        (col("doc_id") * 2 + i).cast("int").as("v"),
        col("n_chars")).coalesce(1)
      if (i == 0) Snapshots.commit(part, path)
      else Snapshots.commitAppend(part, path)
    }
    Snapshots.setProperties(spark, path,
      Map("stats.bloom.columns" -> "v"))
    Snapshots.analyzeNdv(spark, path, Seq("v"))
    // blooms probative at the analyzed type: an even value lives in
    // file 0 only; the odd file's bloom proves absence
    val (keptInt, totalInt) = Snapshots.prunedEntriesEquals(
      spark, path, "v", 42)
    assert(totalInt === 2 && keptInt.size === 1,
      s"int-typed bloom should prune 1 of 2, kept ${keptInt.size}")
    // WIDEN: a long batch promotes v to bigint (metadata-only).
    // xxhash64(42L) != xxhash64(42: Int), so every committed bloom
    // block is now non-probative for lookups — the type tag must
    // make the pruner SKIP them (files kept), not falsely prune
    Snapshots.commitAppend(base.limit(50).select(
      ((col("doc_id") + 1000000L) * 2).cast("long").as("v"),
      col("n_chars")).coalesce(1), path)
    assert(Snapshots.read(spark, path).schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    val (keptWide, totalWide) = Snapshots.prunedEntriesEquals(
      spark, path, "v", 42L)
    // stats (type-agnostic doubles) may still prune the new far-range
    // file, but BOTH pre-widening files must survive: their blooms
    // are tag-mismatched and prove nothing
    assert(totalWide === 3)
    assert(keptWide.size >= 1 &&
      keptWide.exists(e => keptInt.exists(_.startsWith(
        e.takeWhile(_ != '\t')))),
      "pre-widening file holding the value must be kept")
    // the actual read stays EXACT - this is the wrong-results bug
    assert(Snapshots.readEquals(spark, path, "v", 42L).count() === 1L)
    assert(Snapshots.readEquals(spark, path, "v", 43L).count() === 1L)
    // re-analyze under the widened schema: blocks re-tagged bigint,
    // pruning resumes (odd/even separation proves absence again)
    Snapshots.analyzeNdv(spark, path, Seq("v"))
    val (keptRe, totalRe) = Snapshots.prunedEntriesEquals(
      spark, path, "v", 42L)
    assert(totalRe === 3 && keptRe.size === 1,
      s"re-analyzed blooms should prune 2 of 3, kept ${keptRe.size}")
    assert(Snapshots.readEquals(spark, path, "v", 42L).count() === 1L)
  }
}
