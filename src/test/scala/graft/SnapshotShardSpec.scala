package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Manifest v4 SHARDING: past the shard threshold a full manifest
  * stores its entries in immutable, content-addressed shard files
  * grouped by partition directory, and every prune proves whole-shard
  * skips from the shard's merged pseudo-stats before reading any
  * entry — the metadata layer's own file skipping. These specs pin
  * the format round-trip, shard reuse across commits, skip proofs,
  * rollback/vacuum interplay, and the v3→v4 threshold crossing.
  */
class SnapshotShardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.t(spark, sf, "documents")
  private def newStore: String =
    Files.createTempDirectory("graft_shard").toString + "/tbl"

  private def withShardSize[A](n: Int)(body: => A): A = {
    val prev = Snapshots.shardSizeOverride
    Snapshots.shardSizeOverride = Some(n)
    try body finally Snapshots.shardSizeOverride = prev
  }

  private def manifestHeader(path: String, v: Long): String = {
    val p = java.nio.file.Paths.get(
      path, "_manifests", f"v$v%09d.manifest")
    java.nio.file.Files.readAllLines(p).get(0)
  }

  private def shardFiles(path: String): Set[String] = {
    val d = new java.io.File(s"$path/_manifests/shards")
    if (!d.exists()) Set.empty
    else d.listFiles().map(_.getName)
      .filter(_.endsWith(".shard")).toSet
  }

  test("v4 round-trip: sharded manifest reads back exactly; " +
      "small tables stay v3") {
    withShardSize(2) {
      val path = newStore
      // one commit of several files -> one directory group, chunked
      val v1 = Snapshots.commit(docs.repartition(8), path)
      assert(manifestHeader(path, v1) === "graft-snapshot-v4")
      assert(shardFiles(path).nonEmpty)
      assert(Snapshots.read(spark, path).count() === docs.count())
      assert(Snapshots.read(spark, path)
        .select(sum("doc_id")).head().getLong(0) ===
        docs.select(sum("doc_id")).head().getLong(0))
      // below threshold: the plain v3 encoding is untouched
      val small = newStore
      val sv = Snapshots.commit(docs.limit(5).coalesce(1), small)
      assert(manifestHeader(small, sv) === "graft-snapshot-v3")
    }
  }

  test("appends REUSE untouched shards (content-addressed): only " +
      "the new commit's group writes") {
    withShardSize(2) {
      val path = newStore
      Snapshots.commit(docs.repartition(6), path)
      val before = shardFiles(path)
      assert(before.nonEmpty)
      Snapshots.commitAppend(
        docs.withColumn("doc_id", col("doc_id") + 1000000)
          .repartition(4), path)
      val after = shardFiles(path)
      // every v1 shard survives by NAME (same group -> same content
      // -> same hash); the append added only its own group's shards
      assert(before.subsetOf(after))
      assert(after.size > before.size)
      assert(Snapshots.read(spark, path).count() === 2 * docs.count())
    }
  }

  test("whole-shard skips: a range prune loads only the commits " +
      "whose merged stats overlap") {
    withShardSize(2) {
      val path = newStore
      // four disjoint doc_id bands, one commit (= one group) each
      (0 until 4).foreach { i =>
        val part = docs
          .select((col("doc_id") + i * 10000000L).as("doc_id"),
            col("n_chars"))
          .repartition(3)
        if (i == 0) Snapshots.commit(part, path)
        else Snapshots.commitAppend(part, path)
      }
      Snapshots.shardsLoaded.set(0L)
      Snapshots.shardsSkipped.set(0L)
      val got = Snapshots.readBetween(spark, path, "doc_id",
        10000000.0, 10005000.0)
      val expect = docs
        .filter(col("doc_id") + 10000000L <= 10005000L)
        .count()
      assert(got.count() === expect)
      assert(Snapshots.shardsSkipped.get() > 0L,
        "the disjoint bands' shards must skip at shard level")
    }
  }

  test("equality prune through shards stays exact; rollback " +
      "republishes v4 verbatim; vacuum keeps referenced shards " +
      "and sweeps orphans") {
    withShardSize(2) {
      val path = newStore
      val v1 = Snapshots.commit(docs.repartition(6), path)
      val probe = docs.select(min("doc_id")).head().getLong(0)
      assert(Snapshots.readEquals(spark, path, "doc_id", probe)
        .count() === docs.filter(col("doc_id") === probe).count())
      // overwrite with a DIFFERENT sharded snapshot, then roll back
      // to v1 — the rollback's verbatim republish references v1's
      // shard files by name, while v2's shards become orphans the
      // moment expire drops v2
      Snapshots.commit(docs.filter(col("doc_id") % 2 === 0)
        .repartition(5), path)
      val v3 = Snapshots.rollback(spark, path, v1)
      assert(manifestHeader(path, v3) === "graft-snapshot-v4")
      assert(Snapshots.read(spark, path).count() === docs.count())
      // expire history, vacuum with zero grace: every shard the
      // surviving manifest references survives; reads still work
      Snapshots.expire(spark, path, keepLast = 1)
      Snapshots.vacuum(spark, path, graceMs = 0L)
      assert(Snapshots.read(spark, path).count() === docs.count())
      val live = shardFiles(path)
      val referenced = Snapshots
        .shardRefsAt(spark, path,
          Snapshots.latestVersion(spark, path).get)
        .map(_.file).toSet
      assert(referenced.subsetOf(live))
      // an orphaned shard (no surviving manifest references it)
      // sweeps on the next vacuum once out of grace
      assert(live === referenced,
        s"orphaned shards survived vacuum: ${live -- referenced}")
    }
  }

  test("aggregate pushdown answers from SHARD pseudo-stats: bare and " +
      "grouped COUNT/MIN/MAX without touching entries; string MIN " +
      "falls back to the entry tier and still answers") {
    withShardSize(2) {
      val wh = Files.createTempDirectory("graft_shard_agg").toString
      val cat = "gshagg" + math.abs(wh.hashCode).toString
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.io.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      docs.createOrReplaceTempView("shard_agg_src")
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.d (doc_id BIGINT, " +
        "lang STRING, source STRING, n_chars BIGINT) " +
        "PARTITIONED BY (lang)")
      (0 until 3).foreach { i =>
        spark.sql(s"INSERT INTO $cat.db.d SELECT doc_id + ${i}000000," +
          " lang, source, n_chars FROM shard_agg_src")
      }
      val tbl = s"$wh/db/d"
      assert(Snapshots.shardRefsAt(spark, tbl,
        Snapshots.latestVersion(spark, tbl).get).nonEmpty,
        "fixture must shard")
      val n = docs.count()
      // bare COUNT(*): a one-row metadata scan, exact
      val cnt = spark.sql(s"SELECT count(*) AS n FROM $cat.db.d")
      assert(cnt.queryExecution.executedPlan.toString
        .contains("manifest-agg"), "COUNT(*) must push to metadata")
      assert(cnt.head().getLong(0) === 3 * n)
      // grouped COUNT over the identity partition column: one row
      // per live lang, counts exact (shard groups are dir-grouped)
      val grouped = spark.sql(s"SELECT lang, count(*) AS n " +
        s"FROM $cat.db.d GROUP BY lang")
      assert(grouped.queryExecution.executedPlan.toString
        .contains("manifest-agg"), "grouped COUNT must push")
      val got = grouped.collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap
      val want = docs.groupBy(col("lang")).count().collect()
        .map(r => r.getString(0) -> 3 * r.getLong(1)).toMap
      assert(got === want)
      // integral MIN/MAX: exact from the shard-merged 'L' bounds
      val mm = spark.sql(s"SELECT min(doc_id) AS lo, max(doc_id) " +
        s"AS hi FROM $cat.db.d")
      assert(mm.queryExecution.executedPlan.toString
        .contains("manifest-agg"))
      val (lo, hi) = (mm.head().getLong(0), mm.head().getLong(1))
      assert(lo === docs.agg(min("doc_id")).head().getLong(0))
      assert(hi === docs.agg(max("doc_id")).head().getLong(0) + 2000000)
      // string MIN on a DATA column: shard 'T' bounds are never
      // exact, so the push falls back to the ENTRY tier — and still
      // answers from metadata (exact untruncated per-file bounds)
      val sm = spark.sql(s"SELECT min(source) AS lo FROM $cat.db.d")
      assert(sm.queryExecution.executedPlan.toString
        .contains("manifest-agg"), "string MIN must still push " +
        "(entry tier)")
      assert(sm.head().getString(0) ===
        docs.agg(min("source")).head().getString(0))
    }
  }

  test("threshold crossing mid-history: v3 versions stay readable " +
      "beside v4 ones; SQL scans prune through shards") {
    withShardSize(2) {
      val path = newStore
      Snapshots.shardSizeOverride = Some(1000) // v1 stays small/v3
      val v1 = Snapshots.commit(docs.coalesce(1), path)
      Snapshots.shardSizeOverride = Some(2)
      Snapshots.commitAppend(
        docs.withColumn("doc_id", col("doc_id") + 1000000)
          .repartition(6), path)
      assert(manifestHeader(path, v1) === "graft-snapshot-v3")
      assert(manifestHeader(path, 2L) === "graft-snapshot-v4")
      assert(Snapshots.read(spark, path, Some(v1)).count() ===
        docs.count())
      assert(Snapshots.read(spark, path).count() === 2 * docs.count())
    }
  }
}
