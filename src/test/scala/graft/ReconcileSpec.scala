package graft

import org.apache.spark.sql.functions._
import graft.etl.Reconcile
import graft.io.Sinks

/** Bucket-checksum reconciliation + HLL distinct-store invariants. */
class ReconcileSpec extends SparkSpec {

  private def snapshot = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"v$i", i * 2.0)).toDF("k", "s", "d")
  }

  test("diff: equals the direct full-outer diff on drifted keys") {
    val a = snapshot
    val b = a.filter(col("k") % 100 =!= 7) // delete 20
      .withColumn("d", when(col("k") % 100 === 11, col("d") + 0.5)
        .otherwise(col("d"))) // change 20
      .unionByName(a.filter(col("k") === 3L)
        .withColumn("k", lit(99999L))) // add 1
    val out = Reconcile.diff(a, b, "k", nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.count(_._2 == "only_left") === 20)
    assert(out.count(_._2 == "changed") === 20)
    assert(out(99999L) === "only_right")
    assert(out.size === 41)
  }

  test("diff: identical snapshots prune every bucket") {
    val a = snapshot
    assert(Reconcile.changedBuckets(a, a, "k", 64).count() === 0,
      "checksum phase must prove equality without a row-level join")
    assert(Reconcile.diff(a, a, "k", 64).count() === 0)
  }

  test("diff: resolve phase only reads drifted buckets") {
    val a = snapshot
    val b = a.withColumn("d",
      when(col("k") === 42L, lit(-1.0)).otherwise(col("d")))
    val changed = Reconcile.changedBuckets(a, b, "k", 256).count()
    assert(changed === 1, s"one drifted row lives in one bucket: $changed")
  }

  test("diff: a user column named 'bucket' is still compared") {
    import spark.implicits._
    // internal bucketing must not shadow (and thereby exclude) a data
    // column that happens to be called "bucket"
    val l = Seq((1L, "x"), (2L, "y")).toDF("k", "bucket")
    val r = Seq((1L, "x"), (2L, "CHANGED")).toDF("k", "bucket")
    val out = Reconcile.diff(l, r, "k", 8)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(out === Map(2L -> "changed"))
  }

  test("diff: count catches the xor blind spot (even multiplicity)") {
    import spark.implicits._
    // same key twice on the left only: the two identical row hashes
    // XOR to 0, but the row COUNT differs, so the bucket still flags
    val l = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "s")
    val r = Seq((2L, "y")).toDF("k", "s")
    assert(Reconcile.changedBuckets(l, r, "k", 8).count() >= 1)
  }

  test("mergeDistinctSketch: batched union estimates like one shot") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_hll_spec").toString + "/store"
    val data = (0L until 3000L).map(i => (s"g${i % 3}", i % 500))
      .toDF("g", "u")
    Sinks.mergeDistinctSketch(spark, data.filter(col("u") < 250),
      path, Seq("g"), "u")
    Sinks.mergeDistinctSketch(spark, data.filter(col("u") >= 200),
      path, Seq("g"), "u") // overlapping batch: union, not sum
    val est = Sinks.distinctEstimate(spark.read.parquet(path), Seq("g"))
      .select(col("g"), col("approx_distinct").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // each group sees ~500/3 + ... exact per-group distinct u:
    val exact = data.groupBy("g").agg(countDistinct("u").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= n * 0.1 + 2,
        s"group $g: est ${est(g)} vs exact $n")
    }
    // rollup from stored sketches to the global grain
    val total = Sinks.distinctEstimate(spark.read.parquet(path),
      Seq.empty).select(col("approx_distinct").cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(total - 500.0) <= 500 * 0.1 + 2,
      s"global rollup from sketches: $total vs 500")
  }
}
