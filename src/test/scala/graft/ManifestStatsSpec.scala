package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{SnapshotBatchScan, Snapshots}

/** Pure-function coverage for the round-15 manifest-stat kinds: 'U'
  * micros timestamp bounds, 'Q' quantile summaries, and the
  * equi-height histogram fold — the pieces whose failure mode is a
  * silently wrong CBO estimate or a wrongly-pruned file rather than
  * a crash, so parsing and edge shapes get direct tests with no
  * Spark session in the loop.
  */
class ManifestStatsSpec extends AnyFunSuite {

  test("tsStatsOf parses 'U' bounds and ignores other kinds") {
    val entry = "data/c-1/f.parquet\t__rows:L:10:10;" +
      "ts:U:1700000000000000:1700000359000000;v:L:0:9;s:T:61:7a"
    val ts = Snapshots.tsStatsOf(entry)
    assert(ts == Map("ts" -> (1700000000000000L, 1700000359000000L)))
    assert(Snapshots.tsStatsOf("rel-with-no-stats").isEmpty)
    // 'U' never leaks into the long/double readers ('L' domain)
    assert(!Snapshots.longStatsOf(entry).contains("ts"))
    assert(!Snapshots.statsOf(entry).contains("ts"))
  }

  test("quantSketchOf round-trips and rejects malformed summaries") {
    val qs = (0 until Snapshots.QuantilePoints)
      .map(i => i * 1.5).toArray
    val entry = s"rel\tv:Q:${qs.mkString(",")}"
    val parsed = Snapshots.quantSketchOf(entry)
    assert(parsed.keySet == Set("v"))
    assert(parsed("v").toSeq == qs.toSeq)
    // wrong arity: dropped, not crashed
    assert(Snapshots.quantSketchOf("rel\tv:Q:1.0,2.0").isEmpty)
    assert(Snapshots.quantSketchOf("rel\tv:Q:not,numbers").isEmpty)
  }

  private def quants(lo: Double, hi: Double): Array[Double] = {
    val n = Snapshots.QuantilePoints
    (0 until n).map(i => lo + (hi - lo) * i / (n - 1)).toArray
  }

  test("buildHistogram: bins are contiguous, cover [min,max], mass-balanced") {
    val h = SnapshotBatchScan.buildHistogram(
      List((quants(0, 1000), 1600L), (quants(500, 1500), 1600L)),
      0.0, 1500.0, Some(1000L)).get
    val bins = h.bins()
    assert(bins.head.lo() == 0.0)
    assert(bins.last.hi() == 1500.0)
    bins.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(0).hi() == w(1).lo(), "bins must be contiguous")
      }
    }
    bins.foreach { b =>
      assert(b.lo() <= b.hi())
      assert(b.ndv() >= 1L)
    }
    assert(math.abs(h.height() * bins.length - 3200.0) < 1e-6)
  }

  test("buildHistogram: a heavy value collapses to lo==hi bins with ndv 1") {
    // 90% of mass at 500: quantiles q1..q15 all equal 500
    val skewed = Array.fill(Snapshots.QuantilePoints)(500.0)
    skewed(0) = 0.0
    skewed(Snapshots.QuantilePoints - 1) = 9999.0
    val h = SnapshotBatchScan.buildHistogram(
      List((skewed, 10000L)), 0.0, 9999.0, Some(100L)).get
    val flat = h.bins().filter(b => b.lo() == b.hi() && b.lo() == 500.0)
    assert(flat.length >= h.bins().length / 2,
      s"heavy value should dominate the bins: ${flat.length} of " +
        s"${h.bins().length}")
    assert(flat.forall(_.ndv() == 1L))
  }

  test("buildHistogram: refusal shapes return None, never a bad histogram") {
    assert(SnapshotBatchScan.buildHistogram(Nil, 0, 1, None).isEmpty)
    assert(SnapshotBatchScan.buildHistogram(
      List((quants(0, 1), 0L)), 0, 1, None).isEmpty)
    assert(SnapshotBatchScan.buildHistogram(
      List((quants(0, 1), 10L)), 5, 1, None).isEmpty) // min > max
    assert(SnapshotBatchScan.buildHistogram(
      List((Array.fill(Snapshots.QuantilePoints)(Double.NaN), 10L)),
      0, 1, None).isEmpty)
  }

  test("buildHistogram: single-point distribution yields one-value coverage") {
    val h = SnapshotBatchScan.buildHistogram(
      List((Array.fill(Snapshots.QuantilePoints)(42.0), 100L)),
      42.0, 42.0, Some(1L)).get
    assert(h.bins().forall(b => b.lo() == 42.0 && b.hi() == 42.0 &&
      b.ndv() == 1L))
  }
}
