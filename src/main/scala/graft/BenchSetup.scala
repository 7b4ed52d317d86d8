package graft

/** Fixture-build vs measured-query accounting for [[Bench]].
  *
  * Gates that must CONSTRUCT their catalog/store in-gate (the
  * `q_snapshot_*` family stages a table with INSERTs, compactions
  * and analyzes before the scan/DML under test; `q_bm25_update` /
  * `q_bm25_compact` build a persisted index first) wrap that
  * construction in [[section]]. [[Bench]] drains the accumulator
  * after each query and reports `setup` and `measured` separately —
  * so per-query bench numbers grade the operation the gate is NAMED
  * for, not its fixture build, which otherwise dominates at sf1
  * (`q_snapshot_range_skip`'s 30.7 s there was z-order compaction of
  * the corpus, not the range scan it gates). [[Verify]] never drains
  * it: correctness runs are unaffected.
  *
  * Accumulation is additive and reentrant-safe (nested sections
  * would double-count, so don't nest — gates wrap flat statement
  * blocks). A single atomic suffices: Bench runs queries one at a
  * time on the driver thread.
  */
object BenchSetup {
  private val acc = new java.util.concurrent.atomic.AtomicLong

  /** Run `body`, attributing its wall time to fixture SETUP. */
  def section[A](body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally { acc.addAndGet(System.nanoTime() - t0); () }
  }

  /** Seconds accumulated since the last drain; resets to zero. */
  def drainSec(): Double = acc.getAndSet(0L) / 1e9
}
