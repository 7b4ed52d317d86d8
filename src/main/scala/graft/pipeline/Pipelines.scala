package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Stage1, Stage2}
import graft.io.Sinks

/** End-to-end pipeline drivers (SURVEY.md §3.1 / §3.3): one lazy
  * DataFrame plan per stage — scan → transform → union → partitioned
  * write — with Catalyst fusing everything; the reference's thread
  * pools, chunk planners, and memory monitors have no equivalent here
  * because partitioning subsumes them.
  */
object Pipelines {

  /** Stage-1 (`transform_conte_ts_data.main`): four raw metric tables →
    * FRESCO union → month-partitioned store with merge+dedup (S11).
    * One shuffle total (the NFS window); the write is partition-pruned.
    */
  def transformPipeline(spark: SparkSession, block: DataFrame,
                        cpu: DataFrame, mem: DataFrame, nfs: DataFrame,
                        outPath: String): Unit = {
    val fresco = Stage1.withMonthKey(Stage1.unionAll(
      Stage1.block(block), Stage1.cpu(cpu), Stage1.mem(mem),
      Stage1.nfs(nfs)))
    Sinks.mergeDedup(spark, fresco, outPath, "ym")
  }

  /** Stage-2 (`conte-etl-step-2-processor.process_year_month`): FRESCO
    * ts × accounting for one month → 22-col contract → day-partitioned
    * store (A2/S10), idempotent under rerun (T4 dynamic overwrite).
    */
  def etlPipeline(ts: DataFrame, jobs: DataFrame, outPath: String): Unit = {
    val out = Stage2.withDayKey(Stage2.joinAndWiden(ts, jobs))
    Sinks.writePartitioned(out, outPath, Seq("day"))
  }

  /** A whole-month driver loop with the reference's orchestration
    * semantics: signal protocol (T2), processed-set idempotency (T3),
    * bounded retry (T5). `months` would come from a listing
    * intersection (U4) in production.
    */
  def runMonths(months: Seq[String], signals: Orchestration.SignalManager,
                processed: Orchestration.ProcessedSet,
                maxRetries: Int = 5, baseDelayMs: Long = 1000L,
                sleep: Long => Unit = Thread.sleep)
               (work: String => Unit): Unit =
    months.filterNot(processed.contains).foreach { m =>
      signals.signal(m, "processing")
      try {
        Orchestration.retryWithBackoff(maxRetries, baseDelayMs,
          sleep)(work(m))
        processed.add(m)
        signals.signal(m, "complete")
      } catch {
        case scala.util.control.NonFatal(e) =>
          signals.signal(m, "failed")
          throw e
      }
    }
}
