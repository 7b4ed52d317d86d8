package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fresco

/** Stage-2 "join & widen" (SURVEY.md §3.3, conte-etl-step-2-processor.py
  * :646-951): join the FRESCO time series with one month of job
  * accounting, keep samples inside each job's `[start, end]` interval,
  * pivot the Event column wide (without collapsing rows), derive job
  * metadata, and project to the fixed 22-column contract.
  *
  * Scale posture (SURVEY §4): the accounting side is one month of jobs —
  * small — so J1 is an explicit broadcast hash join; the interval check
  * is a post-join filter (J2) keeping the equi-key hash join; the pivot
  * is 6 `when()` projections (F13) — no shuffle anywhere in this
  * pipeline. At 100 TB of ts data this is scan → broadcast-join →
  * project, embarrassingly parallel.
  */
object Stage2 {

  /** The 22-column output contract —
    * conte-etl-step-2-processor.py:1353-1376. `nhosts`/`ncores` are
    * deliberately double, not int (:1358-1360).
    */
  val OutputColumns: Seq[(String, DataType)] = Seq(
    "time" -> TimestampType, "submit_time" -> TimestampType,
    "start_time" -> TimestampType, "end_time" -> TimestampType,
    "timelimit" -> DoubleType, "nhosts" -> DoubleType,
    "ncores" -> DoubleType, "account" -> StringType,
    "queue" -> StringType, "host" -> StringType, "jid" -> StringType,
    "unit" -> StringType, "jobname" -> StringType,
    "exitcode" -> StringType, "host_list" -> StringType,
    "username" -> StringType,
    "value_cpuuser" -> DoubleType, "value_gpu_usage" -> DoubleType,
    "value_memused" -> DoubleType,
    "value_memused_minus_diskcache" -> DoubleType,
    "value_nfs" -> DoubleType, "value_block" -> DoubleType)

  /** Accounting-side normalization (S2 + F8 + F9 —
    * conte-etl-step-2-processor.py:1196-1302): standardize the join key
    * to `JOB<digits>`. Timestamp columns are expected already typed
    * (the permissive CSV reader in `graft.io` handles string coercion).
    */
  def normalizeJobs(jobs: DataFrame): DataFrame =
    jobs.withColumn("jobID", Fresco.standardizeJobId(col("jobID")))

  /** The core query — conte-etl-step-2-processor.py:646-951.
    *
    * @param ts   FRESCO long table: `Job Id, Host, Event, Value, Units,
    *             Timestamp`
    * @param jobs accounting table: `jobID, qtime, start, end,
    *             Resource_List.walltime, Resource_List.nodect,
    *             Resource_List.ncpus, account, queue, jobname, user,
    *             group, exec_host, jobevent, Exit_status`
    */
  def joinAndWiden(ts: DataFrame, jobs: DataFrame): DataFrame = {
    // P1/P2 pruning is declared via select; Catalyst pushes it to scan.
    val t = ts
      .select("Job Id", "Host", "Event", "Value", "Units", "Timestamp")
      // key normalization on BOTH sides (SURVEY §7.3 — a missed side
      // silently empties the join, the reference's own failure mode)
      .withColumn("Job Id", Fresco.standardizeJobId(col("Job Id")))
    val j = normalizeJobs(jobs)

    val joined = t
      .join(broadcast(j), t("Job Id") === j("jobID"), "inner") // J1
      .where(col("Timestamp").between(col("start"), col("end"))) // J2/P6

    val widened = Fresco.pivotEvents(joined) // F13: no row collapse
      .withColumnsRenamed(Fresco.Stage2Renames) // F14
      .withColumn("timelimit",
        Fresco.walltimeToSeconds(col("timelimit"))) // F10
      .withColumn("host_list", Fresco.hostList(col("host_list"))) // F11
      .withColumn("exitcode",
        Fresco.exitStatusDescription(col("jobevent"),
          col("Exit_status"))) // F12

    projectContract(widened)
  }

  /** P7 + schema enforcement (conte-etl-step-2-processor.py:910-938):
    * missing columns appear as typed nulls, extras are dropped, order is
    * fixed, and every column is cast to the contract type. Unlike the
    * reference's `astype(str)` (which bakes `"nan"` strings, SURVEY
    * §1.3), nulls stay true nulls — a documented bug-fix divergence.
    */
  def projectContract(df: DataFrame): DataFrame = {
    val cols = OutputColumns.map { case (name, dt) =>
      if (df.columns.contains(name)) col(name).cast(dt).as(name)
      else lit(null).cast(dt).as(name)
    }
    df.select(cols: _*)
  }

  /** A2 + F17: day-of-month partition key for the daily sinks (S10) —
    * conte-etl-step-2-processor.py:113-153. Feeds
    * `write.partitionBy("day")`; no driver-side splitting.
    */
  def withDayKey(out: DataFrame): DataFrame =
    out.withColumn("day", Fresco.dayKey(col("time")))
}
