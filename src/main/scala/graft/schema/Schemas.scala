package graft.schema

import org.apache.spark.sql.types._

/** Fixed schema contracts (SURVEY.md §1.3-1.4). Inputs are read
  * all-string then coerced (the reference's `dtype='object'` +
  * `errors='coerce'` posture, conte-etl-step-2-processor.py:1207-1221);
  * outputs are hard contracts with fixed order and types
  * (conte-etl-step-2-processor.py:1353-1405).
  */
object Schemas {

  private def allString(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  /** Raw metric CSVs — transform_conte_ts_data.py:226,328,432,556. */
  val blockRaw: StructType = allString(
    "rd_sectors", "wr_sectors", "rd_ticks", "wr_ticks",
    "jobID", "node", "timestamp")
  val cpuRaw: StructType = allString(
    "user", "nice", "system", "idle", "iowait", "irq", "softirq",
    "jobID", "node", "timestamp")
  val memRaw: StructType = allString(
    "MemTotal", "MemFree", "FilePages", "jobID", "node", "timestamp")
  val nfsRaw: StructType = allString(
    "read_bytes", "write_bytes", "jobID", "node", "timestamp")

  /** FRESCO long/tidy 6-col time-series schema —
    * transform_conte_ts_data.py:285-292.
    */
  val fresco: StructType = StructType(Seq(
    StructField("Job Id", StringType),
    StructField("Host", StringType),
    StructField("Event", StringType),
    StructField("Value", DoubleType),
    StructField("Units", StringType),
    StructField("Timestamp", TimestampType)))

  /** Accounting CSV (read all-string; coerced downstream) —
    * conte-etl-step-2-processor.py:691-694, 1214-1221.
    */
  val accountingRaw: StructType = allString(
    "jobID", "user", "account", "queue", "ctime", "qtime", "etime",
    "start", "end", "timestamp", "Resource_List.walltime",
    "Resource_List.nodect", "Resource_List.ncpus", "group", "exec_host",
    "jobname", "jobevent", "Exit_status")

  /** Joined wide output: the 22-column contract —
    * conte-etl-step-2-processor.py:1353-1376 (dtypes), :911-915 (order).
    * `nhosts`/`ncores` are deliberately double, not int (:1358-1360).
    */
  val output22: StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("submit_time", TimestampType),
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("timelimit", DoubleType),
    StructField("nhosts", DoubleType),
    StructField("ncores", DoubleType),
    StructField("account", StringType),
    StructField("queue", StringType),
    StructField("host", StringType),
    StructField("jid", StringType),
    StructField("unit", StringType),
    StructField("jobname", StringType),
    StructField("exitcode", StringType),
    StructField("host_list", StringType),
    StructField("username", StringType),
    StructField("value_cpuuser", DoubleType),
    StructField("value_gpu_usage", DoubleType),
    StructField("value_memused", DoubleType),
    StructField("value_memused_minus_diskcache", DoubleType),
    StructField("value_nfs", DoubleType),
    StructField("value_block", DoubleType)))
}
