package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fresco

/** Stage-1 metric transformation (SURVEY.md §3.1): raw node-metric tables
  * (block/cpu/mem/llite) → the long/tidy 6-column FRESCO time-series
  * schema (`Job Id, Host, Event, Value, Units, Timestamp`,
  * transform_conte_ts_data.py:285-292).
  *
  * Each transform is a pure `DataFrame => DataFrame` built entirely from
  * codegen'd built-in expressions — no UDFs — so at 100 TB the whole
  * stage-1 pipeline is one scan → project → filter per metric with zero
  * shuffles (the NFS window is the single exception, exactly one
  * exchange on (jobID, node)).
  *
  * Input contract per metric (reference's raw CSVs, SURVEY §1.4): a
  * string `timestamp` column in `M/d/yyyy H:mm:ss` (F9), a `jobID`
  * string, a `node` string, plus the metric counters. The reference's
  * P3 (required-column presence) is a hard error here; P4 (`na.drop` on
  * required) and P5 (invalid-timestamp drop) are applied in order.
  */
object Stage1 {

  /** FRESCO output column names — transform_conte_ts_data.py:285-292. */
  val FrescoColumns: Seq[String] =
    Seq("Job Id", "Host", "Event", "Value", "Units", "Timestamp")

  /** P3: required-column presence check — transform_conte_ts_data.py:227-231.
    * The reference returns an empty frame; we fail fast (documented
    * divergence: silent empties hide data loss at scale).
    */
  private def requireColumns(df: DataFrame, cols: Seq[String]): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: $missing")
  }

  /** P4 + P5 + F9: drop rows with nulls in required columns, parse the
    * timestamp (null-on-fail), drop unparseable rows.
    */
  private def cleanRaw(df: DataFrame, required: Seq[String]): DataFrame = {
    requireColumns(df, required)
    df.na.drop(required)
      .withColumn("__ts", Fresco.parseTimestamp(col("timestamp")))
      .filter(col("__ts").isNotNull)
  }

  /** Project to the 6-col FRESCO schema (F7 jobID rewrite applied). */
  private def fresco(df: DataFrame, event: String, value: Column,
                     units: String): DataFrame =
    df.select(
      Fresco.jobIdPrefix(col("jobID")).as("Job Id"),
      col("node").as("Host"),
      lit(event).as("Event"),
      value.cast("double").as("Value"),
      lit(units).as("Units"),
      col("__ts").as("Timestamp"))

  /** Block metric — transform_conte_ts_data.py:190-292: GB/s throughput
    * from sector/tick counters (F4).
    */
  def block(raw: DataFrame): DataFrame = {
    val required = Seq("rd_sectors", "wr_sectors", "rd_ticks", "wr_ticks",
      "jobID", "node", "timestamp")
    val df = cleanRaw(raw, required)
    fresco(df, "block",
      Fresco.blockThroughputGBs(col("rd_sectors"), col("wr_sectors"),
        col("rd_ticks"), col("wr_ticks")),
      "GB/s")
  }

  /** CPU metric — transform_conte_ts_data.py:310-392: user CPU % (F5). */
  def cpu(raw: DataFrame): DataFrame = {
    val required = Seq("user", "nice", "system", "idle", "iowait", "irq",
      "softirq", "jobID", "node", "timestamp")
    val df = cleanRaw(raw, required)
    fresco(df, "cpuuser",
      Fresco.cpuPercent(col("user"), col("nice"), col("system"),
        col("idle"), col("iowait"), col("irq"), col("softirq")),
      "CPU %")
  }

  /** Memory metric — transform_conte_ts_data.py:400-516: two FRESCO
    * events (`memused`, `memused_minus_diskcache`) per input row, from
    * ONE scan (U2): the row explodes over a 2-element (Event, Value)
    * array in a single map-only projection. The union-of-projections
    * alternative plans two FileScans of the same source — double the
    * read volume at 100 TB for byte-identical output.
    */
  def mem(raw: DataFrame): DataFrame = {
    val required = Seq("MemTotal", "MemFree", "FilePages", "jobID", "node",
      "timestamp")
    val df = cleanRaw(raw, required)
    val (used, usedMinusCache) =
      Fresco.memoryGB(col("MemTotal"), col("MemFree"), col("FilePages"))
    df.select(
        Fresco.jobIdPrefix(col("jobID")).as("Job Id"),
        col("node").as("Host"),
        explode(array(
          struct(lit("memused").as("Event"),
            used.cast("double").as("Value")),
          struct(lit("memused_minus_diskcache").as("Event"),
            usedMinusCache.cast("double").as("Value")))).as("ev"),
        col("__ts").as("Timestamp"))
      .select(col("Job Id"), col("Host"),
        col("ev.Event").as("Event"), col("ev.Value").as("Value"),
        lit("GB").as("Units"), col("Timestamp"))
  }

  /** NFS metric — transform_conte_ts_data.py:520-627: per-(jobID,node)
    * ordered byte deltas (W1: one window exchange) then the reference's
    * quirky `(cum − delta)/dt` rate (W1a, preserved faithfully).
    * `orderCols` defaults to timestamp only (the reference's sort,
    * O1 at :591); pass extra tiebreak columns for full determinism.
    */
  def nfs(raw: DataFrame, orderCols: Seq[String] = Seq("__ts")): DataFrame = {
    val required = Seq("read_bytes", "write_bytes", "jobID", "node",
      "timestamp")
    val df = cleanRaw(raw, required)
    val w = Window.partitionBy("jobID", "node").orderBy(orderCols.map(col): _*)
    val total = col("read_bytes") + col("write_bytes")
    val withDeltas = df
      .withColumn("__total", total)
      // A3: first row of each group → delta 0 (reference fillna(0), :604/:610)
      .withColumn("__byte_delta",
        coalesce(col("__total") - lag(col("__total"), 1).over(w), lit(0.0)))
      .withColumn("__dt",
        coalesce(col("__ts").cast("double") -
          lag(col("__ts"), 1).over(w).cast("double"), lit(0.0)))
    fresco(withDeltas, "nfs",
      Fresco.nfsRateMBs(col("__total"), col("__byte_delta"), col("__dt")),
      "MB/s")
  }

  /** U1: union-all of the four metric outputs into one FRESCO stream —
    * transform_conte_ts_data.py:987.
    */
  def unionAll(metrics: DataFrame*): DataFrame =
    metrics.reduce(_ unionByName _)

  /** A1 + F16: month partition key for the monthly sinks —
    * transform_conte_ts_data.py:1108-1111. At scale this feeds
    * `write.partitionBy("ym")` — no driver-side group-split.
    */
  def withMonthKey(fresco: DataFrame): DataFrame =
    fresco.withColumn("ym", Fresco.monthKey(col("Timestamp")))
}
