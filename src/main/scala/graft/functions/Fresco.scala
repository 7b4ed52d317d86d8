package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar function library (SURVEY.md §2.8, F1–F18): pure `Column`
  * expressions, zero UDFs, so every function stays inside whole-stage
  * codegen and is pushdown/prune friendly at 100 TB scale.
  *
  * Each function re-expresses a behavior of the reference
  * (`j-mckerracher/conte-to-fresco-etl`, read-only at /root/reference);
  * citations are `file:line` into that tree.
  */
object Fresco {

  /** F1 safe_division — transform_conte_ts_data.py:125-147.
    * `num/den` when `den != 0`, else `default`. Null-safe: a null
    * denominator also yields the default (pandas NaN/0 guard).
    */
  def safeDiv(num: Column, den: Column, default: Double = 0.0): Column =
    when(den.isNotNull && den =!= 0.0, num / den).otherwise(lit(default))

  /** F2 validate_metric — transform_conte_ts_data.py:149-165 (np.clip). */
  def clip(v: Column, minVal: Double = 0.0,
           maxVal: Double = Double.PositiveInfinity): Column = {
    val lo = greatest(lit(minVal), v)
    if (maxVal.isPosInfinity) lo else least(lit(maxVal), lo)
  }

  /** F3 calculate_rate — transform_conte_ts_data.py:168-187:
    * `safe_division(cur - prev, dt)`.
    */
  def calculateRate(cur: Column, prev: Column, dtSeconds: Column): Column =
    safeDiv(cur - prev, dtSeconds)

  /** F4 block throughput GB/s — transform_conte_ts_data.py:245-258:
    * `clip(safe_div((rd+wr)*512, rd_ticks+wr_ticks) / 1024^3, min=0)`.
    */
  def blockThroughputGBs(rdSectors: Column, wrSectors: Column,
                         rdTicks: Column, wrTicks: Column): Column =
    clip(safeDiv((rdSectors + wrSectors) * lit(512.0), rdTicks + wrTicks)
      / lit(1024.0) / lit(1024.0) / lit(1024.0))

  /** F5 CPU percent — transform_conte_ts_data.py:347-358:
    * `clip(safe_div(user+nice, user+nice+system+idle+iowait+irq+softirq)*100,
    * min=0)`; deliberately no upper clamp (multi-core can exceed 100).
    */
  def cpuPercent(user: Column, nice: Column, system: Column, idle: Column,
                 iowait: Column, irq: Column, softirq: Column): Column = {
    val total = user + nice + system + idle + iowait + irq + softirq
    clip(safeDiv(user + nice, total) * lit(100.0))
  }

  /** F6 memory GB (two events) — transform_conte_ts_data.py:451-469.
    * Inputs clipped >= 0, `MemFree = min(MemFree, MemTotal)`;
    * `memused = clip((T-F)/1024^3, min=0)`,
    * `memused_minus_diskcache = clip(T-F-FilePages, min=0)/1024^3`.
    * Returns (memused, memusedMinusDiskcache).
    */
  def memoryGB(memTotal: Column, memFree: Column,
               filePages: Column): (Column, Column) = {
    val t = clip(memTotal)
    val f = least(clip(memFree), t)
    val fp = clip(filePages)
    val used = t - f
    val gb = lit(1024.0) * lit(1024.0) * lit(1024.0)
    (clip(used / gb), clip(used - fp) / gb)
  }

  /** F7 jobID prefix rewrite — transform_conte_ts_data.py:261-263:
    * null -> "unknown", then case-insensitive "jobID" -> "JOB".
    */
  def jobIdPrefix(c: Column): Column =
    regexp_replace(coalesce(c.cast("string"), lit("unknown")),
      "(?i)jobID", "JOB")

  /** F8 jobID standardization — conte-etl-step-2-processor.py:474-511:
    * first digit-run becomes `"JOB"+digits`; no digits -> passthrough;
    * nulls preserved.
    */
  def standardizeJobId(c: Column): Column = {
    val s = c.cast("string")
    val digits = regexp_extract(s, "(\\d+)", 1)
    when(s.isNull, s)
      .when(digits =!= "", concat(lit("JOB"), digits))
      .otherwise(s)
  }

  /** F9 timestamp parse, null-on-fail — transform_conte_ts_data.py:267
    * (`%m/%d/%Y %H:%M:%S`, errors='coerce').
    */
  def parseTimestamp(c: Column,
                     fmt: String = "M/d/yyyy H:mm:ss"): Column =
    try_to_timestamp(c.cast("string"), lit(fmt))

  /** F10 walltime -> seconds — conte-etl-step-2-processor.py:224-276:
    * numeric passthrough; `H:MM:SS` -> h*3600+m*60+s; `M:SS` -> m*60+s;
    * anything else (incl. parse failures) -> null.
    */
  def walltimeToSeconds(c: Column): Column = {
    val s = c.cast("string")
    val numeric = s.try_cast("double")
    val parts = split(s, ":")
    def p(i: Int) = element_at(parts, i).try_cast("double")
    when(s.isNull, lit(null).cast("double"))
      .when(numeric.isNotNull, numeric)
      .when(size(parts) === 3, p(1) * 3600 + p(2) * 60 + p(3))
      .when(size(parts) === 2, p(1) * 60 + p(2))
      .otherwise(lit(null).cast("double"))
  }

  /** F11 exec_host -> host_list — conte-etl-step-2-processor.py:566-616:
    * regex findall `([^/+]+)/`, distinct node names, serialized as
    * `[a, b]` (json.dumps with quotes stripped, :609). The reference's
    * `list(set(...))` order is nondeterministic; we sort (documented
    * divergence — deterministic superset of the same semantics).
    * No matches / null input -> null.
    */
  def hostList(execHost: Column): Column = {
    val names = array_sort(array_distinct(
      regexp_extract_all(execHost.cast("string"), lit("([^/+]+)/"), lit(1))))
    when(execHost.isNull || size(names) === 0, lit(null).cast("string"))
      .otherwise(concat(lit("["), array_join(names, ", "), lit("]")))
  }

  /** F12 exitcode derivation — conte-etl-step-2-processor.py:279-333.
    * Nulls treated as "" (reference fillna('')).
    */
  def exitStatusDescription(jobevent: Column, exitStatus: Column): Column = {
    val je = coalesce(jobevent.cast("string"), lit(""))
    val es = coalesce(exitStatus.cast("string"), lit(""))
    when(je === "E" && es === "0", lit("COMPLETED"))
      .when(je === "E", concat(lit("FAILED:"), es))
      .when(je === "A", lit("ABORTED"))
      .when(je === "S", lit("STARTED"))
      .when(je === "Q", lit("QUEUED"))
      .otherwise(concat(je, lit(":"), es))
  }

  /** The six known FRESCO events whose pivot columns get a `value_`
    * prefix — conte-etl-step-2-processor.py:808-817.
    */
  val KnownEvents: Seq[String] = Seq("cpuuser", "gpu_usage", "memused",
    "memused_minus_diskcache", "nfs", "block")

  /** F13 event pivot WITHOUT collapse —
    * conte-etl-step-2-processor.py:804-833: for each event `e`, a column
    * (named `value_<e>` for known events, else `e` verbatim) holding
    * `Value` where `Event == e` else null; `Event`/`Value` dropped.
    * Deliberately NOT `groupBy().pivot()` — row-per-sample is preserved.
    */
  def pivotEvents(df: DataFrame, events: Seq[String] = KnownEvents,
                  eventCol: String = "Event",
                  valueCol: String = "Value"): DataFrame = {
    val withCols = events.foldLeft(df) { (d, e) =>
      val name = if (KnownEvents.contains(e)) s"value_$e" else e
      d.withColumn(name, when(col(eventCol) === e, col(valueCol)))
    }
    withCols.drop(eventCol, valueCol)
  }

  /** F14 stage-2 rename map — conte-etl-step-2-processor.py:836-865. */
  val Stage2Renames: Map[String, String] = Map(
    "Timestamp" -> "time", "qtime" -> "submit_time", "start" -> "start_time",
    "end" -> "end_time", "Resource_List.walltime" -> "timelimit",
    "Resource_List.nodect" -> "nhosts", "Resource_List.ncpus" -> "ncores",
    "exec_host" -> "host_list", "user" -> "username", "jobID" -> "jid",
    "Host" -> "host", "Units" -> "unit")

  /** F16 month key — transform_conte_ts_data.py:1110 (`%Y_%m`). */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy_MM")

  /** F17 day-of-month — conte-etl-step-2-processor.py:142. */
  def dayKey(ts: Column): Column = dayofmonth(ts)

  /** W1a NFS rate quirk — transform_conte_ts_data.py:615-617: the code
    * passes cumulative `total_bytes` as "current" and the *delta* as
    * "previous" into calculate_rate, so the shipped arithmetic is
    * `clip(safe_div(total - delta, max(0.1, dt)) / 1024^2, min=0)` —
    * NOT `delta/dt` as its docstring (:526-529) claims. We preserve the
    * code's behavior (flagged in FrescoSpec).
    */
  def nfsRateMBs(totalBytes: Column, byteDelta: Column,
                 dtSeconds: Column): Column =
    clip(safeDiv(totalBytes - byteDelta, greatest(lit(0.1), dtSeconds))
      / lit(1024.0) / lit(1024.0))
}
