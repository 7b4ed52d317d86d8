package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fresco
import graft.etl.{Stage1, Stage2}

/** FRESCO ETL queries (SURVEY.md §2.5/§2.8 + §3): each query synthesizes
  * a raw metric/accounting-shaped input from the driver's tables with
  * deterministic arithmetic (mirrored verbatim in the DuckDB oracle),
  * then runs the real `graft.etl` / `graft.functions` library code.
  */
private[graft] object QueriesFresco {

  import Tables.t

  import Tables.events

  // ---------------------------------------------------------------------
  // Scalar-function queries (F7, F8, F10, F11, F12)
  // ---------------------------------------------------------------------

  /** F7 + F8: jobID prefix rewrite and regex standardization. */
  def jobidNorm(s: SparkSession, dir: String): DataFrame = {
    val raw = when(col("l_orderkey") % 4 === 0,
        concat(lit("jobID"), col("l_orderkey")))
      .when(col("l_orderkey") % 4 === 1,
        concat(lit("job."), col("l_orderkey"), lit(".rr")))
      .when(col("l_orderkey") % 4 === 2, lit("nodigits"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), raw.as("raw_id"))
      .select(col("l_orderkey"), col("l_linenumber"),
        Fresco.jobIdPrefix(col("raw_id")).as("fixed"),
        Fresco.standardizeJobId(col("raw_id")).as("jid"))
  }

  /** F10: walltime → seconds over numeric / H:MM:SS / M:SS / garbage. */
  def walltime(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val w = when(k % 5 === 0, (k % 100).cast("string"))
      .when(k % 5 === 1,
        format_string("%d:%02d:%02d", k % 100, k % 60, k % 60))
      .when(k % 5 === 2, format_string("%d:%02d", k % 60, k % 60))
      .when(k % 5 === 3, lit("garbage"))
    t(s, dir, "orders")
      .select(k, w.as("w"))
      .select(col("o_orderkey"), col("w"),
        Fresco.walltimeToSeconds(col("w")).as("walltime_sec"))
  }

  /** F11: exec_host → host_list pseudo-JSON. */
  def hostlist(s: SparkSession, dir: String): DataFrame = {
    val k = col("l_suppkey")
    val eh = concat(lit("node"), k % 20, lit("/0+node"), k % 20,
      lit("/1+node"), (k + 7) % 20, lit("/0"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), eh.as("exec_host"))
      .select(col("l_orderkey"), col("l_linenumber"),
        Fresco.hostList(col("exec_host")).as("host_list"))
  }

  /** F12: exitcode CASE derivation. */
  def exitcode(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val je = when(k % 6 < 2, lit("E")).when(k % 6 === 2, lit("A"))
      .when(k % 6 === 3, lit("S")).when(k % 6 === 4, lit("Q"))
      .otherwise(lit("X"))
    val es = when(k % 7 === 0, lit(null).cast("string"))
      .otherwise((k % 3).cast("string"))
    t(s, dir, "orders")
      .select(k, je.as("jobevent"), es.as("exit_status"))
      .select(col("o_orderkey"),
        Fresco.exitStatusDescription(col("jobevent"),
          col("exit_status")).as("exitcode"))
  }

  // ---------------------------------------------------------------------
  // Stage-1 metric transforms (F4, F5, F6, W1, W1a) via graft.etl.Stage1
  // ---------------------------------------------------------------------

  /** Raw cpu.csv-shaped input synthesized from lineitem. */
  private def cpuRaw(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_quantity").as("user"),
      col("l_linenumber").cast("double").as("nice"),
      (col("l_discount") * 100.0).as("system"),
      (col("l_tax") * 100.0).as("idle"),
      lit(1.0).as("iowait"), lit(0.0).as("irq"), lit(0.0).as("softirq"),
      concat(lit("jobID"), col("l_orderkey")).as("jobID"),
      concat(lit("node"), col("l_suppkey") % 50).as("node"),
      date_format(col("l_shipdate"), "MM/dd/yyyy HH:mm:ss").as("timestamp"))

  /** F5 CPU%: full Stage1.cpu transform → FRESCO 6-col rows. */
  def stage1Cpu(s: SparkSession, dir: String): DataFrame =
    Stage1.cpu(cpuRaw(s, dir))

  /** F4 block GB/s: full Stage1.block transform. */
  def stage1Block(s: SparkSession, dir: String): DataFrame =
    Stage1.block(t(s, dir, "lineitem").select(
      (col("l_quantity") * 1000.0).as("rd_sectors"),
      col("l_extendedprice").as("wr_sectors"),
      (col("l_linenumber").cast("double") * 10.0).as("rd_ticks"),
      (col("l_discount") * 100.0).as("wr_ticks"),
      concat(lit("jobID"), col("l_orderkey")).as("jobID"),
      concat(lit("node"), col("l_suppkey") % 50).as("node"),
      date_format(col("l_shipdate"), "MM/dd/yyyy HH:mm:ss").as("timestamp")))

  /** Raw mem.csv-shaped input synthesized from events. */
  private def memRaw(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      ((col("value") + 100.0) * 1.0e8).as("MemTotal"),
      (col("value") * 5.0e7).as("MemFree"),
      (col("value") * 1.0e7).as("FilePages"),
      concat(lit("jobID"), col("user_id")).as("jobID"),
      concat(lit("host"), col("user_id") % 10).as("node"),
      date_format(col("ts"), "MM/dd/yyyy HH:mm:ss").as("timestamp"))

  /** F6 memory GB: Stage1.mem → two FRESCO events per input row (U2). */
  def stage1Mem(s: SparkSession, dir: String): DataFrame =
    Stage1.mem(memRaw(s, dir))

  /** Raw llite.csv-shaped input synthesized from events (`event_id`
    * rides along purely as the deterministic order tiebreak).
    */
  private def nfsRaw(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      (col("value") * 1.0e6).as("read_bytes"),
      (col("value") * 5.0e5).as("write_bytes"),
      concat(lit("jobID"), col("user_id")).as("jobID"),
      concat(lit("n"), col("user_id") % 3).as("node"),
      date_format(col("ts"), "MM/dd/yyyy HH:mm:ss").as("timestamp"),
      col("event_id"))

  /** W1 + W1a: Stage1.nfs — per-(jobID,node) ordered lag deltas feeding
    * the reference's quirky `(cum − delta)/dt` rate.
    */
  def stage1Nfs(s: SparkSession, dir: String): DataFrame =
    Stage1.nfs(nfsRaw(s, dir), orderCols = Seq("__ts", "event_id"))

  /** W1 standalone: integer-microsecond lag deltas (exact, no FP). */
  def windowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir).select(
      col("event_id"), col("user_id"),
      coalesce(unix_micros(col("ts")) -
        lag(unix_micros(col("ts")), 1).over(w), lit(0L)).as("time_delta_us"),
      coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0))
        .as("value_delta"))
  }

  // ---------------------------------------------------------------------
  // Stage-2 join & widen (J1, J2, F13, F14, P7) via graft.etl.Stage2
  // ---------------------------------------------------------------------

  private val EventMap: Column = {
    val e = col("event_type")
    when(e === "click", lit("cpuuser")).when(e === "view", lit("memused"))
      .when(e === "purchase", lit("nfs")).when(e === "error", lit("block"))
      .otherwise(lit("gpu_usage"))
  }

  private val UnitMap: Column = {
    val e = col("Event")
    when(e === "cpuuser", lit("CPU %")).when(e === "memused", lit("GB"))
      .when(e === "nfs", lit("MB/s")).when(e === "block", lit("GB/s"))
      .otherwise(lit("%"))
  }

  /** FRESCO long table synthesized from events. */
  private def frescoTs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(
        concat(lit("jobID"), col("user_id")).as("Job Id"),
        concat(lit("host"), col("user_id") % 10).as("Host"),
        EventMap.as("Event"), col("value").as("Value"), col("ts"))
      .select(col("Job Id"), col("Host"), col("Event"), col("Value"),
        UnitMap.as("Units"), col("ts").as("Timestamp"))

  /** Accounting table synthesized from customer (µs-integer timestamps
    * so both engines construct bit-identical instants).
    */
  private def jobsTable(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val Base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val Hour = 3600000000L
    val startUs = lit(Base) + (k % 240) * Hour
    t(s, dir, "customer").select(
      concat(lit("job"), k).as("jobID"),
      timestamp_micros(lit(Base) - lit(86400000000L) + k * Hour).as("qtime"),
      timestamp_micros(startUs).as("start"),
      timestamp_micros(startUs + lit(1296000000000L)).as("end"), // +15 d
      format_string("%d:00:00", (k % 48) + 1).as("Resource_List.walltime"),
      ((k % 4) + 1).as("Resource_List.nodect"),
      ((k % 16) + 1).as("Resource_List.ncpus"),
      concat(lit("acct"), k % 5).as("account"),
      when(k % 3 === 0, lit("standby")).when(k % 3 === 1, lit("normal"))
        .otherwise(lit("debug")).as("queue"),
      concat(lit("job_"), k).as("jobname"),
      concat(lit("user"), k % 20).as("user"),
      concat(lit("grp"), k % 4).as("group"),
      concat(lit("node"), k % 30, lit("/0+node"), k % 30, lit("/1+node"),
        (k + 5) % 30, lit("/2")).as("exec_host"),
      when(k % 5 < 2, lit("E")).when(k % 5 === 2, lit("A"))
        .when(k % 5 === 3, lit("S")).otherwise(lit("Q")).as("jobevent"),
      (k % 2).cast("string").as("Exit_status"))
  }

  /** F13 pivot-without-collapse standalone (row count preserved). */
  def pivot(s: SparkSession, dir: String): DataFrame =
    Fresco.pivotEvents(
      events(s, dir).select(col("event_id"), EventMap.as("Event"),
        col("value").as("Value")))

  /** The flagship: full stage-2 join & widen to the 22-col contract. */
  def stage2Spine(s: SparkSession, dir: String): DataFrame =
    Stage2.joinAndWiden(frescoTs(s, dir), jobsTable(s, dir))

  /** §3 lifecycle capstone: all four Stage-1 metric transforms → U1
    * union → Stage-2 join & widen → S10 day key, as ONE logical plan —
    * proving the spine composes with no per-stage materialization.
    * cpu/block timestamps are rebased into the accounting month
    * (integer-µs arithmetic both engines reproduce bit-identically) so
    * the J2 interval filter actually selects; mem/nfs ride events
    * exactly as their standalone gates do. Plan shape: scans + ONE
    * hash exchange (the nfs window) + one broadcast join — zero extra
    * exchanges vs the standalone stages (guarded in
    * PlanRegressionSpec).
    */
  def etlMonth(s: SparkSession, dir: String): DataFrame = {
    val Base = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs
    val Hour = 3600000000L
    val Minute = 60000000L
    val k = col("l_orderkey")
    val rebased = date_format(
      timestamp_micros(lit(Base) + (k % 240) * lit(Hour) +
        col("l_linenumber") * lit(Minute)),
      "MM/dd/yyyy HH:mm:ss")
    val jid = concat(lit("jobID"), k % 300)
    val node = concat(lit("node"), col("l_suppkey") % 50)
    val cpu = Stage1.cpu(t(s, dir, "lineitem").select(
      col("l_quantity").as("user"),
      col("l_linenumber").cast("double").as("nice"),
      (col("l_discount") * 100.0).as("system"),
      (col("l_tax") * 100.0).as("idle"),
      lit(1.0).as("iowait"), lit(0.0).as("irq"), lit(0.0).as("softirq"),
      jid.as("jobID"), node.as("node"), rebased.as("timestamp")))
    val block = Stage1.block(t(s, dir, "lineitem").select(
      (col("l_quantity") * 1000.0).as("rd_sectors"),
      col("l_extendedprice").as("wr_sectors"),
      (col("l_linenumber").cast("double") * 10.0).as("rd_ticks"),
      (col("l_discount") * 100.0).as("wr_ticks"),
      jid.as("jobID"), node.as("node"), rebased.as("timestamp")))
    val union = Stage1.unionAll(cpu, block, Stage1.mem(memRaw(s, dir)),
      Stage1.nfs(nfsRaw(s, dir), orderCols = Seq("__ts", "event_id")))
    Stage2.withDayKey(Stage2.joinAndWiden(union, jobsTable(s, dir)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jobid_norm" -> (jobidNorm _),
    "q_walltime" -> (walltime _),
    "q_hostlist" -> (hostlist _),
    "q_exitcode" -> (exitcode _),
    "q_stage1_cpu" -> (stage1Cpu _),
    "q_stage1_block" -> (stage1Block _),
    "q_stage1_mem" -> (stage1Mem _),
    "q_stage1_nfs" -> (stage1Nfs _),
    "q_window_lag" -> (windowLag _),
    "q_pivot" -> (pivot _),
    "q_stage2_spine" -> (stage2Spine _),
    "q_etl_month" -> (etlMonth _))

  // ---------------------------------------------------------------------
  // DuckDB oracles — independent SQL re-statements of the same semantics
  // ---------------------------------------------------------------------

  /** Shared SQL fragments, mirroring Fresco.* arithmetic exactly. */
  private def safeDivSql(num: String, den: String): String =
    s"CASE WHEN ($den) IS NOT NULL AND ($den) <> 0.0 THEN ($num)/($den) ELSE 0.0 END"

  val oracles: Map[String, String] = Map(
    "q_jobid_norm" ->
      """WITH raw AS (
           SELECT l_orderkey, l_linenumber,
                  CASE WHEN l_orderkey % 4 = 0 THEN 'jobID' || l_orderkey
                       WHEN l_orderkey % 4 = 1 THEN 'job.' || l_orderkey || '.rr'
                       WHEN l_orderkey % 4 = 2 THEN 'nodigits'
                       ELSE NULL END AS raw_id
           FROM lineitem)
         SELECT l_orderkey, l_linenumber,
                regexp_replace(coalesce(raw_id, 'unknown'),
                               '(?i)jobID', 'JOB', 'g') AS fixed,
                CASE WHEN raw_id IS NULL THEN NULL
                     WHEN regexp_extract(raw_id, '(\d+)', 1) <> ''
                       THEN 'JOB' || regexp_extract(raw_id, '(\d+)', 1)
                     ELSE raw_id END AS jid
         FROM raw""",
    "q_walltime" ->
      """WITH raw AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 5 = 0 THEN CAST(o_orderkey % 100 AS VARCHAR)
                       WHEN o_orderkey % 5 = 1 THEN printf('%d:%02d:%02d', o_orderkey % 100, o_orderkey % 60, o_orderkey % 60)
                       WHEN o_orderkey % 5 = 2 THEN printf('%d:%02d', o_orderkey % 60, o_orderkey % 60)
                       WHEN o_orderkey % 5 = 3 THEN 'garbage'
                       ELSE NULL END AS w
           FROM orders)
         SELECT o_orderkey, w,
                CASE WHEN w IS NULL THEN NULL
                     WHEN try_cast(w AS DOUBLE) IS NOT NULL THEN try_cast(w AS DOUBLE)
                     WHEN len(str_split(w, ':')) = 3
                       THEN try_cast(str_split(w, ':')[1] AS DOUBLE) * 3600
                          + try_cast(str_split(w, ':')[2] AS DOUBLE) * 60
                          + try_cast(str_split(w, ':')[3] AS DOUBLE)
                     WHEN len(str_split(w, ':')) = 2
                       THEN try_cast(str_split(w, ':')[1] AS DOUBLE) * 60
                          + try_cast(str_split(w, ':')[2] AS DOUBLE)
                     ELSE NULL END AS walltime_sec
         FROM raw""",
    "q_hostlist" ->
      """SELECT l_orderkey, l_linenumber,
                '[' || array_to_string(list_sort(list_distinct(
                  regexp_extract_all('node' || (l_suppkey % 20) || '/0+node' ||
                    (l_suppkey % 20) || '/1+node' || ((l_suppkey + 7) % 20) || '/0',
                    '([^/+]+)/', 1))), ', ') || ']' AS host_list
         FROM lineitem""",
    "q_exitcode" ->
      """WITH raw AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 6 < 2 THEN 'E'
                       WHEN o_orderkey % 6 = 2 THEN 'A'
                       WHEN o_orderkey % 6 = 3 THEN 'S'
                       WHEN o_orderkey % 6 = 4 THEN 'Q'
                       ELSE 'X' END AS je,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL
                       ELSE CAST(o_orderkey % 3 AS VARCHAR) END AS es
           FROM orders)
         SELECT o_orderkey,
                CASE WHEN je = 'E' AND coalesce(es, '') = '0' THEN 'COMPLETED'
                     WHEN je = 'E' THEN 'FAILED:' || coalesce(es, '')
                     WHEN je = 'A' THEN 'ABORTED'
                     WHEN je = 'S' THEN 'STARTED'
                     WHEN je = 'Q' THEN 'QUEUED'
                     ELSE je || ':' || coalesce(es, '') END AS exitcode
         FROM raw""",
    "q_stage1_cpu" ->
      s"""SELECT regexp_replace('jobID' || l_orderkey, '(?i)jobID', 'JOB', 'g') AS "Job Id",
                'node' || (l_suppkey % 50) AS "Host",
                'cpuuser' AS "Event",
                greatest(0.0, ${safeDivSql(
        "l_quantity + CAST(l_linenumber AS DOUBLE)",
        "l_quantity + CAST(l_linenumber AS DOUBLE) + l_discount*100.0 + l_tax*100.0 + 1.0 + 0.0 + 0.0")} * 100.0) AS "Value",
                'CPU %' AS "Units",
                strptime(strftime(l_shipdate, '%m/%d/%Y %H:%M:%S'), '%m/%d/%Y %H:%M:%S') AS "Timestamp"
         FROM lineitem""",
    "q_stage1_block" ->
      s"""SELECT regexp_replace('jobID' || l_orderkey, '(?i)jobID', 'JOB', 'g') AS "Job Id",
                'node' || (l_suppkey % 50) AS "Host",
                'block' AS "Event",
                greatest(0.0, ${safeDivSql(
        "(l_quantity*1000.0 + l_extendedprice) * 512.0",
        "CAST(l_linenumber AS DOUBLE)*10.0 + l_discount*100.0")} / 1024.0 / 1024.0 / 1024.0) AS "Value",
                'GB/s' AS "Units",
                strptime(strftime(l_shipdate, '%m/%d/%Y %H:%M:%S'), '%m/%d/%Y %H:%M:%S') AS "Timestamp"
         FROM lineitem""",
    "q_stage1_mem" ->
      """WITH m AS (
           SELECT 'JOB' || user_id AS jid,
                  'host' || (user_id % 10) AS host,
                  greatest(0.0, (value + 100.0) * 1.0e8) AS t,
                  least(greatest(0.0, value * 5.0e7),
                        greatest(0.0, (value + 100.0) * 1.0e8)) AS f,
                  greatest(0.0, value * 1.0e7) AS fp,
                  strptime(strftime(ts, '%m/%d/%Y %H:%M:%S'), '%m/%d/%Y %H:%M:%S') AS pts
           FROM events)
         SELECT jid AS "Job Id", host AS "Host", 'memused' AS "Event",
                greatest(0.0, (t - f) / 1073741824.0) AS "Value",
                'GB' AS "Units", pts AS "Timestamp"
         FROM m
         UNION ALL
         SELECT jid, host, 'memused_minus_diskcache',
                greatest(0.0, t - f - fp) / 1073741824.0,
                'GB', pts
         FROM m""",
    "q_stage1_nfs" ->
      s"""WITH raw AS (
           SELECT value * 1.0e6 + value * 5.0e5 AS total,
                  'JOB' || user_id AS jid,
                  'n' || (user_id % 3) AS node,
                  strptime(strftime(ts, '%m/%d/%Y %H:%M:%S'), '%m/%d/%Y %H:%M:%S') AS pts,
                  event_id
           FROM events),
         d AS (
           SELECT jid, node, pts,
                  coalesce(total - lag(total) OVER w, 0.0) AS byte_delta,
                  coalesce(epoch(pts) - epoch(lag(pts) OVER w), 0.0) AS dt,
                  total
           FROM raw
           WINDOW w AS (PARTITION BY jid, node ORDER BY pts, event_id))
         SELECT jid AS "Job Id", node AS "Host", 'nfs' AS "Event",
                greatest(0.0, ${safeDivSql("total - byte_delta",
        "greatest(0.1, dt)")} / 1024.0 / 1024.0) AS "Value",
                'MB/s' AS "Units", pts AS "Timestamp"
         FROM d""",
    "q_window_lag" ->
      """SELECT event_id, user_id,
                coalesce(epoch_us(CAST(ts AS TIMESTAMP)) -
                  lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w, 0) AS time_delta_us,
                coalesce(value - lag(value) OVER w, 0.0) AS value_delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q_pivot" ->
      """WITH e AS (
           SELECT event_id,
                  CASE event_type WHEN 'click' THEN 'cpuuser'
                       WHEN 'view' THEN 'memused' WHEN 'purchase' THEN 'nfs'
                       WHEN 'error' THEN 'block' ELSE 'gpu_usage' END AS ev,
                  value FROM events)
         SELECT event_id,
                CASE WHEN ev = 'cpuuser' THEN value END AS value_cpuuser,
                CASE WHEN ev = 'gpu_usage' THEN value END AS value_gpu_usage,
                CASE WHEN ev = 'memused' THEN value END AS value_memused,
                CAST(NULL AS DOUBLE) AS value_memused_minus_diskcache,
                CASE WHEN ev = 'nfs' THEN value END AS value_nfs,
                CASE WHEN ev = 'block' THEN value END AS value_block
         FROM e""",
    // The §3 lifecycle in one statement: the four stage-1 CTEs are the
    // standalone gates' SQL verbatim (uniform (key,host,ev,v,u,tstamp)
    // shape), unioned and pushed through the spine's join+pivot with
    // the real per-stream units and a day partition key.
    "q_etl_month" ->
      s"""WITH cpu AS (
           SELECT 'JOB' || (l_orderkey % 300) AS key,
                  'node' || (l_suppkey % 50) AS host,
                  'cpuuser' AS ev,
                  greatest(0.0, ${safeDivSql(
        "l_quantity + CAST(l_linenumber AS DOUBLE)",
        "l_quantity + CAST(l_linenumber AS DOUBLE) + l_discount*100.0 + l_tax*100.0 + 1.0 + 0.0 + 0.0")} * 100.0) AS v,
                  'CPU %' AS u,
                  make_timestamp(1704067200000000 +
                    (l_orderkey % 240) * 3600000000 +
                    l_linenumber * 60000000) AS tstamp
           FROM lineitem),
         blk AS (
           SELECT 'JOB' || (l_orderkey % 300) AS key,
                  'node' || (l_suppkey % 50) AS host,
                  'block' AS ev,
                  greatest(0.0, ${safeDivSql(
        "(l_quantity*1000.0 + l_extendedprice) * 512.0",
        "CAST(l_linenumber AS DOUBLE)*10.0 + l_discount*100.0")} / 1024.0 / 1024.0 / 1024.0) AS v,
                  'GB/s' AS u,
                  make_timestamp(1704067200000000 +
                    (l_orderkey % 240) * 3600000000 +
                    l_linenumber * 60000000) AS tstamp
           FROM lineitem),
         m AS (
           SELECT 'JOB' || user_id AS key,
                  'host' || (user_id % 10) AS host,
                  greatest(0.0, (value + 100.0) * 1.0e8) AS mt,
                  least(greatest(0.0, value * 5.0e7),
                        greatest(0.0, (value + 100.0) * 1.0e8)) AS mf,
                  greatest(0.0, value * 1.0e7) AS fp,
                  strptime(strftime(ts, '%m/%d/%Y %H:%M:%S'),
                           '%m/%d/%Y %H:%M:%S') AS tstamp
           FROM events),
         mem AS (
           SELECT key, host, 'memused' AS ev,
                  greatest(0.0, (mt - mf) / 1073741824.0) AS v,
                  'GB' AS u, tstamp
           FROM m
           UNION ALL
           SELECT key, host, 'memused_minus_diskcache',
                  greatest(0.0, mt - mf - fp) / 1073741824.0, 'GB', tstamp
           FROM m),
         nraw AS (
           SELECT value * 1.0e6 + value * 5.0e5 AS total,
                  'JOB' || user_id AS key,
                  'n' || (user_id % 3) AS host,
                  strptime(strftime(ts, '%m/%d/%Y %H:%M:%S'),
                           '%m/%d/%Y %H:%M:%S') AS tstamp,
                  event_id
           FROM events),
         nfs AS (
           SELECT key, host, 'nfs' AS ev,
                  greatest(0.0, ${safeDivSql("total - byte_delta",
        "greatest(0.1, dt)")} / 1024.0 / 1024.0) AS v,
                  'MB/s' AS u, tstamp
           FROM (SELECT key, host, tstamp,
                   coalesce(total - lag(total) OVER w, 0.0) AS byte_delta,
                   coalesce(epoch(tstamp) - epoch(lag(tstamp) OVER w), 0.0) AS dt,
                   total
                 FROM nraw
                 WINDOW w AS (PARTITION BY key, host
                              ORDER BY tstamp, event_id)) d),
         allts AS (
           SELECT * FROM cpu UNION ALL SELECT * FROM blk
           UNION ALL SELECT * FROM mem UNION ALL SELECT * FROM nfs),
         jobs AS (
           SELECT 'JOB' || c_custkey AS jid,
                  make_timestamp(1703980800000000 + c_custkey * 3600000000) AS qtime,
                  make_timestamp(1704067200000000 + (c_custkey % 240) * 3600000000) AS jstart,
                  make_timestamp(1704067200000000 + (c_custkey % 240) * 3600000000 + 1296000000000) AS jend,
                  CAST((c_custkey % 48) + 1 AS DOUBLE) * 3600 + 0.0 * 60 + 0.0 AS timelimit,
                  CAST((c_custkey % 4) + 1 AS DOUBLE) AS nhosts,
                  CAST((c_custkey % 16) + 1 AS DOUBLE) AS ncores,
                  'acct' || (c_custkey % 5) AS account,
                  CASE WHEN c_custkey % 3 = 0 THEN 'standby'
                       WHEN c_custkey % 3 = 1 THEN 'normal'
                       ELSE 'debug' END AS queue,
                  'job_' || c_custkey AS jobname,
                  'user' || (c_custkey % 20) AS username,
                  '[' || array_to_string(list_sort(list_distinct(
                    regexp_extract_all('node' || (c_custkey % 30) || '/0+node' ||
                      (c_custkey % 30) || '/1+node' || ((c_custkey + 5) % 30) || '/2',
                      '([^/+]+)/', 1))), ', ') || ']' AS host_list,
                  CASE WHEN c_custkey % 5 < 2 AND CAST(c_custkey % 2 AS VARCHAR) = '0' THEN 'COMPLETED'
                       WHEN c_custkey % 5 < 2 THEN 'FAILED:' || CAST(c_custkey % 2 AS VARCHAR)
                       WHEN c_custkey % 5 = 2 THEN 'ABORTED'
                       WHEN c_custkey % 5 = 3 THEN 'STARTED'
                       ELSE 'QUEUED' END AS exitcode
           FROM customer)
         SELECT tstamp AS time, qtime AS submit_time, jstart AS start_time,
                jend AS end_time, timelimit, nhosts, ncores, account, queue,
                host, jid, u AS unit, jobname, exitcode, host_list, username,
                CASE WHEN ev = 'cpuuser' THEN v END AS value_cpuuser,
                CASE WHEN ev = 'gpu_usage' THEN v END AS value_gpu_usage,
                CASE WHEN ev = 'memused' THEN v END AS value_memused,
                CASE WHEN ev = 'memused_minus_diskcache' THEN v END
                  AS value_memused_minus_diskcache,
                CASE WHEN ev = 'nfs' THEN v END AS value_nfs,
                CASE WHEN ev = 'block' THEN v END AS value_block,
                CAST(day(tstamp) AS INT) AS day
         FROM allts JOIN jobs ON allts.key = jobs.jid
         WHERE tstamp BETWEEN jstart AND jend""",
    "q_stage2_spine" ->
      """WITH ts AS (
           SELECT 'JOB' || user_id AS key,
                  'host' || (user_id % 10) AS host,
                  CASE event_type WHEN 'click' THEN 'cpuuser'
                       WHEN 'view' THEN 'memused' WHEN 'purchase' THEN 'nfs'
                       WHEN 'error' THEN 'block' ELSE 'gpu_usage' END AS ev,
                  value AS v,
                  CAST(ts AS TIMESTAMP) AS tstamp
           FROM events),
         jobs AS (
           SELECT 'JOB' || c_custkey AS jid,
                  make_timestamp(1703980800000000 + c_custkey * 3600000000) AS qtime,
                  make_timestamp(1704067200000000 + (c_custkey % 240) * 3600000000) AS jstart,
                  make_timestamp(1704067200000000 + (c_custkey % 240) * 3600000000 + 1296000000000) AS jend,
                  CAST((c_custkey % 48) + 1 AS DOUBLE) * 3600 + 0.0 * 60 + 0.0 AS timelimit,
                  CAST((c_custkey % 4) + 1 AS DOUBLE) AS nhosts,
                  CAST((c_custkey % 16) + 1 AS DOUBLE) AS ncores,
                  'acct' || (c_custkey % 5) AS account,
                  CASE WHEN c_custkey % 3 = 0 THEN 'standby'
                       WHEN c_custkey % 3 = 1 THEN 'normal'
                       ELSE 'debug' END AS queue,
                  'job_' || c_custkey AS jobname,
                  'user' || (c_custkey % 20) AS username,
                  '[' || array_to_string(list_sort(list_distinct(
                    regexp_extract_all('node' || (c_custkey % 30) || '/0+node' ||
                      (c_custkey % 30) || '/1+node' || ((c_custkey + 5) % 30) || '/2',
                      '([^/+]+)/', 1))), ', ') || ']' AS host_list,
                  CASE WHEN c_custkey % 5 < 2 AND CAST(c_custkey % 2 AS VARCHAR) = '0' THEN 'COMPLETED'
                       WHEN c_custkey % 5 < 2 THEN 'FAILED:' || CAST(c_custkey % 2 AS VARCHAR)
                       WHEN c_custkey % 5 = 2 THEN 'ABORTED'
                       WHEN c_custkey % 5 = 3 THEN 'STARTED'
                       ELSE 'QUEUED' END AS exitcode
           FROM customer)
         SELECT tstamp AS time, qtime AS submit_time, jstart AS start_time,
                jend AS end_time, timelimit, nhosts, ncores, account, queue,
                host, jid,
                CASE ev WHEN 'cpuuser' THEN 'CPU %' WHEN 'memused' THEN 'GB'
                     WHEN 'nfs' THEN 'MB/s' WHEN 'block' THEN 'GB/s'
                     ELSE '%' END AS unit,
                jobname, exitcode, host_list, username,
                CASE WHEN ev = 'cpuuser' THEN v END AS value_cpuuser,
                CASE WHEN ev = 'gpu_usage' THEN v END AS value_gpu_usage,
                CASE WHEN ev = 'memused' THEN v END AS value_memused,
                CAST(NULL AS DOUBLE) AS value_memused_minus_diskcache,
                CASE WHEN ev = 'nfs' THEN v END AS value_nfs,
                CASE WHEN ev = 'block' THEN v END AS value_block
         FROM ts JOIN jobs ON ts.key = jobs.jid
         WHERE tstamp BETWEEN jstart AND jend"""
  ).map { case (k, v) => k -> v.linesIterator.map(_.trim).mkString(" ") }
}
