package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fresco

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a SURVEY.md §2 operator (or an
  * LLM-pipeline extension) phrased over the driver's synthetic tables
  * (`/root/testdata/sf*`); [[oracleSql]] holds the equivalent DuckDB SQL.
  * Column names and floating-point operand order are kept identical on
  * both sides so the driver's sorted-column value hash matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The stage-2 "join & widen" spine (SURVEY §3.3) over the events table.
    */
  def entry(spark: SparkSession): DataFrame =
    QueriesFresco.stage2Spine(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesFresco.queries ++ QueriesLlm.queries ++ QueriesIo.queries ++
    QueriesAnalytics.queries ++ Map(
    // --- scans / filters / projections -------------------------------
    "q_scan_filter_project" -> (Queries.scanFilterProject _),
    "q_csv_roundtrip" -> (Queries.csvRoundtrip _),
    "q_jsonl_roundtrip" -> (Queries.jsonlRoundtrip _),
    "q_orc_roundtrip" -> (Queries.orcRoundtrip _),
    "q_dropna" -> (Queries.dropna _),
    "q_ts_parse" -> (Queries.tsParse _),
    // --- joins --------------------------------------------------------
    "q_join_broadcast" -> (Queries.joinBroadcast _),
    "q_join_interval" -> (Queries.joinInterval _),
    "q_semi_join" -> (Queries.semiJoin _),
    "q_bloom_join" -> (Queries.bloomJoin _),
    "q_out_of_range" -> (Queries.outOfRange _),
    // --- aggregations / grouping --------------------------------------
    "q_agg_minmax" -> (Queries.aggMinMax _),
    "q_dedup_distinct" -> (Queries.dedupDistinct _),
    "q_month_split" -> (Queries.monthSplit _),
    "q_day_split" -> (Queries.daySplit _),
    "q_cardinality" -> (Queries.cardinality _),
    // --- sorts / limits / sampling ------------------------------------
    "q_sort_limit" -> (Queries.sortLimit _),
    "q_sample_det" -> (Queries.sampleDet _),
    // --- set ops --------------------------------------------------------
    "q_union_metrics" -> (Queries.unionMetrics _),
    "q_intersect_keys" -> (Queries.intersectKeys _),
    // --- scalar functions ----------------------------------------------
    "q_safe_div" -> (Queries.safeDivQ _),
    "q_clip" -> (Queries.clipQ _),
    // --- beyond-reference analytics ------------------------------------
    "q_session_window" -> (Queries.sessionWindow _),
    "q_sessionize" -> (Queries.sessionize _),
    "q_resample" -> (Queries.resample _),
    "q_rollup" -> (Queries.rollupAgg _),
    "q_json_extract" -> (Queries.jsonExtract _),
    "q_range_join" -> (Queries.rangeJoin _),
    "q_asof_join" -> (Queries.asofJoin _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QueriesFresco.oracles ++ QueriesLlm.oracles ++ QueriesIo.oracles ++
    QueriesAnalytics.oracles ++ Map(
    "q_scan_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 25 AND l_shipdate IS NOT NULL""",
    "q_csv_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority FROM orders""",
    "q_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",
    "q_orc_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
         FROM part""",
    "q_dropna" ->
      """SELECT event_id, event_type, value AS v FROM events
         WHERE value >= 10 AND event_type IS NOT NULL""",
    "q_ts_parse" ->
      """SELECT event_id,
                strptime(strftime(ts, '%m/%d/%Y %H:%M:%S'),
                         '%m/%d/%Y %H:%M:%S') AS parsed_ts
         FROM events WHERE ts IS NOT NULL""",
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_totalprice,
                l_quantity
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q_join_interval" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate BETWEEN o_orderdate
                              AND o_orderdate + INTERVAL 60 DAY""",
    "q_semi_join" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)""",
    "q_bloom_join" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_totalprice > 450000)""",
    "q_out_of_range" ->
      """SELECT o_orderkey,
                CAST(sum(CASE WHEN l_shipdate < o_orderdate
                           OR l_shipdate > o_orderdate + INTERVAL 60 DAY
                          THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range,
                count(*) AS n_samples
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_orderkey""",
    "q_agg_minmax" ->
      """SELECT min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
                min(o_totalprice) AS min_price,
                max(o_totalprice) AS max_price FROM orders""",
    "q_dedup_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_month_split" ->
      """SELECT strftime(l_shipdate, '%Y_%m') AS ym, count(*) AS n,
                sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1""",
    "q_day_split" ->
      """SELECT CAST(day(o_orderdate) AS BIGINT) AS dom, count(*) AS n
         FROM orders GROUP BY 1""",
    "q_cardinality" ->
      """SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events""",
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 100""",
    "q_sample_det" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_orderkey % 97 = 0""",
    "q_union_metrics" ->
      """SELECT event_id, 'value_total' AS event, value AS metric
         FROM events
         UNION ALL
         SELECT event_id, 'value_half' AS event, value / 2.0 AS metric
         FROM events""",
    "q_intersect_keys" ->
      """SELECT strftime(l_shipdate, '%Y_%m') AS ym FROM lineitem
         INTERSECT
         SELECT strftime(o_orderdate, '%Y_%m') AS ym FROM orders""",
    "q_safe_div" ->
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN (l_quantity - 25.0) IS NOT NULL
                      AND (l_quantity - 25.0) <> 0.0
                     THEN l_extendedprice / (l_quantity - 25.0)
                     ELSE 0.0 END AS ratio
         FROM lineitem""",
    "q_clip" ->
      """SELECT event_id,
                greatest(0.0, least(100.0, value - 50.0)) AS clipped
         FROM events""",
    "q_session_window" ->
      s"""WITH ev AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
           UNION ALL
           ${Tables.SessionTie.sql}),
         o AS (
           SELECT user_id, ts,
                  CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts)
                         > 3600000000 THEN 1 ELSE 0 END AS brk
           FROM ev),
         s AS (
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM o)
         SELECT user_id, min(ts) AS s_start,
                max(ts) + INTERVAL 1 HOUR AS s_end,
                count(*) AS n
         FROM s GROUP BY user_id, sid""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
                sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_sessionize" ->
      """WITH o AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
                         lag(epoch_us(CAST(ts AS TIMESTAMP)))
                           OVER (PARTITION BY user_id ORDER BY ts)
                         > 3600000000 THEN 1 ELSE 0 END AS brk
           FROM events)
         SELECT event_id, user_id,
                CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
         FROM o""",
    "q_resample" ->
      """WITH e AS (
           SELECT event_type,
                  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h
           FROM events),
         c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
         b AS (SELECT event_type, min(h) AS mn, max(h) AS mx
               FROM e GROUP BY 1),
         spine AS (
           SELECT event_type,
                  unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
           FROM b)
         SELECT spine.event_type, spine.h, coalesce(c.n, 0) AS n
         FROM spine LEFT JOIN c
           ON spine.event_type = c.event_type AND spine.h = c.h""",
    "q_json_extract" ->
      """SELECT event_id,
                CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
         FROM events""",
    "q_range_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
                n_nationkey, lo, hi
         FROM lineitem
         JOIN (SELECT n_nationkey, n_nationkey * 2.0 AS lo,
                      n_nationkey * 2.0 + 3.0 AS hi FROM nation)
           ON l_quantity BETWEEN lo AND hi""",
    "q_asof_join" ->
      """WITH j AS (
           SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC, o.o_orderkey) AS rn
           FROM events e JOIN orders o
             ON e.user_id = o.o_custkey
               AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
         SELECT event_id, user_id, o_orderkey, o_orderdate
         FROM j WHERE rn = 1"""
  ).map { case (k, v) => k -> v.linesIterator.map(_.trim).mkString(" ") }
}

/** Query implementations, one per SURVEY §2 operator (see map above). */
private[graft] object Queries {
  import Tables.{t, events}

  /** S3 parquet scan + P1 pruning + predicate pushdown. */
  def scanFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 25 && col("l_shipdate").isNotNull)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")

  /** S1/S2/S6/S9: CSV sink + all-string permissive scan + coerce
    * (conte-etl-step-2-processor.py:1196-1302 posture). Writes orders to
    * CSV, reads it back with an explicit all-StringType schema, casts.
    */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = s"/tmp/graft_csv_roundtrip_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    t(s, dir, "orders")
      .write.mode("overwrite")
      .option("header", "true").option("timestampFormat", fmt)
      .option("timestampNTZFormat", fmt) // o_orderdate reads as TIMESTAMP_NTZ
      .csv(tmp)
    graft.io.Sinks.readCsvAllString(s, tmp,
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
      .select(
        graft.io.Sinks.coerce(col("o_orderkey"), "long").as("o_orderkey"),
        graft.io.Sinks.coerce(col("o_custkey"), "long").as("o_custkey"),
        col("o_orderstatus"),
        graft.io.Sinks.coerce(col("o_totalprice"), "double")
          .as("o_totalprice"),
        try_to_timestamp(col("o_orderdate"), lit(fmt)).as("o_orderdate"),
        col("o_orderpriority"))
  }

  /** JSONL (newline-delimited JSON) sink + schema-first scan — the
    * interchange format of LLM data pipelines, alongside the
    * reference's CSV/parquet surface. Lossless round-trip of the
    * documents table: write as JSONL, read back with an EXPLICIT
    * schema — schema-on-read with no inference pass, which at 100 TB
    * would otherwise scan the corpus twice.
    */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp =
      s"/tmp/graft_jsonl_roundtrip_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    t(s, dir, "documents").write.mode("overwrite").json(tmp)
    s.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
        "n_chars LONG")
      .json(tmp)
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** ORC sink + scan round-trip — the third columnar/interchange
    * format next to parquet and JSONL. ORC files are self-describing
    * (schema in the footer), so the read needs no inference pass.
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp =
      s"/tmp/graft_orc_roundtrip_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val cols = Seq("p_partkey", "p_name", "p_brand", "p_size",
      "p_retailprice")
    t(s, dir, "part").select(cols.map(col): _*)
      .write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).select(cols.map(col): _*)
  }

  /** P3/P4: required-column presence + na.drop. A derived column is
    * nulled below a threshold, then dropped — the reference's
    * dropna-on-required-columns (transform_conte_ts_data.py:233-241).
    */
  def dropna(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val required = Seq("event_id", "event_type", "value")
    require(required.forall(ev.columns.contains),
      s"missing required columns: ${required.filterNot(ev.columns.contains)}")
    ev.withColumn("v", when(col("value") >= 10, col("value")))
      .na.drop(Seq("v", "event_type"))
      .select("event_id", "event_type", "v")
  }

  /** F9/P5: parse `%m/%d/%Y %H:%M:%S` strings, null-on-fail, drop nulls. */
  def tsParse(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("event_id"),
        Fresco.parseTimestamp(
          date_format(col("ts"), "MM/dd/yyyy HH:mm:ss"),
          "MM/dd/yyyy HH:mm:ss").as("parsed_ts"))

  /** J1: inner equi-join with an explicit broadcast of the small side. */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "orders")),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_custkey", "o_totalprice",
        "l_quantity")

  /** J2/P6: equi-join + interval (between) filter — the stage-2 shape:
    * hash join on the key, time-in-interval as a post-join filter.
    */
  def joinInterval(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "orders")),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate").between(col("o_orderdate"),
        col("o_orderdate") + expr("INTERVAL 60 DAYS")))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")

  /** J4: semi-join filter by key list. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").filter(col("p_size") > 40)
    t(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .select("l_orderkey", "l_partkey", "l_linenumber")
  }

  /** Bloom-pruned semi join ([[graft.etl.BloomJoin]]): the dim key set
    * is sketched once, the big side is pruned in its SCAN stage before
    * any exchange, and the exact semi join rescues false positives —
    * result equals the plain semi join, shuffle carries ≈ matches.
    */
  def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
    graft.etl.BloomJoin.semiJoin(
      t(s, dir, "lineitem"), "l_orderkey", dim, "o_orderkey",
      expectedItems = 1000000)
      .select("l_orderkey", "l_partkey", "l_linenumber")
  }

  /** J5: per-key out-of-interval probe (utils/analyze-timestamps.py:73-85). */
  def outOfRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(
        sum(when(col("l_shipdate") < col("o_orderdate") ||
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          1).otherwise(0)).cast("long").as("out_of_range"),
        count(lit(1)).as("n_samples"))

  /** A6: min/max scan. */
  def aggMinMax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      min("o_orderdate").as("min_date"), max("o_orderdate").as("max_date"),
      min("o_totalprice").as("min_price"),
      max("o_totalprice").as("max_price"))

  /** A5: dedup via dropDuplicates. */
  def dedupDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
      .dropDuplicates()

  /** A1/F16: month-key grouping (yyyy_MM). */
  def monthSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(Fresco.monthKey(col("l_shipdate")).as("ym"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))

  /** A2/F17: day-of-month grouping. */
  def daySplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(Fresco.dayKey(col("o_orderdate")).cast("long").as("dom"))
      .agg(count(lit(1)).as("n"))

  /** A7: cardinality probes (exact here so the oracle matches). */
  def cardinality(s: SparkSession, dir: String): DataFrame =
    events(s, dir).agg(
      countDistinct("event_type").as("n_event_types"),
      countDistinct("user_id").as("n_users"))

  /** O1/O3: multi-key sort + limit (total order via unique key suffix). */
  def sortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .limit(100)

  /** O4: deterministic sample (key-modulo so the oracle can reproduce it;
    * the reference's seed-42 pandas sample is not cross-engine stable).
    */
  def sampleDet(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 97 === 0)
      .select("l_orderkey", "l_partkey", "l_quantity")

  /** U1/U2: union-all of derived metric streams. */
  def unionMetrics(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val a = ev.select(col("event_id"), lit("value_total").as("event"),
      col("value").as("metric"))
    val b = ev.select(col("event_id"), lit("value_half").as("event"),
      (col("value") / 2.0).as("metric"))
    a.unionByName(b)
  }

  /** U4: key-space intersection.
    *
    * Each side is aggregated to distinct keys BEFORE the intersect
    * (same rationale as [[QueriesAnalytics.exceptKeys]]): Spark plans
    * INTERSECT DISTINCT as a join/aggregate over both full inputs, so
    * without the pre-distinct the shuffle carries every row's
    * formatted month string instead of the handful of distinct
    * months. The pre-aggregate is map-side-combined.
    */
  def intersectKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(Fresco.monthKey(col("l_shipdate")).as("ym"))
      .distinct()
      .intersect(
        t(s, dir, "orders").select(Fresco.monthKey(col("o_orderdate")).as("ym"))
          .distinct())

  /** F1: safe_division with zero-denominator guard. */
  def safeDivQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      Fresco.safeDiv(col("l_extendedprice"),
        col("l_quantity") - 25.0).as("ratio"))

  /** F2: clip to [0, 100]. */
  def clipQ(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("event_id"),
      Fresco.clip(col("value") - 50.0, 0.0, 100.0).as("clipped"))

  /** Session windows (1 h gap) — beyond-reference analytics surface;
    * the streaming form is the same expression under a watermark.
    *
    * Boundary rule (pinned by StreamsSinksSpec): Spark merges an event
    * landing EXACTLY at last+gap into the running session — inclusive,
    * not half-open. The DuckDB oracle therefore breaks only on
    * diff > gap (strict), never >=.
    *
    * [[Tables.SessionTie]] is unioned in on both sides of the gate so
    * the oracle comparison actually exercises the exact-gap boundary
    * (the shipped data has no tie; without the fixture, gate-green
    * could not tell `>` from `>=`).
    */
  def sessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("user_id"), col("ts"))
      .unionByName(Tables.SessionTie.df(s))
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"))

  /** Per-event session LABELING (each event tagged with its session
    * ordinal) — the assignment form of session windows: lag + gap
    * comparison + running sum of breaks, one shuffle on the user key.
    * Boundary rule matches `session_window` (strict `>`: an event
    * exactly gap-apart merges).
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("brk",
        when(unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w) > 3600000000L, 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("event_id", "user_id", "session_no")
  }

  /** Hourly resampling with gap fill: per event_type, a complete
    * hourly spine from its min to max hour (built by exploding a
    * computed `sequence` off the tiny per-type bounds row — never a
    * driver loop), left-joined with observed counts, gaps as 0.
    */
  def resample(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_type"),
      date_trunc("hour", col("ts")).as("h"))
    val counts = ev.groupBy("event_type", "h")
      .agg(count(lit(1)).as("n"))
    val spine = ev.groupBy("event_type")
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    spine.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Rollup (hierarchical subtotals) over lineitem flags. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))

  /** JSON field extraction from the events props column. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** Key-less interval join via binning: lineitem quantities against
    * overlapping value bands derived from nation — a pure BETWEEN
    * join with no equi key, kept off the nested-loop path by
    * [[graft.etl.RangeJoin.binned]].
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = t(s, dir, "nation").select(col("n_nationkey"),
      (col("n_nationkey") * 2.0).as("lo"),
      (col("n_nationkey") * 2.0 + 3.0).as("hi"))
    graft.etl.RangeJoin.binned(
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity"),
      bands, "l_quantity", "lo", "hi", binWidth = 4.0)
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "n_nationkey", "lo", "hi")
  }

  /** As-of join, SORT-MERGE formulation: events and orders UNION
    * into one per-user timeline — orders sort BEFORE events at the
    * same instant (`<=` is inclusive) and equal-date orders sort
    * best-last (o_orderkey desc, so the tie-break winner is the
    * smallest key) — then each event reads the latest preceding
    * order via `last(..., ignoreNulls)` over a rows-frame window.
    * ONE shuffle (hash by user) + one sort per user, O(n log n),
    * with NO join-product intermediate: the previous equi-join +
    * top-1 formulation materialized every (event, earlier-order)
    * pair per user — quadratic in per-user density, the suite's
    * worst 10x scale ratio (9.8x), and a hot-user skew bomb at
    * 100x. Same result set as the rank-1 oracle, tie-break
    * included.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, dir).select(
      col("user_id"),
      col("ts").cast("timestamp_ntz").as("tval"),
      lit(1).as("is_event"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp").as("o_orderdate"))
    val ord = t(s, dir, "orders").select(
      col("o_custkey").cast("long").as("user_id"),
      col("o_orderdate").cast("timestamp_ntz").as("tval"),
      lit(0).as("is_event"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"),
      col("o_orderdate"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tval"), col("is_event"), col("o_orderkey").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      // the struct must be NULL (not a struct of nulls) on event
      // rows, or last(ignoreNulls) would treat the event's own
      // timeline row as a "latest order" and null the result
      .withColumn("best", last(
        when(col("is_event") === 0,
          struct(col("o_orderkey"), col("o_orderdate"))),
        ignoreNulls = true).over(w))
      .filter(col("is_event") === 1 && col("best").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("best").getField("o_orderkey").as("o_orderkey"),
        col("best").getField("o_orderdate").as("o_orderdate"))
  }

}
