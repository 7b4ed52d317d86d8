package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared readers for the driver's test tables. */
private[graft] object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet is TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) rejects outright; read nanos as long (legacy conf) and
    * convert — the generated values are micro-precision, so the
    * conversion is lossless.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Deterministic session-boundary fixture unioned into BOTH session
    * gates (batch `q_session_window`, streaming `q_stream_session`) on
    * the Spark side AND in the DuckDB oracle SQL: the shipped test
    * data has no pair of events exactly gap-apart, so without these
    * rows the oracle gate cannot distinguish Spark's merge-at-boundary
    * rule from break-at-boundary — the gate would stay green with
    * either oracle. Negative user ids cannot collide with real data
    * (the generator emits user_id >= 0); timestamps sit AFTER the
    * events table's max (2024-01-30) so a streaming watermark derived
    * from the real data can never drop them.
    *
    * user -1: exact tie then in-gap   -> ONE session of 3
    * user -2: chained exact ties      -> ONE session of 3 (transitive)
    * user -3: one second past the gap -> TWO sessions of 1
    */
  object SessionTie {
    val rows: Seq[(Long, String)] = Seq(
      (-1L, "2024-03-01 00:00:00"),
      (-1L, "2024-03-01 01:00:00"),
      (-1L, "2024-03-01 01:59:59"),
      (-2L, "2024-03-05 00:00:00"),
      (-2L, "2024-03-05 01:00:00"),
      (-2L, "2024-03-05 02:00:00"),
      (-3L, "2024-03-09 00:00:00"),
      (-3L, "2024-03-09 01:00:01"))

    /** (user_id, ts) batch shape, parsed in the UTC session TZ. */
    def df(s: SparkSession): DataFrame = {
      import s.implicits._
      rows.toDF("user_id", "ts_s")
        .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"))
    }

    /** events.parquet raw shape (ts in NANOS, other columns null) for
      * staging next to the real file in the streaming gate. The
      * fixture timestamps are whole seconds, so the
      * timestamp->seconds->nanos path is exact.
      */
    def rawDf(s: SparkSession): DataFrame =
      df(s).select(
        lit(null).cast("long").as("event_id"),
        (col("ts").cast("long") * lit(1000000000L)).as("ts"),
        col("user_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"),
        lit(null).cast("string").as("props"))

    /** The identical rows as a DuckDB VALUES block for the oracles. */
    val sql: String = rows
      .map { case (u, t) => s"($u, TIMESTAMP '$t')" }
      .mkString(
        "SELECT CAST(u AS BIGINT) AS user_id, t AS ts FROM (VALUES ",
        ", ", ") AS tie(u, t)")
  }
}
