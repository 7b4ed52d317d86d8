package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared readers for the driver's test tables. */
private[graft] object Tables {

  /** Read a test table conformed to its logical contract
    * ([[graft.schema.Conform.contracts]]): identical physical schema
    * passes through untouched (zero plan change), value-preserving
    * drift (int width, float width, timestamp encoding) conforms via
    * in-plan casts, lossy or semantic drift refuses loudly. The
    * legacy-nanos shim is set before the read so a TIMESTAMP(NANOS)
    * file infers as long instead of crashing schema inference — even
    * on sessions not built by [[GraftSession]].
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    graft.schema.Conform.contracts.get(name)
      .map(c => graft.schema.Conform.conform(df, c, name))
      .getOrElse(df)
  }

  /** Physical encoding of the events `ts` column in a given parquet
    * file. The test harness has shipped this column as
    * TIMESTAMP(NANOS) (readable only as long via the legacy conf) in
    * some rounds and timestamp[us] TIMESTAMP_NTZ in others — and a
    * real user's file could equally be UTC-adjusted micros
    * (TimestampType). The engine reads data it does not generate, so
    * every events entry point probes the footer and branches instead
    * of assuming one encoding forever.
    */
  sealed trait TsEncoding
  object TsEncoding {
    /** TIMESTAMP(NANOS) surfaced as LongType via
      * `spark.sql.legacy.parquet.nanosAsLong` (or a genuine
      * long-nanos column).
      */
    case object NanosLong extends TsEncoding
    /** timestamp[us] with isAdjustedToUTC=false → TimestampNTZType. */
    case object MicrosNtz extends TsEncoding
    /** timestamp with isAdjustedToUTC=true (or INT96) → TimestampType. */
    case object MicrosUtc extends TsEncoding
  }

  /** Probe the footer schema of an events-shaped parquet file and
    * classify its `ts` encoding. Schema inference only reads footers —
    * no row data — but at production scale a path holds many files and
    * the listing+footer pass is not free, so the result is memoized
    * per path (the encoding is a property of the FILES, not of the
    * session; a path whose data is rewritten with a different encoding
    * mid-JVM would need a restart, which is the standard schema-cache
    * trade every table catalog makes). The legacy nanos conf is set
    * first so a TIMESTAMP(NANOS) file infers as LongType instead of
    * throwing.
    */
  private val encodingCache =
    new java.util.concurrent.ConcurrentHashMap[String, TsEncoding]()

  def tsEncoding(s: SparkSession, path: String): TsEncoding = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    encodingCache.computeIfAbsent(path,
      _ => s.read.parquet(path).schema("ts").dataType match {
        case LongType         => TsEncoding.NanosLong
        case TimestampNTZType => TsEncoding.MicrosNtz
        case TimestampType    => TsEncoding.MicrosUtc
        case other => throw new IllegalStateException(
          s"events ts column has unsupported type $other in $path - " +
            "expected long (nanos), TIMESTAMP_NTZ or TIMESTAMP")
      })
  }

  /** The raw (as-read) type `ts` carries for a given encoding — what a
    * streaming read schema must declare so the file source hands back
    * the file's actual values instead of silently coercing them.
    */
  def tsRawType(enc: TsEncoding): DataType = enc match {
    case TsEncoding.NanosLong => LongType
    case TsEncoding.MicrosNtz => TimestampNTZType
    case TsEncoding.MicrosUtc => TimestampType
  }

  /** Normalize a raw `ts` column to TimestampType (micros, UTC
    * session). Nanos-as-long uses integer division (`div`) — the
    * values (~1.7e18) exceed double's exact range, so a float divide
    * would corrupt them. NTZ casts through the session TZ, which
    * [[GraftSession]] pins to UTC, so the instant is preserved and
    * DuckDB's naive reading of the same file matches.
    */
  def normalizeTs(df: DataFrame, enc: TsEncoding): DataFrame = enc match {
    case TsEncoding.NanosLong =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TsEncoding.MicrosNtz =>
      df.withColumn("ts", col("ts").cast(TimestampType))
    case TsEncoding.MicrosUtc => df
  }

  /** The events table with `ts` normalized to TimestampType regardless
    * of the file's physical encoding — since the generalization of the
    * r8 lesson to every table, just the contract-conformed read (the
    * events contract's `ts: TimestampType` branch of
    * [[graft.schema.Conform.convert]] encodes the same three-way
    * nanos/NTZ/TZ normalization [[normalizeTs]] pins for streaming).
    */
  def events(s: SparkSession, dir: String): DataFrame = t(s, dir, "events")

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

    /** events.parquet raw shape for staging next to the real file in
      * the streaming gate: EVERY column is emitted in the SAME
      * physical type the staged real file carries (pass the probed
      * footer schema, [[graft.schema.Conform.physicalReadSchema]]),
      * so the file-source read schema fits both files and the fixture
      * rows land at their intended instants whatever the writer's
      * encoding — ts included (whole-second fixtures, every
      * conversion exact) and ids included (an int32-id file must get
      * an int32-id fixture).
      */
    def rawDf(s: SparkSession, raw: StructType): DataFrame =
      rawConform(df(s), raw)

    /** The identical rows as a DuckDB VALUES block for the oracles. */
    val sql: String = rows
      .map { case (u, t) => s"($u, TIMESTAMP '$t')" }
      .mkString(
        "SELECT CAST(u AS BIGINT) AS user_id, t AS ts FROM (VALUES ",
        ", ", ") AS tie(u, t)")
  }

  /** Convert a LOGICAL-typed fixture DataFrame to a staged events
    * file's physical schema: columns the fixture carries cast to the
    * file's type (whole-second `ts` fixtures convert exactly through
    * any of the three encodings), columns it lacks land as typed
    * nulls. Shared by every fixture staged next to a real events file
    * ([[SessionTie.rawDf]], the stream-join flush sentinels).
    */
  private[graft] def rawConform(logical: DataFrame,
                                raw: StructType): DataFrame = {
    val have = logical.columns.toSet
    logical.select(raw.fields.map {
      case f if f.name == "ts" && have("ts") =>
        f.dataType match {
          case LongType => // TIMESTAMP(NANOS) read via the legacy shim
            (col("ts").cast("long") * lit(1000000000L)).as("ts")
          case TimestampNTZType =>
            col("ts").cast(TimestampNTZType).as("ts")
          case TimestampType => col("ts")
          case other => throw new IllegalStateException(
            s"events fixture: unsupported physical ts type $other")
        }
      case f if have(f.name) => col(f.name).cast(f.dataType).as(f.name)
      case f => lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }
}
