package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.Tables.TsEncoding
import graft.streaming.Streams

/** The events reader must survive every physical ts encoding a parquet
  * writer can produce — the round-8 harness regeneration flipped the
  * shipped file from TIMESTAMP(NANOS) to timestamp[us] NTZ and zeroed
  * 45 gates because the reader assumed one encoding forever. This spec
  * writes the SAME three instants in all three encodings and drives a
  * ts-sensitive aggregation through both the batch and streaming
  * readers, so the next encoding drift degrades to one red spec here
  * instead of a wall of red gates.
  */
class TsEncodingSpec extends SparkSpec {

  // three instants spanning two 6h tumbling windows, exact in micros
  private val instantsUs = Seq(
    1704067200000000L, // 2024-01-01 00:00:00
    1704070800000000L, // 2024-01-01 01:00:00
    1704096000000000L) // 2024-01-01 08:00:00

  /** Write a tiny events-shaped table at `$dir/events.parquet` (a
    * plain FILE, like the shipped testdata, so the streaming staging
    * copy works) with ts in the requested physical encoding.
    *
    * The NanosLong fixture is a GENUINE `TIMESTAMP(NANOS)` file
    * written through parquet-mr (Spark cannot write nanos itself) —
    * a plain int64 column would read fine without the legacy
    * `nanosAsLong` conf, silently un-testing the exact encoding that
    * zeroed round 8's gates.
    */
  private def writeFixture(enc: TsEncoding): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_tsenc_$enc").toString
    if (enc == TsEncoding.NanosLong) {
      writeNanosFile(s"$dir/events.parquet")
      return dir
    }
    val base = instantsUs.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong % 2, "click", 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val tsCol = enc match {
      case TsEncoding.MicrosNtz =>
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")
      case _ => timestamp_micros(col("us")).as("ts")
    }
    val df = base.select(col("event_id"), tsCol, col("user_id"),
      col("event_type"), col("value"), col("props"))
    val tmp = s"$dir/_part"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  /** Real TIMESTAMP(NANOS, isAdjustedToUTC=false) events file via the
    * parquet-mr example API — the encoding the pre-r8 harness
    * shipped, which Spark only reads under the legacy nanosAsLong
    * conf.
    */
  private def writeNanosFile(path: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType,
      PrimitiveType, Type, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.hadoop.ParquetFileWriter
    val schema: MessageType = Types.buildMessage()
      .addField(Types.optional(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .addField(Types.optional(INT64).named("user_id"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.optional(DOUBLE).named("value"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf).withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
    val f = new SimpleGroupFactory(schema)
    try instantsUs.zipWithIndex.foreach { case (us, i) =>
      writer.write(f.newGroup()
        .append("event_id", i.toLong)
        .append("ts", us * 1000L)
        .append("user_id", i.toLong % 2)
        .append("event_type", "click")
        .append("value", 1.0)
        .append("props", "{}"))
    } finally writer.close()
  }

  private def expected: Seq[java.sql.Timestamp] =
    instantsUs.map(us => java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L)))

  private val encodings =
    Seq(TsEncoding.NanosLong, TsEncoding.MicrosNtz, TsEncoding.MicrosUtc)

  test("tsEncoding classifies all three physical encodings") {
    for (enc <- encodings) {
      val dir = writeFixture(enc)
      assert(Tables.tsEncoding(spark, s"$dir/events.parquet") === enc,
        s"for fixture written as $enc")
    }
  }

  test("batch reader lands identical instants for all three encodings") {
    for (enc <- encodings) {
      val got = Tables.events(spark, writeFixture(enc))
        .select("ts").orderBy("ts")
      assert(got.schema("ts").dataType === TimestampType, s"under $enc")
      assert(got.collect().map(_.getTimestamp(0)).toSeq === expected,
        s"under $enc")
    }
  }

  test("streaming source lands identical windows for all three encodings") {
    def windows(df: DataFrame): Seq[(java.sql.Timestamp, Long)] =
      df.select("w_start", "n").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq.sortBy(_._1)
    val results = encodings.map { enc =>
      val dir = writeFixture(enc)
      windows(Streams.runToTable(
        Streams.tumblingAgg(Streams.eventsStream(spark, dir)),
        s"tsenc_${enc.toString.toLowerCase}", OutputMode.Complete()))
    }
    // two 6h windows: [00:00,06:00) holds 2 events, [06:00,12:00) holds 1
    val want = Seq(
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L)), 2L),
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704088800L)), 1L))
    for ((got, enc) <- results.zip(encodings))
      assert(got === want, s"under $enc")
  }
}
