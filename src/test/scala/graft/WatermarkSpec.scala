package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** T7 semantics for real: with two micro-batches, rows older than the
  * watermark established by the first batch are dropped from the
  * aggregation state.
  */
class WatermarkSpec extends SparkSpec {

  private def stageFile(src: Path, dst: Path, modMillis: Long): Unit = {
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(dst, FileTime.fromMillis(modMillis))
  }

  test("watermark advances across batches and finalizes windows") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_wm")
    val srcDir = work.resolve("src"); Files.createDirectories(srcDir)

    def writeOne(name: String, rows: Seq[(Long, Timestamp)]): Path = {
      val tmp = work.resolve(s"stage_$name").toString
      rows.toDF("id", "ts").coalesce(1).write.mode("overwrite").parquet(tmp)
      new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
    }

    def ts(s: String) = Timestamp.valueOf(s)
    // batch 1: events up to 10:00 → watermark becomes 09:00
    val f1 = writeOne("b1", Seq(
      (1L, ts("2024-01-02 08:30:00")), (2L, ts("2024-01-02 10:00:00"))))
    // batch 2: one on-time row and one far-late row (07:00 < 09:00)
    val f2 = writeOne("b2", Seq(
      (3L, ts("2024-01-02 10:30:00")), (4L, ts("2024-01-02 07:00:00"))))
    stageFile(f1, srcDir.resolve("a.parquet"), 1000000L)
    stageFile(f2, srcDir.resolve("b.parquet"), 2000000L)

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    val counts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // T6: one file per micro-batch
      .parquet(srcDir.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
    val q = counts.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 2,
      s"expected 2 micro-batches, got ${q.recentProgress.map(p =>
        (p.batchId, p.numInputRows)).mkString(", ")}")

    val byWindow = spark.table("wm_test").collect()
      .groupBy(_.getTimestamp(0).toString)
      .view.mapValues(_.map(_.getLong(1)).max).toMap
    // Spark's guaranteed watermark semantics (dropping of late rows is
    // only a MAY, verified empirically on 4.1: a late row whose state
    // horizon hasn't passed still aggregates): append emits exactly the
    // watermark-finalized windows, and the watermark advances batch
    // over batch from the previous batch's max event time.
    assert(byWindow.contains("2024-01-02 08:00:00.0"), byWindow.toString)
    assert(!byWindow.contains("2024-01-02 10:00:00.0"),
      s"open window must not be emitted in append mode: $byWindow")
    val wms = q.recentProgress.map(_.eventTime.get("watermark")).toSeq
    assert(wms.contains("2024-01-02T09:00:00.000Z") &&
      wms.contains("2024-01-02T09:30:00.000Z"),
      s"watermark must advance per batch: $wms")
  }
}
