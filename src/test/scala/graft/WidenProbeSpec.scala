package graft

import org.apache.spark.sql.types._
import graft.io.Snapshots

/** Pins the Spark 4 parquet type-promotion behavior the snapshot
  * store's type widening relies on: files written with a NARROWER
  * type must read exactly under the promoted read schema. If an
  * engine upgrade ever regresses this, these pins fail before any
  * widened table silently misreads.
  */
class WidenProbeSpec extends SparkSpec {

  test("parquet type promotion pin: int32 pages read exactly as long and double, float as double") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("widen").toString
    Seq((1, 1.5f), (2147483647, 2.5f)).toDF("i", "f")
      .write.parquet(dir + "/t")
    val wide = StructType(Seq(StructField("i", LongType),
      StructField("f", DoubleType)))
    val r = spark.read.schema(wide).parquet(dir + "/t")
      .orderBy("i").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2147483647L))
    assert(r.map(_.getDouble(1)).toSeq === Seq(1.5d, 2.5d))
    val asDouble = StructType(Seq(StructField("i", DoubleType)))
    assert(spark.read.schema(asDouble).parquet(dir + "/t")
      .orderBy("i").collect().map(_.getDouble(0)).toSeq ===
      Seq(1.0d, 2147483647.0d))
  }

  test("narrowing read refuses: long pages under an int read schema fail, never truncate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("narrow").toString
    Seq(5000000000L, 7L).toDF("i").write.parquet(dir + "/t")
    // the streaming source pins its schema per run; if the table
    // widens mid-stream, later (wider) files are read under the
    // pinned (narrower) schema - that MUST be a loud failure, not a
    // silent truncation of values past 2^31
    val narrow = StructType(Seq(StructField("i", IntegerType)))
    val e = intercept[Throwable](
      spark.read.schema(narrow).parquet(dir + "/t").collect())
    assert(e.getMessage != null)
  }

  test("the widening lattice: up-chain only, no narrowing, no long->double") {
    assert(Snapshots.widens(IntegerType, LongType))
    assert(Snapshots.widens(ByteType, LongType))
    assert(Snapshots.widens(ShortType, IntegerType))
    assert(Snapshots.widens(FloatType, DoubleType))
    assert(Snapshots.widens(IntegerType, DoubleType))
    assert(!Snapshots.widens(LongType, IntegerType))
    assert(!Snapshots.widens(LongType, DoubleType))
    assert(!Snapshots.widens(DoubleType, FloatType))
    assert(!Snapshots.widens(IntegerType, FloatType))
    assert(!Snapshots.widens(StringType, LongType))
  }
}
