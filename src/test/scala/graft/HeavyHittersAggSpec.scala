package graft

import org.apache.spark.sql.{Encoders, functions => F}
import org.apache.spark.sql.functions._
import graft.functions.HeavyHittersAgg

/** The Misra–Gries sketch's retention guarantee must hold under any
  * partitioning (merge order), with bounded memory and one-sided count
  * error.
  */
class HeavyHittersAggSpec extends SparkSpec {

  // 300 copies of the heavy item buried in 2700 distinct fillers:
  // n = 3000, k = 10 -> guarantee threshold n/(k+1) ~ 272.7 < 300
  private def stream = {
    import spark.implicits._
    val items = (0 until 2700).map(i => s"filler_$i") ++
      Seq.fill(300)("HEAVY")
    // deterministic adversarial order: fillers and heavy interleaved
    items.zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L) % 3000 }
      .map(_._1).toDF("item")
  }

  test("item above n/(k+1) survives any partitioning; counts one-sided") {
    val mg = F.udaf(new HeavyHittersAgg(10), Encoders.STRING)
    for (parts <- Seq(1, 7, 32)) {
      val sketch = stream.repartition(parts)
        .agg(mg(col("item")).as("mg"))
        .collect().head.getMap[String, Long](0)
      assert(sketch.contains("HEAVY"),
        s"guaranteed heavy item missing at $parts partitions: $sketch")
      val est = sketch("HEAVY")
      assert(est <= 300L, s"stored count must never exceed true: $est")
      assert(est >= 300L - (3000L / 11L) - 1,
        s"undercount beyond n/(k+1): $est")
      assert(sketch.size <= 20, // buffer contract: <= 2k survivors
        s"sketch must stay bounded: ${sketch.size}")
    }
  }

  test("streaming mapGroupsWithState sketch honors the batch guarantee") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    // per-key streams: key A has a guaranteed-heavy item, key B is
    // uniform; the streaming sketch must retain A's heavy item
    val rows = (0 until 900).map(i => ("A", s"a_$i")) ++
      Seq.fill(200)(("A", "HOT")) ++                  // n_A=1100, k=20 ->
      (0 until 800).map(i => ("B", s"b_${i % 400}"))  // thresh ~52 < 200
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hh_stream").toString
    rows.toDF("key", "item").repartition(4)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("key STRING, item STRING").parquet(dir)
    val out = graft.streaming.Streams
      .runToTable(graft.streaming.Streams.heavyHittersByKey(stream, 20),
        "spec_hh_stream", OutputMode.Update())
    val sketches = out.collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    assert(sketches("A").contains("HOT"),
      s"guaranteed heavy item must survive streaming state: ${sketches("A")}")
    assert(sketches("A").size <= 40 && sketches("B").size <= 40,
      "state bounded at 2k counters per key")
  }

  test("uniform stream: sketch stays bounded, no false guarantee") {
    val mg = F.udaf(new HeavyHittersAgg(10), Encoders.STRING)
    import spark.implicits._
    val uniform = (0 until 5000).map(i => s"u_${i % 1000}")
      .toDF("item").repartition(16)
    val sketch = uniform.agg(mg(col("item")).as("mg"))
      .collect().head.getMap[String, Long](0)
    assert(sketch.size <= 20, s"bounded even at 1000 distinct: ${sketch.size}")
  }
}
