package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.io.Sinks
import graft.streaming.Streams

/** Streaming-vs-batch equivalence and sink behavior. */
class StreamsSinksSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def batchEvents = Tables.events(spark, sfDir)

  test("streaming tumbling agg == batch equivalent") {
    val streamed = Streams.runToTable(
      Streams.tumblingAgg(Streams.eventsStream(spark, sfDir)),
      "spec_tumbling", OutputMode.Complete())
    val batch = Streams.tumblingAgg(batchEvents)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming state lives in the RocksDB state store") {
    // the conf is the contract (GraftSession and SparkSpec both pin
    // it): the default HDFS-backed provider keeps every key on the
    // executor HEAP — at 100x state sizes (stream-stream join
    // buffers, dedup key sets) that OOMs long before the box runs
    // out of memory, while RocksDB spills to local disk and
    // checkpoints incrementally
    assert(spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
    // and a stateful query actually RUNS on it: progress metrics
    // expose RocksDB-specific counters only that provider emits
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val src = MemoryStream[(String, Int)]
    src.addData(("a", 1), ("a", 2), ("b", 3))
    val q = src.toDF().toDF("k", "v")
      .groupBy("k").count()
      .writeStream.format("memory").queryName("rocks_probe")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty, "no stateful operator in progress")
      val custom = ops.head.customMetrics
      assert(custom.containsKey("rocksdbFilesCopied") ||
        custom.containsKey("rocksdbTotalCompactLatencyMs"),
        s"state-store metrics are not RocksDB's: $custom")
      assert(ops.head.numRowsTotal == 2L)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join == batch left join (outer rows flushed)") {
    val streamed = Streams.runToTable(
      Streams.purchaseClickLeftJoin(
        Streams.eventsWithFlushSentinelStream(spark, sfDir),
        Streams.eventsWithFlushSentinelStream(spark, sfDir)),
      "spec_ljoin", OutputMode.Append())
      .filter(col("user_id") >= 0) // batch-side sentinel exclusion
    val ev = batchEvents
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        col("ts").as("buy_ts"))
    val cls = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
    val batch = buys.join(cls,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("buy_ts"),
      "left_outer")
      .select(col("buy_id"), col("click_id"), col("user_id"))
    // the click-less purchases' NULL rows must ALL be present — the
    // watermark-withholding failure mode drops exactly the latest ones
    assert(streamed.filter(col("click_id").isNull).count() ===
      batch.filter(col("click_id").isNull).count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("stream-stream FULL OUTER join == batch full join (both outer sides flushed)") {
    val streamed = Streams.runToTable(
      Streams.purchaseClickFullJoin(
        Streams.eventsWithFlushSentinelStream(spark, sfDir),
        Streams.eventsWithFlushSentinelStream(spark, sfDir)),
      "spec_fjoin", OutputMode.Append())
      .filter(col("user_id") >= 0)
    val ev = batchEvents
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"),
        col("user_id").as("buy_user"), col("ts").as("buy_ts"))
    val cls = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
    val batch = buys.join(cls,
      col("buy_user") === col("click_user") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("buy_ts"),
      "full_outer")
      .select(col("buy_id"), col("click_id"),
        coalesce(col("buy_user"), col("click_user")).as("user_id"))
    // BOTH outer sides must be complete — each side's watermark can
    // withhold the other side's tail
    assert(streamed.filter(col("click_id").isNull).count() ===
      batch.filter(col("click_id").isNull).count())
    assert(streamed.filter(col("buy_id").isNull).count() ===
      batch.filter(col("buy_id").isNull).count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("mapGroupsWithState custom state == batch groupBy") {
    val streamed = Streams.runToTable(
      Streams.userStatsCustomState(Streams.eventsStream(spark, sfDir)),
      "spec_custom_state", OutputMode.Update())
    val batch = Streams.userStats(batchEvents)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("flatMapGroupsWithState alerts == batch milestone computation") {
    val streamed = Streams.runToTable(
      Streams.countAlerts(Streams.eventsStream(spark, sfDir), every = 3L),
      "spec_alerts", OutputMode.Append())
    // batch equivalent: each user emits one row per multiple of 3
    // reached by their total count
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      // guard: Spark's sequence(1, 0) is DESCENDING [1,0], not empty —
      // a user with n < 3 would fabricate milestones in this reference
      .filter(expr("n div 3") >= 1)
      .select(col("user_id"),
        explode(sequence(lit(1L), expr("n div 3"))).as("k"))
      .select(col("user_id"), (col("k") * 3L).as("milestone"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("writeParquetSplit bounds records per file") {
    val dir = Files.createTempDirectory("graft_split").toString
    Sinks.writeParquetSplit(batchEvents.select("event_id"), dir, 100L)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 10, s"1000 rows / 100 per file: ${files.length}")
    assert(spark.read.parquet(dir).count() === 1000)
  }

  test("compact: bin-packs small files losslessly") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/store"
    Sinks.writeParquetSplit(batchEvents.select("event_id"), dir, 50L)
    def fileCount = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = fileCount
    assert(before >= 20, s"1000 rows / 50 per file: $before")
    Sinks.compact(spark, dir, 1000L)
    assert(fileCount === 1, "1000 rows fit one target-size file")
    assert(spark.read.parquet(dir).count() === 1000)
  }

  test("writePartitioned: dynamic overwrite touches only present months") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dyn").toString
    val v1 = Seq((1L, "2024_01"), (2L, "2024_02")).toDF("id", "ym")
    Sinks.writePartitioned(v1, dir, Seq("ym"))
    // rerun with only January data changed
    val v2 = Seq((10L, "2024_01")).toDF("id", "ym")
    Sinks.writePartitioned(v2, dir, Seq("ym"))
    val back = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("ym") -> r.getAs[Long]("id")).toMap
    assert(back === Map("2024_01" -> 10L, "2024_02" -> 2L),
      "February partition must survive the January rerun")
  }

  test("mergeDedup: overlapping batches yield the distinct union") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/store"
    val b1 = Seq((1L, "2024_01"), (2L, "2024_01")).toDF("id", "ym")
    val b2 = Seq((2L, "2024_01"), (3L, "2024_01")).toDF("id", "ym")
    Sinks.mergeDedup(spark, b1, dir, "ym")
    Sinks.mergeDedup(spark, b2, dir, "ym")
    val ids = spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("writeZOrderLayout: lossless, disjoint file z ranges, 2-D locality") {
    import spark.implicits._
    val df = (for { a <- 0L until 32L; b <- 0L until 32L } yield (a, b))
      .toDF("ka", "kb")
    val dir = Files.createTempDirectory("graft_zorder").toString + "/store"
    Sinks.writeZOrderLayout(df, dir, "ka", "kb", 8)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1024)
    assert(back.select("ka", "kb").exceptAll(df).count() === 0)
    // every file covers a disjoint z range (that's what lets parquet
    // min/max stats prune on either dimension)
    val ranges = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.toString).agg(min("z"), max("z")).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1).toSeq
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2,
        s"file z ranges overlap: $ranges")
      case _ => ()
    }
    // Morton locality: the low-low quadrant sorts entirely before the
    // high-high quadrant — z clusters both dimensions at once
    val q00 = back.filter(col("ka") < 16 && col("kb") < 16)
      .agg(max("z")).head.getLong(0)
    val q11 = back.filter(col("ka") >= 16 && col("kb") >= 16)
      .agg(min("z")).head.getLong(0)
    assert(q00 < q11, "low-low quadrant must z-sort before high-high")
  }

  test("mergeAggregate: batch partials fold to the one-shot aggregate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_magg").toString + "/store"
    val b1 = Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("k", "n", "s")
    val b2 = Seq(("a", 3L, 7L), ("c", 1L, 1L)).toDF("k", "n", "s")
    Sinks.mergeAggregate(spark, b1, dir, Seq("k"))
    Sinks.mergeAggregate(spark, b2, dir, Seq("k"))
    val back = spark.read.parquet(dir).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("s")))
      .toMap
    assert(back === Map("a" -> (5L, 17L), "b" -> (1L, 5L), "c" -> (1L, 1L)),
      "stored partials and batch partials sum per key")
  }

  test("streaming near-dup candidates: distinct emitted pairs == " +
    "batch lshCandidates across a 2-micro-batch split") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // 6 groups of 4 identical docs — every within-group pair is a
    // candidate in every band; groups differ in their lead token
    // 26/27 are shingle-less (< 3 tokens): they must neither emit
    // sentinel pairs nor occupy bucket state (all-sentinel signatures
    // would otherwise share one bucket per band)
    val docs = ((0L until 24L)
      .map(i => (i, s"n${i % 6} a b c d e f g h i j")) ++
      Seq((26L, "solo"), (27L, "two tokens")))
      .toDF("doc_id", "text")
    val srcDir = Files.createTempDirectory("graft_neardup_src")
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_neardup_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.copy(part, srcDir.resolve(name))
    }
    // the split separates group members across micro-batches, so
    // cross-batch pairs must come from the bucket STATE
    stage(docs.filter(col("doc_id") < 12), "f1.parquet")
    stage(docs.filter(col("doc_id") >= 12), "f2.parquet")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val streamed = Streams.runToTable(
      Streams.streamingNearDupCandidates(
        Streams.fileStream(spark, srcDir.toString, schema,
          maxFilesPerTrigger = Some(1))),
      "strm_neardup_spec", OutputMode.Append()).distinct()
    // equivalence contract is over SHINGLED docs (>= 3 tokens)
    val batch = graft.dedup.Dedup.lshCandidates(
      graft.dedup.Dedup.minhashSignatures(
        docs.filter(col("doc_id") < 24L), 8), 8)
    assert(streamed.exceptAll(batch).count() === 0,
      "no pair the batch banding would not produce")
    assert(batch.exceptAll(streamed).count() === 0,
      "every batch candidate is emitted, incl. cross-micro-batch pairs")
    assert(batch.count() >= 36, "6 groups x C(4,2) within-group pairs")
    assert(streamed.filter(col("doc_a") >= 24L || col("doc_b") >= 24L)
        .count() === 0,
      "shingle-less docs emit no sentinel pairs")
  }

  test("streaming near-dup: bucket-flood guard throws with remediation") {
    import spark.implicits._
    val flood = (0L until (Streams.MaxLshBucketDocs + 1L))
      .map(i => (i, "same text in every single document here"))
      .toDF("doc_id", "text")
    val srcDir = Files.createTempDirectory("graft_neardup_flood")
    val tmp = Files.createTempDirectory("graft_neardup_flood_tmp")
    flood.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, srcDir.resolve("flood.parquet"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val e = intercept[Exception] {
      Streams.runToTable(
        Streams.streamingNearDupCandidates(
          Streams.fileStream(spark, srcDir.toString, schema)),
        "strm_neardup_flood", OutputMode.Append())
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("LSH bucket exceeds")),
      s"guard must fail loudly, got: ${msgs(e).mkString(" | ")}")
  }

  test("stream-static enrich join == batch equivalent") {
    import spark.implicits._
    val dim = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val streamed = Streams.runToTable(
      Streams.enrichedSegmentStats(Streams.eventsStream(spark, sfDir), dim),
      "spec_enrich", OutputMode.Complete())
    val batch = Streams.enrichedSegmentStats(batchEvents, dim)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("mergeDedup: explicit file:// scheme URI still merges (Hadoop FS, " +
    "not java.io.File)") {
    import spark.implicits._
    // java.io.File("file:///...").exists() is false, which silently
    // turned the second merge into an overwrite — this is the
    // regression test for the Hadoop FileSystem resolution
    val dir = "file://" +
      Files.createTempDirectory("graft_merge_uri").toString + "/store"
    val b1 = Seq((1L, "2024_01"), (2L, "2024_01")).toDF("id", "ym")
    val b2 = Seq((2L, "2024_01"), (3L, "2024_01")).toDF("id", "ym")
    Sinks.mergeDedup(spark, b1, dir, "ym")
    Sinks.mergeDedup(spark, b2, dir, "ym")
    val ids = spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L),
      "batch-1 rows must survive the batch-2 merge through a scheme URI")
  }

  test("s3aConf sets retry/endpoint tuning on the Hadoop configuration") {
    Sinks.s3aConf(spark, endpoint = Some("http://localhost:9000"),
      maxRetries = 7)
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.endpoint") === "http://localhost:9000")
    assert(c.get("fs.s3a.attempts.maximum") === "7")
  }

  test("T6 backpressure: maxFilesPerTrigger bounds files per micro-batch") {
    val dir = Files.createTempDirectory("graft_bp").toString
    batchEvents.select("event_id", "user_id").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = Streams.fileStream(spark, dir, schema,
        maxFilesPerTrigger = Some(1)) // the same wiring eventsStream uses
      .groupBy().count()
      .writeStream.format("memory").queryName("spec_bp")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val feeding = q.recentProgress.count(_.numInputRows > 0)
    assert(feeding >= 3,
      s"3 files at 1 file/trigger must take >= 3 micro-batches: $feeding")
    assert(spark.table("spec_bp").collect().head.getLong(0) === 1000L,
      "throttling must not drop rows")
  }

  test("streaming distinctByKey: HLL state tracks exact distinct within rse") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_hllstream").toString
    // two files so the sketch state must carry across micro-batches;
    // overlapping values per key prove union-not-sum semantics
    val f1 = (0L until 3000L).map(i => (s"k${i % 3}", i % 400))
      .toDF("key", "value")
    val f2 = (0L until 3000L).map(i => (s"k${i % 3}", 300L + (i % 400)))
      .toDF("key", "value")
    f1.coalesce(1).write.mode("overwrite").parquet(s"$src/a")
    f2.coalesce(1).write.mode("overwrite").parquet(s"$src/b")
    val stream = Streams.fileStream(spark, s"$src/a", f1.schema, Some(1))
      .unionByName(Streams.fileStream(spark, s"$src/b", f1.schema,
        Some(1)))
    val q = Streams.distinctByKey(stream)
      .writeStream.format("memory").queryName("spec_hll_stream")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the final (largest) update per key reflects the union: the
    // estimate is monotone as the sketch accrues values
    val est = spark.table("spec_hll_stream")
      .groupBy("key").agg(max("approx_distinct").as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = f1.unionByName(f2).groupBy("key")
      .agg(countDistinct("value").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= n * 0.1 + 2,
        s"key $k: est ${est(k)} vs exact $n (union across batches, " +
          "not sum: a summed estimate would be ~2x)")
      assert(est(k) <= n * 1.5,
        s"key $k overlap must not double-count: ${est(k)} vs $n")
    }
  }

  test("streaming CDC apply == one-shot batch Cdc.apply") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_cdc_src").toString
    val store = Files.createTempDirectory("graft_cdc_store").toString +
      "/snap"
    // two change generations as separate files: v1 seeds, v2 mutates
    val gen1 = Seq((1L, "a", "I", 1L), (2L, "b", "I", 1L),
      (3L, "c", "I", 1L)).toDF("k", "v", "op", "version")
    val gen2 = Seq((2L, "b2", "U", 2L), (3L, "c", "D", 2L),
      (4L, "d", "I", 2L)).toDF("k", "v", "op", "version")
    gen1.coalesce(1).write.mode("overwrite").parquet(s"$src/g=1")
    gen2.coalesce(1).write.mode("overwrite").parquet(s"$src/g=2")
    val schema = gen1.schema
    // 1 file/trigger: the generations apply in separate micro-batches
    Streams.cdcApplyStream(
      Streams.fileStream(spark, s"$src/g=1", schema, Some(1))
        .unionByName(Streams.fileStream(spark, s"$src/g=2", schema,
          Some(1))),
      store, "k")
    val streamed = spark.read.parquet(store)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    import graft.etl.Cdc
    val oneShot = Cdc.apply(gen1.select("k", "v").limit(0),
        gen1.unionByName(gen2), "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === oneShot)
    assert(streamed === Map(1L -> "a", 2L -> "b2", 4L -> "d"),
      "update applied, delete dropped, insert present")
  }

  test("tumbling(6h) counts compose into sliding(12h/6h) counts") {
    // every sliding window [s, s+12h) is exactly the union of tumbling
    // buckets s and s+6h — catches window-boundary bugs independently
    // of the DuckDB oracle
    val tumb = Streams.tumblingAgg(batchEvents)
      .select(col("w_start"), col("event_type"), col("n").as("tn"))
    val expected = tumb
      .unionByName(tumb.select(
        (col("w_start") - expr("INTERVAL 6 HOURS")).as("w_start"),
        col("event_type"), col("tn")))
      .groupBy("w_start", "event_type").agg(sum("tn").as("n"))
    val slid = Streams.slidingAgg(batchEvents)
      .select(col("w_start"), col("event_type"), col("n"))
    assert(slid.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(slid).count() === 0)
  }

  test("session_window: event exactly at last+gap MERGES into the session") {
    import spark.implicits._
    // Spark's session_window merges an event landing EXACTLY at
    // last+gap into the running session — the boundary is inclusive,
    // not half-open (verified empirically: 00:00 / 01:00 / 01:59:59
    // with a 1 h gap yield ONE session of 3). The DuckDB oracles
    // encode the same rule — break only on diff > gap, never >= — so
    // engine and oracle can't silently diverge at the boundary.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00") // == last+gap
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 01:59:59") // inside gap
    val ev = Seq((1L, t0), (1L, t1), (1L, t2)).toDF("user_id", "ts")
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    assert(sessions.count() === 1,
      "exact-boundary event extends the session (inclusive merge)")
    val ns = sessions.select("n").as[Long].collect().sorted
    assert(ns === Array(3L))
    // streaming path must agree with batch at the same boundary
    val dir = Files.createTempDirectory("graft_session_tie").toString
    ev.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP").parquet(dir)
    val streamed = Streams.runToTable(
      Streams.sessionAgg(stream), "spec_session_tie", OutputMode.Complete())
    assert(streamed.select("n").as[Long].collect().sorted === Array(3L),
      "streaming sessionAgg must merge the exact-boundary event like batch")
  }

  test("readCsvAllString: permissive strings-first read, null-on-coerce") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csv").toString
    Seq(("1", "x"), ("notanumber", "y")).toDF("a", "b")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = Sinks.readCsvAllString(spark, dir, Seq("a", "b"))
      .select(Sinks.coerce(col("a"), "long").as("a"), col("b"))
    val rows = back.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((1L, "x"), (null, "y")),
      "bad numerics coerce to null, row is kept")
  }

  test("outer joins flush from watermark advance alone on an unbounded source (no sentinels)") {
    // the sentinel trick lives in the GATE FIXTURE only (a finite
    // AvailableNow source whose watermark would otherwise stall one
    // hour short of the data's edge); the public join API on a real
    // unbounded source must emit outer rows purely from ordinary
    // later events advancing both watermarks
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def shape(ds: org.apache.spark.sql.Dataset[
        (Long, Long, String, java.sql.Timestamp)]) =
      ds.toDF("event_id", "user_id", "event_type", "ts")

    val buysL = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val clicksL = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val left = Streams.purchaseClickLeftJoin(
      shape(buysL.toDS()), shape(clicksL.toDS()))
    val qL = left.writeStream.format("memory").queryName("nosent_left")
      .outputMode("append").start()
    try {
      // micro-batch 1: one matched purchase, one click-less purchase
      clicksL.addData((100L, 1L, "click", ts("2024-01-01 09:30:00")))
      buysL.addData((1L, 1L, "purchase", ts("2024-01-01 10:00:00")),
        (2L, 2L, "purchase", ts("2024-01-01 10:00:00")))
      qL.processAllAvailable()
      val after1 = spark.table("nosent_left").collect().map(_.getLong(0))
      assert(after1.toSet === Set(1L),
        s"inner match emits, outer row withheld: ${after1.toSeq}")
      // micro-batch 2: ORDINARY later traffic on both sides moves both
      // watermarks past 10:00; the withheld outer row must now flush
      buysL.addData((3L, 3L, "purchase", ts("2024-01-02 12:00:00")))
      clicksL.addData((101L, 4L, "click", ts("2024-01-02 12:00:00")))
      qL.processAllAvailable()
      val rows = spark.table("nosent_left").collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          r.getLong(2))).toSet
      assert(rows.contains((2L, -1L, 2L)),
        s"outer row must flush from watermark advance alone: $rows")
      assert(rows.contains((1L, 100L, 1L)), rows.toString)
    } finally qL.stop()

    val buysF = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val clicksF = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val full = Streams.purchaseClickFullJoin(
      shape(buysF.toDS()), shape(clicksF.toDS()))
    val qF = full.writeStream.format("memory").queryName("nosent_full")
      .outputMode("append").start()
    try {
      // unmatched on BOTH sides in batch 1
      buysF.addData((1L, 1L, "purchase", ts("2024-01-01 10:00:00")))
      clicksF.addData((100L, 2L, "click", ts("2024-01-01 10:00:00")))
      qF.processAllAvailable()
      buysF.addData((3L, 3L, "purchase", ts("2024-01-02 12:00:00")))
      clicksF.addData((101L, 4L, "click", ts("2024-01-02 12:00:00")))
      qF.processAllAvailable()
      val rows = spark.table("nosent_full").collect().map(r =>
        (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2))).toSet
      assert(rows.contains((1L, -1L, 1L)),
        s"unmatched purchase must NULL-extend: $rows")
      assert(rows.contains((-1L, 100L, 2L)),
        s"unmatched click must NULL-extend: $rows")
    } finally qF.stop()
  }
}
