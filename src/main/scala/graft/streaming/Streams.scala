package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9): the reference's
  * polling/signal-file incremental semantics (T1–T7) restated as file
  * source + checkpoint + watermark.
  *
  *  - T1 (directory polling): `readStream` file source with
  *    `Trigger.AvailableNow` — catch-up batch over whatever arrived.
  *  - T3 (processed-set idempotency): the file-source checkpoint tracks
  *    consumed files; no JSON tracker.
  *  - T6 (backpressure): `maxFilesPerTrigger`.
  *  - T7 (late data): `withWatermark` bounds state; the reference
  *    silently drops out-of-interval samples, a watermark drops
  *    out-of-window ones.
  *
  * All sinks here are memory tables (driver-side correctness checks at
  * sf0.01); production would `writeStream.format("parquet")` with the
  * same plans.
  */
object Streams {

  /** Streaming read schemas for driver-owned files are built from the
    * file's ACTUAL footer types
    * ([[graft.schema.Conform.physicalReadSchema]]) and conformed to
    * the logical contract after the source. Declaring the logical
    * type directly is the r8 failure mode — worse than a crash: a
    * LongType declaration over a micros file makes the source hand
    * back raw micros which a nanos→micros division then lands in
    * 1970 — silently wrong windows.
    */
  private def contractOf(table: String): StructType =
    graft.schema.Conform.contracts(table)

  /** Per-run scratch dir for staging file-source inputs — see
    * [[graft.io.Scratch]] for the isolation + cleanup contract.
    */
  private def stagingDir(prefix: String): java.nio.file.Path =
    graft.io.Scratch.dir(prefix)

  /** SCALE-ADAPTIVE state-partition count for stateful streaming
    * queries. A stateful operator instantiates one state store per
    * shuffle partition per trigger (a stream-stream join runs FOUR),
    * and each RocksDB store lifecycle (open → commit → changelog
    * fsync) costs real wall time regardless of how little state it
    * holds — measured on the stream-stream join gates, 32 partitions
    * (128 stores) cost ~11 s where 8 partitions cost ~3.5 s on the
    * SAME data. Sizing the state partitioning to the SOURCE VOLUME
    * instead of a fixed constant is the same posture the batch side
    * gets from AQE coalescing (guide §2.2: fewer, larger partitions),
    * which streaming cannot use (AQE is disabled in stateful
    * workloads). The count grows with staged bytes up to the
    * session's shuffle parallelism, so a 100 TB stream still fans out
    * to the full cluster while a megabyte micro-batch stops paying
    * hundreds of store lifecycles per trigger.
    *
    * Tunables (documented local defaults, production values in
    * OPTIMIZATION_r17.md): `spark.graft.stream.statePartitionBytes`
    * — source bytes per state partition (default 16 MiB);
    * `spark.graft.stream.statePartitionsMin` — floor (default 8, so
    * local runs keep meaningful parallelism). The cap is always the
    * session's `spark.sql.shuffle.partitions`, i.e. this only ever
    * LOWERS the count for small sources, never changes the at-scale
    * fan-out.
    */
  private[graft] def adaptiveStatePartitions(
      spark: SparkSession, sourceBytes: Long): Int = {
    val per = spark.conf
      .getOption("spark.graft.stream.statePartitionBytes")
      .map(_.toLong).getOrElse(16L << 20)
    val floor = spark.conf
      .getOption("spark.graft.stream.statePartitionsMin")
      .map(_.toInt).getOrElse(8)
    val cap = spark.sessionState.conf.numShufflePartitions
    math.min(cap,
      math.max(math.min(floor, cap),
        (sourceBytes / math.max(1L, per)).toInt + 1))
  }

  /** The staged-source byte size most recently observed by a source
    * builder in this thread — [[runToTable]] consumes it to size the
    * query's state partitioning. Thread-local because bench/verify
    * run gates sequentially per thread while tests may run suites in
    * parallel sessions.
    */
  private val lastStagedBytes = new ThreadLocal[Long] {
    override def initialValue(): Long = -1L
  }

  /** Consume-and-clear the staged-bytes marker. The foreachBatch
    * helpers call this at entry even though they run no stateful
    * operators, so a source staged for THEM can never leak its size
    * into a later [[runToTable]] query on the same thread.
    */
  private def consumeStagedBytes(): Long = {
    val b = lastStagedBytes.get(); lastStagedBytes.set(-1L); b
  }

  private def recordStagedBytes(staged: java.nio.file.Path): Unit = {
    val it = java.nio.file.Files.list(staged).iterator()
    var b = 0L
    while (it.hasNext) {
      val p = it.next()
      if (java.nio.file.Files.isRegularFile(p))
        b += java.nio.file.Files.size(p)
    }
    lastStagedBytes.set(math.max(lastStagedBytes.get(), b))
  }

  /** Generic parquet file-source stream with optional T6 backpressure —
    * the single wiring point every streaming entry (and the T6 spec)
    * goes through.
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n)) // T6
    reader.parquet(dir)
  }

  /** File-source stream over the events table. The file source needs a
    * directory (arriving-files semantics), so the single test file is
    * staged into a scratch dir once.
    */
  /** Stage a parquet table into the file-source directory: a
    * single-file table copies as itself; a DIRECTORY table (the
    * normal Spark-written layout) copies its part files —
    * `Files.copy` on a directory would copy it EMPTY and the stream
    * would silently read zero rows.
    */
  private def stageParquet(src: java.nio.file.Path,
                           staged: java.nio.file.Path): Unit =
    if (java.nio.file.Files.isDirectory(src)) {
      val it = java.nio.file.Files.list(src).iterator()
      var n = 0
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p,
            staged.resolve(p.getFileName.toString),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          n += 1
        }
      }
      require(n > 0,
        s"streams: $src is a directory with no parquet part files")
    } else java.nio.file.Files.copy(src,
      staged.resolve(src.getFileName.toString),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)

  def eventsStream(spark: SparkSession, dir: String,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val raw = graft.schema.Conform.physicalReadSchema(
      spark, s"$dir/events.parquet", contractOf("events"), "events")
    val staged = stagingDir("graft_stream_src_")
    stageParquet(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged)
    recordStagedBytes(staged)
    graft.schema.Conform.conform(
      fileStream(spark, staged.toString, raw, maxFilesPerTrigger),
      contractOf("events"), "events")
  }

  /** documents.parquet schema for the streaming source. */
  private[graft] val DocsRawSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over the documents table (staged like
    * [[eventsStream]] — the file source needs a directory).
    */
  def docsStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = graft.schema.Conform.physicalReadSchema(
      spark, s"$dir/documents.parquet", contractOf("documents"),
      "documents")
    val staged = stagingDir("graft_stream_docs_")
    stageParquet(java.nio.file.Paths.get(s"$dir/documents.parquet"),
      staged)
    recordStagedBytes(staged)
    graft.schema.Conform.conform(
      fileStream(spark, staged.toString, raw),
      contractOf("documents"), "documents")
  }

  /** Hard per-bucket state ceiling for [[streamingNearDupCandidates]].
    * A bucket this hot means boilerplate-identical documents flooding
    * one LSH bucket (the candidate count is quadratic in bucket size
    * whether batch or stream) — exact-dedup the stream first. Fails
    * loudly, the library's standard guard posture.
    */
  val MaxLshBucketDocs: Int = 1024

  /** Streaming MinHash-LSH near-dup candidate generation: the
    * arriving-documents form of [[graft.dedup.Dedup.lshCandidates]].
    * Signature and band keys are MAP-ONLY column expressions on the
    * stream (the same hash constants as batch — codegen'd shingle +
    * hash60 expressions); per-(band, band-signature) buckets live as
    * `flatMapGroupsWithState` state, and a document emits one
    * candidate pair per stored bucket member the moment it arrives —
    * the online index every streaming dedup service maintains.
    *
    * Pair-set equivalence with batch: a pair shares a bucket iff its
    * two docs agree on that band, and the pair is emitted exactly once
    * per shared bucket when the LATER member arrives — so the DISTINCT
    * emitted set equals batch `lshCandidates` over the SHINGLED docs
    * (≥ 3 tokens; see the sentinel note below) regardless of arrival
    * order or batch boundaries (asserted in StreamsSinksSpec and by
    * the `q_stream_neardup` oracle).
    *
    * State: per bucket, the sorted member-id list, capped at
    * [[MaxLshBucketDocs]] (quadratic-flood guard, throws with
    * remediation). `r` is fixed at the library default 2: the state
    * key packs the band's minhashes exactly (both < 2³¹−1).
    */
  def streamingNearDupCandidates(docs: DataFrame, k: Int = 8):
      DataFrame = {
    import graft.dedup.Dedup
    import graft.functions.TextAnalysis
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % 2 == 0, s"k=$k must be divisible by the band width 2")
    // shingle-less docs (< 3 tokens, empty/null text) are dropped
    // BEFORE banding: their minhashes all coalesce to the sentinel P,
    // so every such doc would share one bucket per band — >cap
    // DISTINCT short docs would then trip the flood guard with a
    // remediation (exact-dedup) that cannot apply, and the emitted
    // sentinel pairs carry no similarity signal anyway (batch `fuzzy`
    // kills them at Jaccard verification; a candidates-only stream
    // has no such downstream). Batch `lshCandidates` still includes
    // them — the equivalence contract is over SHINGLED docs.
    val hashed = docs.select(col("doc_id"),
      transform(TextAnalysis.hash60Array(
          array_distinct(TextAnalysis.wordShinglesOfNative(
            TextAnalysis.tokens(col("text")), 3))),
        h => h % Dedup.P).as("hs"))
      .filter(size(col("hs")) > 0)
    val sig = hashed.select(col("doc_id") +:
      (0 until k).map(i => Dedup.minhashCol(col("hs"), i).as(s"mh_$i")): _*)
    val bands = (0 until k / 2).map { j =>
      sig.select(col("doc_id"), lit(j).as("band"),
        col(s"mh_${2 * j}").as("m0"), col(s"mh_${2 * j + 1}").as("m1"))
    }.reduce(_ unionByName _)
    bands.as[(Long, Int, Long, Long)]
      .groupByKey(t => (t._2, t._3, t._4))
      .flatMapGroupsWithState[Seq[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty[Long])
          val fresh = rows.map(_._1).toSeq.distinct.sorted
            .filterNot(seen.contains)
          if (seen.size + fresh.size > MaxLshBucketDocs)
            throw new IllegalStateException(
              s"LSH bucket exceeds $MaxLshBucketDocs members: near-" +
                "identical boilerplate is flooding one bucket and the " +
                "candidate count is quadratic in it - exact-dedup the " +
                "stream first (Dedup.exact / streamingDedup)")
          val vsOld = for (n <- fresh; o <- seen)
            yield (math.min(n, o), math.max(n, o))
          val vsNew = for {
            i <- fresh.indices; j <- (i + 1) until fresh.size
          } yield (fresh(i), fresh(j))
          state.update(seen ++ fresh)
          (vsOld ++ vsNew).iterator
      }
      .toDF("doc_a", "doc_b")
  }

  /** Events stream with the [[graft.Tables.SessionTie]] boundary
    * fixture staged as a SECOND arriving file — the streaming session
    * gate gets an exact-gap tie the shipped data lacks, so the oracle
    * comparison exercises the merge-at-boundary rule end-to-end
    * through the file source. Separate staging dir from
    * [[eventsStream]]: the other streaming gates must not see the
    * fixture rows. The fixture timestamps sit after the real data's
    * max event time, so they survive any watermark the real file can
    * establish even if the two files land in different micro-batches.
    */
  def eventsWithSessionTieStream(spark: SparkSession,
                                 dir: String): DataFrame = {
    val raw = graft.schema.Conform.physicalReadSchema(
      spark, s"$dir/events.parquet", contractOf("events"), "events")
    val staged = stagingDir("graft_stream_tie_src_")
    stageParquet(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged)
    graft.io.Scratch.stageSingleParquetFile(
      graft.Tables.SessionTie.rawDf(spark, raw), staged, "tie.parquet")
    recordStagedBytes(staged)
    graft.schema.Conform.conform(
      fileStream(spark, staged.toString, raw, None),
      contractOf("events"), "events")
  }

  /** The events stream plus two far-future FLUSH SENTINELS (a
    * purchase at 2024-06-01 under user −999, a click at 2024-12-01
    * under user −998): an OUTER stream-stream join can only emit its
    * unmatched rows once the watermark proves no partner can still
    * arrive, and the global watermark is held by the slower side —
    * with a finite source it would stop an hour short of the data's
    * end and silently hold back the last purchases' outer rows
    * forever. The sentinels advance BOTH sides' watermarks past every
    * real event; their user ids are distinct negatives (they cannot
    * join each other or any real row) and callers filter
    * `user_id >= 0` after the join. Same staging pattern as
    * [[eventsWithSessionTieStream]].
    */
  def eventsWithFlushSentinelStream(spark: SparkSession,
                                    dir: String): DataFrame = {
    val (staged, raw) = stageFlushSentinelSource(spark, dir)
    graft.schema.Conform.conform(
      fileStream(spark, staged, raw, None),
      contractOf("events"), "events")
  }

  /** Stage the flush-sentinel source once; returns (staged dir, raw
    * schema) so callers needing TWO streams over the same data (the
    * outer-join gates) pay the staging job once.
    */
  private def stageFlushSentinelSource(spark: SparkSession,
                                       dir: String):
      (String, StructType) = {
    import spark.implicits._
    val raw = graft.schema.Conform.physicalReadSchema(
      spark, s"$dir/events.parquet", contractOf("events"), "events")
    val staged = stagingDir("graft_stream_flush_src_")
    // sentinels ride in the SAME single staged file as the real
    // events: one file → one data batch → one deterministic listing
    // (multi-file AvailableNow snapshots have proven racy about
    // late-staged files). End-of-batch watermark lands months past
    // the real data, and the standard no-data batch that follows
    // evicts every real purchase's outer row before termination.
    val sentinels = Seq(
      (-901L, -999L, "purchase", "2024-06-01 00:00:00"),
      (-902L, -998L, "click", "2024-12-01 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_timestamp(col("ts_s")).as("ts"))
    val combined = spark.read.schema(raw)
      .parquet(s"$dir/events.parquet")
      .unionByName(graft.Tables.rawConform(sentinels, raw))
    graft.io.Scratch.stageSingleParquetFile(
      combined, staged, "events.parquet")
    recordStagedBytes(staged)
    (staged.toString, raw)
  }

  /** TWO independent streams over ONE staged flush-sentinel source —
    * what a stream-stream self-join gate needs. Staging (a Spark
    * read + union + write job) is a per-gate fixed cost worth
    * halving: both sides read the same staged file through separate
    * file-source instances, which is semantically identical to two
    * separately staged copies of the same data.
    */
  def eventsWithFlushSentinelStreamPair(spark: SparkSession,
                                        dir: String):
      (DataFrame, DataFrame) = {
    val (staged, raw) = stageFlushSentinelSource(spark, dir)
    def one() = graft.schema.Conform.conform(
      fileStream(spark, staged, raw, None), contractOf("events"), "events")
    (one(), one())
  }

  /** TWO independent plain event streams over one staged source —
    * the inner-join gate's analogue of
    * [[eventsWithFlushSentinelStreamPair]].
    */
  def eventsStreamPair(spark: SparkSession, dir: String):
      (DataFrame, DataFrame) = {
    val raw = graft.schema.Conform.physicalReadSchema(
      spark, s"$dir/events.parquet", contractOf("events"), "events")
    val staged = stagingDir("graft_stream_src_")
    stageParquet(java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged)
    recordStagedBytes(staged)
    def one() = graft.schema.Conform.conform(
      fileStream(spark, staged.toString, raw, None),
      contractOf("events"), "events")
    (one(), one())
  }

  /** Run a streaming DataFrame to completion (AvailableNow) into a
    * memory sink and return the result table.
    */
  def runToTable(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    // size the query's state partitioning to the staged source (see
    // [[adaptiveStatePartitions]]); the session conf is restored after
    // the query terminates so downstream BATCH plans are untouched.
    // The partition count is pinned at the query's FIRST batch by the
    // state checkpoint anyway — these one-shot AvailableNow runs start
    // fresh, so the derived value applies cleanly each run.
    val staged = consumeStagedBytes()
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    if (staged >= 0L)
      spark.conf.set("spark.sql.shuffle.partitions",
        adaptiveStatePartitions(spark, staged).toString)
    try {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name)
  }

  /** T7: watermarked tumbling-window aggregation (6 h windows, 1 h
    * watermark). Value sums are exact integer cents so results are
    * engine-portable.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("sum_cents"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"), col("n"),
        col("sum_cents"))

  /** Sliding-window variant (12 h window, 6 h slide): each event lands
    * in exactly two windows.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "12 hours", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"), col("n"))

  /** Streaming session windows (1 h inactivity gap): the watermark
    * both bounds state and lets Spark finalize sessions — merged
    * dynamically as late events bridge gaps inside the watermark.
    *
    * Boundary rule (pinned by StreamsSinksSpec, batch == stream): an
    * event exactly at last+gap MERGES into the running session —
    * inclusive boundary. Oracles must break on diff > gap, never >=.
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"))

  /** Streaming deduplication (T3's in-stream form): watermarked
    * `dropDuplicates` on the event key — state for seen keys is
    * dropped once the watermark passes, so memory stays bounded on an
    * unbounded stream.
    */
  def streamingDedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")
      .select(col("event_id"), col("event_type"))

  /** Stream-stream inner join with watermarks and an event-time range
    * condition: each purchase matches that user's clicks from the
    * preceding hour. Both sides carry watermarks so the join state is
    * bounded; inner matches emit as they arrive (append mode).
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val buys = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "1 hour")
    val cls = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    buys.join(cls,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("buy_ts"))
      .select(col("buy_id"), col("click_id"), col("user_id"))
  }

  /** Watermarked stream-stream LEFT OUTER join — the state-expiry
    * semantics unique to streaming outer joins: a purchase's
    * NULL-click row may only emit once the watermark proves no
    * matching click can still arrive (same keys/interval as
    * [[purchaseClickJoin]]). Feed it
    * [[eventsWithFlushSentinelStream]] on both sides — without the
    * sentinels the finite source's watermark stops short of the last
    * purchases and their outer rows are silently withheld, the
    * wrong-but-plausible failure mode streaming outer joins are known
    * for.
    */
  def purchaseClickLeftJoin(purchases: DataFrame,
                            clicks: DataFrame): DataFrame = {
    val buys = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id"),
        col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "1 hour")
    val cls = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    buys.join(cls,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("buy_ts"),
      "left_outer")
      .select(col("buy_id"), col("click_id"), col("user_id"))
  }

  /** Watermarked stream-stream FULL OUTER join: both unmatched
    * purchases AND unmatched clicks emit NULL-extended rows once the
    * watermark proves no partner can arrive — `user_id` coalesces
    * across sides so every row carries its key. Same sentinel-flush
    * requirement as [[purchaseClickLeftJoin]], on both sides.
    */
  def purchaseClickFullJoin(purchases: DataFrame,
                            clicks: DataFrame): DataFrame = {
    val buys = purchases.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"),
        col("user_id").as("buy_user"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "1 hour")
    val cls = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    buys.join(cls,
      col("buy_user") === col("click_user") &&
        col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("buy_ts"),
      "full_outer")
      .select(col("buy_id"), col("click_id"),
        coalesce(col("buy_user"), col("click_user")).as("user_id"))
  }

  /** Stream-static enrichment join: the unbounded event stream joined
    * to a bounded dimension table, then aggregated per (segment,
    * event_type). The static side is broadcast to every micro-batch —
    * no join state accumulates and no watermark is needed for the join
    * itself (only the downstream aggregate holds state). This is the
    * streaming analogue of J1's broadcast dimension join and the
    * standard enrich-then-aggregate shape of a metrics pipeline.
    */
  def enrichedSegmentStats(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), "user_id")
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100.0, 0).cast("long")).as("sum_cents"))

  /** Stateful per-user aggregate via streaming state (complete mode):
    * running max/count per user.
    */
  def userStats(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        max(round(col("value") * 100.0, 0).cast("long")).as("max_cents"))

  /** The reference's full incremental lifecycle (T1+T3+S11+T4) as one
    * stream: arriving files are merged into a partitioned store with
    * dedup per micro-batch via foreachBatch — checkpointed, idempotent
    * under restart, no signal files.
    */
  def incrementalMergeDedup(stream: DataFrame, storePath: String,
                            partitionCol: String): Unit = {
    consumeStagedBytes()
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.io.Sinks.mergeDedup(batch.sparkSession, batch, storePath,
          partitionCol)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming ingestion into a BM25 index store: arriving document
    * files fold into the persisted index per micro-batch — the first
    * batch builds ([[graft.functions.TextAnalysis.buildBm25Index]]),
    * every later batch appends
    * ([[graft.functions.TextAnalysis.updateBm25Index]] — postings/
    * doclens appends into the affected buckets, no rewrite). The
    * file-source checkpoint makes ingestion restartable WHEN a
    * durable `checkpoint` location is supplied — without one Spark
    * uses a temp checkpoint and a restarted run would re-list every
    * file, where update's overlap guard fails the first replayed
    * batch loudly instead of double-indexing (one-shot semantics,
    * never corruption). Serving ([[graft.functions.TextAnalysis
    * .bm25TopKIndexed]]) sees each batch as soon as its append lands
    * — the continuously-maintained retrieval index every RAG/search
    * ingestion pipeline runs.
    */
  def bm25IndexStream(docs: DataFrame, path: String, pbuckets: Int = 64,
                      checkpoint: Option[String] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextAnalysis
    indexIngestStream(docs, s"$path/doclens", checkpoint)(
      build = b => TextAnalysis.buildBm25Index(b, path, pbuckets),
      update = b => TextAnalysis.updateBm25Index(b, path))
  }

  /** The shared build-or-update ingestion scaffold both index streams
    * ([[bm25IndexStream]], [[ivfIndexStream]]) run on: foreachBatch
    * dispatches on whether `probePath` exists yet, an EMPTY batch is
    * skipped outright (a zero-row first batch would otherwise "build"
    * a schema-less store — the empty-dynamic-partition-write brick the
    * compactors guard against), and the terminated query returns so
    * callers can assert batch counts.
    */
  private def indexIngestStream(docs: DataFrame, probePath: String,
                                checkpoint: Option[String])(
      build: DataFrame => Unit, update: DataFrame => Unit):
      org.apache.spark.sql.streaming.StreamingQuery = {
    consumeStagedBytes()
    val writer = docs.writeStream
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.limit(1).count() > 0L) {
          if (graft.io.Sinks.storeExists(batch.sparkSession, probePath))
            update(batch)
          else build(batch)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q // terminated; progress history lets callers assert batch counts
  }

  /** Stream a [[graft.io.Snapshots]] table — see [[SnapshotSource]]:
    * version-offset incremental reads (first batch = full snapshot,
    * later batches = append deltas at O(delta-files)), checkpointed
    * resume, loud refusal on non-append-only history.
    */
  def snapshotSource(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .format(classOf[graft.streaming.SnapshotSourceProvider].getName)
      .option("path", path)
      .load()

  /** Stream a snapshot table's CHANGE DATA FEED — row-level
    * (insert | delete) changes per commit, merges/deletes/compactions
    * included ([[graft.io.Snapshots.changeFeed]] under version
    * offsets): columns = table schema + `_change_type` +
    * `_commit_version`. `startingVersion` includes that version's own
    * changes; default streams only commits after the query starts
    * (the Delta readChangeFeed posture).
    */
  def snapshotChangeFeed(spark: SparkSession, path: String,
                         startingVersion: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format(classOf[graft.streaming.SnapshotSourceProvider].getName)
      .option("path", path)
      .option("readChangeFeed", "true")
    startingVersion.foreach(v => r.option("startingVersion", v.toString))
    r.load()
  }

  /** CDC-style maintenance stream for a persisted BM25 index: each
    * micro-batch carries an `opCol` routing column — add codes
    * (`a`/`add`/`i`/`insert`/`u`/`upsert`) fold into the index
    * (first build, then appends, the [[bm25IndexStream]] path), and
    * delete codes (`d`/`delete`) land as TOMBSTONES
    * ([[graft.functions.TextAnalysis.deleteFromBm25Index]] — one
    * append to the deletes table; serving forgets the docs
    * immediately, physical removal waits for compaction). The
    * takedown/opt-out feed every production retrieval index consumes,
    * now streaming like its ingestion.
    *
    * Order contract: adds apply BEFORE deletes within a batch (an
    * add+delete of one id in one batch indexes then tombstones it —
    * deterministic); a delete for an id the index has never seen is
    * the documented no-op (same as the batch API), so a delete-only
    * batch against an empty store does nothing. Re-adding a
    * tombstoned id refuses loudly inside `updateBm25Index` until a
    * compaction physically drops the old rows — the stream surfaces
    * that refusal rather than silently corrupting the index. Unknown
    * or NULL op codes refuse loudly.
    */
  def bm25IndexCdcStream(docs: DataFrame, path: String,
                         opCol: String = "op", pbuckets: Int = 64,
                         checkpoint: Option[String] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextAnalysis
    val addOps = Set("a", "add", "i", "insert", "u", "upsert")
    val deleteOps = Set("d", "delete")
    consumeStagedBytes()
    val writer = docs.writeStream
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val opNorm = lower(col(opCol))
          val unknown = b.filter(opNorm.isNull ||
            !opNorm.isInCollection(addOps ++ deleteOps)).limit(1).collect()
          require(unknown.isEmpty,
            s"index cdc: unknown op code '${unknown.headOption.map(
              _.getAs[Any](opCol)).orNull}' - expected one of " +
              (addOps ++ deleteOps).toSeq.sorted.mkString(", "))
          val adds = b.filter(opNorm.isInCollection(addOps)).drop(opCol)
          val dels = b.filter(opNorm.isInCollection(deleteOps))
            .select(col("doc_id"))
          if (adds.limit(1).count() > 0L) {
            if (graft.io.Sinks.storeExists(b.sparkSession, s"$path/doclens"))
              TextAnalysis.updateBm25Index(adds, path)
            else TextAnalysis.buildBm25Index(adds, path, pbuckets)
          }
          if (dels.limit(1).count() > 0L &&
              graft.io.Sinks.storeExists(b.sparkSession, s"$path/doclens"))
            TextAnalysis.deleteFromBm25Index(b.sparkSession, path, dels)
          ()
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming ingestion into a [[graft.io.Snapshots]] store: every
    * micro-batch lands as one APPEND commit — an atomic, time-
    * travelable version (train/eval jobs pin the version they read;
    * late-arriving data is a later version, never an in-place
    * mutation). Only each batch's delta is written (structural
    * sharing), so continuous ingestion stays O(batch) however large
    * the table grows. Empty batches are skipped — a zero-row commit
    * would burn a version per empty trigger.
    *
    * EXACTLY-ONCE under replay: each batch commits with a
    * `(txnAppId, batchId)` transaction marker
    * ([[graft.io.Snapshots.commitAppend]]'s `txn`), so a query that
    * crashed between the commit and its checkpoint write NO-OPS the
    * replayed batch instead of double-appending — the Delta
    * txnAppId/txnVersion contract. The appId defaults to the
    * checkpoint location (stable across restarts of the same query);
    * pass `txnAppId` explicitly when the checkpoint path can change
    * (e.g. a rebuilt checkpoint that must still dedupe against the
    * table's history). Without a checkpoint the query is not
    * restartable anyway and a fresh per-run appId applies.
    */
  def snapshotStream(data: DataFrame, path: String,
                     checkpoint: Option[String] = None,
                     txnAppId: Option[String] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val appId = txnAppId
      .orElse(checkpoint.map(c => "ckpt-" + c.replace(":", "_")))
      .getOrElse("run-" + java.util.UUID.randomUUID())
    consumeStagedBytes()
    val writer = data.writeStream
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batch.limit(1).count() > 0L) {
          graft.io.Snapshots.commitAppend(batch, path,
            txn = Some((appId, batchId))); ()
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming UPSERT into a snapshot store: the first non-empty
    * micro-batch commits the table, every later batch applies as a
    * copy-on-write [[graft.io.Snapshots.merge]] on `keyCols` — the
    * CDC-sink posture (replace-by-key, insert-when-new) over the
    * same versioned store the append stream feeds. Each batch is
    * persisted for the merge's multiple passes (dup-key guard,
    * affected-file discovery, rewrite) so the source isn't re-read
    * per pass. Same checkpoint contract as the other index streams:
    * durable `checkpoint` → restartable; a replayed batch is
    * IDEMPOTENT here by merge semantics (same keys, same rows →
    * same table), unlike the append stream's duplicate rows.
    */
  def snapshotUpsertStream(data: DataFrame, path: String,
                           keyCols: Seq[String],
                           checkpoint: Option[String] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    consumeStagedBytes()
    val writer = data.writeStream
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          if (b.limit(1).count() > 0L) {
            if (graft.io.Snapshots.latestVersion(b.sparkSession, path).isEmpty) {
              // the bootstrap commit bypasses merge, so it must run
              // merge's own key guards: a first batch with duplicate
              // (or NULL) keys would otherwise seed a table violating
              // the upsert key invariant — and the at-least-once
              // REPLAY of that same batch would then throw inside
              // merge, wedging the stream on data the stream itself
              // accepted
              requireUpsertableKeys(b, keyCols, "snapshot upsert bootstrap")
              graft.io.Snapshots.commit(b, path)
            } else graft.io.Snapshots.merge(b.sparkSession, path, b, keyCols)
            ()
          }
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Merge's key invariants (no duplicate keys, no NULL keys),
    * applied to a BOOTSTRAP batch that commits directly: the table a
    * CDC/upsert stream seeds must already satisfy what every later
    * merge enforces.
    */
  private def requireUpsertableKeys(b: DataFrame, keyCols: Seq[String],
                                    what: String): Unit = {
    val keyExprs = keyCols.map(col)
    require(b.filter(keyCols.map(col(_).isNull)
        .reduce(_ || _)).limit(1).count() == 0L,
      s"$what: the first batch carries a NULL key " +
        s"(${keyCols.mkString(", ")}) - a NULL key can never be " +
        "merged or deleted later; repair the feed")
    require(b.groupBy(keyExprs: _*).count()
        .filter(col("count") > 1).limit(1).count() == 0L,
      s"$what: the first batch carries duplicate keys - it would seed " +
        "a table violating the upsert key invariant, and a replayed " +
        "batch would then fail inside merge; deduplicate the feed")
  }

  /** CDC sink over the snapshot store: each micro-batch carries an
    * `opCol` routing column — upsert codes (`u`/`c`/`i`/`insert`/
    * `update`/`upsert`) apply as a copy-on-write
    * [[graft.io.Snapshots.merge]] (first batch bootstraps via
    * commit), delete codes (`d`/`delete`) as a distributed
    * [[graft.io.Snapshots.deleteKeys]] — the Debezium-sink posture
    * with NO driver-side key lists. Contract refusals, loud: an
    * unknown op code, and a key appearing under BOTH an upsert and a
    * delete in the same batch (the batch gives no order between
    * them; a CDC feed that compacts per key per transaction — the
    * standard connector behavior — never trips this). Upserts apply
    * before deletes within a batch, so disjoint-key batches are
    * order-independent.
    */
  def snapshotCdcStream(data: DataFrame, path: String,
                        keyCols: Seq[String], opCol: String = "op",
                        checkpoint: Option[String] = None,
                        deleteMode: String = "cow"):
      org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("cow", "mor", "eq").contains(deleteMode),
      s"cdc: deleteMode must be 'cow', 'mor' or 'eq': '$deleteMode'")
    val upsertOps = Set("u", "c", "i", "insert", "update", "upsert")
    val deleteOps = Set("d", "delete")
    consumeStagedBytes()
    val writer = data.writeStream
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val opNorm = lower(col(opCol))
          // NULL op is unknown too — `!isInCollection` alone yields
          // NULL for a NULL op and the filter would silently DROP the
          // row instead of refusing it
          val unknown = b.filter(opNorm.isNull ||
            !opNorm.isInCollection(upsertOps ++ deleteOps)).limit(1).collect()
          require(unknown.isEmpty,
            s"cdc: unknown op code '${unknown.headOption.map(
              _.getAs[Any](opCol)).orNull}' - expected one of " +
              (upsertOps ++ deleteOps).toSeq.sorted.mkString(", "))
          val ups = b.filter(opNorm.isInCollection(upsertOps)).drop(opCol)
          val dels = b.filter(opNorm.isInCollection(deleteOps))
            .select(keyCols.map(col): _*)
          val clash = ups.select(keyCols.map(col): _*)
            .join(dels, keyCols, "left_semi").limit(1).count()
          require(clash == 0L,
            "cdc: a key appears under both an upsert and a delete in " +
              "one batch - the batch gives no order between them; " +
              "compact the feed per key first")
          if (ups.limit(1).count() > 0L) {
            if (graft.io.Snapshots.latestVersion(b.sparkSession, path).isEmpty) {
              // same bootstrap guard as the upsert stream: the seed
              // commit must satisfy what later merges enforce
              requireUpsertableKeys(ups, keyCols, "snapshot cdc bootstrap")
              graft.io.Snapshots.commit(ups, path)
            } else graft.io.Snapshots.merge(b.sparkSession, path, ups, keyCols)
          }
          if (dels.limit(1).count() > 0L &&
              graft.io.Snapshots.latestVersion(b.sparkSession, path).nonEmpty) {
            // 'eq' is the 100 TB CDC shape: the delete batch commits
            // AS a key file (zero table reads, zero rewrites) and is
            // applied physically at the next compact; replays re-kill
            // the same keys harmlessly. 'mor' commits row positions
            // (one table scan, no rewrites); 'cow' rewrites the
            // affected files. All three converge under replay.
            deleteMode match {
              case "eq" => graft.io.Snapshots.deleteKeysEq(
                b.sparkSession, path, dels, keyCols)
              case m => graft.io.Snapshots.deleteKeys(
                b.sparkSession, path, dels, keyCols, mode = m)
            }
          }
          ()
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Streaming ingestion into an IVF index store — the vector twin of
    * [[bm25IndexStream]]: the first micro-batch builds the store
    * against the supplied centroids
    * ([[graft.similarity.Vectors.buildIvfIndex]]), every later batch
    * assigns to the STORED centroids and appends
    * ([[graft.similarity.Vectors.updateIvfIndex]]). Same checkpoint
    * contract as the BM25 stream: durable `checkpoint` → restartable;
    * without one, a replayed batch fails loudly on the overlap guard
    * instead of double-indexing.
    */
  def ivfIndexStream(vectors: DataFrame, centroids: DataFrame,
                     path: String,
                     checkpoint: Option[String] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.similarity.Vectors
    indexIngestStream(vectors, s"$path/lists", checkpoint)(
      build = b => Vectors.buildIvfIndex(b, centroids, path),
      update = b => Vectors.updateIvfIndex(b, path))
  }

  /** CDC-style maintenance stream for a persisted IVF index — the
    * vector twin of [[bm25IndexCdcStream]]: add codes fold into the
    * store (first build against `centroids`, then appends against the
    * STORED centroids), delete codes land tombstones
    * ([[graft.similarity.Vectors.deleteFromIvfIndex]] — serving
    * forgets the vectors immediately, physical removal at
    * compaction). Same contracts: adds before deletes per batch,
    * delete-for-unseen-id is the documented no-op, unknown/NULL ops
    * refuse, re-adding a tombstoned id surfaces update's refusal.
    */
  def ivfIndexCdcStream(vectors: DataFrame, centroids: DataFrame,
                        path: String, opCol: String = "op",
                        checkpoint: Option[String] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.similarity.Vectors
    val addOps = Set("a", "add", "i", "insert", "u", "upsert")
    val deleteOps = Set("d", "delete")
    val writer = vectors.writeStream
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          val opNorm = lower(col(opCol))
          val unknown = b.filter(opNorm.isNull ||
            !opNorm.isInCollection(addOps ++ deleteOps)).limit(1).collect()
          require(unknown.isEmpty,
            s"index cdc: unknown op code '${unknown.headOption.map(
              _.getAs[Any](opCol)).orNull}' - expected one of " +
              (addOps ++ deleteOps).toSeq.sorted.mkString(", "))
          val adds = b.filter(opNorm.isInCollection(addOps)).drop(opCol)
          val dels = b.filter(opNorm.isInCollection(deleteOps))
            .select(col("vec_id"))
          if (adds.limit(1).count() > 0L) {
            if (graft.io.Sinks.storeExists(b.sparkSession, s"$path/lists"))
              Vectors.updateIvfIndex(adds, path)
            else Vectors.buildIvfIndex(adds, centroids, path)
          }
          if (dels.limit(1).count() > 0L &&
              graft.io.Sinks.storeExists(b.sparkSession, s"$path/lists"))
            Vectors.deleteFromIvfIndex(b.sparkSession, path, dels)
          ()
        } finally { b.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** embeddings.parquet read schema for the streaming source. */
  private[graft] val EmbeddingsRawSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Streaming approximate distinct per key: one DataSketches HLL
    * sketch per key held as `mapGroupsWithState` state — bounded
    * memory forever (≤ ~2.5 KB/key at lgK=12, rse ≈ 1.6%/√m) where
    * exact streaming distinct would grow state with the value
    * cardinality. The same sketch family the batch store
    * (`Sinks.mergeDistinctSketch`) persists, so streaming state and
    * stored batch partials are mutually mergeable. Input:
    * `(key string, value long)`; output per update:
    * `(key, approx_distinct)`.
    */
  def distinctByKey(items: DataFrame): DataFrame = {
    import org.apache.datasketches.hll.HllSketch
    import org.apache.datasketches.memory.Memory
    val spark = items.sparkSession
    import spark.implicits._
    items.as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Double)](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val sk =
            if (state.exists) HllSketch.heapify(Memory.wrap(state.get))
            else new HllSketch(12)
          rows.foreach(r => sk.update(r._2))
          state.update(sk.toCompactByteArray)
          (key, sk.getEstimate)
      }
      .toDF("key", "approx_distinct")
  }

  /** Streaming CDC apply: versioned I/U/D change batches arriving as
    * a file stream fold into a keyed snapshot store via
    * [[graft.etl.Cdc.apply]] per micro-batch — the continuous-MERGE
    * ingestion shape. Each batch costs one bounded-heap latest-wins
    * pass over (store + batch); the store stays O(live keys).
    * `Cdc.apply` is version-ordered and idempotent, so a replayed
    * batch (restart without checkpoint cleanup) cannot corrupt the
    * store.
    */
  def cdcApplyStream(changes: DataFrame, storePath: String,
                     key: String): Unit = {
    consumeStagedBytes()
    val q = changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dataCols = batch.columns.filterNot(
          Seq("op", "version").contains)
        val base =
          if (graft.io.Sinks.storeExists(spark, storePath))
            spark.read.parquet(storePath)
          else batch.select(dataCols.map(col): _*).limit(0)
        graft.etl.Cdc.apply(base, batch, key)
          .localCheckpoint() // never write over the store being read
          .write.mode("overwrite").parquet(storePath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming heavy hitters: one Misra–Gries sketch per key kept as
    * `mapGroupsWithState` state — the streaming form of
    * [[graft.functions.HeavyHittersAgg]], which is mergeable precisely
    * so it can live here. State per key is bounded at 2k counters
    * forever (NoTimeout matches the reference's forever-tracked
    * processed-set posture); each micro-batch folds its items into the
    * sketch with the same reduce the batch UDAF uses, so the
    * order-independent retention guarantee (true freq > n/(k+1) ⇒
    * present) holds across any batch arrival order.
    *
    * Input: `(key string, item string)` columns. Output per update:
    * `(key, sketch map<string,long>)`.
    */
  def heavyHittersByKey(items: DataFrame, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val agg = new graft.functions.HeavyHittersAgg(k)
    items.select(col("key").cast("string"), col("item").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val next = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            case (acc, (_, item)) => agg.reduce(acc, item)
          }
          state.update(next)
          (key, next)
      }
      .toDF("key", "sketch")
  }

  /** Threshold-crossing alerts via flatMapGroupsWithState: zero or
    * many outputs per group per batch (mapGroupsWithState is locked to
    * exactly one) — emit a row each time a user's running event count
    * crosses a multiple of `every`. The state is one long per user;
    * a watermark-less NoTimeout state matches the reference's
    * forever-tracked processed-set semantics.
    */
  def countAlerts(events: DataFrame, every: Long = 10L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          // one alert per multiple of `every` crossed in this batch
          ((before / every + 1) to (after / every))
            .map(k => (user, k * every)).iterator
      }
      .toDF("user_id", "milestone")
  }

  /** Custom-state operator (T2/T3-style dedup-and-track semantics):
    * mapGroupsWithState keeping a running (count, maxCents) per user.
    * Exercised by the test suite; production streams would emit updates
    * per micro-batch.
    */
  def userStatsCustomState(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        round(col("value") * 100.0, 0).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long)]) =>
          val (n0, m0) = state.getOption.getOrElse((0L, Long.MinValue))
          var n = n0; var m = m0
          rows.foreach { case (_, c) => n += 1; if (c > m) m = c }
          state.update((n, m))
          (user, n, m)
      }
      .toDF("user_id", "n", "max_cents")
  }
}
