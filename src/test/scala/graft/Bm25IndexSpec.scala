package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** The persisted BM25 index must serve the exact results of the
  * corpus-scan path, and serving must prune postings partitions to the
  * query terms' hash buckets instead of scanning the store.
  */
class Bm25IndexSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "hash join merge sort"),
    (2L, "merge sort window"),
    (3L, "hash hash hash join"),
    (4L, "scan filter project scan"),
    (5L, "window order rank")).toDF("doc_id", "text")

  private def queries = Seq(
    (0L, "hash join"), (1L, "window sort sort")).toDF("query_id", "qtext")

  test("indexed serving equals the corpus-scan path bit-for-bit") {
    val idx = Files.createTempDirectory("bm25idx").toString
    TextAnalysis.buildBm25Index(corpus, idx, pbuckets = 16)
    val scan = TextAnalysis.bm25TopK(corpus, queries, 3)
    val served = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
    assert(served.exceptAll(scan).count() === 0)
    assert(scan.exceptAll(served).count() === 0)
    assert(served.count() > 0)
  }

  test("serving reads only the query terms' postings buckets") {
    val idx = Files.createTempDirectory("bm25idx_p").toString
    TextAnalysis.buildBm25Index(corpus, idx, pbuckets = 16)
    // distinct buckets the two queries' 5 distinct words can hash to —
    // at most 5 of 16; a full-store scan would read every non-empty one
    val served = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
    val filter = "PartitionFilters: \\[[^\\]]*pb[^\\]]*\\]".r
      .findFirstIn(plan)
    assert(filter.isDefined,
      s"expected a static pb partition filter on the postings scan:\n$plan")
    // the filter must list EXACTLY the query terms' buckets — not all
    // 16, and not some wrong hash's buckets
    val want = Seq("hash", "join", "window", "sort")
      .map(w => TextAnalysis.hash60Jvm(w) % 16).distinct.sorted
    // parse the IN-list literals only (pb#<exprId> would pollute a
    // bare digit scan): "pb#123L IN (3,7,12)" → 3,7,12
    val inList = "pb#\\d+L? IN(?:SET)? ?\\(([^)]*)\\)".r
      .findFirstMatchIn(filter.get).map(_.group(1))
      .getOrElse(fail(s"no IN-list in partition filter: ${filter.get}"))
    val got = "\\d+".r.findAllIn(inList).map(_.toLong).toSeq
      .distinct.sorted
    assert(got === want,
      s"pb filter literals ${got.mkString(",")} != expected buckets " +
        s"${want.mkString(",")} in: ${filter.get}")
  }

  test("serving reads ONLY store tables - no corpus path in the plan") {
    val idx = Files.createTempDirectory("bm25idx_np").toString
    TextAnalysis.buildBm25Index(corpus, idx, pbuckets = 16)
    val served = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
    served.collect()
    // long TMPDIRs would otherwise truncate the path out of the plan
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    val scans = "Location: [^,\\]]+".r
      .findAllIn(served.queryExecution.executedPlan.toString).toSeq
    assert(scans.nonEmpty)
    scans.foreach(loc => assert(loc.contains("bm25idx_np"),
      s"serving plan scans a non-store location: $loc"))
  }

  test("hash60Jvm matches the Column expression") {
    val words = Seq("hash", "join", "window", "", "ünïcode £5")
    val viaCol = words.toDF("w")
      .select(TextAnalysis.hash60(col("w"))).collect().map(_.getLong(0))
    assert(viaCol.toSeq === words.map(TextAnalysis.hash60Jvm))
  }

  test("incremental update equals a single-pass build; duplicate " +
    "batches refuse; empty batches are no-ops") {
    import org.apache.spark.sql.functions.col
    val full = Files.createTempDirectory("bm25idx_f").toString
    TextAnalysis.buildBm25Index(corpus, full, pbuckets = 16)
    val inc = Files.createTempDirectory("bm25idx_i").toString
    TextAnalysis.buildBm25Index(
      corpus.filter(col("doc_id") <= 2), inc, pbuckets = 16)
    TextAnalysis.updateBm25Index(corpus.filter(col("doc_id") > 2), inc)
    val a = TextAnalysis.bm25TopKIndexed(spark, full, queries, 3)
    val b = TextAnalysis.bm25TopKIndexed(spark, inc, queries, 3)
    assert(b.exceptAll(a).count() === 0)
    assert(a.exceptAll(b).count() === 0)
    // re-appending an already-indexed doc would corrupt tf/df
    val e = intercept[IllegalArgumentException](
      TextAnalysis.updateBm25Index(corpus.filter(col("doc_id") === 1), inc))
    assert(e.getMessage.contains("already indexed"))
    // a doc_id repeated WITHIN the batch would double postings too
    val e2 = intercept[IllegalArgumentException](
      TextAnalysis.updateBm25Index(
        Seq((100L, "dup a"), (100L, "dup b")).toDF("doc_id", "text"), inc))
    assert(e2.getMessage.contains("within itself"))
    // empty batch: stats unchanged, serving unchanged (BOTH directions
    // — a subset result must fail too)
    TextAnalysis.updateBm25Index(corpus.filter(col("doc_id") > 99), inc)
    val c = TextAnalysis.bm25TopKIndexed(spark, inc, queries, 3)
    assert(c.exceptAll(a).count() === 0)
    assert(a.exceptAll(c).count() === 0)
  }

  test("compaction collapses appended buckets to one file each and " +
    "changes nothing else") {
    import org.apache.spark.sql.functions.col
    val idx = Files.createTempDirectory("bm25idx_c").toString
    TextAnalysis.buildBm25Index(
      corpus.filter(col("doc_id") <= 2), idx, pbuckets = 16)
    TextAnalysis.updateBm25Index(corpus.filter(col("doc_id") === 3), idx)
    TextAnalysis.updateBm25Index(corpus.filter(col("doc_id") === 4), idx)
    val before = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
      .collect().toSeq
    TextAnalysis.compactBm25Index(spark, idx)
    val after = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
      .collect().toSeq
    assert(after.toSet === before.toSet)
    // every bucket dir holds exactly one parquet file after compaction
    val buckets = new java.io.File(s"$idx/postings").listFiles()
      .filter(_.getName.startsWith("pb="))
    assert(buckets.nonEmpty)
    for (b <- buckets) {
      val parts = b.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1,
        s"bucket ${b.getName} has ${parts.length} files after compaction")
    }
    assert(!new java.io.File(s"$idx/_postings_compact").exists())
    assert(!new java.io.File(s"$idx/_postings_old").exists())
    // doclens accumulated one file per update batch; compaction
    // rewrites it too (bounded by the shuffle-partition count)
    val dlParts = new java.io.File(s"$idx/doclens").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(dlParts >= 1 && dlParts <= 4,
      s"doclens has $dlParts files after compaction")
  }

  test("tombstone deletes: idempotent, stats-exact, physically removed " +
    "at compaction, then re-addable") {
    import org.apache.spark.sql.functions.col
    val idx = Files.createTempDirectory("bm25idx_d").toString
    TextAnalysis.buildBm25Index(corpus, idx, pbuckets = 16)
    val truth = {
      val surv = Files.createTempDirectory("bm25idx_dt").toString
      TextAnalysis.buildBm25Index(
        corpus.filter(col("doc_id") =!= 3L), surv, pbuckets = 16)
      TextAnalysis.bm25TopKIndexed(spark, surv, queries, 3)
        .collect().toSet
    }
    val ids = Seq(3L).toDF("doc_id")
    TextAnalysis.deleteFromBm25Index(spark, idx, ids)
    // repeated + absent-id deletes must not double-subtract stats
    TextAnalysis.deleteFromBm25Index(spark, idx, ids)
    TextAnalysis.deleteFromBm25Index(spark, idx, Seq(999L).toDF("doc_id"))
    assert(TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
      .collect().toSet === truth, "served ≡ an index never holding doc 3")
    // compaction applies tombstones physically and clears them
    TextAnalysis.compactBm25Index(spark, idx)
    assert(!new java.io.File(s"$idx/deletes").exists())
    assert(spark.read.parquet(s"$idx/doclens")
      .filter(col("doc_id") === 3L).count() === 0)
    assert(TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
      .collect().toSet === truth)
    // a deleted-then-compacted id is new again
    TextAnalysis.updateBm25Index(
      corpus.filter(col("doc_id") === 3L), idx)
    val back = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
    val orig = TextAnalysis.bm25TopKIndexed(spark,
      { val f = Files.createTempDirectory("bm25idx_db").toString
        TextAnalysis.buildBm25Index(corpus, f, pbuckets = 16); f },
      queries, 3)
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
  }

  test("streaming ingestion folds per-file micro-batches into the " +
    "store: first builds, later ones append") {
    import org.apache.spark.sql.functions.col
    val staged = Files.createTempDirectory("bm25_stream_docs")
    Seq((col("doc_id") <= 2, "a"), (col("doc_id") > 2, "b"))
      .foreach { case (pred, name) =>
        val tmp = s"$staged/_$name"
        corpus.filter(pred)
          .select(col("doc_id"), col("text"),
            org.apache.spark.sql.functions.lit("en").as("lang"),
            org.apache.spark.sql.functions.lit("s").as("source"),
            org.apache.spark.sql.functions.length(col("text"))
              .cast("long").as("n_chars"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath,
          java.nio.file.Paths.get(s"$staged/$name.parquet"))
      }
    val idx = Files.createTempDirectory("bm25_stream_idx").toString
    val q = graft.streaming.Streams.bm25IndexStream(
      graft.streaming.Streams.fileStream(spark, staged.toString,
        graft.streaming.Streams.DocsRawSchema,
        maxFilesPerTrigger = Some(1)),
      idx, pbuckets = 16)
    // both files consumed, in separate micro-batches — so the update
    // (append) path genuinely ran, not one big build
    assert(q.recentProgress.count(_.numInputRows > 0) === 2,
      "expected exactly two non-empty micro-batches")
    val scan = TextAnalysis.bm25TopK(corpus, queries, 3)
    val served = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
    assert(served.exceptAll(scan).count() === 0)
    assert(scan.exceptAll(served).count() === 0)
  }

  test("compaction recovers from a crash that left the live dir " +
    "moved aside") {
    import org.apache.spark.sql.functions.col
    val idx = Files.createTempDirectory("bm25idx_r").toString
    TextAnalysis.buildBm25Index(corpus, idx, pbuckets = 16)
    val before = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
      .collect().toSeq
    // simulate the mid-swap crash: previous layout moved aside, the
    // compacted one never activated
    assert(new java.io.File(s"$idx/postings")
      .renameTo(new java.io.File(s"$idx/_postings_old")))
    TextAnalysis.compactBm25Index(spark, idx)
    val after = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
      .collect().toSeq
    assert(after.toSet === before.toSet)
    assert(new java.io.File(s"$idx/postings").exists())
    assert(!new java.io.File(s"$idx/_postings_old").exists())
  }

  test("an index built with one pbuckets serves under another stats row") {
    // pbuckets travels in stats/ — serving re-derives pb with the
    // STORED count, so a rebuilt index with a different bucket count
    // needs no code change
    val idx = Files.createTempDirectory("bm25idx_b").toString
    TextAnalysis.buildBm25Index(corpus, idx, pbuckets = 3)
    val scan = TextAnalysis.bm25TopK(corpus, queries, 3)
    val served = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 3)
    assert(served.exceptAll(scan).count() === 0)
    assert(scan.exceptAll(served).count() === 0)
  }

  test("CDC stream: adds apply before deletes within a batch; unknown op refuses") {
    import graft.streaming.Streams
    val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType)))
    // ONE batch that both adds the corpus and tombstones doc 3: the
    // documented order (adds first, then deletes) must leave doc 3
    // indexed-then-tombstoned, i.e. absent from serving
    val idx = Files.createTempDirectory("bm25idx_cdc").toString
    val staged = graft.io.Scratch.dir("graft_bm25_cdc_")
    graft.io.Scratch.stageSingleParquetFile(
      corpus.withColumn("op", lit("a"))
        .unionByName(corpus.filter(col("doc_id") === 3L)
          .withColumn("op", lit("d"))),
      staged, "batch.parquet")
    Streams.bm25IndexCdcStream(
      Streams.fileStream(spark, staged.toString, cdcSchema), idx)
    val served = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 5)
    val scan = TextAnalysis.bm25TopK(
      corpus.filter(col("doc_id") =!= 3L), queries, 5)
    assert(served.exceptAll(scan).count() === 0)
    assert(scan.exceptAll(served).count() === 0)
    assert(served.filter(col("doc_id") === 3L).count() === 0)
    // a delete for an id the index never saw is the documented no-op
    val staged2 = graft.io.Scratch.dir("graft_bm25_cdc2_")
    graft.io.Scratch.stageSingleParquetFile(
      corpus.limit(1).select(lit(999L).as("doc_id"), col("text"))
        .withColumn("op", lit("d")),
      staged2, "del.parquet")
    Streams.bm25IndexCdcStream(
      Streams.fileStream(spark, staged2.toString, cdcSchema), idx)
    val again = TextAnalysis.bm25TopKIndexed(spark, idx, queries, 5)
    assert(again.exceptAll(scan).count() === 0)
    // unknown (and NULL) op codes refuse loudly
    val badStaged = graft.io.Scratch.dir("graft_bm25_cdc_bad_")
    graft.io.Scratch.stageSingleParquetFile(
      corpus.limit(1).withColumn("op", lit("zap")), badStaged, "b.parquet")
    val e = intercept[Exception] {
      Streams.bm25IndexCdcStream(
        Streams.fileStream(spark, badStaged.toString, cdcSchema),
        Files.createTempDirectory("bm25idx_cdc_bad").toString)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("unknown op")), e.toString)
  }
}
