package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Readers and sinks re-expressing the reference's IO surface
  * (SURVEY.md §2.1) in Spark's partition-directory idiom:
  *
  *  - S1/S2: permissive all-string CSV scan + column-wise coercion
  *    (never `inferSchema`; the reference's semantics are "strings
  *    first, null-on-error coercion")
  *  - S5: splitter via `maxRecordsPerFile` (no custom chunking code)
  *  - S9: snappy parquet sink (Spark default codec)
  *  - S10/A1/A2: partitioned append/overwrite sinks — directory-per-key
  *    replaces the reference's append-to-single-file
  *  - S11: monthly merge + dedup — union + dropDuplicates + dynamic
  *    partition overwrite
  *  - T4: idempotent month rerun via dynamic partition overwrite (only
  *    the partitions present in the new data are replaced)
  */
object Sinks {

  /** The reference's `errors='coerce'` semantics: malformed values
    * become null instead of failing the job (Spark 4 ANSI mode would
    * throw on a plain cast).
    */
  def coerce(c: org.apache.spark.sql.Column, to: String):
      org.apache.spark.sql.Column = c.try_cast(to)

  /** S1/S2 — conte-etl-step-2-processor.py:1196-1302: read CSV with an
    * explicit all-StringType schema, PERMISSIVE mode; caller casts
    * (via [[coerce]] for null-on-error columns).
    */
  def readCsvAllString(spark: SparkSession, path: String,
                       columns: Seq[String]): DataFrame =
    spark.read
      .schema(StructType(columns.map(StructField(_, StringType,
        nullable = true))))
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("encoding", "ISO-8859-1") // S1: latin1 accepts any byte
      .csv(path)

  /** S5 — utils/split_parquet_files_to_smaller_files.py:47-143: bound
    * output file size by record count; Spark does the chunking.
    */
  def writeParquetSplit(df: DataFrame, path: String,
                        maxRecordsPerFile: Long): Unit =
    df.write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)

  /** S9/S10/A1/A2 + T4 — partitioned sink with dynamic overwrite:
    * rerunning a month replaces exactly that month's partitions
    * (conte-etl-step-2-processor.py:363-368's skip-if-exists, made
    * idempotent instead of skipped).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       format: String = "parquet"): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .format(format) // reference's daily sinks are CSV (S10); parquet default
      .option("header", "true")
      .save(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Range-clustered layout sink: globally range-partition on
    * `keys` (one skew-aware sampled exchange), sort within each
    * partition, and write one file per range. Downstream effect at
    * 100 TB: every file covers a disjoint key range, so parquet
    * min/max statistics prune whole files for key-range predicates,
    * and merge/as-of readers see locally sorted runs — the poor-man's
    * Z-order for the 1-D case. Content is unchanged (layout-only).
    */
  def writeRangeLayout(df: DataFrame, path: String, keys: Seq[String],
                       numPartitions: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numPartitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction (the splitter's inverse): rewrite a store
    * into files of ~`targetRecordsPerFile` rows. Streaming and
    * per-partition-overwrite sinks accrete small files; at 100 TB the
    * resulting per-file open/seek overhead and NameNode/listing
    * pressure dominate scan cost, so periodic bin-packing rewrites
    * are standard table maintenance (Delta OPTIMIZE / Iceberg
    * rewrite_data_files). Content is unchanged; the result is
    * localCheckpoint'ed before overwriting the directory being read.
    * Returns the rewritten file count.
    */
  def compact(spark: SparkSession, path: String,
              targetRecordsPerFile: Long): Int = {
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRecordsPerFile)
      .toInt)
    df.repartition(files).localCheckpoint()
      .write.mode("overwrite").parquet(path)
    files
  }

  /** Z-order key: min-max-normalize two numeric columns to 16-bit
    * grids and bit-interleave them into one 32-bit locality key.
    * Nearby (a, b) points get nearby z values, so sorting by z
    * clusters BOTH dimensions at once. Pure integer/bit built-ins
    * after two exact double ops — engine-portable and codegen'd.
    */
  def zOrderKey(a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column,
                amin: org.apache.spark.sql.Column,
                amax: org.apache.spark.sql.Column,
                bmin: org.apache.spark.sql.Column,
                bmax: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    zOrderKeyN(Seq(a, b), Seq(amin, bmin), Seq(amax, bmax))

  /** N-dimensional z-key (2 ≤ d ≤ 4 dimensions): each column
    * normalizes against its global min/max, then the bits interleave
    * round-robin (bit i of dimension j lands at position d·i + j —
    * the d = 2 case reproduces the original 2-D key exactly), so
    * files cover compact hyper-rectangles of the key space and
    * per-file min/max stats prune selective scans on ANY clustered
    * dimension. 16 bits per dimension at d ≤ 3; d = 4 drops to 15
    * bits so the top interleaved bit (d·(bits−1)+d−1 = 63 at 16
    * bits) never lands on the LONG SIGN BIT — a signed key would
    * sort half the key space before the other half and split the
    * curve at the wrong point. Past 4 dimensions the curve's
    * locality decays to uselessness anyway, so the arity is a
    * refusal, not a truncation. */
  def zOrderKeyN(cols: Seq[org.apache.spark.sql.Column],
                 mins: Seq[org.apache.spark.sql.Column],
                 maxs: Seq[org.apache.spark.sql.Column]):
      org.apache.spark.sql.Column = {
    val d = cols.size
    require(d >= 2 && d <= 4,
      s"zOrderKeyN takes two to four dimensions, got $d")
    require(mins.size == d && maxs.size == d,
      "zOrderKeyN: one min and one max per dimension")
    val bits = if (d == 4) 15 else 16
    val scale = ((1L << bits) - 1).toDouble
    def norm(x: org.apache.spark.sql.Column,
             mn: org.apache.spark.sql.Column,
             mx: org.apache.spark.sql.Column) =
      when(mx > mn,
        floor((x.cast("double") - mn.cast("double")) * scale /
          (mx.cast("double") - mn.cast("double")) + 0.5).cast("long"))
        .otherwise(lit(0L))
    val ns = cols.indices.map(j => norm(cols(j), mins(j), maxs(j)))
    (0 until bits).flatMap(i => ns.zipWithIndex.map { case (n, j) =>
      shiftleft(shiftright(n, i).bitwiseAND(lit(1L)), d * i + j)
    }).reduce(_ + _)
  }

  /** Z-order clustered layout sink: compute [[zOrderKey]] over two
    * key columns (global min/max from one broadcast 1-row aggregate),
    * range-partition + sort by it, write one file per range. The 2-D
    * upgrade of [[writeRangeLayout]]: every file covers a compact
    * rectangle-ish region of (keyA, keyB) space, so parquet min/max
    * stats prune files for predicates on EITHER dimension — the
    * standard lakehouse layout trick (Delta/Iceberg `ZORDER BY`) for
    * 100 TB tables queried along more than one axis. The `z` column
    * is kept in the output for audit/re-clustering.
    */
  def writeZOrderLayout(df: DataFrame, path: String, keyA: String,
                        keyB: String, numPartitions: Int): Unit = {
    val mm = df.agg(
      min(col(keyA)).as("__amin"), max(col(keyA)).as("__amax"),
      min(col(keyB)).as("__bmin"), max(col(keyB)).as("__bmax"))
    df.crossJoin(broadcast(mm))
      .withColumn("z", zOrderKey(col(keyA), col(keyB), col("__amin"),
        col("__amax"), col("__bmin"), col("__bmax")))
      .drop("__amin", "__amax", "__bmin", "__bmax")
      .repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)
  }

  /** Scheme-agnostic store-existence check through the Hadoop
    * FileSystem API. `java.io.File` is local-FS-only: on `hdfs://` or
    * `s3a://` it is always false, which would silently turn every
    * S11 merge into an overwrite of the touched partitions.
    */
  private[graft] def storeExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** A store sub-table that may not exist yet (tombstone tables):
    * None until the first write creates it. One accessor so every
    * consumer (serve anti-joins, overlap guards, compaction) reads
    * the same layout the same way.
    */
  private[graft] def optionalTable(spark: SparkSession,
                                   path: String): Option[DataFrame] =
    if (storeExists(spark, path)) Some(spark.read.parquet(path))
    else None

  /** Rewrite-and-swap a store sub-table: `write(live, tmp)` produces
    * the replacement under `_<table>_compact`, then two renames
    * activate it. Crash-safe in the store-compaction sense shared by
    * every engine store (BM25 postings/doclens, IVF lists): a crashed
    * prior swap — `_<table>_old` present without the live dir — is
    * DETECTED and rolled back before compacting; stale scratch is
    * cleared so a rename can never nest into it; and a failed
    * activation rename restores the previous layout in place.
    */
  private[graft] def swapInRewrite(spark: SparkSession, base: String,
                                   table: String)(
      write: (String, String) => Unit): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val live = s"$base/$table"
    val tmp = s"$base/_${table}_compact"
    val old = s"$base/_${table}_old"
    if (!fs.exists(p(live)) && fs.exists(p(old)))
      require(fs.rename(p(old), p(live)),
        s"swapInRewrite: cannot restore $live from crashed run")
    fs.delete(p(tmp), true)
    fs.delete(p(old), true)
    write(live, tmp)
    require(fs.rename(p(live), p(old)),
      s"swapInRewrite: cannot move aside $live")
    if (!fs.rename(p(tmp), p(live))) {
      fs.rename(p(old), p(live))
      throw new IllegalStateException(
        s"swapInRewrite: cannot activate compacted $table - " +
          "previous layout restored")
    }
    fs.delete(p(old), true)
    ()
  }

  /** S8 — utils/s3.py:35-93: the reference hand-rolls boto3 list/get/put
    * with retry + backoff. On Spark the s3a connector owns that loop;
    * this helper centralizes the equivalent tuning as documented Hadoop
    * confs so every reader/sink in this module works on `s3a://` URIs
    * unchanged. No credentials in code — the default provider chain
    * (env/instance role) supplies them.
    */
  def s3aConf(spark: SparkSession,
              endpoint: Option[String] = None,
              maxRetries: Int = 5,
              connectionTimeoutMs: Int = 60000): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    endpoint.foreach(c.set("fs.s3a.endpoint", _))
    c.set("fs.s3a.attempts.maximum", maxRetries.toString)     // list/get/put retries
    c.set("fs.s3a.retry.limit", maxRetries.toString)          // throttle retries
    c.set("fs.s3a.connection.timeout", connectionTimeoutMs.toString)
    c.set("fs.s3a.connection.maximum", "64")                  // parallel part uploads
    c.set("fs.s3a.directory.marker.retention", "keep")        // avoid delete storms
  }

  /** Incremental aggregate-store maintenance (materialized-view
    * update): fold a new batch's partial aggregate into a persistent
    * per-key store by summing the stored partials with the batch's.
    * The store schema is `keys ++ value columns`, every value column
    * an algebraic partial (counts, sums — averages/rates derive at
    * read time from their parts). This is the update rule that makes
    * a 100 TB history affordable: each batch costs O(batch + keys),
    * never O(history), and the store stays O(distinct keys). The
    * merged result is localCheckpoint'ed before the overwrite so the
    * write never reads the directory it is replacing.
    */
  def mergeAggregate(spark: SparkSession, batchAgg: DataFrame,
                     path: String, keys: Seq[String]): Unit = {
    val valueCols = batchAgg.columns.filterNot(keys.contains)
    val merged =
      if (storeExists(spark, path)) {
        val aggs = valueCols.map(c => sum(col(c)).as(c))
        spark.read.parquet(path).unionByName(batchAgg)
          .groupBy(keys.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
          .localCheckpoint()
      } else batchAgg
    merged.write.mode("overwrite").parquet(path)
  }

  /** Incremental DISTINCT-COUNT store — the non-algebraic cousin of
    * [[mergeAggregate]]. `count(DISTINCT x)` cannot be folded from
    * stored partial counts, so the store keeps one mergeable
    * DataSketches HLL sketch per key (a few KB each) and each batch
    * unions its sketch in: O(batch + keys) per batch, never
    * O(history), and re-aggregation across keys stays possible
    * ([[distinctEstimate]] can union sketches upward to any coarser
    * grain — the property a stored exact count loses).
    */
  def mergeDistinctSketch(spark: SparkSession, batch: DataFrame,
                          path: String, keys: Seq[String],
                          valueCol: String): Unit = {
    val kc = keys.map(col)
    val batchSk = batch.groupBy(kc: _*)
      .agg(hll_sketch_agg(col(valueCol)).as("hll"))
    val merged =
      if (storeExists(spark, path)) {
        spark.read.parquet(path).unionByName(batchSk)
          .groupBy(kc: _*)
          .agg(hll_union_agg(col("hll")).as("hll"))
          .localCheckpoint()
      } else batchSk
    merged.write.mode("overwrite").parquet(path)
  }

  /** Per-key distinct estimates from a [[mergeDistinctSketch]] store,
    * plus optional roll-up: pass a key subset to union sketches up to
    * the coarser grain before estimating.
    */
  def distinctEstimate(store: DataFrame, keys: Seq[String]): DataFrame =
    store.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
        .as("approx_distinct"))

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** KLL quantile-sketch aggregate over a double column — the
    * quantile member of the sketch family (Spark ships HLL natively
    * but no KLL; [[graft.plans.KllSketchAgg]] is the same
    * TypedImperativeAggregate shape Spark's own sketch aggs use).
    */
  def kllSketchAgg(c: Column, k: Int = 200): Column =
    Bridge.column(graft.plans.KllSketchAgg(Bridge.expression(c), k)
      .toAggregateExpression())

  /** Union stored KLL sketches (binary column). */
  def kllMergeAgg(c: Column): Column =
    Bridge.column(graft.plans.KllMergeAgg(Bridge.expression(c))
      .toAggregateExpression())

  /** Quantile at `prob` from a serialized KLL sketch. */
  def kllQuantile(c: Column, prob: Double): Column =
    Bridge.column(graft.plans.KllQuantileExpr(Bridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(prob)))

  /** Theta sketch aggregate over a long/double/string column — the
    * SET-OPERATION member of the sketch family (intersections, which
    * HLL cannot do).
    */
  def thetaSketchAgg(c: Column, lgK: Int = 12): Column =
    Bridge.column(graft.plans.ThetaSketchAgg(Bridge.expression(c), lgK)
      .toAggregateExpression())

  /** Union stored theta sketches (binary column). */
  def thetaUnionAgg(c: Column): Column =
    Bridge.column(graft.plans.ThetaUnionAgg(Bridge.expression(c))
      .toAggregateExpression())

  /** Intersect stored theta sketches across the group's rows. */
  def thetaIntersectAgg(c: Column): Column =
    Bridge.column(graft.plans.ThetaIntersectAgg(Bridge.expression(c))
      .toAggregateExpression())

  /** Distinct-count estimate of a serialized theta sketch. */
  def thetaEstimate(c: Column): Column =
    Bridge.column(graft.plans.ThetaEstimateExpr(Bridge.expression(c)))

  /** Incremental SET store — theta sketches per key, folded in per
    * batch like the HLL/KLL stores, but supporting INTERSECTION at
    * read time ([[setIntersectEstimate]]): "users in BOTH segments",
    * "corpus overlap across shards" — answered from ~KB sketches
    * with no raw-set join, at any grain.
    */
  def mergeSetSketch(spark: SparkSession, batch: DataFrame,
                     path: String, keys: Seq[String],
                     valueCol: String, lgK: Int = 12): Unit = {
    val kc = keys.map(col)
    val batchSk = batch.groupBy(kc: _*)
      .agg(thetaSketchAgg(col(valueCol), lgK).as("theta"))
    val merged =
      if (storeExists(spark, path)) {
        spark.read.parquet(path).unionByName(batchSk)
          .groupBy(kc: _*)
          .agg(thetaUnionAgg(col("theta")).as("theta"))
          .localCheckpoint()
      } else batchSk
    merged.write.mode("overwrite").parquet(path)
  }

  /** Per-key distinct estimates from a [[mergeSetSketch]] store
    * (union roll-up to any coarser grain, as [[distinctEstimate]]).
    */
  def setEstimate(store: DataFrame, keys: Seq[String]): DataFrame =
    store.groupBy(keys.map(col): _*)
      .agg(thetaEstimate(thetaUnionAgg(col("theta")))
        .as("approx_distinct"))

  /** The estimated size of the INTERSECTION of every selected key's
    * set — filter the store to the segments of interest first
    * (`store.filter(col("k").isin(...))`); one row, one double.
    */
  def setIntersectEstimate(store: DataFrame): DataFrame =
    store.agg(thetaEstimate(thetaIntersectAgg(col("theta")))
      .as("approx_overlap"))

  /** A-not-B on two serialized sketches (Column form): difference
    * sketch, estimable via [[thetaEstimate]] — "in segment A but
    * never in B".
    */
  def thetaAnotB(a: Column, b: Column): Column =
    Bridge.column(graft.plans.ThetaAnotBExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** The estimated size of A \\ B between two segments of a
    * [[mergeSetSketch]] store (each side union-rolled first).
    */
  def setDifferenceEstimate(storeA: DataFrame,
                            storeB: DataFrame): DataFrame = {
    val a = storeA.agg(thetaUnionAgg(col("theta")).as("ta"))
    val b = storeB.agg(thetaUnionAgg(col("theta")).as("tb"))
    a.crossJoin(b).select(
      thetaEstimate(thetaAnotB(col("ta"), col("tb")))
        .as("approx_difference"))
  }

  /** Incremental FREQUENT-ITEMS store — the Misra–Gries member of
    * the sketch family: per-key item sketches (≤ 2k counters each,
    * whatever the item cardinality) folded in per batch via
    * [[graft.functions.HeavyHittersMergeAgg]]. The n/(k+1) retention
    * guarantee composes across batches: any item with true total
    * frequency > n/(k+1) is present in the stored sketch however the
    * history arrived. Serve by sketch MEMBERSHIP (+ exact-side counts
    * where needed) — stored counts are merge-order-dependent, the
    * documented [[graft.functions.HeavyHittersAgg]] contract.
    */
  def mergeHeavyHittersSketch(spark: SparkSession, batch: DataFrame,
                              path: String, keys: Seq[String],
                              itemCol: String, k: Int = 500): Unit = {
    val kc = keys.map(col)
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.HeavyHittersAgg(k),
      org.apache.spark.sql.Encoders.STRING)
    val mgMerge = org.apache.spark.sql.functions.udaf(
      new graft.functions.HeavyHittersMergeAgg(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]())
    val batchSk = batch.groupBy(kc: _*)
      .agg(mg(col(itemCol).cast("string")).as("mg"))
    val merged =
      if (storeExists(spark, path)) {
        spark.read.parquet(path).unionByName(batchSk)
          .groupBy(kc: _*)
          .agg(mgMerge(col("mg")).as("mg"))
          .localCheckpoint()
      } else batchSk
    merged.write.mode("overwrite").parquet(path)
  }

  /** Incremental QUANTILE store — the third mergeable sketch store
    * next to [[mergeAggregate]] (exact counts/sums) and
    * [[mergeDistinctSketch]] (HLL distincts): one ~3 KB KLL sketch
    * per key, folded in per batch, re-aggregable to any coarser
    * grain ([[quantileEstimate]] with a key subset) — the stored
    * exact percentile can do neither. Rank error ≤ ~1.65% at k=200
    * regardless of history size; each merge costs O(batch + keys),
    * never O(history).
    */
  def mergeQuantileSketch(spark: SparkSession, batch: DataFrame,
                          path: String, keys: Seq[String],
                          valueCol: String, k: Int = 200): Unit = {
    val kc = keys.map(col)
    val batchSk = batch.groupBy(kc: _*)
      .agg(kllSketchAgg(col(valueCol).cast("double"), k).as("kll"))
    val merged =
      if (storeExists(spark, path)) {
        spark.read.parquet(path).unionByName(batchSk)
          .groupBy(kc: _*)
          .agg(kllMergeAgg(col("kll")).as("kll"))
          .localCheckpoint()
      } else batchSk
    merged.write.mode("overwrite").parquet(path)
  }

  /** Per-key quantile estimates from a [[mergeQuantileSketch]] store
    * at the given probabilities (columns `q<percent>`), with the
    * same roll-up contract as [[distinctEstimate]].
    */
  def quantileEstimate(store: DataFrame, keys: Seq[String],
                       probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"quantileEstimate probs must sit in [0, 1]: ${probs.mkString(",")}")
    store.groupBy(keys.map(col): _*)
      .agg(kllMergeAgg(col("kll")).as("kll"))
      .select(keys.map(col) ++ probs.map(p =>
        kllQuantile(col("kll"), p)
          .as(s"q${math.round(p * 100)}")): _*)
  }

  /** S11 — transform_conte_ts_data.py:1032-1049: merge new rows into an
    * existing monthly store with dedup. Union + dropDuplicates + dynamic
    * partition overwrite of only the touched months. Works on any
    * Hadoop-supported URI scheme (file/hdfs/s3a) — see [[storeExists]].
    */
  def mergeDedup(spark: SparkSession, incoming: DataFrame, path: String,
                 partitionCol: String): Unit = {
    val merged =
      if (storeExists(spark, path)) {
        val existing = spark.read.parquet(path)
        // only months present in the incoming batch are rewritten;
        // restrict the union to those partitions (partition pruning
        // keeps the read cheap at scale)
        val touched = incoming.select(partitionCol).distinct()
        existing.join(broadcast(touched), Seq(partitionCol), "left_semi")
          .unionByName(incoming).dropDuplicates()
      } else incoming.dropDuplicates()
    writePartitioned(merged, path, Seq(partitionCol))
  }
}
