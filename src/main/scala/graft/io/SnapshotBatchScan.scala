package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => VExpression}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.graft.ScanBridge
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** STORAGE-PARTITIONED JOINS for bucket-partitioned snapshot tables
  * (SPARK-37375, the Iceberg/Delta answer to "join two 100 TB tables
  * without shuffling either"): a DSv2 batch scan that reports the
  * table's hidden `bucket(n, col)` layout as a connector
  * `KeyGroupedPartitioning`, one input partition per bucket
  * directory, each carrying its bucket number as the partition key.
  * When BOTH join sides are graft tables bucketed the same way on
  * the join key (and `spark.sql.sources.v2.bucketing.enabled` is
  * on), Spark's `EnsureRequirements` matches the two
  * `KeyGroupedShuffleSpec`s — same canonical bucket function, same
  * bucket count — and plans the join with ZERO `Exchange` nodes:
  * bucket k of the left reads against bucket k of the right, the
  * write-time layout IS the join distribution. At 100 TB the
  * eliminated shuffle is the whole cost of the join.
  *
  * The scan itself stays exact-by-construction:
  *   - column pruning lands in the parquet reader's requiredSchema
  *     (physical names via the column mapping);
  *   - every filter is reported back as post-scan, so pushdown is
  *     IO-only — the parquet row-group pruning and the manifest-level
  *     bucket point-lookup ([[Snapshots.prunedEntriesEquals]], the
  *     same helper `readEquals` uses) can never change answers;
  *   - files are read through the SAME `ParquetFileFormat` closure
  *     `FileSourceScanExec` ships (vectorized, type-promoting, via
  *     [[org.apache.spark.sql.graft.ScanBridge]]), so widened
  *     schemas and rebase rules behave identically to every other
  *     read path.
  *
  * [[GraftCatalog.GraftTable.newScanBuilder]] routes here only for
  * bucket-only partition specs with no live delete files and the v2
  * bucketing flag on; everything else keeps the V1 fallback path.
  */
object SnapshotBatchScan {

  /** Collect top-level / AND-nested equality filters — the shapes the
    * manifest bucket lookup can prune on EXACTLY. An `EqualTo` under
    * an OR must not prune (the other branch may keep the file).
    */
  private[io] def conjunctiveEquals(fs: Seq[Filter])
      : Seq[(String, Any)] = fs.flatMap {
    case sources.EqualTo(a, v) if v != null => Seq(a -> v)
    case sources.And(l, r) => conjunctiveEquals(Seq(l, r))
    case _ => Nil
  }

  /** Rename a filter's attributes logical → physical for the parquet
    * reader (row-group pruning reads physical column names). Filters
    * that do not fully translate are dropped — Spark re-applies every
    * filter above the scan, so this is IO-only.
    */
  private[io] def toPhysicalFilter(p: Map[String, String])(f: Filter)
      : Option[Filter] = {
    def n(a: String): String = p.getOrElse(a, a)
    f match {
      case sources.EqualTo(a, v) => Some(sources.EqualTo(n(a), v))
      case sources.EqualNullSafe(a, v) =>
        Some(sources.EqualNullSafe(n(a), v))
      case sources.GreaterThan(a, v) => Some(sources.GreaterThan(n(a), v))
      case sources.GreaterThanOrEqual(a, v) =>
        Some(sources.GreaterThanOrEqual(n(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(n(a), v))
      case sources.LessThanOrEqual(a, v) =>
        Some(sources.LessThanOrEqual(n(a), v))
      case sources.In(a, vs) => Some(sources.In(n(a), vs))
      case sources.IsNull(a) => Some(sources.IsNull(n(a)))
      case sources.IsNotNull(a) => Some(sources.IsNotNull(n(a)))
      case sources.StringStartsWith(a, v) =>
        Some(sources.StringStartsWith(n(a), v))
      case sources.StringEndsWith(a, v) =>
        Some(sources.StringEndsWith(n(a), v))
      case sources.StringContains(a, v) =>
        Some(sources.StringContains(n(a), v))
      case sources.And(l, r) =>
        for { a <- toPhysicalFilter(p)(l); b <- toPhysicalFilter(p)(r) }
          yield sources.And(a, b)
      case sources.Or(l, r) =>
        for { a <- toPhysicalFilter(p)(l); b <- toPhysicalFilter(p)(r) }
          yield sources.Or(a, b)
      case sources.Not(c) => toPhysicalFilter(p)(c).map(sources.Not)
      case _ => None
    }
  }
}

private[graft] final class SnapshotScanBuilder(
    spark: SparkSession, path: String, pinnedV: Long,
    tableSchema: StructType, partCols: Seq[String],
    colMap: Map[String, String], entries: Seq[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var filters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs // ALL filters stay post-scan: pushdown below is IO-only
  }

  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = new SnapshotBatchScan(spark, path,
    pinnedV, tableSchema, required, partCols, colMap, entries,
    filters.toSeq)
}

private[graft] final class SnapshotBatchScan(
    spark: SparkSession, path: String, pinnedV: Long,
    tableSchema: StructType, required: StructType,
    partCols: Seq[String], colMap: Map[String, String],
    entries: Seq[String], filters: Seq[Filter])
  extends Scan with Batch with SupportsReportPartitioning
  with SupportsReportStatistics {

  import SnapshotBatchScan._

  private val bucketFields: Seq[Snapshots.PBucket] =
    partCols.map(Snapshots.parsePartField)
      .collect { case b: Snapshots.PBucket => b }
  require(bucketFields.length == partCols.length,
    s"snapshot scan: the key-grouped path needs a bucket-only " +
      s"partition spec, got ${partCols.mkString(", ")}")

  private def logicalName(phys: String): String =
    colMap.getOrElse(phys, phys)

  /** Manifest-level pruning: a conjunctive equality on a bucket
    * source keeps only that bucket's directory (and stats-surviving
    * files) — the point-lookup sliver, computed with the exact
    * write-time expressions via [[Snapshots.prunedEntriesEquals]].
    */
  private lazy val keptEntries: Seq[String] = {
    val sources0 = bucketFields.map(b => logicalName(b.source)).toSet
    val eqs = conjunctiveEquals(filters)
      .filter { case (c, _) => sources0.contains(c) }
    eqs.foldLeft(entries) { case (acc, (c, v)) =>
      val (kept, _) =
        Snapshots.prunedEntriesEquals(spark, path, c, v, Some(pinnedV))
      val keptSet = kept.map(Snapshots.relOfEntry).toSet
      acc.filter(e => keptSet(Snapshots.relOfEntry(e)))
    }
  }

  private lazy val partitions: Array[SnapshotInputPartition] = {
    val f = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    keptEntries.groupBy { e =>
      val vals = Snapshots.partValsOf(Snapshots.relOfEntry(e))
      bucketFields.map(b => vals(b.dirName).toInt)
    }.toSeq.sortBy(_._1.mkString(","))
      .map { case (key, es) =>
        SnapshotInputPartition(key.toArray, es.map { e =>
          val (rel, len, _) = Snapshots.entryMeta(spark, path, e)
          FileSlice(
            f.makeQualified(new Path(s"$path/$rel")).toString, len)
        }.toArray)
      }.toArray
  }

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-snapshot spj $path v$pinnedV " +
      s"[${partCols.mkString(", ")}]"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      bucketFields.map(b => Expressions.bucket(b.n,
        logicalName(b.source)): VExpression).toArray,
      partitions.length)

  override def planInputPartitions(): Array[InputPartition] =
    partitions.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory = {
    val physData = Snapshots.physicalSchemaOf(tableSchema, colMap)
    val physRequired = Snapshots.physicalSchemaOf(required, colMap)
    val l2p = colMap.map(_.swap)
    val physFilters =
      filters.flatMap(toPhysicalFilter(l2p))
        .filter(_.references.forall(physData.fieldNames.contains))
    new SnapshotReaderFactory(ScanBridge.parquetReadFunc(spark,
      physData, physRequired, physFilters,
      spark.sessionState.newHadoopConf()))
  }

  /** Size/rows from the manifest pseudo-stats (post-prune): join
    * planning sees the SLIVER a point lookup keeps, so a pruned side
    * can still broadcast.
    */
  override def estimateStatistics(): Statistics = {
    val metas = keptEntries.map(e => Snapshots.entryMeta(spark, path, e))
    val rows = metas.map(_._3)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(metas.map(_._2).sum)
      override def numRows(): java.util.OptionalLong =
        if (rows.nonEmpty && rows.forall(_.isDefined))
          java.util.OptionalLong.of(rows.map(_.get).sum)
        else java.util.OptionalLong.empty()
    }
  }
}

/** One bucket directory's files; the bucket number(s) are the
  * partition key Spark groups and aligns join sides by. */
private[graft] final case class FileSlice(path: String, len: Long)

private[graft] final case class SnapshotInputPartition(
    key: Array[Int], files: Array[FileSlice])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow.fromSeq(key.toIndexedSeq)
}

private[graft] final class SnapshotReaderFactory(
    readFunc: (String, Long) => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[SnapshotInputPartition]
    new PartitionReader[InternalRow] {
      private val it = slice.files.iterator
        .flatMap(fs => readFunc(fs.path, fs.len))
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** The store's hidden bucket transform as a catalog V2 function —
  * what lets Spark RESOLVE `bucket(n, col)` partitioning reported by
  * two scans into comparable `TransformExpression`s (equal canonical
  * name + equal bucket count ⇒ compatible shuffle specs ⇒ no
  * Exchange). `produceResult` evaluates the IDENTICAL expression the
  * writer used to derive bucket directories — `pmod(xxhash64(col),
  * n)` — so any Spark-side evaluation (partially-clustered
  * distributions, runtime filters) can never disagree with the
  * layout on disk.
  */
private[graft] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(xxhash64(col), n) - the snapshot store's " +
      "hidden bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"graft bucket(n, col) takes 2 arguments, got $inputType")
    new GraftBucketBound(inputType.fields(1).dataType)
  }
}

private[graft] final class GraftBucketBound(dt: DataType)
  extends ScalarFunction[Integer] with Serializable {
  // the write-time hash, evaluated through catalyst itself: XxHash64
  // with Spark's fixed seed 42, null values folding to the seed -
  // exactly functions.xxhash64's semantics
  @transient private lazy val hasher =
    XxHash64(Seq(BoundReference(1, dt, nullable = true)), 42L)

  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = hasher.eval(input).asInstanceOf[Long]
    val m = (h % n).toInt
    Integer.valueOf(if (m < 0) m + n else m)
  }
}
