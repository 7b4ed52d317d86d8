package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex,
  PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** The scan-side integration of a partitioned [[Snapshots]] store —
  * the piece every real table format (Delta's `TahoeFileIndex`,
  * Iceberg's `SparkScan`) implements instead of directory listing:
  * the MANIFEST is the file index. Spark's built-in Hive-style
  * partition discovery walks directories and requires every
  * partition under one root, which a multi-commit snapshot store
  * (one `data/c-<uuid>/` dir per commit, carried files interleaving
  * generations) structurally cannot give it. Here the manifest
  * already knows every file, its byte size, and its partition
  * values, so:
  *
  *   - `listFiles` serves `PartitionDirectory`s straight from
  *     memory — zero filesystem listing, zero footer reads; at
  *     100 TB / millions of files the listing pass IS the planning
  *     bottleneck this removes.
  *   - `partitionFilters` are evaluated here, so Catalyst's dynamic
  *     + static partition pruning work exactly as they do over a
  *     catalog table (`.explain` shows the pruned count), composing
  *     with the manifest-stats pruning [[Snapshots.readBetween]]
  *     does above the scan.
  *   - File-level granularity is preserved: a copy-on-write commit
  *     carries SOME files of an old commit dir, and this index reads
  *     precisely those — a directory-based index cannot.
  */
private[graft] class SnapshotFileIndex(
    spark: SparkSession,
    base: Path,
    override val partitionSchema: StructType,
    partitions: Seq[(InternalRow, Seq[FileStatus])])
  extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(base)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty) partitions
      else {
        // bind partition-column attributes to their ordinal in the
        // values row and evaluate — the same interpreted pruning
        // PartitioningAwareFileIndex does over discovered directories
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }
        // BasePredicate.eval is three-valued under the hood; a NULL
        // verdict unboxes to false - the keep-nothing direction is
        // correct for pruning (same contract as Spark's own
        // prunePartitions)
        val pred = Predicate.createInterpreted(bound)
        partitions.filter { case (values, _) => pred.eval(values) }
      }
    kept.map { case (values, files) =>
      PartitionDirectory(values, files.toArray)
    }
  }

  override def inputFiles: Array[String] =
    partitions.iterator.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // manifests are immutable

  override val sizeInBytes: Long =
    partitions.iterator.flatMap(_._2.map(_.getLen)).sum
}
