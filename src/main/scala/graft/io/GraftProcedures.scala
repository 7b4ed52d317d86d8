package graft.io

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType,
  LongType, StringType, StructField, StructType}

/** SQL stored procedures for snapshot-store maintenance — the
  * `CALL cat.system.<proc>(...)` surface (Spark 4 DSv2
  * `ProcedureCatalog`, the Iceberg `system.*` convention), so
  * compaction, retention, rollback and tagging are schedulable from
  * pure SQL exactly like reads and DML:
  *
  * {{{
  *   CALL graft.system.compact(table => 'db.docs', zorder_by => 'a,b')
  *   CALL graft.system.rollback(table => 'db.docs', version => 3)
  *   CALL graft.system.expire_versions(table => 'db.docs', keep_last => 10)
  *   CALL graft.system.vacuum(table => 'db.docs', grace_minutes => 60)
  *   CALL graft.system.tag(table => 'db.docs', name => 'train-v1')
  *   CALL graft.system.maintain(table => 'db.docs')
  * }}}
  *
  * Each returns a one-row result (the committed version / counts) via
  * a `LocalScan`, and each is exactly the corresponding [[Snapshots]]
  * call — same OCC, same history, same refusals. The `table` argument
  * is `namespace.table` under the catalog's warehouse; segments get
  * the same traversal refusals as catalog identifiers ('..' in a
  * CALL must not escape the warehouse any more than in a DROP).
  */
private[graft] object GraftProcedures {

  val Names: Seq[String] = Seq("compact", "vacuum", "expire_versions",
    "rollback", "tag", "drop_tag", "maintain", "publish_staged",
    "drop_staged", "list_staged", "clone", "create_branch",
    "fast_forward", "drop_branch", "list_branches", "rewrite_deletes",
    "analyze_ndv")

  def identifiers: Array[Identifier] =
    Names.map(n => Identifier.of(Array("system"), n)).toArray

  def load(name: String, warehouse: String): UnboundProcedure =
    name match {
      case "compact" => new Compact(warehouse)
      case "vacuum" => new Vacuum(warehouse)
      case "expire_versions" => new ExpireVersions(warehouse)
      case "rollback" => new Rollback(warehouse)
      case "tag" => new Tag(warehouse)
      case "drop_tag" => new DropTag(warehouse)
      case "maintain" => new Maintain(warehouse)
      case "publish_staged" => new PublishStaged(warehouse)
      case "drop_staged" => new DropStaged(warehouse)
      case "list_staged" => new ListStaged(warehouse)
      case "clone" => new Clone(warehouse)
      case "create_branch" => new CreateBranch(warehouse)
      case "fast_forward" => new FastForward(warehouse)
      case "drop_branch" => new DropBranch(warehouse)
      case "list_branches" => new ListBranches(warehouse)
      case "rewrite_deletes" => new RewriteDeletes(warehouse)
      case "analyze_ndv" => new AnalyzeNdv(warehouse)
      case other => throw new IllegalArgumentException(
        s"graft catalog: unknown procedure system.$other " +
          s"(have: ${Names.mkString(", ")})")
    }

  /** `warehouse/<ns...>/<table>` with the catalog's traversal
    * refusals — mirrors GraftCatalog.requireSafeSegment.
    */
  private def pathOf(warehouse: String, table: String): String = {
    val segs = table.split('.')
    require(segs.nonEmpty && segs.forall(s =>
      s.nonEmpty && s != "." && s != ".." && !s.contains('/') &&
        !s.contains('\\') && !s.contains('\u0000')),
      s"graft procedure: illegal table identifier '$table' - segments " +
        "must be non-empty and free of path separators / traversal")
    (warehouse +: segs.toSeq).mkString("/")
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType,
                        sqlDefault: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(sqlDefault).build()

  private def csv(s: String): Seq[String] =
    if (s == null || s.trim.isEmpty) Nil
    else s.split(',').map(_.trim).filter(_.nonEmpty).toSeq

  /** One-procedure base: bind is identity (parameters are static),
    * call runs the maintenance op on the active session and returns
    * its one result row.
    */
  private abstract class Base(val name: String,
                              params: Seq[ProcedureParameter],
                              out: StructType)
      extends UnboundProcedure with BoundProcedure {
    protected def invoke(spark: SparkSession,
                         input: InternalRow): Array[Any]
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    // every procedure commits/deletes state; never cache or re-order
    override def isDeterministic: Boolean = false
    override def description(): String =
      s"graft snapshot-store maintenance: $name"
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val vals = invoke(SparkSession.active, input)
      val row: InternalRow = new GenericInternalRow(vals)
      Collections.singletonList[Scan](new LocalScan {
        override def readSchema(): StructType = out
        override def rows(): Array[InternalRow] = Array(row)
        override def description(): String = s"graft.system.$name result"
      }).iterator()
    }
  }

  private final class Compact(wh: String) extends Base("compact",
    Seq(in("table", StringType),
      inDefault("target_file_mb", IntegerType, "128"),
      inDefault("sort_by", StringType, "''"),
      inDefault("zorder_by", StringType, "''"),
      inDefault("scope_column", StringType, "''"),
      inDefault("scope_value", StringType, "''")),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      val mb = input.getInt(1)
      require(mb > 0, s"graft compact: target_file_mb must be > 0: $mb")
      // scoped maintenance from SQL: the value arrives as a string
      // and is cast to the column's type inside the point-lookup
      // pruning — `CALL ...compact(table => 't', scope_column =>
      // 'ts', scope_value => '2024-01-05 10:00:00')` bin-packs one
      // day and carries the other 100 TB untouched
      val scopeCol = input.getUTF8String(4).toString
      val scopeVal = input.getUTF8String(5).toString
      require(scopeCol.nonEmpty || scopeVal.isEmpty,
        "graft compact: scope_value needs scope_column")
      val v = Snapshots.compact(spark, path,
        targetFileBytes = mb.toLong << 20,
        sortBy = csv(input.getUTF8String(2).toString),
        zorderBy = csv(input.getUTF8String(3).toString),
        scope = if (scopeCol.isEmpty) Nil else Seq(scopeCol -> scopeVal))
      Array[Any](v)
    }
  }

  private final class Vacuum(wh: String) extends Base("vacuum",
    Seq(in("table", StringType),
      inDefault("grace_minutes", LongType, "60"),
      inDefault("dry_run", BooleanType, "false")),
    StructType(Seq(
      StructField("deleted_files", IntegerType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      val grace = input.getLong(1)
      require(grace >= 0,
        s"graft vacuum: grace_minutes must be >= 0: $grace")
      val ms = grace * 60000L
      Array[Any](
        if (input.getBoolean(2)) Snapshots.vacuumDryRun(spark, path, ms)
        else Snapshots.vacuum(spark, path, graceMs = ms))
    }
  }

  /** `CALL cat.system.rewrite_deletes(table => 'db.docs',
    * convert_equality_deletes => true)` —
    * [[Snapshots.rewriteDeletes]]: consolidate merge-on-read delete
    * files (and optionally convert equality deletes to positional),
    * the scheduled antidote to CDC delete-sliver accretion. */
  private final class RewriteDeletes(wh: String) extends Base(
    "rewrite_deletes",
    Seq(in("table", StringType),
      inDefault("convert_equality_deletes", BooleanType, "false")),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.rewriteDeletes(spark, path,
        convertEq = input.getBoolean(1)))
    }
  }

  /** `CALL cat.system.analyze_ndv(table => 'db.docs', columns =>
    * 'doc_id,lang')` — [[Snapshots.analyzeNdv]]: per-file NDV
    * sketches into the manifest, feeding `distinctCount` column
    * statistics (CBO join estimation) for any planned file subset. */
  private final class AnalyzeNdv(wh: String) extends Base(
    "analyze_ndv",
    Seq(in("table", StringType), in("columns", StringType)),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      val cols = input.getUTF8String(1).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      Array[Any](Snapshots.analyzeNdv(spark, path, cols))
    }
  }

  private final class ExpireVersions(wh: String) extends Base(
    "expire_versions",
    Seq(in("table", StringType), in("keep_last", IntegerType)),
    StructType(Seq(
      StructField("removed", IntegerType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.expire(spark, path, keepLast = input.getInt(1)))
    }
  }

  private final class Rollback(wh: String) extends Base("rollback",
    Seq(in("table", StringType), in("version", LongType)),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.rollback(spark, path, input.getLong(1)))
    }
  }

  private final class Tag(wh: String) extends Base("tag",
    Seq(in("table", StringType), in("name", StringType),
      inDefault("version", LongType, "NULL")),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      val v = if (input.isNullAt(2)) None else Some(input.getLong(2))
      Array[Any](Snapshots.tag(spark, path,
        input.getUTF8String(1).toString, v))
    }
  }

  private final class DropTag(wh: String) extends Base("drop_tag",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(
      StructField("dropped", BooleanType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.dropTag(spark, path,
        input.getUTF8String(1).toString))
    }
  }

  /** `CALL graft.system.clone(source => 'db.t', target => 'db.fork')`
    * — zero-copy shallow clone ([[Snapshots.cloneTable]]); both
    * identifiers live under this catalog's warehouse.
    */
  private final class Clone(wh: String) extends Base("clone",
    Seq(in("source", StringType), in("target", StringType),
      inDefault("version", LongType, "NULL")),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val src = pathOf(wh, input.getUTF8String(0).toString)
      val dst = pathOf(wh, input.getUTF8String(1).toString)
      val v = if (input.isNullAt(2)) None else Some(input.getLong(2))
      Array[Any](Snapshots.cloneTable(spark, src, dst, v))
    }
  }

  /** Branch lifecycle from SQL: fork, promote, abandon, list —
    * `CALL graft.system.create_branch(table => 'db.t', name => 'x')`.
    */
  private final class CreateBranch(wh: String) extends Base(
    "create_branch",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.createBranch(spark, path,
        input.getUTF8String(1).toString))
    }
  }

  private final class FastForward(wh: String) extends Base(
    "fast_forward",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.fastForward(spark, path,
        input.getUTF8String(1).toString))
    }
  }

  private final class DropBranch(wh: String) extends Base(
    "drop_branch",
    Seq(in("table", StringType), in("name", StringType)),
    StructType(Seq(
      StructField("dropped", BooleanType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Snapshots.dropBranch(spark, path,
        input.getUTF8String(1).toString)
      Array[Any](true)
    }
  }

  private final class ListBranches(wh: String) extends Base(
    "list_branches",
    Seq(in("table", StringType)),
    StructType(Seq(
      StructField("branches", StringType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(
        Snapshots.listBranches(spark, path).mkString(",")))
    }
  }

  private final class Maintain(wh: String) extends Base("maintain",
    Seq(in("table", StringType),
      inDefault("target_file_mb", IntegerType, "128"),
      inDefault("keep_versions", IntegerType, "10"),
      inDefault("grace_minutes", LongType, "60")),
    StructType(Seq(
      StructField("compacted", BooleanType, nullable = false),
      StructField("expired", IntegerType, nullable = false),
      StructField("vacuumed", IntegerType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      val mb = input.getInt(1)
      require(mb > 0, s"graft maintain: target_file_mb must be > 0: $mb")
      val grace = input.getLong(3)
      require(grace >= 0,
        s"graft maintain: grace_minutes must be >= 0: $grace")
      val (c, e, vres) = Snapshots.maintain(spark, path,
        targetFileBytes = mb.toLong << 20,
        keepVersions = input.getInt(2), graceMs = grace * 60000L)
      Array[Any](c, e, vres)
    }
  }

  /** Write-audit-publish from SQL: the audit job stages with the
    * programmatic API (or finds pending ids via `list_staged`),
    * quality-checks, then `CALL graft.system.publish_staged(table =>
    * 'db.docs', wap_id => 'audit-42')` — the gate itself is pure
    * metadata, schedulable next to compact/vacuum.
    */
  private final class PublishStaged(wh: String) extends Base(
    "publish_staged",
    Seq(in("table", StringType), in("wap_id", StringType)),
    StructType(Seq(StructField("version", LongType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](Snapshots.publishStaged(spark, path,
        input.getUTF8String(1).toString))
    }
  }

  private final class DropStaged(wh: String) extends Base(
    "drop_staged",
    Seq(in("table", StringType), in("wap_id", StringType)),
    StructType(Seq(
      StructField("dropped", BooleanType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Snapshots.dropStaged(spark, path, input.getUTF8String(1).toString)
      Array[Any](true)
    }
  }

  private final class ListStaged(wh: String) extends Base(
    "list_staged",
    Seq(in("table", StringType)),
    StructType(Seq(
      StructField("wap_ids", StringType, nullable = false)))) {
    override protected def invoke(spark: SparkSession,
                                  input: InternalRow): Array[Any] = {
      val path = pathOf(wh, input.getUTF8String(0).toString)
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(
        Snapshots.listStaged(spark, path).mkString(",")))
    }
  }
}
