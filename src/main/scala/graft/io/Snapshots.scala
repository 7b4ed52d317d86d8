package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Snapshot-versioned parquet store: manifest-based time travel,
  * rollback and retention over immutable data files — the minimal
  * table-format posture (what Delta/Iceberg pin down) that a 100 TB
  * deployment needs and a bare parquet directory cannot give:
  *
  *   - **Atomic visibility.** Readers resolve the `_latest` pointer
  *     (swapped by rename, the HDFS/S3A-committer atomicity primitive)
  *     to an immutable manifest listing immutable files — a reader
  *     can never observe a half-written commit, and a writer crash at
  *     ANY point leaves the previous snapshot intact (data files →
  *     manifest → pointer, in that order; everything before the
  *     pointer swap is invisible garbage that [[vacuum]] collects).
  *   - **Structural sharing.** [[commitAppend]] writes ONLY the new
  *     rows' files; the new manifest lists old files + new files. At
  *     100 TB an append costs the append, never a rewrite, and every
  *     historical snapshot remains readable at zero storage cost
  *     beyond its delta.
  *   - **Time travel & rollback.** [[read]] with a version pins any
  *     committed snapshot (reproducibility: train/eval jobs pin the
  *     corpus version they ran on). [[rollback]] is a new manifest
  *     referencing an old snapshot's files — constant-time, no data
  *     IO, and itself versioned (nothing is lost by rolling back).
  *   - **Retention.** [[expire]] drops old manifests; [[vacuum]]
  *     deletes data files no surviving manifest references. Split in
  *     two on purpose: expiry is a metadata decision, physical
  *     deletion is the irreversible one.
  *
  * Layout under `path/`: `data/c-<uuid>/part-*.parquet` (one subdir
  * per commit's write), `_manifests/v%09d.manifest` (one RELATIVE
  * file path per line — the store is relocatable), `_latest` (the
  * committed version number). Manifests list files, not rows: commit
  * metadata stays O(files-per-commit) however large the table grows.
  *
  * Single-writer, many-reader — the standard object-store table
  * contract; concurrent writers need a coordination layer (catalog /
  * lock) above this seam, as they do for every manifest format.
  */
object Snapshots {

  // v2: line 2 of the manifest is the snapshot's schema as Spark
  // DataType JSON — every version reads with ITS schema, not whatever
  // random file footer Spark samples (which silently drops columns
  // the sampled file lacks after an evolution)
  private val Header = "graft-snapshot-v2"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(base: String, v: Long) =
    new Path(f"$base/_manifests/v$v%09d.manifest")

  /** List a commit's freshly-written parquet files, store-relative. */
  private def listCommitFiles(f: FileSystem, base: String,
                              commitDir: String): Seq[String] = {
    val it = f.listFiles(new Path(s"$base/$commitDir"), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        out += s"$commitDir/${st.getPath.getName}"
    }
    out.toSeq.sorted
  }

  private def writeTextAtomic(f: FileSystem, target: Path,
                              lines: Seq[String]): Unit = {
    val tmp = new Path(target.getParent, s"_tmp_${target.getName}")
    val os = f.create(tmp, true)
    try os.write((lines :+ "").mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    // FileSystem.rename refuses an existing destination; the pointer
    // swap must REPLACE _latest atomically, which is exactly
    // FileContext's Rename.OVERWRITE (atomic on HDFS/local; object
    // stores emulate — single-writer contract covers the difference)
    try org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, f.getConf).rename(tmp, target,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case e: java.io.IOException =>
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot: cannot activate ${target.getName}", e)
    }
  }

  private def readLines(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** A manifest FILE ENTRY is `relpath` optionally followed by a TAB
    * and the file's column statistics
    * (`col:T:min:max;...`, T ∈ {L,D}) — collected from the parquet
    * footer once at commit time and carried VERBATIM whenever the
    * file itself is carried, so stats are written once per file ever.
    */
  private def relOf(entry: String): String = entry.takeWhile(_ != '\t')

  /** Parsed numeric column ranges of a manifest entry: name →
    * (min, max) as doubles (longs widened — exact below 2^53, the
    * documented pruning domain). Absent column ⇒ no stats ⇒ the file
    * can never be pruned on it.
    */
  private[graft] def statsOf(entry: String): Map[String, (Double, Double)] = {
    val i = entry.indexOf('\t')
    if (i < 0) Map.empty
    else entry.substring(i + 1).split(';').iterator.filter(_.nonEmpty)
      .flatMap { part =>
        part.split(':') match {
          case Array(name, "L", mn, mx) =>
            Some(name -> (mn.toLong.toDouble, mx.toLong.toDouble))
          case Array(name, "D", mn, mx) =>
            Some(name -> (mn.toDouble, mx.toDouble))
          case _ => None
        }
      }.toMap
  }

  /** Manifest contents: the snapshot's schema (line 2, Spark DataType
    * JSON) and its file ENTRIES (rel path + optional stats).
    */
  private def manifest(f: FileSystem, base: String,
                       v: Long): (StructType, Seq[String]) = {
    val p = manifestPath(base, v)
    if (!f.exists(p)) throw new IllegalArgumentException(
      s"snapshot: version $v does not exist under $base " +
        s"(have: ${allManifestVersions(f, base).mkString(", ")})")
    val lines = readLines(f, p)
    require(lines.headOption.contains(Header),
      s"snapshot: ${p.getName} is not a $Header manifest")
    require(lines.size >= 2,
      s"snapshot: ${p.getName} is missing its schema line")
    val schema = DataType.fromJson(lines(1)).asInstanceOf[StructType]
    (schema, lines.drop(2).filter(_.nonEmpty))
  }

  private def manifestFiles(f: FileSystem, base: String,
                            v: Long): Seq[String] =
    manifest(f, base, v)._2

  /** Every manifest on disk, committed or not (a crash between
    * manifest write and pointer swap leaves an uncommitted one — its
    * version number is burned, its files are retained until expiry,
    * exactly Iceberg's orphan-snapshot posture).
    */
  private def allManifestVersions(f: FileSystem, base: String): Seq[Long] = {
    val dir = new Path(s"$base/_manifests")
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  /** The committed (pointer-visible) version, if any commit ever
    * completed.
    */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val f = fs(spark, path)
    val p = new Path(s"$path/_latest")
    if (!f.exists(p)) None
    else Some(readLines(f, p).head.trim.toLong)
  }

  /** Committed versions, oldest first. */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    latestVersion(spark, path) match {
      case None => Nil
      case Some(l) => allManifestVersions(f, path).filter(_ <= l)
    }
  }

  /** Per-file numeric column stats from the parquet FOOTER, as the
    * manifest entry suffix: top-level INT64/DOUBLE columns whose
    * every row group carries valid statistics (a single stats-less
    * row group drops the column — conservative: a file without stats
    * is simply never pruned). Column names containing the entry
    * separators are skipped. One footer read per file, at commit
    * time only.
    */
  private def footerStats(conf: org.apache.hadoop.conf.Configuration,
                          p: Path): String = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      if (blocks.isEmpty) return ""
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (Char, Double, Double)]
      val dead = scala.collection.mutable.Set.empty[String]
      blocks.foreach(_.getColumns.asScala.foreach { c =>
        val name = c.getPath.toDotString
        val tpe = c.getPrimitiveType.getPrimitiveTypeName
        val tag = tpe match {
          case PrimitiveTypeName.INT64 => 'L'
          case PrimitiveTypeName.DOUBLE => 'D'
          case _ => ' '
        }
        val logical = c.getPrimitiveType.getLogicalTypeAnnotation
        val plainNumeric = logical == null ||
          logical.isInstanceOf[org.apache.parquet.schema
            .LogicalTypeAnnotation.IntLogicalTypeAnnotation]
        if (tag != ' ' && plainNumeric && !name.contains(':') &&
            !name.contains(';') && !name.contains('\t') &&
            !name.contains('.')) {
          val st = c.getStatistics
          if (st == null || !st.hasNonNullValue) dead += name
          else {
            val (mn, mx) = tag match {
              case 'L' => (st.genericGetMin.asInstanceOf[java.lang.Long]
                .toDouble, st.genericGetMax.asInstanceOf[java.lang.Long]
                .toDouble)
              case _ => (st.genericGetMin.asInstanceOf[java.lang.Double]
                .toDouble, st.genericGetMax.asInstanceOf[java.lang.Double]
                .toDouble)
            }
            // a NaN min/max (doubles; some writers emit them) would
            // compare false against ANY range and wrongly PRUNE the
            // file — drop the column's stats instead (kept, not
            // skipped, is the safe direction)
            if (mn.isNaN || mx.isNaN) dead += name
            else acc.get(name) match {
              case Some((t, lo, hi)) =>
                acc(name) = (t, math.min(lo, mn), math.max(hi, mx))
              case None => acc(name) = (tag, mn, mx)
            }
          }
        } else dead += name
      })
      (acc -- dead).map { case (n, (t, mn, mx)) =>
        val (a, b) =
          if (t == 'L') (mn.toLong.toString, mx.toLong.toString)
          else (mn.toString, mx.toString)
        s"$n:$t:$a:$b"
      }.mkString(";")
    } finally reader.close()
  }

  private def writeCommit(spark: SparkSession, df: DataFrame,
                          path: String, carried: Seq[String],
                          schema: StructType): Long = {
    val f = fs(spark, path)
    val commitDir = s"data/c-${java.util.UUID.randomUUID()}"
    df.write.parquet(s"$path/$commitDir")
    val conf = spark.sessionState.newHadoopConf()
    val fresh = listCommitFiles(f, path, commitDir).map { rel =>
      val stats = footerStats(conf, new Path(s"$path/$rel"))
      if (stats.isEmpty) rel else s"$rel\t$stats"
    }
    // an empty DataFrame still writes one schema-bearing part file,
    // so even zero-row snapshots are readable; this guard only fires
    // for writers that emit NO files (a no-file manifest has no
    // schema and can never be read back)
    require(fresh.nonEmpty,
      "snapshot: the write produced no parquet files - a no-file " +
        "snapshot has no schema and cannot be read back")
    // version numbers come from the manifests present, not the
    // pointer: a crash after manifest-write burned that number and it
    // must never be reused (a reader may already hold it)
    val v = allManifestVersions(f, path).lastOption.getOrElse(0L) + 1L
    writeTextAtomic(f, manifestPath(path, v),
      Header +: schema.json +: (carried ++ fresh))
    writeTextAtomic(f, new Path(s"$path/_latest"), Seq(v.toString))
    v
  }

  /** The stored form of a snapshot schema: every field nullable, so a
    * file written before a column existed (or after a writer stopped
    * supplying one) legally null-fills on read.
    */
  private def nullableAll(s: StructType): StructType =
    StructType(s.fields.map(_.copy(nullable = true)))

  /** The evolved schema an append commit stores: previous fields in
    * order, new fields appended — ADDING columns is evolution, a
    * CHANGED type on a shared name is drift and refuses loudly (the
    * two files genuinely disagree; a cast policy belongs to the
    * caller, cf. [[graft.schema.Conform]]). A column the append batch
    * lacks stays in the schema and null-fills for the new files —
    * dropping a column is not something an APPEND can mean.
    */
  private def evolvedSchema(prev: StructType, next: StructType,
                            path: String): StructType = {
    val prevByName = prev.fields.map(f => f.name -> f).toMap
    next.fields.foreach(nf => prevByName.get(nf.name).foreach(pf =>
      require(pf.dataType == nf.dataType,
        s"snapshot: append column ${nf.name} arrives as ${nf.dataType} " +
          s"but $path stores ${pf.dataType} - refusing the silent " +
          "type drift; cast before appending")))
    StructType(prev.fields ++
      next.fields.filterNot(f => prevByName.contains(f.name)))
  }

  /** Commit `df` as the new FULL contents of the table (overwrite
    * semantics — the new snapshot lists only this commit's files).
    * Returns the new version.
    */
  def commit(df: DataFrame, path: String): Long =
    writeCommit(df.sparkSession, df, path, Nil, nullableAll(df.schema))

  /** Commit `df` as an APPEND: the new snapshot = previous snapshot's
    * files + this commit's files. Only the delta is written — the
    * 100 TB append costs the append. Schema evolution: columns new in
    * `df` join the snapshot schema (old files null-fill them); columns
    * `df` lacks stay (the new files null-fill); a type change on a
    * shared name refuses loudly.
    */
  def commitAppend(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val (carried, schema) = latestVersion(spark, path) match {
      case Some(v) =>
        val (prev, files) = manifest(f, path, v)
        (files, evolvedSchema(prev, nullableAll(df.schema), path))
      case None => (Nil, nullableAll(df.schema))
    }
    writeCommit(spark, df, path, carried, schema)
  }

  /** Read a snapshot: the pointer-visible latest, or any committed
    * `version` (time travel). The file list comes from the immutable
    * manifest, so the read is consistent whatever commits land
    * meanwhile — and so does the SCHEMA: each version reads with the
    * schema its manifest stores (a file from before a column was
    * added null-fills it), never whichever random file footer Spark
    * happens to sample, which after an evolution would silently drop
    * or surface columns depending on sampling luck.
    */
  def read(spark: SparkSession, path: String,
           version: Option[Long] = None): DataFrame = {
    val f = fs(spark, path)
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot: no committed version under $path"))
    val (schema, rels) = manifest(f, path, v)
    spark.read.schema(schema)
      .parquet(rels.map(e => s"$path/${relOf(e)}"): _*)
  }

  /** The manifest entries a `[lo, hi]` range scan on `column` must
    * read, against the total entry count — the file-skipping decision
    * exposed for specs and planning. An entry without stats for the
    * column is always kept (prune only on proof).
    */
  private[graft] def prunedEntries(spark: SparkSession, path: String,
                                   column: String, lo: Double, hi: Double,
                                   version: Option[Long] = None):
      (Seq[String], Int) = {
    val f = fs(spark, path)
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot: no committed version under $path"))
    val (_, entries) = manifest(f, path, v)
    val kept = entries.filter(e => statsOf(e).get(column) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi // ranges overlap
      case None => true
    })
    (kept, entries.size)
  }

  /** Range scan with MANIFEST-LEVEL file skipping: files whose
    * committed min/max stats prove no row can satisfy
    * `column BETWEEN lo AND hi` are never opened — not even their
    * footers. Parquet row-group pruning needs a footer read per file;
    * at 100 TB with millions of files the open/footer pass IS the
    * scan bottleneck for selective queries, and manifest stats cut it
    * to the overlapping sliver (after a [[compact]] with `sortBy` on
    * the column, that sliver is ~1 file). Stats cover top-level
    * BIGINT/DOUBLE columns (widened-to-double compare — exact below
    * 2^53); files without stats for the column are read, never
    * wrongly skipped, and the residual in-plan BETWEEN keeps the
    * result exact regardless of how coarse the pruning was.
    */
  def readBetween(spark: SparkSession, path: String, column: String,
                  lo: Double, hi: Double,
                  version: Option[Long] = None): DataFrame = {
    val f = fs(spark, path)
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot: no committed version under $path"))
    val (schema, _) = manifest(f, path, v)
    require(schema.fieldNames.contains(column),
      s"snapshot: readBetween column $column is not in the table " +
        s"schema (${schema.fieldNames.mkString(", ")})")
    val (kept, _) = prunedEntries(spark, path, column, lo, hi, Some(v))
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(kept.map(e => s"$path/${relOf(e)}"): _*)
    // integral column + whole-number bounds → long literals, so the
    // residual predicate reaches the parquet scan as a pushed filter
    // instead of hiding behind a cast-to-double
    val integral = schema(column).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    val (l, h) =
      if (integral && lo.isWhole && hi.isWhole)
        (lit(lo.toLong), lit(hi.toLong))
      else (lit(lo), lit(hi))
    base.filter(col(column) >= l && col(column) <= h)
  }

  /** The rows ADDED between two committed versions: the files in
    * `toVersion`'s manifest that `fromVersion`'s lacks — an exact
    * incremental read for append-only history (each append commit
    * lists old files + new files, so the set difference IS the
    * delta). Cost is O(delta files), never a table scan or a row
    * diff: this is how a downstream consumer keeps up with a 100 TB
    * table by reading only what arrived since its last poll. An
    * overwrite or rollback in the range makes "added rows" ill-
    * defined (files dropped out) — refused loudly rather than
    * answered wrongly.
    */
  def changes(spark: SparkSession, path: String, fromVersion: Long,
              toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"snapshot: changes range is backwards ($fromVersion > $toVersion)")
    val f = fs(spark, path)
    val before = manifestFiles(f, path, fromVersion)
    val (toSchema, after) = manifest(f, path, toVersion)
    val dropped = before.toSet -- after.toSet
    require(dropped.isEmpty,
      s"snapshot: versions $fromVersion..$toVersion are not append-only " +
        s"(${dropped.size} files dropped out - an overwrite, rollback " +
        "or retention pass in the range); read the versions directly " +
        "and diff rows instead")
    val fresh = after.filterNot(before.toSet)
    if (fresh.isEmpty)
      read(spark, path, Some(toVersion)).limit(0)
    else spark.read.schema(toSchema)
      .parquet(fresh.map(e => s"$path/${relOf(e)}"): _*)
  }

  /** The store-relative manifest entry for a scanned file's
    * `_metadata.file_path` URI. Commit dirs sit directly under
    * `data/`, so the last two path segments ARE the manifest entry —
    * no string-matching against the (possibly URI-mangled) base path.
    */
  private def relativize(filePath: String): String = {
    val seg = filePath.split('/')
    require(seg.length >= 2, s"snapshot: unparseable file path $filePath")
    s"data/${seg(seg.length - 2)}/${seg(seg.length - 1)}"
  }

  /** Current snapshot's version, schema, and store-relative files,
    * failing loudly when nothing was ever committed.
    */
  private def currentFiles(spark: SparkSession, path: String,
                           what: String): (Long, StructType, Seq[String]) = {
    val v = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot: no committed version under $path to $what"))
    val (schema, rels) = manifest(fs(spark, path), path, v)
    (v, schema, rels)
  }

  /** Copy-on-write MERGE (upsert) keyed on `keyCols`: an update row
    * whose key exists in the table REPLACES that row (whole-row
    * semantics); a row whose key is absent is INSERTED. Returns the
    * new committed version; every prior version stays readable (time
    * travel across the merge).
    *
    * Scale shape — the Delta/Iceberg copy-on-write contract:
    *   1. *Discovery* scans ONLY the key columns plus the file-path
    *      metadata column (columnar prune) and semi-joins the update
    *      keys; the collected result is O(affected files) — bounded
    *      by the file count, like the manifest itself, never by rows.
    *   2. *Rewrite* reads just the affected files, anti-joins the
    *      update keys, and writes survivors + updates as the commit's
    *      fresh files. Unaffected files are carried by reference —
    *      a merge touching 1 of 10,000 files costs 1 file of IO.
    *
    * Refused loudly: duplicate keys within `updates` (two update rows
    * for one key make the upsert non-deterministic; note the check
    * groups NULL keys as equal, so multiple NULL-keyed update rows
    * are also refused — a NULL key never equi-joins and would
    * otherwise always insert), and a column set differing from the
    * table's (whole-row replacement needs whole rows).
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "snapshot: merge needs at least one key column")
    val (_, schema, all) = currentFiles(spark, path, "merge into")
    val table = spark.read.schema(schema)
      .parquet(all.map(e => s"$path/${relOf(e)}"): _*)
    require(table.columns.sorted.sameElements(updates.columns.sorted),
      s"snapshot: merge updates columns ${updates.columns.sorted.mkString(",")} " +
        s"differ from the table's ${table.columns.sorted.mkString(",")}")
    require(keyCols.forall(updates.columns.contains),
      s"snapshot: key columns ${keyCols.filterNot(updates.columns.contains)} " +
        "missing from updates")
    requireSameTypes(table.schema, updates.schema, "merge updates")
    val keyExprs = keyCols.map(col)
    // merge runs three actions over `updates` (dup-key guard, affected-
    // file discovery, rewrite) — pin it so the caller's plan isn't
    // re-executed per pass; the write below drains every pass before
    // the unpersist
    val upd0 = updates.persist()
    try {
      val dup = upd0.groupBy(keyExprs: _*)
        .count().filter(col("count") > 1).limit(1).count()
      require(dup == 0L,
        "snapshot: updates carry duplicate keys - the upsert would be " +
          "non-deterministic; deduplicate (e.g. keep-latest) before merging")
      val affected = affectedFilesPlan(table, upd0, keyCols)
        .collect().map(r => relativize(r.getString(0))).toSet
      val carried = all.filterNot(e => affected(relOf(e)))
      val cols = table.columns.toSeq.map(col)
      val upd = upd0.select(cols: _*)
      val fresh =
        if (affected.isEmpty) upd // pure insert: nothing to rewrite
        else spark.read.schema(schema)
          .parquet(all.collect { case e if affected(relOf(e)) =>
            s"$path/${relOf(e)}" }: _*)
          .join(upd.select(keyExprs: _*), keyCols, "left_anti")
          .select(cols: _*)
          .unionByName(upd)
      writeCommit(spark, fresh, path, carried, schema)
    } finally { upd0.unpersist(); () }
  }

  /** Mutation batches must carry the table's exact column types:
    * name-matched columns with a different type would either write
    * mixed-type files under one stored schema (failing much later, at
    * some reader's file) or — for join keys — let Spark insert an
    * implicit cast into the equi-join and match rows the caller never
    * meant (string "07" vs long 7). Nullability is legitimately loose
    * (the stored schema is all-nullable); `catalogString` compares
    * types while ignoring it.
    */
  private def requireSameTypes(table: StructType, incoming: StructType,
                               what: String): Unit = {
    val tbl = table.fields.map(f => f.name -> f.dataType).toMap
    incoming.fields.foreach(f => tbl.get(f.name).foreach(t =>
      require(t.catalogString == f.dataType.catalogString,
        s"snapshot: $what column ${f.name} arrives as " +
          s"${f.dataType.catalogString} but the table stores " +
          s"${t.catalogString} - cast before mutating")))
  }

  /** The merge discovery plan: distinct file paths holding at least
    * one update key. Split out so SnapshotsSpec can pin its scale
    * property — the scan reads ONLY the key columns (plus constant
    * file metadata), never the table's payload.
    */
  private[graft] def affectedFilesPlan(table: DataFrame, updates: DataFrame,
                                       keyCols: Seq[String]): DataFrame = {
    val keyExprs = keyCols.map(col)
    table
      .select(keyExprs :+ col("_metadata.file_path").as("__graft_fp"): _*)
      .join(updates.select(keyExprs: _*), keyCols, "left_semi")
      .select("__graft_fp").distinct()
  }

  /** Copy-on-write DELETE BY KEY: every table row whose `keyCols`
    * tuple appears in `keys` is removed — the CDC-delete shape, fully
    * distributed (the key set is a DataFrame semi/anti-joined against
    * the table; only file paths are ever collected, same as [[merge]],
    * so a delete batch of any size works without a driver-side key
    * list). Same copy-on-write economics as merge: discovery scans
    * keys + file metadata only, rewrite touches only files holding a
    * doomed key, zero matches = no commit (idempotent). NULL keys in
    * `keys` never equi-join, so NULL-keyed table rows are never
    * deleted this way ([[deleteWhere]] with an IS NULL predicate is
    * the explicit spelling for that).
    */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
                 keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty,
      "snapshot: deleteKeys needs at least one key column")
    require(keyCols.forall(keys.columns.contains),
      s"snapshot: key columns ${keyCols.filterNot(keys.columns.contains)} " +
        "missing from the keys table")
    val (v, schema, all) = currentFiles(spark, path, "delete keys from")
    val table = spark.read.schema(schema)
      .parquet(all.map(e => s"$path/${relOf(e)}"): _*)
    requireSameTypes(StructType(schema.filter(f => keyCols.contains(f.name))),
      StructType(keys.schema.filter(f => keyCols.contains(f.name))),
      "deleteKeys key")
    val k = keys.select(keyCols.map(col): _*).persist()
    try {
      val affected = affectedFilesPlan(table, k, keyCols)
        .collect().map(r => relativize(r.getString(0))).toSet
      if (affected.isEmpty) v
      else {
        val carried = all.filterNot(e => affected(relOf(e)))
        val survivors = spark.read.schema(schema)
          .parquet(all.collect { case e if affected(relOf(e)) =>
            s"$path/${relOf(e)}" }: _*)
          .join(k, keyCols, "left_anti")
        writeCommit(spark, survivors, path, carried, schema)
      }
    } finally { k.unpersist(); () }
  }

  /** Copy-on-write DELETE: rows where `predicate` evaluates TRUE are
    * removed; FALSE and NULL rows are retained (SQL DELETE WHERE
    * semantics — discovery's `filter(predicate)` and the survivors'
    * `NOT coalesce(predicate, false)` agree on the NULL row). Only
    * files containing at least one matching row are rewritten; when
    * nothing matches, no commit happens and the current version is
    * returned unchanged (delete is idempotent). The predicate must
    * reference data columns only.
    */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: Column): Long = {
    val (v, schema, all) = currentFiles(spark, path, "delete from")
    val table = spark.read.schema(schema)
      .parquet(all.map(e => s"$path/${relOf(e)}"): _*)
    val affected = table.filter(predicate)
      .select(col("_metadata.file_path")).distinct()
      .collect().map(r => relativize(r.getString(0))).toSet
    if (affected.isEmpty) return v
    val carried = all.filterNot(e => affected(relOf(e)))
    val survivors = spark.read.schema(schema)
      .parquet(all.collect { case e if affected(relOf(e)) =>
        s"$path/${relOf(e)}" }: _*)
      .filter(not(coalesce(predicate, lit(false))))
    writeCommit(spark, survivors, path, carried, schema)
  }

  /** Bin-pack the current snapshot into ~`targetFileBytes` files — the
    * answer to the small-files problem streaming ingestion creates
    * (every [[commitAppend]] micro-batch lands its own files; a
    * thousand triggers later the scan pays a thousand file opens).
    * Rewrites the SAME rows as a new overwrite version: history stays
    * readable, [[rollback]] can undo it, and [[expire]]+[[vacuum]]
    * later reclaim the fragment files. When the table already has no
    * more files than the byte budget calls for, no commit happens and
    * the current version is returned (compaction is idempotent —
    * a scheduler can call it every N batches for free).
    *
    * Sizing uses the files' actual on-disk bytes (compressed), the
    * same signal a table-format maintenance job keys on; the
    * repartition is a round-robin full shuffle of just the affected
    * snapshot — at 100 TB you compact partitions/recent commits, not
    * the world, which is what the no-op fast path gives a caller who
    * compacts right after a burst of small appends.
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L << 20,
              sortBy: Seq[String] = Nil): Long = {
    require(targetFileBytes > 0, "snapshot: targetFileBytes must be positive")
    val (v, schema, all) = currentFiles(spark, path, "compact")
    sortBy.foreach(c => require(schema.fieldNames.contains(c),
      s"snapshot: compact sort column $c is not in the table schema " +
        s"(${schema.fieldNames.mkString(", ")})"))
    val f = fs(spark, path)
    val totalBytes = all.map(e =>
      f.getFileStatus(new Path(s"$path/${relOf(e)}")).getLen).sum
    val want = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
    // an unsorted compaction of an already-packed table is a no-op,
    // but a CLUSTERED one is not: the caller asked for a layout, and
    // whether the current files honor it is unknowable from counts
    if (sortBy.isEmpty && all.size <= want) return v
    val table = spark.read.schema(schema)
      .parquet(all.map(e => s"$path/${relOf(e)}"): _*)
    val packed =
      if (sortBy.isEmpty) table.repartition(want.toInt)
      else table
        // range partitioning gives files DISJOINT key ranges and the
        // within-file sort tightens row-group min/max: after this, a
        // key-predicate scan prunes to one file + few row groups —
        // Delta OPTIMIZE ZORDER's 1-D essence over the same store
        .repartitionByRange(want.toInt, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
    writeCommit(spark, packed, path, Nil, schema)
  }

  /** Roll the table back to `toVersion`: a NEW version whose manifest
    * is a copy of the old one — constant-time, no data IO, and the
    * rolled-back-from snapshot stays readable (rollback is an
    * ordinary commit in the history, not an erasure).
    */
  def rollback(spark: SparkSession, path: String, toVersion: Long): Long = {
    val f = fs(spark, path)
    val (schema, files) = manifest(f, path, toVersion)
    val v = allManifestVersions(f, path).last + 1L
    writeTextAtomic(f, manifestPath(path, v),
      Header +: schema.json +: files)
    writeTextAtomic(f, new Path(s"$path/_latest"), Seq(v.toString))
    v
  }

  /** Drop every manifest older than the newest `keepLast` (the
    * pointer's snapshot always survives). Metadata-only; the files
    * those manifests referenced remain until [[vacuum]] proves no
    * surviving manifest needs them.
    */
  def expire(spark: SparkSession, path: String, keepLast: Int): Int = {
    require(keepLast >= 1, "snapshot: must keep at least one version")
    val f = fs(spark, path)
    val all = allManifestVersions(f, path)
    val latest = latestVersion(spark, path)
    val pinned = tags(spark, path).values.toSet
    val drop = all.dropRight(keepLast)
      .filterNot(latest.contains) // never the pointer's snapshot
      .filterNot(pinned) // never a tagged snapshot — tags PIN history
    drop.foreach(v => f.delete(manifestPath(path, v), false))
    drop.size
  }

  private def tagPath(base: String, name: String): Path = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"snapshot: tag name '$name' must be [A-Za-z0-9._-]+")
    new Path(s"$base/_refs/$name.ref")
  }

  /** Pin a committed version under a NAME — Iceberg-style tags, the
    * reproducibility contract by which a training job records "the
    * corpus I trained on" as `train-2024-06` instead of a bare
    * number. A tagged snapshot is protected from [[expire]] (and so
    * from [[vacuum]] — its manifest survives, its files stay
    * referenced) until the tag is dropped: retention can never
    * silently eat a pinned corpus. Re-tagging an existing name
    * refuses (a tag is a permanent record; [[dropTag]] first is the
    * explicit spelling). Returns the pinned version.
    */
  def tag(spark: SparkSession, path: String, name: String,
          version: Option[Long] = None): Long = {
    val f = fs(spark, path)
    val v = version.orElse(latestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot: no committed version under $path to tag"))
    manifest(f, path, v) // existence check, loud on unknown versions
    val p = tagPath(path, name)
    require(!f.exists(p),
      s"snapshot: tag '$name' already exists (drop it first to retag)")
    writeTextAtomic(f, p, Seq(v.toString))
    v
  }

  /** All tags: name → pinned version. */
  def tags(spark: SparkSession, path: String): Map[String, Long] = {
    val f = fs(spark, path)
    val dir = new Path(s"$path/_refs")
    if (!f.exists(dir)) Map.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".ref"))
      .map(s => s.getPath.getName.stripSuffix(".ref") ->
        readLines(f, s.getPath).head.trim.toLong)
      .toMap
  }

  /** Read the snapshot a tag pins — [[read]] by name. */
  def readTag(spark: SparkSession, path: String, name: String): DataFrame = {
    val v = tags(spark, path).getOrElse(name,
      throw new IllegalArgumentException(
        s"snapshot: no tag '$name' under $path " +
          s"(have: ${tags(spark, path).keys.toSeq.sorted.mkString(", ")})"))
    read(spark, path, Some(v))
  }

  /** Drop a tag (the version becomes expirable again). */
  def dropTag(spark: SparkSession, path: String, name: String): Boolean =
    fs(spark, path).delete(tagPath(path, name), false)

  /** Delete data files referenced by NO manifest on disk: expired
    * history and crashed-commit leftovers. The irreversible half of
    * retention, kept separate from [[expire]] on purpose. Returns the
    * number of files removed (empty commit dirs go with them).
    */
  def vacuum(spark: SparkSession, path: String): Int = {
    val f = fs(spark, path)
    val referenced = allManifestVersions(f, path)
      .flatMap(v => manifestFiles(f, path, v).map(relOf)).toSet
    val dataDir = new Path(s"$path/data")
    if (!f.exists(dataDir)) return 0
    var removed = 0
    f.listStatus(dataDir).foreach { commit =>
      val rel = s"data/${commit.getPath.getName}"
      val it = f.listFiles(commit.getPath, true)
      val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
      var kept = false
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile) {
          if (st.getPath.getName.endsWith(".parquet") &&
              referenced.contains(s"$rel/${st.getPath.getName}")) kept = true
          else doomed += st.getPath
        }
      }
      val doomedParquet = doomed.filter(_.getName.endsWith(".parquet"))
      if (!kept) { // no survivor: the whole commit dir goes
        f.delete(commit.getPath, true); removed += doomedParquet.size
      } else doomedParquet.foreach { p =>
        f.delete(p, false); removed += 1
      }
    }
    removed
  }
}
