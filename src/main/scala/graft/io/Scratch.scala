package graft.io

/** Per-run scratch directories with guaranteed cleanup.
  *
  * Gates and streaming sources stage files and build throwaway index
  * stores under java.io.tmpdir; a fixed world-shared path lets two
  * concurrent runs clobber each other, and `File.deleteOnExit` on a
  * directory silently fails once files land inside it (non-empty dirs
  * don't delete) — each run would leak parquet copies and index stores
  * across invocations. Every caller gets a fresh private dir, and ONE
  * shutdown hook removes all of them recursively at JVM exit.
  */
object Scratch {

  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(d).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: java.io.IOException => () }
      }))

  /** A fresh private temp dir, deleted (recursively) at JVM exit. */
  def dir(prefix: String): java.nio.file.Path = {
    hook
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  /** Write `df` as ONE plain parquet FILE at `dir/name` — the shape a
    * file-source stream lists (it reads plain files, not Spark's
    * part-file directories). Spark writes a one-part directory into an
    * underscore-prefixed scratch subdir (underscore paths are
    * invisible to the file source, so a half-staged write is never
    * consumed), then the part file moves up under the final name.
    */
  def stageSingleParquetFile(df: org.apache.spark.sql.DataFrame,
                             dir: java.nio.file.Path,
                             name: String): Unit = {
    val tmp = dir.resolve(s"_stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"no parquet part written under $tmp"))
    }
    java.nio.file.Files.move(part, dir.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}
