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
}
