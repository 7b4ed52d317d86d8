package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.util.control.NonFatal

/** Driver-side orchestration utilities re-expressing the reference's
  * manager/processor coordination (SURVEY.md §2.9) in minimal form.
  * None of this touches data — Spark's scheduler, checkpointing, and
  * dynamic partition overwrite do the heavy lifting; what remains is
  * the thin cross-system protocol the reference encoded in files.
  */
object Orchestration {

  /** T2 — utils/ready_signal_creator.py:15-21: the four-phase signal
    * protocol `{key}.{ready|processing|complete|failed}` over a shared
    * filesystem. Kept for interop with external producers; within the
    * engine, streaming checkpoints + `_SUCCESS` markers replace it.
    */
  final class SignalManager(dir: String) {
    private val base = Paths.get(dir)
    Files.createDirectories(base)
    private def p(key: String, state: String): Path =
      base.resolve(s"$key.$state")

    val States: Seq[String] = Seq("ready", "processing", "complete", "failed")

    def signal(key: String, state: String): Unit = {
      require(States.contains(state), s"unknown state $state")
      Files.writeString(p(key, state),
        s"$key $state ${java.time.Instant.now()}\n")
      // complete/failed clears ready+processing
      // (ready_signal_creator.py:108-248)
      if (state == "complete" || state == "failed") {
        Files.deleteIfExists(p(key, "ready"))
        Files.deleteIfExists(p(key, "processing"))
      }
    }

    def state(key: String): Option[String] =
      States.reverse.find(s => Files.exists(p(key, s)))

    /** Keys currently ready and not already taken (T1 poll body). */
    def readyKeys(): Seq[String] =
      Files.list(base).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".ready"))
        .map(_.stripSuffix(".ready"))
        .filter(k => state(k).contains("ready"))
        .toSeq.sorted
  }

  /** T3 — conte-etl-step-2-manager.py:61-123: processed-set
    * idempotency. A line-per-key high-water file; the streaming file
    * source's checkpoint subsumes this for in-engine flows.
    */
  final class ProcessedSet(file: String) {
    private val path = Paths.get(file)

    def contains(key: String): Boolean =
      Files.exists(path) &&
        Files.readAllLines(path).asScala.contains(key)

    /** One-shot read of the whole set — use this (not per-key
      * [[contains]], which re-reads the file) when filtering a batch
      * of candidates.
      */
    def snapshot: Set[String] =
      if (Files.exists(path)) Files.readAllLines(path).asScala.toSet
      else Set.empty

    def add(key: String): Unit = {
      Files.createDirectories(path.getParent)
      Files.writeString(path, s"$key\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** T5 — conte-etl-step-2-processor.py:53,1916-1983: bounded retry
    * with exponential backoff (base·2^(n−1)), for driver-level units of
    * work (a month partition); task-level retries stay with Spark.
    */
  def retryWithBackoff[A](maxRetries: Int = 5, baseDelayMs: Long = 60000L,
                          sleep: Long => Unit = Thread.sleep)
                         (work: => A): A = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try return work
      catch {
        case NonFatal(e) =>
          lastErr = e
          if (attempt < maxRetries)
            sleep(baseDelayMs * (1L << attempt))
          attempt += 1
      }
    }
    throw lastErr
  }

  /** O2 — conte-etl-step-2-processor.py:1660-1671: deterministic work
    * ordering for chunked inputs — originals before chunked rewrites,
    * then by version, then by chunk number. A driver-side listing sort,
    * not a data operator.
    */
  def orderFiles(names: Seq[String]): Seq[String] = {
    val Chunked = raw".*_v(\d+)_chunk(\d+)\..*".r
    names.sortBy {
      case Chunked(v, c) => (1, v.toInt, c.toInt, "")
      case n => (0, 0, 0, n)
    }
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
  private implicit class ListAsScala[A](l: java.util.List[A]) {
    def asScala: Seq[A] = {
      val b = Seq.newBuilder[A]
      l.forEach(a => b += a)
      b.result()
    }
  }
}
