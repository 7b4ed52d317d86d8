package graft.pipeline

import java.nio.file.{Files, Paths, StandardCopyOption}

/** S7 — the reference's HTTP directory-scrape ingestion
  * (`transform_conte_ts_data.py:872-892` lists a remote index page;
  * `:639-747` downloads each file, verifies, and stages it for the
  * processor). This is deliberately OUT of the data engine (SURVEY
  * §2.1): fetching is a driver-side, pre-Spark lifecycle step. What
  * the engine owns is the contract AFTER the fetch — a staging
  * directory the streaming file source (`Streams.eventsStream`) or a
  * batch read consumes.
  *
  * The transport is injected (`list`/`fetch` functions) so the step is
  * testable without network egress and swappable for HTTP
  * ([[HttpTransport]] is the shipped real implementation), S3 listing,
  * or a message queue; the durable parts — idempotency via
  * [[Orchestration.ProcessedSet]], deterministic ordering via
  * [[Orchestration.orderFiles]], bounded retry via
  * [[Orchestration.retryWithBackoff]] — are the reference's actual
  * semantics and are real here.
  */
object Fetch {

  /** One fetch pass: list remote entries, drop already-fetched ones,
    * fetch the rest (with bounded retry) in deterministic order into
    * `stagingDir`, and record each success in the processed set.
    * Returns the newly staged file names.
    *
    * Crash-safety: a file is staged via temp-file + atomic move, and
    * recorded processed only after the move — a crash between the two
    * refetches (idempotent) rather than skips (data loss).
    */
  def fetchNew(list: () => Seq[String],
               fetch: String => Array[Byte],
               stagingDir: String,
               processed: Orchestration.ProcessedSet,
               maxRetries: Int = 5,
               baseDelayMs: Long = 1000L,
               sleep: Long => Unit = Thread.sleep): Seq[String] = {
    val staging = Paths.get(stagingDir)
    Files.createDirectories(staging)
    val done = processed.snapshot // one read, not one per candidate
    val todo = Orchestration.orderFiles(list().filterNot(done))
    todo.map { name =>
      // validate BEFORE the retry loop: a malformed name is a permanent
      // error — retrying it just burns the full backoff schedule
      val target = staging.resolve(name).normalize()
      require(target.getParent == staging && !name.isEmpty,
        s"remote entry '$name' is not a plain file name")
      Orchestration.retryWithBackoff(maxRetries, baseDelayMs, sleep) {
        val bytes = fetch(name)
        val tmp = Files.createTempFile(staging, "fetch", ".part")
        Files.write(tmp, bytes)
        Files.move(tmp, target,
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        processed.add(name)
        name
      }
    }
  }
}
