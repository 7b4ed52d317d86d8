package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** THE cache contract for engine-held intermediate caches.
  *
  * Several operators persist an internal table that multiple DAG
  * branches of their OWN result consume (jaccard/containment shingle
  * sets, contamination's probe-shingle set, BM25's query-term postings
  * sliver, the curate capstone's quality table). Those results must
  * stay lazy — callers assert on their plans and compose them further —
  * so the operator cannot unpersist before returning (the cache would
  * be dropped before the first action ever reads it). That makes the
  * cache lifetime session-owned by necessity, and previously each
  * operator documented its own ad-hoc variant of this contract.
  *
  * This object is the one shared seam:
  *   - operators register every such cache via [[retain]] (tagged with
  *     the owning operator), so "what is the engine holding?" has one
  *     answer: [[tags]];
  *   - callers done with a corpus release EVERYTHING the engine cached
  *     for a session with one [[release]] call — the unpersist hook the
  *     per-operator docs used to delegate to `spark.catalog.clearCache()`
  *     (which also evicted CALLER caches; this releases only ours).
  *
  * Repeated calls on identical inputs do NOT stack cache entries:
  * Spark's `CacheManager` recognizes an already-cached plan and reuses
  * the existing `InMemoryRelation` (the second `persist` is a no-op),
  * so e.g. `hybridRrfQ` calling [[graft.functions.TextAnalysis.bm25TopK]]
  * twice on the same corpus holds ONE postings cache. Distinct inputs
  * legitimately cache separately and are all dropped by [[release]].
  *
  * Registration is weak ownership, not a second reference count:
  * [[release]] calls `unpersist(blocking = false)`, which is safe on
  * already-unpersisted frames, so operators that manage a bounded cache
  * scope themselves (explicit `unpersist` on their own line) simply
  * never register here.
  */
object CacheScope {
  // all access under this lock: retain's register and release's
  // remove+drain must be atomic with respect to each other, or a
  // retain racing a release could append to an already-drained queue
  // and leave that DataFrame persisted but untracked forever.
  private val held = scala.collection.mutable.Map.empty[
    SparkSession, scala.collection.mutable.ListBuffer[(String, DataFrame)]]

  // the eviction listener each session carries. Tracked apart from
  // `held` — release() clears a session's held entry, and the next
  // retain would otherwise re-install a fresh listener per
  // retain/release cycle (unbounded ListenerBus growth in a
  // long-lived driver). release() also REMOVES the listener from the
  // bus and drops this entry: a driver cycling many short-lived
  // `newSession()`s over one long-lived context must not pin every
  // discarded session until application end.
  private val listening = scala.collection.mutable.Map.empty[
    SparkSession, org.apache.spark.scheduler.SparkListener]

  /** Persist `df` (MEMORY_AND_DISK, the `Dataset.cache()` level) and
    * register it under `tag` for its session. Returns `df` for inline
    * use at the existing `.cache()` call sites.
    *
    * The first registration for a session installs a listener that
    * drops the session's whole entry on application end — a session
    * stopped without [[release]] must not pin the session object and
    * every retained plan tree for the JVM lifetime (multi-session
    * drivers would leak). No unpersist is needed at that point: the
    * stopping context is discarding its block manager anyway.
    */
  def retain(df: DataFrame, tag: String,
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    val s = df.sparkSession
    held.synchronized {
      if (!listening.contains(s)) {
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = held.synchronized {
            held.remove(s); listening.remove(s); ()
          }
        }
        s.sparkContext.addSparkListener(l)
        listening(s) = l
      }
      held.getOrElseUpdate(s,
        scala.collection.mutable.ListBuffer.empty) += (tag -> df)
    }
    df
  }

  /** Tags of every cache the engine currently holds for `spark`, in
    * registration order (duplicates possible: one operator call may
    * retain several tables, or run on several corpora).
    */
  def tags(spark: SparkSession): Seq[String] = held.synchronized {
    held.get(spark).map(_.map(_._1).toList).getOrElse(Nil)
  }

  /** Unpersist every engine-held cache for `spark`; returns how many
    * were released. Non-blocking (eviction proceeds asynchronously),
    * and safe to call at any point — a released cache just recomputes
    * if a still-lazy result is materialized afterwards (correctness is
    * unaffected; only the one-scan economy is).
    */
  def release(spark: SparkSession): Int = {
    val (drained, listener) = held.synchronized {
      (held.remove(spark), listening.remove(spark))
    }
    // drop the bus listener too: a released session may be a
    // discarded newSession() that must become collectable now, not
    // at application end. A later retain simply re-installs one.
    listener.foreach { l =>
      try spark.sparkContext.removeSparkListener(l)
      catch { case _: IllegalStateException => () } // context stopped
    }
    drained match {
      case None => 0
      case Some(q) =>
        q.foreach { case (_, df) => df.unpersist(blocking = false) }
        q.size
    }
  }
}
