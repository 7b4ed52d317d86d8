package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Drains the async listener bus so per-query metric attribution in
  * [[graft.Bench]] is exact: task-end events are posted
  * asynchronously, and without a drain the tail of query N's events
  * would be credited to query N+1. `listenerBus` is
  * `private[spark]`, hence this one-file bridge package — the same
  * accessor shape Spark's own test harness uses.
  */
object ListenerFlush {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
