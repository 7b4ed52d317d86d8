package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}

/** Whole-operator custom plan: per-key top-k without a global sort.
  *
  * The composed form (`row_number().over(Window.partitionBy(keys)
  * .orderBy(order)) <= k`) shuffles on the keys and then FULLY SORTS
  * every partition — O(n log n) per partition and materialized sort
  * buffers — only to discard all but k rows per key. This operator
  * keeps a bounded k-row heap per key instead: same one shuffle
  * (ClusteredDistribution), O(n log k) work, O(keys·k) memory, no sort
  * spill. At 100 TB ANN scale (n ≫ k) the sort is the dominant cost
  * this removes.
  *
  * Output rows are emitted best-first per key; no rank column is
  * produced (rank the k survivors with a window afterwards — that
  * window sorts only keys·k rows).
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, maxKeysPerPartition: Long,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKeyPlan = copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, maxKeysPerPartition: Long,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val boundOrder = order.map(
      BindReferences.bindReference(_, child.output))
    val keyExprs = keys
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions({ iter =>
      // PQ dequeues its "maximum" = the worst-ranked retained row
      implicit val ordering: Ordering[InternalRow] =
        GenerateOrdering.generate(boundOrder)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      val keyCap = maxKeysPerPartition
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer: copy only on insert
        var pq = heaps.getOrElse(key, null)
        if (pq == null) {
          // fail LOUDLY before the heap map outgrows executor memory
          // (there is no spill path) — the remediation is a config
          // change, and an explicit error beats a task OOM that AQE
          // retries into the same wall
          if (heaps.size >= keyCap)
            throw new IllegalStateException(
              s"TopKPerKeyExec: more than $keyCap distinct keys in one " +
                "partition (heap memory is O(keys*k) with no spill). " +
                "Raise spark.sql.shuffle.partitions so each task sees " +
                "fewer keys, raise maxKeysPerPartition if the memory " +
                "is actually available, or use a row_number window " +
                "(sorts but spills).")
          pq = scala.collection.mutable.PriorityQueue.empty[InternalRow]
          heaps.put(key.copy(), pq)
        }
        if (pq.size < limit) {
          pq += row.copy()
        } else if (ordering.compare(row, pq.head) < 0) {
          pq.dequeue()
          pq += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. Injected via
  * `spark.experimental.extraStrategies` (TopK.ensureStrategy) or
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, maxKeys, child) =>
      TopKPerKeyExec(keys, order, k, maxKeys, planLater(child)) :: Nil
    case _ => Nil
  }
}
