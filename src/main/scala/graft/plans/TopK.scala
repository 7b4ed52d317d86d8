package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graft.Bridge

/** Public API for the [[TopKPerKeyPlan]] custom operator. */
object TopK {

  /** Register the planner strategy once per session. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_ eq TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per `keys` group under `order` (use `col.desc` /
    * `col.asc` Columns; bare Columns default to ascending). One
    * shuffle on the keys, bounded heaps instead of a partition sort.
    *
    * MEMORY CONTRACT (100 TB guard): each task holds one k-bounded
    * heap per distinct key in its partition — O(keys-in-partition · k)
    * rows, which is exactly the operator's output for that partition,
    * never the input. This is the right bound when `keys · k` fits in
    * executor memory (the usual top-k-per-group shape: output ≪
    * input). For pathological cardinality (billions of keys × large
    * k), raise `spark.sql.shuffle.partitions` so each task sees
    * proportionally fewer keys — memory scales down linearly — or fall
    * back to a `row_number` window, which sorts but spills.
    *
    * `maxKeysPerPartition` enforces that contract at runtime: a task
    * that accumulates more distinct keys than the cap throws an
    * explicit error (with the remediation above) instead of creeping
    * toward an executor OOM that a retry would only repeat. The
    * default (8M keys/task) is far above any sane per-task key load.
    */
  val DefaultMaxKeysPerPartition: Long = 8000000L

  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
             k: Int,
             maxKeysPerPartition: Long = DefaultMaxKeysPerPartition)
      : DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val orderExprs = order.map(c => Bridge.expression(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(spark, TopKPerKeyPlan(keys.map(Bridge.expression),
      orderExprs, k, maxKeysPerPartition, Bridge.logicalPlan(df)))
  }
}
