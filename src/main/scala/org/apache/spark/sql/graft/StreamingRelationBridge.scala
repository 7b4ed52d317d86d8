package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

/** Wrap a resolved [[BaseRelation]] as a STREAMING DataFrame — what
  * `FileStreamSource.getBatch` does internally for the built-in file
  * source: a DSv1 `Source` must hand MicroBatchExecution a plan with
  * `isStreaming = true`, and both `LogicalRelation`'s flag and
  * `Dataset.ofRows` are `private[sql]`, hence this one-file bridge
  * package (the same accessor shape as the listener-bus drain).
  */
object StreamingRelationBridge {
  def streamingFrom(spark: SparkSession, rel: BaseRelation): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      LogicalRelation(rel, isStreaming = true))
}
