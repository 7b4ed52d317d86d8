package org.apache.spark.sql.graft

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptContext, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** `private[sql]` seam for the DSv2 batch WRITE path
  * ([[graft.io.SnapshotBatchWrite]]): builds the SAME serializable
  * parquet `OutputWriterFactory` Spark's own `FileFormatWriter`
  * ships to executors — compression codec from the session conf,
  * `ParquetWriteSupport` schema wiring, output-timestamp-type and
  * rebase settings included — so files written by a DSv2
  * `DataWriter` are byte-compatible with the V1
  * `DataFrameWriter.parquet` files the store committed historically.
  * Without this seam the writer factory (a `sql`-private class
  * hierarchy) could not be constructed from library code.
  */
object WriteBridge {

  /** Everything a task needs to open parquet writers: the prepared
    * factory plus the job's Hadoop conf (Spark's serializable
    * wrapper — `Configuration` itself is not serializable).
    */
  final case class TaskWriteSupport(
      factory: OutputWriterFactory,
      conf: SerializableConfiguration) extends Serializable {

    /** A per-task Hadoop context — parquet-mr reads codec/page
      * settings from it. Fresh `Configuration` copy per task: Hadoop
      * conf objects are not thread-safe and `local[32]` runs many
      * tasks in one JVM.
      */
    def context(partitionId: Int, attemptNumber: Int)
        : TaskAttemptContext = {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID("graft-write", 0), TaskType.MAP,
          partitionId),
        attemptNumber)
      new TaskAttemptContextImpl(
        new org.apache.hadoop.conf.Configuration(conf.value), attempt)
    }

    def fileExtension(ctx: TaskAttemptContext): String =
      factory.getFileExtension(ctx)

    def newWriter(path: String, dataSchema: StructType,
                  ctx: TaskAttemptContext): OutputWriter =
      factory.newInstance(path, dataSchema, ctx)
  }

  /** Prepare a parquet write of `dataSchema` (PHYSICAL column names)
    * under the session's parquet settings; `extraConf` carries
    * per-table Hadoop keys (the store's `write.bloom.columns` →
    * `parquet.bloom.filter.enabled#col`).
    */
  def parquetWriteSupport(spark: SparkSession, dataSchema: StructType,
                          extraConf: Map[String, String])
      : TaskWriteSupport = {
    val conf = spark.sessionState.newHadoopConf()
    extraConf.foreach { case (k, v) => conf.set(k, v) }
    val job = Job.getInstance(conf)
    val factory =
      new ParquetFileFormat().prepareWrite(spark, job, Map.empty,
        dataSchema)
    // snapshot-store files always write timestamps as INT64 MICROS,
    // whatever the session writes elsewhere: legacy INT96 carries no
    // usable min/max statistics (its ordering is deprecated), so a
    // store written with it could never commit the 'U'-kind bounds
    // that make `WHERE ts BETWEEN a AND b` prune at the manifest.
    // ParquetWriteSupport reads this key from the TASK-side hadoop
    // conf prepareWrite populated — overriding here scopes the
    // choice to store files only (Verify result dumps and user
    // sinks keep the session default, which external readers
    // interpret as tz-naive).
    job.getConfiguration.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")
    TaskWriteSupport(factory,
      new SerializableConfiguration(job.getConfiguration))
  }
}
