package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.Stage2

/** Contract tests for the stage-2 join & widen pipeline (SURVEY §3.3). */
class Stage2Spec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val tsDf = {
    import spark.implicits._
    Seq(
      ("jobID1", "h1", "cpuuser", 50.0, "CPU %", ts("2024-01-10 12:00:00")),
      ("jobID1", "h1", "nfs", 2.0, "MB/s", ts("2024-01-10 13:00:00")),
      ("jobID1", "h1", "cpuuser", 60.0, "CPU %", ts("2024-02-01 00:00:00")), // outside
      ("jobID2", "h2", "block", 1.5, "GB/s", ts("2024-01-05 00:00:00")),
      ("jobID9", "h9", "cpuuser", 10.0, "CPU %", ts("2024-01-10 12:00:00"))) // no job
      .toDF("Job Id", "Host", "Event", "Value", "Units", "Timestamp")
  }

  private lazy val jobsDf = {
    import spark.implicits._
    Seq(
      ("job1", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"),
        ts("2024-01-31 00:00:00"), "12:00:00", 2L, 16L, "acct1", "q1",
        "name1", "alice", "grp1", "n1/0+n2/0", "E", "0"),
      ("job2", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"),
        ts("2024-01-31 00:00:00"), "30:00", 1L, 8L, "acct2", "q2",
        "name2", "bob", "grp2", "n3/0", "A", "1"))
      .toDF("jobID", "qtime", "start", "end", "Resource_List.walltime",
        "Resource_List.nodect", "Resource_List.ncpus", "account", "queue",
        "jobname", "user", "group", "exec_host", "jobevent", "Exit_status")
  }

  private lazy val out = Stage2.joinAndWiden(tsDf, jobsDf)

  test("contract: exactly the 22 columns, in order, with contract types") {
    assert(out.columns.toSeq === Stage2.OutputColumns.map(_._1))
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    Stage2.OutputColumns.foreach { case (n, dt) =>
      assert(types(n) === dt, s"column $n")
    }
  }

  test("interval containment: every row start_time <= time <= end_time") {
    val bad = out.filter(col("time") < col("start_time") ||
      col("time") > col("end_time")).count()
    assert(bad === 0)
    assert(out.count() === 3, "out-of-interval and unmatched rows dropped")
  }

  test("key normalization joins jobID1 with job1") {
    assert(out.filter(col("jid") === "JOB1").count() === 2)
  }

  test("derivations: walltime, host_list, exitcode") {
    val r = out.filter(col("jid") === "JOB1").head()
    assert(r.getAs[Double]("timelimit") === 43200.0)
    assert(r.getAs[String]("host_list") === "[n1, n2]")
    assert(r.getAs[String]("exitcode") === "COMPLETED")
    val r2 = out.filter(col("jid") === "JOB2").head()
    assert(r2.getAs[Double]("timelimit") === 1800.0)
    assert(r2.getAs[String]("exitcode") === "ABORTED")
    assert(r2.getAs[Double]("nhosts") === 1.0, "nhosts is double by contract")
  }

  test("pivot: one value_* populated per row, unmentioned ones null") {
    val r = out.filter(col("jid") === "JOB2").head()
    assert(r.getAs[Double]("value_block") === 1.5)
    assert(r.isNullAt(r.fieldIndex("value_cpuuser")))
    assert(r.isNullAt(r.fieldIndex("value_gpu_usage")))
  }

  test("projectContract: missing columns appear as typed nulls") {
    import spark.implicits._
    val sparse = Seq(("x", 1.0)).toDF("jid", "value_nfs")
    val p = Stage2.projectContract(sparse)
    assert(p.columns.toSeq === Stage2.OutputColumns.map(_._1))
    val r = p.head()
    assert(r.isNullAt(r.fieldIndex("time")))
    assert(r.getAs[Double]("value_nfs") === 1.0)
    assert(p.schema("time").dataType === TimestampType)
  }

  test("plan: accounting side is broadcast, not shuffled") {
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected BroadcastHashJoin in:\n$plan")
  }
}
