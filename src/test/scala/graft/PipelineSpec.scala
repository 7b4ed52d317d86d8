package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{Fetch, Orchestration, Pipelines}

/** Orchestration protocol + end-to-end pipeline drivers. */
class PipelineSpec extends SparkSpec {

  test("S7 fetch step: idempotent, ordered, retried, atomically staged") {
    val dir = Files.createTempDirectory("graft_fetch")
    val staging = dir.resolve("staging").toString
    val ps = new Orchestration.ProcessedSet(dir.resolve("done.txt").toString)
    val remote = Map(
      "b_v1_chunk2.csv" -> "2", "a.csv" -> "A", "b_v1_chunk1.csv" -> "1")
    var fetchCalls = 0
    def fetch(name: String): Array[Byte] = {
      fetchCalls += 1
      if (fetchCalls == 1) sys.error("transient network failure")
      remote(name).getBytes("UTF-8")
    }
    val staged = Fetch.fetchNew(() => remote.keys.toSeq, fetch,
      staging, ps, maxRetries = 3, baseDelayMs = 1L, sleep = _ => ())
    // originals before chunked rewrites, chunks in numeric order (O2)
    assert(staged === Seq("a.csv", "b_v1_chunk1.csv", "b_v1_chunk2.csv"))
    assert(fetchCalls === 4, "first call failed, was retried")
    assert(Files.readString(java.nio.file.Paths.get(staging, "a.csv"))
      === "A")
    // second pass: everything already in the processed set
    val again = Fetch.fetchNew(() => remote.keys.toSeq, fetch,
      staging, ps, sleep = _ => ())
    assert(again.isEmpty, "refetch of processed files must be skipped")
    assert(fetchCalls === 4)
  }

  test("T2 signal protocol: complete clears ready+processing") {
    val dir = Files.createTempDirectory("graft_sig").toString
    val sm = new Orchestration.SignalManager(dir)
    sm.signal("2024-01", "ready")
    assert(sm.readyKeys() === Seq("2024-01"))
    sm.signal("2024-01", "processing")
    sm.signal("2024-01", "complete")
    assert(sm.state("2024-01") === Some("complete"))
    assert(sm.readyKeys().isEmpty)
  }

  test("T5 retry: succeeds after transient failures, backs off 2^n") {
    var calls = 0
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val r = Orchestration.retryWithBackoff(5, 10L, delays += _) {
      calls += 1
      if (calls < 3) sys.error("transient")
      "ok"
    }
    assert(r === "ok" && calls === 3)
    assert(delays.toSeq === Seq(10L, 20L))
    intercept[RuntimeException] {
      Orchestration.retryWithBackoff(2, 10L, _ => ())(sys.error("always"))
    }
  }

  test("T3 processed-set: second run skips completed months") {
    val dir = Files.createTempDirectory("graft_proc")
    val sm = new Orchestration.SignalManager(dir.resolve("sig").toString)
    val ps = new Orchestration.ProcessedSet(dir.resolve("done.txt").toString)
    var runs = 0
    Pipelines.runMonths(Seq("2024-01", "2024-02"), sm, ps,
      baseDelayMs = 1, sleep = _ => ())(_ => runs += 1)
    Pipelines.runMonths(Seq("2024-01", "2024-02"), sm, ps,
      baseDelayMs = 1, sleep = _ => ())(_ => runs += 1)
    assert(runs === 2, "already-processed months skipped on rerun")
    assert(sm.state("2024-01") === Some("complete"))
  }

  test("O2 file ordering: originals, then chunks by version and number") {
    val in = Seq("b_v2_chunk3.parquet", "a.parquet", "b_v2_chunk1.parquet",
      "b_v1_chunk2.parquet", "c.parquet")
    assert(Orchestration.orderFiles(in) === Seq("a.parquet", "c.parquet",
      "b_v1_chunk2.parquet", "b_v2_chunk1.parquet", "b_v2_chunk3.parquet"))
  }

  test("stage-1 + stage-2 pipelines end to end on a miniature month") {
    import spark.implicits._
    val out1 = Files.createTempDirectory("graft_p1").toString + "/fresco"
    val cpuRaw = Seq(
      (80.0, 0.0, 10.0, 10.0, 0.0, 0.0, 0.0, "jobID1", "n1",
        "01/10/2024 12:00:00"),
      (40.0, 0.0, 10.0, 50.0, 0.0, 0.0, 0.0, "jobID1", "n1",
        "01/10/2024 12:01:00"))
      .toDF("user", "nice", "system", "idle", "iowait", "irq", "softirq",
        "jobID", "node", "timestamp")
    def emptyWith(cols: String*): org.apache.spark.sql.DataFrame =
      cols.foldLeft(Seq.empty[String].toDF("jobID"))(
        (d, c) => d.withColumn(c, lit(null).cast(
          if (c == "timestamp" || c == "node") "string" else "double")))
        .limit(0)
    Pipelines.transformPipeline(spark,
      emptyWith("rd_sectors", "wr_sectors", "rd_ticks", "wr_ticks",
        "node", "timestamp"),
      cpuRaw,
      emptyWith("MemTotal", "MemFree", "FilePages", "node", "timestamp"),
      emptyWith("read_bytes", "write_bytes", "node", "timestamp"),
      out1)
    val fresco = spark.read.parquet(out1)
    assert(fresco.count() === 2)
    assert(fresco.columns.toSet ===
      Set("Job Id", "Host", "Event", "Value", "Units", "Timestamp", "ym"))

    val jobs = Seq(("job1", "2024-01-01 00:00:00", "2024-01-02 00:00:00",
      "2024-01-31 00:00:00", "1:00:00", 1L, 8L, "acct", "q", "jn",
      "alice", "grp", "n1/0", "E", "0"))
      .toDF("jobID", "qtime", "start", "end", "Resource_List.walltime",
        "Resource_List.nodect", "Resource_List.ncpus", "account", "queue",
        "jobname", "user", "group", "exec_host", "jobevent", "Exit_status")
      .withColumn("qtime", to_timestamp(col("qtime")))
      .withColumn("start", to_timestamp(col("start")))
      .withColumn("end", to_timestamp(col("end")))
    val out2 = Files.createTempDirectory("graft_p2").toString + "/wide"
    Pipelines.etlPipeline(fresco.drop("ym"), jobs, out2)
    val wide = spark.read.parquet(out2)
    assert(wide.count() === 2)
    assert(wide.select("value_cpuuser").collect().map(_.getDouble(0)).sorted
      === Array(40.0, 80.0))
    assert(wide.columns.contains("day"), "day partition column present")
  }
}
