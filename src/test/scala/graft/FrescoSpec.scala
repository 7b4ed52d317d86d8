package graft

import org.apache.spark.sql.functions._
import graft.functions.Fresco

/** Unit + property tests for the scalar function library (SURVEY §2.8).
  * Property sweeps use deterministic seeded generators (scalatestplus
  * bridge is not in the offline cache).
  */
class FrescoSpec extends SparkSpec {


  private def eval1(c: org.apache.spark.sql.Column,
                    input: Seq[String]): Seq[Any] = {
    import spark.implicits._
    input.toDF("x").select(c.as("r")).collect().map(_.get(0)).toSeq
  }

  test("F10 walltime: numeric passthrough, H:MM:SS, MM:SS, garbage") {
    val in = Seq("3600", "1:30:00", "90:00", "2:05", "garbage", "1:2:3:4")
    val out = eval1(Fresco.walltimeToSeconds(col("x")), in)
    assert(out === Seq(3600.0, 5400.0, 5400.0, 125.0, null, null))
  }

  test("F10 walltime: property — H:MM:SS always h*3600+m*60+s") {
    val cases = sweepValues(r =>
      (r.nextInt(300), r.nextInt(60), r.nextInt(60)))
    val in = cases.map { case (h, m, s) => f"$h%d:$m%02d:$s%02d" }
    val out = eval1(Fresco.walltimeToSeconds(col("x")), in)
    cases.zip(out).foreach { case ((h, m, s), o) =>
      assert(o === h * 3600.0 + m * 60.0 + s, s"$h:$m:$s")
    }
  }

  private def sweepValues[A](gen: scala.util.Random => A): Seq[A] = {
    val rnd = new scala.util.Random(42)
    (1 to 60).map(_ => gen(rnd))
  }

  test("F8 standardizeJobId: idempotent and digit-extracting") {
    val in = Seq("jobID123", "job.456.host", "nodigits", "789")
    val once = eval1(Fresco.standardizeJobId(col("x")), in)
    assert(once === Seq("JOB123", "JOB456", "nodigits", "JOB789"))
    val twice = eval1(
      Fresco.standardizeJobId(Fresco.standardizeJobId(col("x"))), in)
    assert(twice === once, "f(f(x)) must equal f(x)")
  }

  test("F7 jobIdPrefix: null -> unknown, case-insensitive rewrite") {
    import spark.implicits._
    val out = Seq(Some("jobid42"), Some("JOBID7"), None).toDF("x")
      .select(Fresco.jobIdPrefix(col("x"))).collect().map(_.getString(0))
    assert(out === Array("JOB42", "JOB7", "unknown"))
  }

  test("F2 clip: property — result always within [min, max]") {
    import spark.implicits._
    val vals = sweepValues(r => r.nextDouble() * 2e6 - 1e6)
    val out = vals.toDF("x")
      .select(Fresco.clip(col("x"), 0.0, 100.0)).collect()
      .map(_.getDouble(0))
    vals.zip(out).foreach { case (v, o) =>
      assert(o >= 0.0 && o <= 100.0)
      if (v >= 0.0 && v <= 100.0) assert(o === v)
    }
  }

  test("F1 safeDiv: zero/null denominator -> default") {
    import spark.implicits._
    val df = Seq((1.0, 0.0), (4.0, 2.0)).toDF("a", "b")
    val r = df.select(Fresco.safeDiv(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(r === Array(0.0, 2.0))
    val n = Seq((Some(1.0), Option.empty[Double])).toDF("a", "b")
      .select(Fresco.safeDiv(col("a"), col("b"))).head().getDouble(0)
    assert(n === 0.0)
  }

  test("F11 hostList: distinct, sorted, quote-stripped; no match -> null") {
    val in = Seq("node1/0+node1/1+node2/0", "a/0", "plain", null)
    import spark.implicits._
    val out = in.map(Option(_)).toDF("x")
      .select(Fresco.hostList(col("x"))).collect().map(_.getString(0))
    assert(out === Array("[node1, node2]", "[a]", null, null))
  }

  test("F12 exitcode: all branches") {
    import spark.implicits._
    val in = Seq(("E", "0"), ("E", "271"), ("A", "1"), ("S", ""),
      ("Q", ""), ("X", "9"))
    val out = in.toDF("je", "es")
      .select(Fresco.exitStatusDescription(col("je"), col("es")))
      .collect().map(_.getString(0))
    assert(out === Array("COMPLETED", "FAILED:271", "ABORTED", "STARTED",
      "QUEUED", "X:9"))
  }

  test("W1a nfs rate: preserves the code's (cum-delta)/dt quirk") {
    import spark.implicits._
    // cum=2 MiB, delta=1 MiB, dt=1 s: the docstring's delta/dt would be
    // 1.0 MB/s; the shipped code computes (cum-delta)/dt = 1.0 too when
    // cum=2*delta — use cum=3 MiB to discriminate: code -> 2.0, doc -> 1.0
    val mib = 1048576.0
    val r = Seq((3 * mib, 1 * mib, 1.0)).toDF("cum", "delta", "dt")
      .select(Fresco.nfsRateMBs(col("cum"), col("delta"), col("dt")))
      .head().getDouble(0)
    assert(r === 2.0, "must be (cum-delta)/dt, not delta/dt")
  }

  test("W1a nfs rate: dt clamped at 0.1 s") {
    import spark.implicits._
    val r = Seq((1048576.0, 0.0, 0.0)).toDF("cum", "delta", "dt")
      .select(Fresco.nfsRateMBs(col("cum"), col("delta"), col("dt")))
      .head().getDouble(0)
    assert(r === 10.0) // 1 MiB / 0.1 s
  }

  test("F3 calculateRate: (cur-prev)/dt with zero-dt guard") {
    import spark.implicits._
    val r = Seq((10.0, 4.0, 2.0), (10.0, 4.0, 0.0))
      .toDF("cur", "prev", "dt")
      .select(Fresco.calculateRate(col("cur"), col("prev"), col("dt")))
      .collect().map(_.getDouble(0))
    assert(r === Array(3.0, 0.0))
  }

  test("F13 pivotEvents: row count preserved, one non-null value per row") {
    import spark.implicits._
    val df = Seq(("cpuuser", 1.0), ("nfs", 2.0), ("cpuuser", 3.0),
      ("block", 4.0)).toDF("Event", "Value")
    val out = Fresco.pivotEvents(df)
    assert(out.count() === 4, "pivot must NOT collapse rows")
    assert(!out.columns.contains("Event") && !out.columns.contains("Value"))
    val nonNullCounts = out.select(
      Fresco.KnownEvents.map(e =>
        sum(when(col(s"value_$e").isNotNull, 1).otherwise(0)).as(e)): _*)
      .head()
    assert((0 until 6).map(nonNullCounts.getLong).sum === 4)
  }

  test("F5 cpuPercent: no upper clamp (multi-core > 100 allowed)") {
    import spark.implicits._
    // user alone exceeds total via tiny denominator contribution ordering
    val r = Seq((99.0, 99.0, 0.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("u", "n", "s", "i", "io", "irq", "so")
      .select(Fresco.cpuPercent(col("u"), col("n"), col("s"), col("i"),
        col("io"), col("irq"), col("so"))).head().getDouble(0)
    assert(r === 100.0)
    val neg = Seq((-5.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("u", "n", "s", "i", "io", "irq", "so")
      .select(Fresco.cpuPercent(col("u"), col("n"), col("s"), col("i"),
        col("io"), col("irq"), col("so"))).head().getDouble(0)
    assert(neg === 0.0, "negative ratio clamped at 0")
  }
}
