package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Phase-level cost breakdown of the stream-stream join gates (the
  * bench's most expensive family): how much of the wall time is
  * source staging (a Spark write job per side) vs the streaming query
  * itself (trigger planning + state-store lifecycle + sink), and how
  * the query time responds to the state-partition count (RocksDB
  * instances per stateful operator = shuffle partitions at query
  * start: a stream-stream join runs FOUR stores per partition).
  * Prints one JSON line; informs — never part of — the bench.
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-stream-cost-probe")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def sec[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // staging cost: the two flush-sentinel source builds a join gate pays
    val (_, stage1) = sec(Streams.eventsWithFlushSentinelStream(spark, sfDir))
    val (_, stage2) = sec(Streams.eventsWithFlushSentinelStream(spark, sfDir))
    // query cost at the session default partition count, staged sources
    // prebuilt so ONLY the streaming query is timed
    def joinOnce(tag: String, parts: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val l = Streams.eventsWithFlushSentinelStream(spark, sfDir)
      val r = Streams.eventsWithFlushSentinelStream(spark, sfDir)
      val (_, t) = sec {
        Streams.runToTable(Streams.purchaseClickJoin(l, r),
          s"probe_join_$tag", OutputMode.Append())
          .filter(!(col("user_id") < 0)).count()
      }
      t
    }
    val dflt = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val t32a = joinOnce("a32", dflt)
    val t32b = joinOnce("b32", dflt)
    val t8 = joinOnce("c8", 8)
    val t2 = joinOnce("d2", 2)
    spark.conf.set("spark.sql.shuffle.partitions", dflt.toString)
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"stage_first":${f(stage1)},"stage_warm":${f(stage2)},""" +
      s""""join_p${dflt}_cold":${f(t32a)},"join_p${dflt}_warm":${f(t32b)},""" +
      s""""join_p8":${f(t8)},"join_p2":${f(t2)}}""")
    spark.stop()
  }
}
