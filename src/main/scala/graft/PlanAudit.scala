package graft

import org.apache.spark.sql.SparkSession

/** Prints physical plans for the scale-critical queries so shuffle /
  * broadcast / pushdown regressions are visible (`sbt "runMain
  * graft.PlanAudit [query ...]"`). Not part of the driver contract.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted =
      if (args.nonEmpty) args.toSeq
      else Seq("q_scan_filter_project", "q_stage2_spine", "q_join_broadcast",
        "q_window_lag", "q_stage1_nfs", "q_jaccard_pairs", "q_dedup_fuzzy",
        "q_cosine_topk", "q_ann_topk", "q_month_split",
        "q_bloom_join", "q_table_diff", "q_cdc_apply", "q_weighted_sample",
        "q_chunk_docs", "q_dq_checks", "q_sessionize", "q_resample",
        "q_intersect_keys", "q_etl_month", "q_stage1_mem",
        "q_encode_tokens_bpe", "q_tfidf", "q_ivf_topk")
    wanted.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
