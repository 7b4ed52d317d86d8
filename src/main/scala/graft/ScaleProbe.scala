package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10× scale probe (`sbt "runMain graft.ScaleProbe"`) — the
  * evidence run behind `BENCH_sf1_probe.json`: replicates the sf0.1
  * tables 10× into a scratch dir with per-copy key shifts (sf1-scale
  * row counts; graph keys shift too, so the part–supplier graph gets
  * 10× NODES, not 10× parallel edges) and times the most expensive
  * queries at both scales with the bench protocol (min-of-2, task
  * metrics, load recorded). Surfaces the nonlinearities the sf0.1
  * gate bench cannot: iterative-graph shuffle growth, dedup
  * candidate blowup, BPE driver heap, stream-join state. NOT part of
  * the driver contract and NOT an oracle gate — the fabricated
  * replicas exist only to scale cost, their row values mean nothing.
  *
  * Documents get a per-copy token suffix (text + recomputed n_chars)
  * so exact/fuzzy dedup does not degenerate into 10-way duplicate
  * groups that no real 10× corpus would have.
  */
object ScaleProbe {

  private def buildIfMissing(spark: SparkSession, src: String,
                             dst: String, factor: Int): Unit = {
    val f = new java.io.File(dst)
    if (new java.io.File(f, "_READY").exists()) return
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f.mkdirs()
    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionByName _)
    def save(name: String, df: DataFrame): Unit =
      df.write.parquet(s"$dst/$name.parquet")
    // dims stay constant (the TPC-H posture for region/nation; the
    // probe queries do not join the other dims at scale)
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      org.apache.commons.io.FileUtils.copyFile(
        new java.io.File(s"$src/$t.parquet"),
        new java.io.File(s"$dst/$t.parquet"))
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val Seq(mo, mp, ms) = li
      .agg(max("l_orderkey"), max("l_partkey"), max("l_suppkey"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long] + 1L)
    save("lineitem", copies(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * mo))
        .withColumn("l_partkey", col("l_partkey") + lit(i * mp))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * ms))
    })
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val moo = orders.agg(max("o_orderkey")).collect()(0).getLong(0) + 1L
    save("orders", copies(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * moo))
    })
    val ev = spark.read.parquet(s"$src/events.parquet")
    val Seq(me, mu) = ev.agg(max("event_id"), max("user_id"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long] + 1L)
    save("events", copies(ev) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * me))
        .withColumn("user_id", col("user_id") + lit(i * mu))
    })
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val md = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1L
    // per-copy LETTER TRANSLATION (rotate the 10 most common English
    // letters), not a suffix: a one-token suffix left cross-copy
    // Jaccard ≈ 1, so every doc gained 9 near-copies and the
    // candidate-pair graph grew ~45× while rows grew 10× — the
    // r15 probe measured that fixture artifact as a 12.8× dedup
    // ratio. Translation rewrites nearly every character trigram,
    // so cross-copy similarity collapses below any threshold while
    // WITHIN-copy dup structure (the same mapping applied to both
    // members of a real dup pair) is preserved exactly — a 10×
    // corpus with the 1× corpus's dup RATE, which is what a real
    // 10× crawl looks like.
    save("documents", copies(docs) { (d, i) =>
      val shifted = d.withColumn("doc_id", col("doc_id") + lit(i * md))
      if (i == 0) shifted
      else {
        val alpha = "etaoinsrhl"
        val perm = alpha.substring(i) + alpha.substring(0, i)
        shifted.withColumn("text",
          translate(col("text"), alpha, perm))
      }
    })
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val mv = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1L
    save("embeddings", copies(emb) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * mv))
    })
    new java.io.File(f, "_READY").createNewFile()
    ()
  }

  private val Probes = Seq(
    "q_connected_components", "q_pagerank", "q_weighted_paths",
    "q_triangles", "q_bfs_hops",
    "q_dedup_clusters", "q_dedup_fuzzy", "q_semantic_dedup",
    "q_leakage_split", "q_training_mix", "q_curation",
    "q_bpe_train", "q_bpe_store_roundtrip",
    "q_bm25_topk", "q_trained_score",
    "q_stream_join", "q_stream_index")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val factor =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_FACTOR", "10").toInt
    val passes =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    // args override the default probe list — e.g. the snapshot/DSv2
    // gate family, whose cost is dominated by the catalog-table
    // build + scan machinery the default list never touches
    val probes = if (args.nonEmpty) args.toSeq else Probes
    val spark = GraftSession.build("graft-scale-probe")
    val dst = s"/tmp/graft_sf_probe_x$factor"
    buildIfMissing(spark, src, dst, factor)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadAvg()
    val metrics = new QueryMetricsListener
    spark.sparkContext.addSparkListener(metrics)
    def run(dir: String): Map[String, (Double, Long, Long, Long)] = {
      def pass() = {
        spark.catalog.clearCache()
        probes.map { name =>
          org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
            spark.sparkContext)
          metrics.reset()
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.ListenerFlush.waitUntilEmpty(
            spark.sparkContext)
          name -> (dt, metrics.snapshot)
        }
      }
      val ps = (1 to passes).map(_ => pass())
      probes.map { n =>
        val runs = ps.map(_.toMap.apply(n))
        val best = runs.minBy(_._1)
        n -> ((math.rint(best._1 * 1000) / 1000, best._2._1,
          best._2._2, best._2._3))
      }.toMap
    }
    val base = run(src)
    val scaled = run(dst)
    val qs = probes.map { n =>
      val (t0, _, _, _) = base(n)
      val (t1, sr, sw, pm) = scaled(n)
      s""""$n":{"sf01_sec":$t0,"x${factor}_sec":$t1,""" +
        s""""ratio":${math.rint(t1 / math.max(t0, 1e-9) * 100) / 100},""" +
        s""""shuffle_read":$sr,"shuffle_write":$sw,"peak_mem":$pm}"""
    }.mkString(",")
    println(s"""{"metric":"scale_probe","factor":$factor,""" +
      s""""passes":$passes,"load_start":$loadStart,""" +
      s""""load_end":${loadAvg()},"queries":{$qs}}""")
  }
}
