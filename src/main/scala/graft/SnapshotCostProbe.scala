package graft

import org.apache.spark.sql.functions._

/** Phase-level cost of the snapshot-store fixture operations that
  * dominate the `q_snapshot_*` gates' setup seconds: CREATE+INSERT
  * through the catalog (the gates' staging idiom), a direct
  * `Snapshots.commit`, and an appended second commit. Prints one JSON
  * line with per-phase wall seconds; informs — never part of — the
  * bench.
  */
object SnapshotCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-snapshot-cost-probe")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def sec[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.t(spark, sfDir, "documents")
    docs.count() // warm the scan
    val base = graft.io.Scratch.dir("graft_snapcost_").toString

    // 1. plain parquet write of the same frame — the floor
    val tParquet = sec(docs.write.mode("overwrite")
      .parquet(s"$base/plain"))
    // 2. direct commit (unpartitioned)
    val tCommit = sec(graft.io.Snapshots.commit(docs, s"$base/t1"))
    // 3. append on top
    val tAppend = sec(graft.io.Snapshots.commitAppend(docs
      .withColumn("doc_id", col("doc_id") + 5000000L), s"$base/t1"))
    // 4. catalog CREATE + INSERT (the gates' staging idiom), lang-partitioned
    val cat = "gsnapcost"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$base/wh")
    docs.createOrReplaceTempView("snapcost_src")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    val tCreate = sec(spark.sql(s"CREATE TABLE $cat.db.docs (doc_id " +
      "BIGINT, text STRING, lang STRING, source STRING, n_chars " +
      "BIGINT) PARTITIONED BY (lang)"))
    val tInsert1 = sec(spark.sql(s"INSERT INTO $cat.db.docs " +
      "SELECT doc_id, text, lang, source, n_chars FROM snapcost_src"))
    val tInsert2 = sec(spark.sql(s"INSERT INTO $cat.db.docs " +
      "SELECT doc_id + 5000000, text, lang, source, n_chars + 7 " +
      "FROM snapcost_src"))
    def f(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"parquet_floor":${f(tParquet)},"commit":${f(tCommit)},""" +
      s""""append":${f(tAppend)},"create":${f(tCreate)},""" +
      s""""insert1":${f(tInsert1)},"insert2":${f(tInsert2)}}""")
    spark.stop()
  }
}
