package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.io.Snapshots

/** Storage-partitioned joins (SPARK-37375 posture): two snapshot
  * tables bucket-partitioned alike on the join key join with ZERO
  * Exchange nodes — the write-time bucket layout IS the join
  * distribution. At 100 TB the eliminated shuffle is the entire cost
  * of the join; this suite pins both the no-shuffle plan shape and
  * result exactness against the plain (shuffling) join.
  */
class SnapshotSpjSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_spj").toString
    val name = s"gspj${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.io.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    (name, wh)
  }

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def executedPlan(df: DataFrame): String = {
    df.collect() // finalize any adaptive plan before inspecting
    df.queryExecution.executedPlan.toString
  }

  private def setupTables(cat: String): Unit = {
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.ord (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_totalprice DOUBLE) " +
      "PARTITIONED BY (bucket(8, o_custkey))")
    spark.sql(s"CREATE TABLE $cat.db.cust (c_custkey BIGINT, " +
      "c_name STRING, c_acctbal DOUBLE) " +
      "PARTITIONED BY (bucket(8, c_custkey))")
    Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView("spj_orders_src")
    Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
      .createOrReplaceTempView("spj_cust_src")
    spark.sql(s"INSERT INTO $cat.db.ord SELECT * FROM spj_orders_src")
    spark.sql(s"INSERT INTO $cat.db.cust SELECT * FROM spj_cust_src")
  }

  private def joinSql(cat: String): String =
    s"SELECT c.c_custkey AS k, o.o_totalprice AS price, " +
      s"c.c_acctbal AS bal FROM $cat.db.ord o " +
      s"JOIN $cat.db.cust c ON o.o_custkey = c.c_custkey"

  test("bucket(8)-aligned tables join with zero Exchange nodes, results exact") {
    val (cat, _) = freshCatalog()
    setupTables(cat)
    // sums over DECIMAL: double addition order differs between the
    // shuffled and the partition-aligned plan
    def summarize(df: DataFrame) =
      df.agg(count(lit(1)), sum("k"),
        sum(col("price").cast("decimal(28,2)")),
        sum(col("bal").cast("decimal(28,2)"))).head()
    val expect = summarize(Tables.t(spark, sf, "orders").as("o")
      .join(Tables.t(spark, sf, "customer").as("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .select(col("c.c_custkey").as("k"),
        col("o.o_totalprice").as("price"),
        col("c.c_acctbal").as("bal")))
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      // broadcast off: a broadcast join is trivially shuffle-free -
      // the pin must prove the PARTITION-ALIGNED join needs none
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(joinSql(cat))
      val p = executedPlan(df)
      assert(p.contains("graft-snapshot spj"), p)
      assert(!p.contains("Exchange"),
        s"storage-partitioned join planned a shuffle:\n$p")
      val got = summarize(df)
      assert(got === expect)
    }
  }

  test("same tables with v2 bucketing OFF read via the V1 path and still answer exactly") {
    val (cat, _) = freshCatalog()
    setupTables(cat)
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "false") {
      val df = spark.sql(joinSql(cat))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("graft-snapshot spj"), p)
      assert(df.count() ===
        Tables.t(spark, sf, "orders").count())
    }
  }

  test("DSv2 path: equality point lookup prunes to one bucket's files and stays exact") {
    val (cat, wh) = freshCatalog()
    setupTables(cat)
    val key = Tables.t(spark, sf, "orders")
      .select("o_custkey").head().getLong(0)
    val expect = Tables.t(spark, sf, "orders")
      .filter(col("o_custkey") === key)
      .agg(count(lit(1)), sum("o_totalprice")).head()
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val df = spark.sql(s"SELECT count(*), sum(o_totalprice) " +
        s"FROM $cat.db.ord WHERE o_custkey = $key")
      assert(df.queryExecution.executedPlan.toString
        .contains("graft-snapshot spj"))
      assert(df.head() === expect)
      // the manifest keeps >1 bucket directory; the pruned scan must
      // plan strictly fewer input partitions than the full read
      val full = spark.sql(s"SELECT * FROM $cat.db.ord")
      val fullParts = full.rdd.getNumPartitions
      val pruned = spark.sql(
        s"SELECT * FROM $cat.db.ord WHERE o_custkey = $key")
      assert(pruned.rdd.getNumPartitions < fullParts,
        s"point lookup did not prune: ${pruned.rdd.getNumPartitions} " +
          s"vs $fullParts")
    }
  }

  test("DSv2 path agrees with the programmatic read on every row (column pruning + filters)") {
    val (cat, wh) = freshCatalog()
    setupTables(cat)
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val v2 = spark.sql(s"SELECT o_orderkey, o_totalprice " +
        s"FROM $cat.db.ord WHERE o_totalprice > 1000.0")
      val prog = Snapshots.read(spark, s"$wh/db/ord")
        .filter(col("o_totalprice") > 1000.0)
        .select("o_orderkey", "o_totalprice")
      assert(v2.exceptAll(prog).isEmpty && prog.exceptAll(v2).isEmpty)
      assert(v2.count() === prog.count())
    }
  }

  test("bucket function: catalog-loaded produceResult matches the write-time directory layout") {
    val (cat, wh) = freshCatalog()
    setupTables(cat)
    import org.apache.spark.sql.types._
    val bound = graft.io.GraftBucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("v", LongType))))
    // every stored row must hash into the bucket directory it lives
    // in: recompute with the V2 function and compare to the dirs
    val perBucket = Snapshots.read(spark, s"$wh/db/ord")
      .select("o_custkey").distinct().collect().map(_.getLong(0))
    perBucket.take(200).foreach { k =>
      val viaFn = bound.asInstanceOf[
        org.apache.spark.sql.connector.catalog.functions
          .ScalarFunction[Integer]]
        .produceResult(org.apache.spark.sql.catalyst.InternalRow(8, k))
      val viaSql = spark.range(1)
        .select(pmod(xxhash64(lit(k)), lit(8)).cast("int")).head.getInt(0)
      assert(viaFn === viaSql, s"key $k: fn $viaFn vs layout $viaSql")
    }
  }
}
