package graft

import org.apache.spark.sql.functions._
import graft.etl.SkewJoin

/** Salting must never change join results, only shuffle shape. */
class SkewJoinSpec extends SparkSpec {

  test("salted join == plain join on a hot-key fact table") {
    import spark.implicits._
    // 90% of fact rows hit one key — the salting target scenario
    val fact = (1L to 1000L).map(i =>
      (i, if (i <= 900) 7L else i % 20, i * 1.5)).toDF("row_id", "k", "v")
    val dim = (0L until 20L).map(k => (k, s"dim_$k")).toDF("k", "label")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", col("row_id"), 8)
    val plain = fact.join(dim, "k")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("twoPhaseDistinct == direct count(DISTINCT) on a hot key") {
    import spark.implicits._
    // key "hot" carries 900 of 1000 rows across 30 distinct users
    val df = (1L to 1000L).map(i =>
      if (i <= 900) ("hot", i % 30) else (s"cold_${i % 5}", i % 7))
      .toDF("k", "u")
    val got = SkewJoin.twoPhaseDistinct(df, "k", "u")
    val want = df.groupBy("k")
      .agg(countDistinct("u").as("n_distinct"), count(lit(1)).as("n_rows"))
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0)
  }
}
