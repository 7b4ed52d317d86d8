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

  test("twoPhaseDistinct ignores NULLs like count(DISTINCT)") {
    import spark.implicits._
    // per key: 2 non-null users + nulls; count(DISTINCT u) must be 2
    // while n_rows still counts the null-valued rows
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("a", None), ("b", None)).toDF("k", "u")
    val got = SkewJoin.twoPhaseDistinct(df, "k", "u")
    val want = df.groupBy("k")
      .agg(countDistinct("u").as("n_distinct"), count(lit(1)).as("n_rows"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("binned range join == plain BETWEEN join, any binWidth") {
    import spark.implicits._
    val pts = (0L until 500L).map(i => (i, (i % 97).toDouble))
      .toDF("id", "p")
    // overlapping, boundary-touching, and empty intervals
    val iv = Seq((0L, 0.0, 10.0), (1L, 5.0, 5.0), (2L, 9.5, 20.0),
      (3L, 200.0, 210.0)).toDF("iv_id", "lo", "hi")
    val plain = pts.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
    for (w <- Seq(1.0, 3.0, 100.0)) {
      val binned = etl.RangeJoin.binned(pts, iv, "p", "lo", "hi", w)
      assert(binned.count() === plain.count(), s"binWidth=$w")
      assert(binned.exceptAll(plain).count() === 0, s"binWidth=$w")
      assert(plain.exceptAll(binned).count() === 0, s"binWidth=$w")
    }
  }
}
