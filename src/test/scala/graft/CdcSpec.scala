package graft

import org.apache.spark.sql.functions._
import graft.etl.{Analyze, Cdc}

/** CDC merge + ANALYZE column-stats invariants. */
class CdcSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
  }

  private def changes(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "v", "op", "version")
  }

  test("cdc: update, delete, insert resolve by version order") {
    val out = Cdc.apply(base,
      changes((1L, "a2", "U", 1L), // update
        (2L, "b", "D", 1L), // delete
        (4L, "d", "I", 1L), // insert
        (3L, "c2", "U", 1L), (3L, "c2", "D", 2L)), // update then delete
      "k").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a2", 4L -> "d"))
  }

  test("cdc: re-insert after delete wins by version") {
    val out = Cdc.apply(base,
      changes((2L, "b", "D", 1L), (2L, "b9", "I", 2L)), "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) === "b9", "later re-insert beats the tombstone")
  }

  test("cdc: applying the same batch twice is idempotent") {
    val batch = changes((1L, "a2", "U", 1L), (2L, "b", "D", 1L))
    val once = Cdc.apply(base, batch, "k")
    val twice = Cdc.apply(once, batch, "k")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("cdc: guards malformed inputs") {
    intercept[IllegalArgumentException] {
      Cdc.apply(base.withColumn("op", lit("I")), changes(), "k")
    }
    intercept[IllegalArgumentException] {
      import spark.implicits._
      Cdc.apply(base, Seq((1L, "x")).toDF("k", "v"), "k")
    }
  }

  test("quality: per-rule violation counts, clean table all-zero") {
    import spark.implicits._
    import graft.etl.Quality
    val dim = Seq(Tuple1(10L), Tuple1(20L)).toDF("ref")
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (10L, 1.0), (10L, -2.0), (20L, 3.0), (30L, 4.0), (null, 5.0))
      .toDF("fk", "x")
    val out = Quality.validate(df, Seq(
      Quality.Check("x_positive", col("x") > 0),
      Quality.Check("fk_not_null", col("fk").isNotNull),
      Quality.Unique("fk_unique", Seq("fk")),
      Quality.InReference("fk_in_dim", "fk", dim, "ref")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("x_positive") === 1L)
    assert(out("fk_not_null") === 1L)
    assert(out("fk_unique") === 1L, "two rows share fk=10")
    assert(out("fk_in_dim") === 1L, "fk=30 dangles; null fk exempt")
    val clean = Quality.validate(dim, Seq(
      Quality.Check("pos", col("ref") > 0),
      Quality.Unique("uniq", Seq("ref"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L))
  }

  test("quality: a null predicate result counts as a violation") {
    import spark.implicits._
    import graft.etl.Quality
    val df = Seq[java.lang.Double](1.0, null, -1.0).map(Tuple1(_))
      .toDF("x")
    val out = Quality.validate(df,
      Seq(Quality.Check("x_positive", col("x") > 0)))
      .collect().head.getLong(1)
    assert(out === 2L, "null > 0 is not TRUE, so it violates")
  }

  test("analyze: nulls, ndv, min/max per column in one pass") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.5), (2L, null), (2L, 7.5), (null, 7.5))
      .toDF("a", "b")
    val stats = Analyze.columnStats(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = stats("a")
    assert(a.getLong(1) === 4L) // n_rows
    assert(a.getLong(2) === 1L) // nulls
    assert(a.getLong(3) === 2L) // ndv
    assert(a.getDouble(4) === 1.0 && a.getDouble(5) === 2.0)
    val b = stats("b")
    assert(b.getLong(2) === 1L && b.getLong(3) === 2L)
    assert(b.getDouble(4) === 2.5 && b.getDouble(5) === 7.5)
  }

  test("analyze: approximate mode avoids the distinct Expand") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, i % 10)).toDF("a", "b")
    val p = Analyze.columnStats(df, Seq("a", "b"), exact = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Expand"),
      s"sketch NDV must not expand rows per column:\n$p")
    val ndv = Analyze.columnStats(df, Seq("a", "b"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(ndv("a") - 1000L) <= 50, s"~1000: ${ndv("a")}")
    assert(ndv("b") === 10L)
  }
}
