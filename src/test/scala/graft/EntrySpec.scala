package graft

/** The driver's flagship smoke contract: entry() returns rows. */
class EntrySpec extends SparkSpec {
  test("flagship entry produces rows with the 22-column contract") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq === graft.etl.Stage2.OutputColumns.map(_._1))
    assert(df.count() > 0)
  }
  test("every query has an oracle (no rows-only gates remain)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set.empty[String],
      s"unexpected oracle-less queries: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty[String],
      s"oracles without a query: $orphans")
  }
}
