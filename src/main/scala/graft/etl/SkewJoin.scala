package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (SURVEY §4 posture): when one join
  * key carries a disproportionate share of fact rows, a plain shuffle
  * join sends that key's entire volume to a single reducer. Salting
  * splits each key into `nSalts` sub-keys — the fact side picks a salt
  * deterministically from a row-unique column, the dimension side is
  * replicated across all salts — restoring even reducer load at the
  * cost of an `nSalts`× dim replication (cheap when dim ≪ fact).
  *
  * AQE's skew-join handling covers sort-merge cases automatically;
  * this explicit form is for deliberate control (e.g. a known hot key
  * at 100 TB) and for joins AQE cannot split.
  */
object SkewJoin {

  /** Inner equi-join `fact.key == dim.key`, salted `nSalts` ways.
    *
    * @param saltSource a fact column with per-row variety (an id or
    *                   hash source); the salt is `pmod(xxhash64(src), n)`
    *                   so it is deterministic, reproducible, uniform for
    *                   any input type (string ids included), and — being
    *                   a hash of a non-null-preserved input — never null
    *                   (a null salt would silently drop fact rows from
    *                   the inner join; xxhash64 hashes null to the seed).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, nSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(nSalts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Two-phase skew-safe distinct aggregation: per `key`, the distinct
    * count of `distinctCol` plus the total row count.
    *
    * `count(DISTINCT x)` on a skewed key is the classic 100 TB
    * aggregation killer: the planner expands every row and funnels each
    * hot key's full volume through one reducer holding its whole
    * distinct set. The two-phase form shuffles on the *composite*
    * `(key, x)` — cardinality spreads across all reducers, each partial
    * is map-side combined — then merges tiny per-pair partials on
    * `key`. Both shuffles are balanced regardless of key skew, and no
    * reducer ever materializes a distinct set.
    */
  def twoPhaseDistinct(df: DataFrame, key: String,
                       distinctCol: String): DataFrame =
    // NULL handling matches count(DISTINCT x): the null group still
    // flows through phase 1 (so n_rows counts every row) but is
    // excluded from the distinct count — count(when(...)) skips the
    // null-valued group exactly as count(DISTINCT) skips null inputs
    df.groupBy(col(key), col(distinctCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(count(when(col(distinctCol).isNotNull, lit(1)))
        .as("n_distinct"),
        sum(col("__n")).cast("long").as("n_rows"))
}
