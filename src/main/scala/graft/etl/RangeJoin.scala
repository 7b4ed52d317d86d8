package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) joins without an equi key. Spark plans a pure
  * `point BETWEEN lo AND hi` join as BroadcastNestedLoopJoin — every
  * point checked against every interval, O(|points|·|intervals|),
  * which is the first thing to die when both sides are large. (The
  * reference's interval join, J2, always has the jobID equi key and
  * stays a hash join — this operator covers the key-less case the
  * reference cannot express.)
  *
  * Binning restores an equi key: fixed-width bins over the point
  * domain; each interval replicates into every bin it overlaps, each
  * point maps to its containing bin, the join becomes a hash
  * equi-join on the bin id, and the exact BETWEEN predicate filters
  * the (bounded) bin-local candidates. Cost is
  * O(points + intervals · avgSpans + candidates) with one balanced
  * shuffle (or none, when the exploded interval side broadcasts).
  */
object RangeJoin {

  /** Inner join `points.pointCol BETWEEN intervals.loCol AND
    * intervals.hiCol`, binned at `binWidth`.
    *
    * `binWidth` trades interval replication (≈ width/binWidth bins per
    * interval) against candidate selectivity (bin population per
    * probe); set it near the median interval width so each interval
    * lands in O(1) bins and each point probes O(1) intervals' worth of
    * candidates.
    */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
             loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
