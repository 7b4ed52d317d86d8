package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-checksum table reconciliation — diff two keyed snapshots
  * without shuffling either full table when they mostly agree.
  *
  * The naive diff (`full outer join` on the key) shuffles 2 × |table|
  * rows; at 100 TB that is the whole cluster's evening for what is
  * usually a handful of drifted rows. Instead:
  *
  *  1. CHECKSUM: each side aggregates per bucket (`xxhash64(key) %
  *     nBuckets`) an order-independent fingerprint — `bit_xor` of the
  *     full-row hash plus a row count. This is a pure scan + tiny
  *     aggregate (nBuckets rows cross the wire per side).
  *  2. PRUNE: buckets whose (checksum, count) agree are provably
  *     identical (up to hash collision) and are never touched again.
  *  3. RESOLVE: only rows hashing into differing buckets — data
  *     volume ∝ drift, not table size — are joined full-outer on the
  *     key and compared row-by-row.
  *
  * `bit_xor` is the right fold: commutative/associative (partition-
  * order independent, map-side combinable) and overflow-free under
  * ANSI mode, unlike `sum`. Its one blind spot — a value appearing an
  * even number of times XORs to nothing — is closed by comparing the
  * row count alongside, and keyed snapshots have unique keys anyway.
  *
  * Output: one row per drifted key with `diff_status ∈ only_left |
  * only_right | changed`.
  */
object Reconcile {

  private def rowHash(df: DataFrame, key: String): Column =
    xxhash64(df.columns.sorted.map(col): _*)

  private def bucketOf(key: String, nBuckets: Int): Column =
    pmod(xxhash64(col(key)), lit(nBuckets.toLong))

  private def checksums(df: DataFrame, key: String,
                        nBuckets: Int): DataFrame =
    df.groupBy(bucketOf(key, nBuckets).as("__graft_bucket"))
      .agg(bit_xor(rowHash(df, key)).as("cksum"),
        count(lit(1)).as("cnt"))

  /** The buckets whose contents differ between the two sides. */
  def changedBuckets(left: DataFrame, right: DataFrame, key: String,
                     nBuckets: Int): DataFrame = {
    val l = checksums(left, key, nBuckets)
      .withColumnsRenamed(Map("cksum" -> "l_cksum", "cnt" -> "l_cnt"))
    val r = checksums(right, key, nBuckets)
      .withColumnsRenamed(Map("cksum" -> "r_cksum", "cnt" -> "r_cnt"))
    l.join(r, Seq("__graft_bucket"), "full_outer")
      .filter(!(col("l_cksum") <=> col("r_cksum")) ||
        !(col("l_cnt") <=> col("r_cnt")))
      .select("__graft_bucket")
  }

  /** Keys that differ between the snapshots, with how. Both inputs
    * must be unique on `key`; column sets must match.
    */
  def diff(left: DataFrame, right: DataFrame, key: String,
           nBuckets: Int = 4096): DataFrame = {
    require(left.columns.sorted.sameElements(right.columns.sorted),
      s"schemas differ: ${left.columns.toSeq} vs ${right.columns.toSeq}")
    val changed = broadcast(changedBuckets(left, right, key, nBuckets))

    def slice(df: DataFrame, side: String): DataFrame =
      df.withColumn("__graft_bucket", bucketOf(key, nBuckets))
        .join(changed, Seq("__graft_bucket"), "left_semi")
        .select(col(key).as(s"${side}_key"),
          rowHash(df, key).as(s"${side}_hash"))

    slice(left, "l").join(slice(right, "r"),
        col("l_key") === col("r_key"), "full_outer")
      .select(
        coalesce(col("l_key"), col("r_key")).as(key),
        when(col("r_key").isNull, "only_left")
          .when(col("l_key").isNull, "only_right")
          .otherwise("changed").as("diff_status"),
        col("l_hash"), col("r_hash"))
      .filter(col("diff_status") =!= "changed" ||
        col("l_hash") =!= col("r_hash"))
      .select(key, "diff_status")
  }
}
