package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a keyed change stream
  * (`op ∈ I | U | D`, version-ordered) into a snapshot — the MERGE
  * step of any warehouse ingestion pipeline.
  *
  * Semantics: per key, the highest-version record wins (the base
  * snapshot participates at version `baseVersion`, lower than every
  * change); a winning `D` tombstone removes the key. This is
  * latest-wins SCD-1 — inserts, re-inserts after delete, repeated
  * updates, and out-of-order arrivals all resolve by version order,
  * so applying the same batch twice is idempotent.
  *
  * Scale shape: one union (no shuffle) + one bounded-heap
  * [[graft.plans.TopKPerKey]] pass (one shuffle on the key, O(keys·1)
  * task memory) — never a `row_number` window sort over the combined
  * history. Changes are usually ≪ base, so the shuffle is dominated
  * by the base snapshot; for purely-incremental stores prefer
  * partition-pruned variants (see `Sinks.mergeDedup`) and use this
  * where versions genuinely interleave.
  */
object Cdc {

  /** `base`: current snapshot (no op/version columns). `changes`:
    * same data columns plus `opCol` and `versionCol`. Returns the new
    * snapshot with base's columns.
    */
  def apply(base: DataFrame, changes: DataFrame, key: String,
            opCol: String = "op", versionCol: String = "version",
            baseVersion: Long = 0L): DataFrame = {
    val dataCols = base.columns
    require(!dataCols.contains(opCol) && !dataCols.contains(versionCol),
      s"base must not already carry $opCol/$versionCol")
    val missing = (dataCols :+ opCol :+ versionCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes missing columns: ${missing.toSeq}")

    val unioned = base
      .withColumn(opCol, lit("I"))
      .withColumn(versionCol, lit(baseVersion))
      .unionByName(changes.select((dataCols :+ opCol :+ versionCol)
        .map(col): _*))
    graft.plans.TopK.perKey(unioned, Seq(col(key)),
      Seq(col(versionCol).desc), 1)
      .filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
  }
}
