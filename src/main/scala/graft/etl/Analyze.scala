package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table statistics collection (the `ANALYZE TABLE ... COMPUTE
  * STATISTICS FOR COLUMNS` shape): one row per column with null
  * count, distinct count, and min/max — the inputs a cost-based
  * optimizer, a file-pruning layout decision, or a data-quality
  * monitor needs.
  *
  * One scan: all per-column aggregates ride a single `agg` (the
  * multi-`count(DISTINCT)` Expand multiplies rows by the column
  * count — the standard ANALYZE trade; for very wide tables at
  * extreme scale run column batches, or switch `exact = false` to
  * HLL sketches and no Expand at all), then one `stack` unpivot of
  * the single result row. Values are surfaced as doubles so one
  * schema covers numeric columns of any width.
  */
object Analyze {

  def columnStats(df: DataFrame, cols: Seq[String],
                  exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty && cols.forall(df.columns.contains),
      s"columns not all present: $cols vs ${df.columns.toSeq}")
    // names are spliced into a stack() SQL string (backtick-quoted
    // identifiers + string literals) — keep to a safe charset
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"column name must be [A-Za-z0-9_]+ for stats: '$c'"))
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).cast("long")
          .as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__ndv`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.select(col("__n_rows").as("n_rows"),
        expr(s"stack(${cols.size}, $stacked) AS " +
          "(col_name, n_nulls, ndv, min_v, max_v)"))
      .select("col_name", "n_rows", "n_nulls", "ndv", "min_v", "max_v")
  }
}
