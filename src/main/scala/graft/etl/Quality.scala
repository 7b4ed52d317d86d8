package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the expectations gate every
  * production pipeline runs before publishing a table (null checks,
  * ranges, key uniqueness, referential integrity), reported as one
  * row per rule with its violation count.
  *
  * Scale shape: all predicate rules fold into ONE conditional-sum
  * aggregate over a single scan (map-side combined); uniqueness adds
  * one key-grouped aggregate; referential integrity adds one
  * left-anti join per foreign key (broadcast when the dimension key
  * set is small). Nothing is ever collected row-wise — violations are
  * counted distributed, and callers needing samples filter the
  * original predicate themselves.
  */
object Quality {

  sealed trait Rule { def name: String }
  /** Rows where `predicate` is false (or null) violate. */
  final case class Check(name: String, predicate: Column) extends Rule
  /** More than one row per key violates (count - distinct). */
  final case class Unique(name: String, keys: Seq[String]) extends Rule
  /** Values of `key` absent from `dim`'s `refKey` violate; null keys
    * don't (use a Check for null policy).
    */
  final case class InReference(name: String, key: String,
                               dim: DataFrame, refKey: String)
    extends Rule

  /** One row per rule: (rule, n_violations). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    // rule names are spliced into a stack() SQL string as identifiers
    // and string literals — restrict to a safe charset up front
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name must be [A-Za-z0-9_]+: '${r.name}'"))
    val checks = rules.collect { case c: Check => c }
    val spark = df.sparkSession
    import spark.implicits._

    val checkReport: Option[DataFrame] =
      if (checks.isEmpty) None
      else {
        val aggs = checks.map(c =>
          sum(when(c.predicate, 0L).otherwise(1L)).as(c.name))
        val wide = df.agg(aggs.head, aggs.tail: _*)
        val stacked = checks.map(c => s"'${c.name}', `${c.name}`")
          .mkString(", ")
        Some(wide.select(expr(
          s"stack(${checks.size}, $stacked) AS (rule, n_violations)")))
      }

    val uniqueReports = rules.collect { case u: Unique =>
      df.groupBy(u.keys.map(col): _*)
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n") - 1L), lit(0L)).as("n_violations"))
        .select(lit(u.name).as("rule"), col("n_violations"))
    }

    val refReports = rules.collect { case r: InReference =>
      df.filter(col(r.key).isNotNull)
        .join(r.dim.select(col(r.refKey).as(r.key)).distinct(),
          Seq(r.key), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }

    (checkReport.toSeq ++ uniqueReports ++ refReports)
      .reduce(_ unionByName _)
  }
}
