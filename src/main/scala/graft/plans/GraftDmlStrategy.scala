package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases,
  UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, And, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment,
  DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable,
  UpdateAction, UpdateTable}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation,
  DataSourceV2ScanRelation}

import graft.io.{GraftCatalog, Snapshots}

/** LEGACY fallback for SQL `UPDATE` and `MERGE INTO` on snapshot
  * catalog tables.
  *
  * Since [[graft.io.GraftCatalog.GraftTable]] implements
  * `SupportsRowLevelOperations`, Spark's OWN analyzer rewrites
  * (`RewriteUpdateTable` / `RewriteMergeIntoTable`) turn both
  * statements into delta plans over the store's (file, pos) rowId
  * ([[graft.io.GraftRowLevelOperation]]) DURING ANALYSIS — so the
  * raw `UpdateTable` / `MergeIntoTable` nodes this strategy matches
  * never reach planning for catalog tables, and the native path
  * additionally supports the shapes this strategy refuses
  * (subqueries in DML expressions, non-equi MERGE conditions). The
  * strategy stays registered as the documented safety net: any
  * command shape a future Spark declines to rewrite still lowers
  * onto the store's copy-on-write commits —
  * [[Snapshots.updateWhere]] and [[Snapshots.mergeInto]] — keeping
  * their economics: key-only discovery, affected-files-only rewrite,
  * OCC conflict refusal, history/time-travel/CDC intact.
  *
  * Expression handoff: the analyzer's expressions reference the
  * command's relation by `exprId`; the store executes against a fresh
  * read of the same table, so every attribute is re-anchored BY NAME
  * — target attributes to their plain column name, source attributes
  * to [[Snapshots.src]]-prefixed names (the merge source is renamed
  * apart before the join, so same-named columns never collide).
  * Shapes outside the store's semantics refuse loudly at planning
  * (never silently): non-equi ON conditions, subqueries inside DML
  * expressions, nested-field assignment, `WITH SCHEMA EVOLUTION`.
  *
  * Reference: conte-to-fresco-etl has no SQL DML surface; this
  * extends the engine's lakehouse posture (VERDICT r10 #5/#6).
  */
object GraftDmlStrategy extends SparkStrategy {

  /** Idempotent per-session registration ([[graft.io.GraftCatalog]]
    * calls this from `initialize`, so configuring the catalog IS
    * enabling its DML; `GraftExtensions` registers it for
    * builder-time sessions too).
    */
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_ eq GraftDmlStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftDmlStrategy

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(target, assignments, condition) =>
      graftTarget(target) match {
        case Some((path, tOut)) =>
          val sets = assignments.map(a =>
            assignName(a, "UPDATE SET") -> rebind(a.value, tOut, Nil))
          val cond = condition.map(rebind(_, tOut, Nil))
          GraftDmlExec("graft update " + path, () => {
            Snapshots.updateWhere(SparkSession.active, path, sets, cond)
            ()
          }) :: Nil
        case None => Nil
      }

    case m: MergeIntoTable =>
      graftTarget(m.targetTable) match {
        case Some((path, tOut)) =>
          val sOut = m.sourceTable.output
          val on = equiKeys(m.mergeCondition, tOut, sOut)
          val matched = m.matchedActions.map(matchedOf(_, tOut, sOut))
          val notMatched = m.notMatchedActions.map(insertOf(_, tOut, sOut))
          val nmbs = m.notMatchedBySourceActions
            .map(matchedOf(_, tOut, Nil))
          val source = m.sourceTable
          GraftDmlExec("graft merge into " + path, () => {
            val spark = SparkSession.active
            Snapshots.mergeInto(spark, path,
              org.apache.spark.sql.graft.Bridge.ofRows(spark, source),
              on, matched, notMatched, nmbs,
              evolve = m.withSchemaEvolution)
            ()
          }) :: Nil
        case None => Nil
      }

    case _ => Nil
  }

  /** The (store path, output attributes) of a mutable Graft catalog
    * relation; None lets the built-in strategies handle (and refuse)
    * other tables. Time-travelled loads refuse loudly — DML against a
    * pinned historical version can never be right.
    */
  private def graftTarget(plan: LogicalPlan)
      : Option[(String, Seq[Attribute])] = {
    def of(t: org.apache.spark.sql.connector.catalog.Table,
           out: Seq[Attribute], name: String)
        : Option[(String, Seq[Attribute])] = t match {
      case g: GraftCatalog#GraftTable =>
        require(g.isMutable,
          s"graft: cannot UPDATE/MERGE INTO the time-travelled table " +
            s"$name - DML mutates the live table only")
        Some((g.snapshotPath, out))
      case _ => None
    }
    EliminateSubqueryAliases(plan) match {
      // before scan planning (fresh analysis) the raw relation;
      // after V2ScanRelationPushDown (the optimizer's normal path)
      // the scan relation wrapping it
      case r: DataSourceV2Relation => of(r.table, r.output, r.name)
      case s: DataSourceV2ScanRelation =>
        of(s.relation.table, s.output, s.relation.name)
      case _ => None
    }
  }

  /** ON must be a conjunction of target-attr = source-attr equalities
    * — the store's merge joins on key pairs. Casts inside ON mean the
    * key types differ; refuse with the store's own remediation.
    */
  private def equiKeys(cond: Expression, tOut: Seq[Attribute],
                       sOut: Seq[Attribute]): Seq[(String, String)] = {
    val tIds = tOut.map(_.exprId).toSet
    val sIds = sOut.map(_.exprId).toSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds(a.exprId) && sIds(b.exprId) => a.name -> b.name
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sIds(a.exprId) && tIds(b.exprId) => b.name -> a.name
      case other => throw new UnsupportedOperationException(
        "graft: MERGE INTO ON must be a conjunction of " +
          s"target.col = source.col equalities; cannot lower: $other " +
          "(if the key types differ, cast the source column in the " +
          "USING subquery)")
    }
  }

  private def matchedOf(a: MergeAction, tOut: Seq[Attribute],
                        sOut: Seq[Attribute]): Snapshots.WhenMatched =
    a match {
      case UpdateAction(cond, assignments, _) =>
        Snapshots.WhenMatchedUpdate(cond.map(rebind(_, tOut, sOut)),
          assignments.map(as => assignName(as, "UPDATE SET") ->
            rebind(as.value, tOut, sOut)))
      case DeleteAction(cond) =>
        Snapshots.WhenMatchedDelete(cond.map(rebind(_, tOut, sOut)))
      case other => throw new UnsupportedOperationException(
        s"graft: unsupported MERGE WHEN MATCHED action: $other")
    }

  private def insertOf(a: MergeAction, tOut: Seq[Attribute],
                       sOut: Seq[Attribute])
      : Snapshots.WhenNotMatchedInsert = a match {
    case InsertAction(cond, assignments) =>
      // the insert's values see the SOURCE row only (SQL scoping);
      // its condition likewise
      Snapshots.WhenNotMatchedInsert(cond.map(rebind(_, Nil, sOut)),
        assignments.map(as => assignName(as, "INSERT") ->
          rebind(as.value, Nil, sOut)))
    case other => throw new UnsupportedOperationException(
      s"graft: unsupported MERGE WHEN NOT MATCHED action: $other")
  }

  private def assignName(a: Assignment, what: String): String =
    a.key match {
      case ar: AttributeReference => ar.name
      case other => throw new UnsupportedOperationException(
        s"graft: $what can only assign top-level columns, not $other")
    }

  /** Re-anchor an analyzer expression by NAME for evaluation against
    * the store's own read: target attributes resolve to their plain
    * column names, source attributes to the renamed-apart
    * [[Snapshots.src]] columns. Anything neither (an outer reference)
    * and any subquery refuses — silently mis-resolving a DML
    * expression would corrupt the table.
    */
  private def rebind(e: Expression, tOut: Seq[Attribute],
                     sOut: Seq[Attribute]): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft: subqueries inside UPDATE/MERGE expressions are not " +
        s"supported: $e (pre-compute the subquery in the USING source)")
    val tIds = tOut.map(_.exprId).toSet
    val sIds = sOut.map(_.exprId).toSet
    val renamed = e.transform {
      case a: AttributeReference if sIds(a.exprId) =>
        UnresolvedAttribute.quoted(Snapshots.SrcPrefix + a.name)
      case a: AttributeReference if tIds(a.exprId) =>
        UnresolvedAttribute.quoted(a.name)
      case a: AttributeReference =>
        throw new UnsupportedOperationException(
          s"graft: UPDATE/MERGE expression references $a, which is " +
            "neither the target table nor the merge source")
    }
    org.apache.spark.sql.graft.Bridge.column(renamed)
  }
}

/** Physical node for an intercepted DML command: runs the store
  * commit exactly once (however many times the plan is collected) and
  * returns no rows, like any DDL/DML command. The thunk runs on the
  * DRIVER — the store operation it wraps launches its own distributed
  * jobs.
  */
case class GraftDmlExec(label: String, run: () => Unit)
    extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  @transient private lazy val done: Unit = run()
  override def executeCollect(): Array[InternalRow] = { done; Array.empty }
  override protected def doExecute(): RDD[InternalRow] = {
    done
    sparkContext.parallelize(Seq.empty[InternalRow], 1)
  }
  override def simpleString(maxFields: Int): String = label
}
