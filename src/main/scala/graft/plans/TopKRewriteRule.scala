package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, PredicateHelper, RowNumber, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous rank-filter idiom
  *
  * {{{
  * SELECT <cols>                         -- rn NOT projected
  * FROM (SELECT *, row_number() OVER
  *         (PARTITION BY p ORDER BY o) AS rn FROM t)
  * WHERE rn <= k
  * }}}
  *
  * into the bounded-heap [[TopKPerKeyPlan]] operator. Spark plans the
  * original as shuffle + FULL per-partition sort (its own
  * `InferWindowGroupLimit` only caps each group at k rows before the
  * sort — the sort itself remains); the rewrite keeps the same single
  * shuffle but replaces the sort with O(n log k) per-key heaps.
  *
  * Safety conditions (all checked):
  *  - single `row_number()` window expression, non-empty PARTITION BY
  *    (a global top-k is already Spark's `TakeOrderedAndProject`) and
  *    ORDER BY;
  *  - the rank attribute appears ONLY in the limiting predicate and
  *    is dropped by the enclosing projection (the operator emits no
  *    rank — callers needing `rn` in the output keep the window);
  *  - k ≤ [[TopKRewriteRule.MaxK]]: heap memory is O(keys·k), so a
  *    huge k belongs with the sorting (spilling) window;
  *  - only `row_number`: `rank`/`dense_rank` ≤ k can emit MORE than k
  *    rows on ties, which a k-bounded heap cannot.
  *
  * Tie behavior matches the window form's nondeterminism: under a
  * non-total ORDER BY both pick an arbitrary k of the tied rows.
  *
  * Registered by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`; the gated queries construct
  * [[TopKPerKeyPlan]] directly and do not depend on this rule.
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Same regime as `spark.sql.optimizer.windowGroupLimitThreshold`. */
  val MaxK = 1000

  private def limitOf(e: Expression, rn: Attribute): Option[Int] =
    e match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, Literal(v: Int, IntegerType))
        if a.semanticEquals(rn) && v == 1 => Some(1)
      case EqualTo(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) && v == 1 => Some(1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(v)
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(v - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case node @ Project(projList,
        Filter(cond, Window(
          Seq(al @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _, _)), _)),
          partSpec, orderSpec, wChild, _)))
        if partSpec.nonEmpty && orderSpec.nonEmpty &&
          !projList.exists(_.references.contains(al.toAttribute)) => {
      val rn = al.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankPreds, rest) =
        conjuncts.partition(_.references.contains(rn))
      val rewritten = for {
        p <- Some(rankPreds).collect { case Seq(single) => single }
        k <- limitOf(p, rn) if k >= 1 && k <= MaxK
      } yield {
        // Spark's InferWindowGroupLimit (which runs before user rules)
        // may already have inserted a WindowGroupLimit pre-cap; its
        // physical form SORTS each partition, which is exactly what
        // the heap replaces — unwrap it, the heap subsumes the cap
        val source = wChild match {
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other => other
        }
        val topk = TopKPerKeyPlan(partSpec, orderSpec, k,
          TopK.DefaultMaxKeysPerPartition, source)
        Project(projList,
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      }
      rewritten.getOrElse(node)
    }
  }
}
