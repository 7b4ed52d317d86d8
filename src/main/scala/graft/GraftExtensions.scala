package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.plans.{CosineSimilarityExpr, TopKStrategy}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst pieces on any session, including pure-SQL ones —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (Equivalently: `spark.sql.extensions=graft.GraftExtensions`.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // rank-filter window pattern -> bounded-heap TopKPerKeyPlan
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName,
        "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(children.head, children(1))))
  }
}
