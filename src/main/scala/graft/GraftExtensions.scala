package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: injects the engine's native
  * Catalyst functions into every session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions` — the deployment path for
  * spark-submit clusters where builder code isn't ours to edit.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("alias_key"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
         classOf[graft.core.Normalize.AliasKeyExpr].getName, "alias_key"),
       (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
         graft.core.Normalize.AliasKeyExpr(exprs.head)))
    ext.injectOptimizerRule(_ => graft.plans.IdempotentAliasKey)
  }
}
