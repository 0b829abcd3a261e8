package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: lets any Spark deployment pick up
  * the graft function surface via config instead of code —
  *
  * {{{
  * spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Currently injects the `cosine_similarity` native expression into the
  * function registry (SQL + DataFrame-SQL callers); future custom rules
  * and planner strategies register here too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[CosineSimilarity].getName, "cosine_similarity"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarity(exprs.head, exprs(1))))
  }
}
