// In the Spark namespace for the same reason as VectorExpressions: the
// FunctionRegistry plumbing used by expression builders is private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the native vector expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works wherever the
  * extension is installed:
  *
  *   spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * or programmatically for an existing session via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(session => ApproxAggRewrite(session))
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  val all: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two vectors, null on zero norm"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two vectors"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))

  /** Register into an already-running session's function registry. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
