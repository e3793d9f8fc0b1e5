package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** Registers graft's native expressions with the SQL layer.
  *
  * Two entry points:
  *  - config-time: `--conf spark.sql.extensions=graft.extensions.GraftExtensions`
  *    (the standard third-party-extension hook);
  *  - runtime: [[GraftFunctions.register]] on an existing session (useful
  *    in tests and notebooks where the session already exists).
  *
  * After either, `SELECT graft_dot(a, b)` works in plain SQL and resolves
  * to the codegen'd [[DotProduct]] expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
  }
}
