package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, Hash56}

/** Registers graft's native expressions with the SQL layer.
  *
  * Two entry points:
  *  - config-time: `--conf spark.sql.extensions=graft.extensions.GraftExtensions`
  *    (the standard third-party-extension hook);
  *  - runtime: [[GraftFunctions.register]] on an existing session (useful
  *    in tests and notebooks where the session already exists).
  *
  * After either, `SELECT graft_dot(a, b)` / `SELECT graft_hash56(s)` work
  * in plain SQL and resolve to the codegen'd native expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_hash56"),
      new ExpressionInfo(classOf[Hash56].getName, "graft_hash56"),
      (exprs: Seq[Expression]) => Hash56(exprs.head)))
  }
}

object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash56", exprs => Hash56(exprs.head), "built-in")
  }
}
