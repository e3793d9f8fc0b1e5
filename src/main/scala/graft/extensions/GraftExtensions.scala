package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, Hash56, NfcNormalize}

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
  import GraftFunctions.{mkDot, mkHash56}
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      mkDot))
    e.injectFunction((
      new FunctionIdentifier("graft_hash56"),
      new ExpressionInfo(classOf[Hash56].getName, "graft_hash56"),
      mkHash56))
    e.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      GraftFunctions.mkNfc))
    // the native as-of join: whole-operator chain (logical plan +
    // optimizer rule + planner strategy + physical exec)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftFunctions {
  // arity checks at resolution: a wrong-arity SQL call should read as an
  // analysis error, not a NoSuchElementException from exprs.head
  private[extensions] val mkDot: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"graft_dot expects 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }
  private[extensions] val mkHash56: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"graft_hash56 expects 1 argument, got ${exprs.length}")
    Hash56(exprs.head)
  }
  private[extensions] val mkNfc: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"graft_nfc expects 1 argument, got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", mkDot, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash56", mkHash56, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", mkNfc, "built-in")
  }
}
