package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column <-> Expression converters.
  *
  * Spark 4's public `Column` is Connect-neutral and no longer exposes
  * `.expr` / `new Column(expr)`; the classic converters live behind
  * `private[sql]`. Housing this one-liner inside `org.apache.spark.sql`
  * is the standard pattern third-party Catalyst extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `Dataset.ofRows` (private[sql]): wraps a custom logical
  * plan — here [[graft.plans.AsOfJoinPlan]] — back into a public
  * DataFrame, the standard move for third-party operators that extend
  * the planner. */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Bridge to `SparkSession.sessionUUID` (private[sql] in Spark 4): a
  * stable, never-reused session identity for cache keys — unlike
  * `System.identityHashCode`, which the JVM can recycle after a stopped
  * session is GC'd. */
object SessionBridge {
  def uuid(spark: org.apache.spark.sql.SparkSession): String = spark match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => "idhash-" + System.identityHashCode(other).toString
  }
}
