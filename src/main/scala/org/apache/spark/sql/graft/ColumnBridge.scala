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

/** Bridges between DataFrames and their binary `RDD[InternalRow]` form
  * (`QueryExecution.toRdd` / `internalCreateDataFrame`, both
  * private[sql]) — used by the dense-id numbering pass
  * ([[graft.operators.RowIds]]), whose map appends one long to rows that
  * are otherwise passed through untouched: going through the public
  * `df.rdd` + `createDataFrame` instead would deserialize and re-encode
  * every row just to add a counter. */
object InternalRowBridge {
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd

  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
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
