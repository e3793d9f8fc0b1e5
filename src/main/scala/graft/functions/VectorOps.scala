package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, built from codegen'd
  * higher-order functions (no Scala UDFs — the lambdas compile to Catalyst
  * expressions and stay inside whole-stage codegen).
  *
  * `dot` folds strictly left-to-right (`aggregate` semantics), which makes
  * the double accumulation order-deterministic — required for the DuckDB
  * oracle hash-match (SURVEY.md §7.3) and for run-to-run stability.
  */
object VectorOps {

  /** float[] → double[] so all arithmetic happens in float64 on both
    * engines (DuckDB casts the same way in the oracle SQL). */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** Native codegen'd dot product ([[graft.expressions.DotProduct]]);
    * same left-to-right accumulation as [[dotHof]], ~50× faster. */
  def dot(a: Column, b: Column): Column = graft.expressions.DotProduct(a, b)

  /** Higher-order-function formulation — kept as the independent
    * cross-check for the native expression (see FunctionsSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
