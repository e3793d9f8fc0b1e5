package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Column faces over Spark's OWN bloom-filter expressions — the exact
  * machinery `InjectRuntimeFilter` wires up automatically when a join is
  * eligible (spark.sql.optimizer.runtime.bloomFilter.*), exposed here as
  * an EXPLICIT operator for the q141 semi-join reduction: build a bloom
  * over the small side's join keys, prune the big side BEFORE its
  * shuffle, let the exact join behind it remove the false positives.
  *
  * Both expressions are internal (not in the SQL FunctionRegistry), so
  * they come in through [[ColumnBridge]] like the repo's other native
  * Catalyst expressions. `might_contain` requires its bloom input to be
  * a CONSTANT or scalar subquery (its own analysis check) — callers
  * materialize the summary-sized filter first (one 1-row action, the
  * same thing the injected rule's reused subquery does) and pass the
  * bytes as a literal.
  */
object BloomFilterOps {

  /** `bloom_filter_agg(key, items, bits)` — a typed aggregate producing
    * the serialized bloom filter (binary). XxHash64-based; accepts
    * int/long/string keys; null keys are skipped. */
  def bloomAgg(key: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(key),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(bloom, key)` — never a false negative, so filtering
    * a join's probe side with it is semantics-preserving as long as an
    * exact join follows. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes), ColumnBridge.expression(key)))
}
