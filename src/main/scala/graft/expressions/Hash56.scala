package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 56-bit md5 hash: the first 7 digest bytes as a big-endian long —
  * numerically IDENTICAL to `conv(substring(md5(c), 1, 14), 16, 10)` (the
  * first 14 hex chars are exactly the first 7 bytes), and to the DuckDB
  * oracle's `CAST(('0x' || substr(md5(x), 1, 14)) AS BIGINT)`.
  *
  * The composed form pays, per value: a 32-char hex string allocation
  * (md5), a substring copy, and a base-16 string parse with a decimal
  * string re-render (conv) plus a long cast. This expression goes digest
  * bytes → long directly. hash56 sits under every shingle of the minhash/
  * simhash/fingerprint family — the dedup trio build runs it millions of
  * times per SF — so the string round-trip was the single hottest
  * scalar in the pipeline surface (same §2.5 rationale as [[DotProduct]]).
  */
// No input-type mixin (AbstractDataType is private[sql] in Spark 4), but
// the type contract is still enforced at ANALYSIS time via
// checkInputDataTypes: graft_hash56 is SQL-exposed, so a non-string
// argument must surface as an analysis error like the arity guard —
// not as a codegen compile failure or ClassCastException at execution.
case class Hash56(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash56"

  // isInstanceOf, not ==: Spark 4 string types may carry a collation.
  // NullType passes too — graft_hash56(NULL) must keep resolving and
  // returning NULL (UnaryExpression short-circuits before nullSafeEval),
  // as it did before this check existed.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hash56 requires a STRING argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Hash56.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hash56.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash56 {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 7 md5 digest bytes, big-endian — always >= 0 (56 < 64 bits). */
  def hash(bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(bytes)
    ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) | ((d(2) & 0xffL) << 32) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) |
      (d(6) & 0xffL)
  }

  import org.apache.spark.sql.graft.ColumnBridge
  def apply(c: Column): Column =
    ColumnBridge.column(Hash56(ColumnBridge.expression(c)))
}
