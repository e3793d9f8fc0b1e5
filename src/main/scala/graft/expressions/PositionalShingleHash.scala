package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType, StringType}

/** Fused positional hashed n-gram shingles: the native form of
  *
  * {{{
  * when(size(toks) >= n,
  *   transform(sequence(lit(0), size(toks) - n),
  *     i => hash56(concat_ws(" ", slice(toks, i + 1, lit(n))))))
  *   .otherwise(array().cast("array<long>"))
  * }}}
  *
  * bit-identical output (md5 over `tok[i] + " " + ... + tok[i+n-1]`,
  * first 7 digest bytes as a long; null elements skipped with their
  * separator exactly like `concat_ws`; null or short input → empty
  * array), but evaluated as ONE tight loop instead of the composed
  * higher-order pipeline. The composed form never reaches whole-stage
  * codegen — `ArrayTransform` is CodegenFallback, so every position
  * pays interpreted `sequence`/`slice` array allocations, lambda
  * variable binding, a `concat_ws` string build, and only then the md5.
  * Measured on the sf0.1 trio build (268k positions): ~13 µs per
  * position through the interpreted stack vs ~0.5 µs here — the md5
  * itself is ~4% of the composed cost. This expression feeds the digest
  * incrementally (`update` per token + separator), so no n-gram string
  * is ever materialized at all, and the shared shingle base — the
  * largest line of every bench's shared-build cost — drops from the
  * dominant stage to scan-bound.
  *
  * The composed formulation stays in [[graft.functions.TextOps
  * .positionalHashedShinglesComposed]] as the independent cross-check
  * (FunctionsSpec), same pattern as `hash56` / `hash56Composed` and
  * `dot` / `dotHof`. DuckDB oracle twin unchanged: the same md5 inside
  * `list_transform(generate_series(...))`.
  */
case class PositionalShingleHash(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_positional_shingles"

  // the composed form's `when` turns a NULL input into the empty array
  // (size(null) is null → predicate not true → otherwise branch), so
  // this expression is never null either
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) | ArrayType(NullType, _) | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_positional_shingles requires an ARRAY<STRING> argument, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) PositionalShingleHash.Empty
    else PositionalShingleHash.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // same static-forwarder call pattern as Hash56's codegen
    val h = "graft.expressions.PositionalShingleHash"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $h.Empty() : $h.compute(${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PositionalShingleHash {
  /** Shared empty result — immutable, so one instance serves all rows. */
  val Empty: ArrayData = new GenericArrayData(Array.emptyLongArray)

  // MessageDigest is stateful and not thread-safe; one per task thread
  // (same pattern as Hash56)
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** One md5 per position, fed incrementally: token bytes + single-space
    * separators, null elements skipped with their separator (concat_ws
    * semantics). First 7 digest bytes big-endian, like [[Hash56.hash]]. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return Empty
    val out = new Array[Long](len - n + 1)
    val digest = md.get()
    var i = 0
    while (i < out.length) {
      digest.reset()
      var first = true
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(i + j)) {
          if (!first) digest.update(' '.toByte)
          digest.update(arr.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val d = digest.digest()
      out(i) = ((d(0) & 0xffL) << 48) | ((d(1) & 0xffL) << 40) |
        ((d(2) & 0xffL) << 32) | ((d(3) & 0xffL) << 24) |
        ((d(4) & 0xffL) << 16) | ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge
  def apply(toks: Column, n: Int): Column =
    ColumnBridge.column(PositionalShingleHash(ColumnBridge.expression(toks), n))
}
