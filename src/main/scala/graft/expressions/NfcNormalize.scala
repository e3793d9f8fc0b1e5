package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — Spark 4
  * has no SQL-level normalize function, and a Scala UDF here would break
  * whole-stage codegen right under the dedup family's hashing (the q91
  * rule: anything feeding a cross-engine hash must be a deterministic
  * scalar expression). Canonical composition via `java.text.Normalizer`
  * (NFC): composed and decomposed spellings of the same glyph — 'é' as
  * U+00E9 vs 'e'+U+0301 — become byte-identical, which is what makes a
  * downstream exact-dedup group BY TEXT mean "same text" instead of
  * "same byte accident". DuckDB's `nfc_normalize` implements the same
  * UAX #15 form, so the q227 gate hash-compares the normalized bytes
  * cross-engine.
  *
  * Fast path inherited from the JDK: `Normalizer.isNormalized` is O(n)
  * with no allocation for already-NFC text (the overwhelming case in a
  * real corpus), so the pass costs ~a scan unless it actually rewrites.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a STRING argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  import org.apache.spark.sql.graft.ColumnBridge
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
