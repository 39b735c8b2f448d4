package graft.catalyst

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility composition (NFC / NFKC) of a string —
  * the multilingual prelude to [[graft.operators.TextOps.normalizeText]]:
  * 'e' + COMBINING ACUTE and precomposed 'é' must normalize to the same
  * bytes before any hash-based dedup/shingling sees them, or visually
  * identical documents count as distinct.
  *
  * Implemented with the JDK's `java.text.Normalizer` (Unicode Standard
  * Annex #15) — no external library needed — as a codegen'd Catalyst
  * expression so it composes inside whole-stage codegen with the
  * lower/strip/collapse steps around it. Already-normalized input (the
  * overwhelmingly common case; all-ASCII in particular) is detected with
  * `Normalizer.isNormalized` and returned as-is, no re-encode allocation.
  *
  * DuckDB's `nfc_normalize()` implements the same UAX #15 NFC, so the NFC
  * mode is inside the deterministic-oracle envelope (gate q83); NFKC has
  * no DuckDB twin and is spec-checked instead.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", form, classOf[Normalizer.Form].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column-API entry points. */
  def nfc(c: Column): Column =
    Cols.column(UnicodeNormalize(Cols.expression(c), Normalizer.Form.NFC))
  def nfkc(c: Column): Column =
    Cols.column(UnicodeNormalize(Cols.expression(c), Normalizer.Form.NFKC))
}
