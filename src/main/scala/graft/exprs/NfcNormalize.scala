package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition (UAX #15) in one codegen'd call —
  * the LOSSLESS canonicalization step before any byte-keyed operation:
  * the same visible text arrives both composed (é = U+00E9) and
  * decomposed (e + U+0301) from real sources, and exact-dedup keys,
  * md5 fingerprints, shingles, and URL joins all split on the
  * difference unless the corpus is NFC-normalized first. Distinct from
  * [[NormalizeText]], which FOLDS (strips accents, lowercases) —
  * NFC preserves every character, only its encoding is canonicalized.
  *
  * Cross-engine contract: equals utf8proc's `nfc_normalize` (both
  * implement UAX #15 exactly), which is what the oracle exercises —
  * a genuinely independent second implementation, not a closed form.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column): Column =
    GraftShim.column(NfcNormalize(GraftShim.expression(text)))

  /** JDK Normalizer bridge; the quick-check fast path skips the
    * Normalizer call for text already in NFC (ASCII always is).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
