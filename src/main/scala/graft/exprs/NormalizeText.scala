package graft.exprs

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization in one codegen'd call: NFD-decompose, strip
  * combining marks (accents), lowercase (root locale), collapse
  * whitespace runs to single spaces, trim — the canonical form a corpus
  * is folded to before dedup keys, shingles, or language heuristics see
  * it ("Café  ÜBER" → "cafe uber").
  *
  * Cross-engine contract: equals
  * `trim(regexp_replace(lower(strip_accents(s)), '\s+', ' ', 'g'))` in a
  * utf8proc-based SQL engine for text whose non-ASCII content is Latin
  * diacritics (NFD mark-stripping and utf8proc accent-stripping agree
  * there; both engines' `lower` agree on the stripped result). Stays a
  * plain scalar → the projection remains inside whole-stage codegen.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(NormalizeText.normalizeJava(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.exprs.NormalizeText.normalizeJava($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column): Column =
    GraftShim.column(NormalizeText(GraftShim.expression(text)))

  private val Marks = Pattern.compile("\\p{Mn}+")
  private val Spaces = Pattern.compile("\\s+")

  /** Static entry for generated code (and the interpreted path). */
  def normalizeJava(s: String): String = {
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val stripped = Marks.matcher(nfd).replaceAll("")
    Spaces.matcher(stripped.toLowerCase(Locale.ROOT).trim).replaceAll(" ")
  }
}
