package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy core step of web-corpus cleaning: text
  * that was UTF-8 on the wire but got decoded as Latin-1 somewhere
  * (then re-encoded as UTF-8) shows up as `Ã©`, `â€™`, `â„–`…; the
  * repair re-reads the string's Latin-1 byte image as UTF-8.
  *
  * The rule is deliberately conservative and deterministic:
  *   1. every char must be ≤ U+00FF (otherwise the string CANNOT be a
  *      Latin-1 byte image — a single genuine non-Latin-1 char proves
  *      the text is not mojibake and it passes through untouched);
  *   2. at least one char ≥ 0x80 (pure ASCII is a fixed point);
  *   3. the byte image must be STRICTLY valid UTF-8 (RFC 3629: no
  *      overlongs, no surrogates, nothing past U+10FFFF) and contain
  *      at least one multibyte sequence.
  * Only then does the reinterpretation apply — and it applies
  * iteratively (bounded), so doubly-mojibaked text also comes back.
  * The residual ambiguity (text that legitimately spells `Ã©`) is the
  * same one every production fixer accepts, documented here.
  *
  * Codegen ships the repair as one static call inside whole-stage
  * codegen (the [[AcMatches]] pattern) — no UDF boundary, no
  * serialization.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fix_mojibake expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    Mojibake.fix(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.Mojibake.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column): Column =
    GraftShim.column(FixMojibake(GraftShim.expression(text)))
}

object Mojibake {

  /** Bounded-iteration repair: each pass undoes one layer of
    * UTF-8-read-as-Latin-1; a non-mojibake string is a fixed point of
    * the first pass.
    */
  def fix(s: UTF8String): UTF8String = {
    var cur = s
    var n = 0
    while (n < 4) {
      val next = fixOnce(cur)
      if (next eq cur) return cur
      cur = next
      n += 1
    }
    cur
  }

  private def fixOnce(s: UTF8String): UTF8String = {
    val str = s.toString
    var hasHigh = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c > 0xff) return s // genuine non-Latin-1 char: not mojibake
      if (c >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // ASCII fixed point
    val bytes = new Array[Byte](str.length)
    i = 0
    while (i < str.length) { bytes(i) = str.charAt(i).toByte; i += 1 }
    if (!strictUtf8WithMultibyte(bytes)) s
    else UTF8String.fromBytes(bytes)
  }

  /** Strict RFC 3629 validation + at-least-one-multibyte-sequence. */
  private[exprs] def strictUtf8WithMultibyte(b: Array[Byte]): Boolean = {
    var i = 0
    var multibyte = false
    while (i < b.length) {
      val x = b(i) & 0xff
      if (x < 0x80) i += 1
      else if (x < 0xc2) return false // continuation byte or overlong lead
      else if (x < 0xe0) { // 2-byte
        if (i + 1 >= b.length || (b(i + 1) & 0xc0) != 0x80) return false
        multibyte = true; i += 2
      } else if (x < 0xf0) { // 3-byte
        if (i + 2 >= b.length) return false
        val y = b(i + 1) & 0xff
        val z = b(i + 2) & 0xff
        if ((y & 0xc0) != 0x80 || (z & 0xc0) != 0x80) return false
        if (x == 0xe0 && y < 0xa0) return false // overlong
        if (x == 0xed && y >= 0xa0) return false // surrogate
        multibyte = true; i += 3
      } else if (x < 0xf5) { // 4-byte
        if (i + 3 >= b.length) return false
        val y = b(i + 1) & 0xff
        val z = b(i + 2) & 0xff
        val w = b(i + 3) & 0xff
        if ((y & 0xc0) != 0x80 || (z & 0xc0) != 0x80 || (w & 0xc0) != 0x80) return false
        if (x == 0xf0 && y < 0x90) return false // overlong
        if (x == 0xf4 && y >= 0x90) return false // past U+10FFFF
        multibyte = true; i += 4
      } else return false
      // x in [0xf5, 0xff] falls through the final else above
    }
    multibyte
  }
}
