package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest common prefix of two document SUFFIXES as one compiled
  * call: `suffix_lcp(text_a, pos_a, text_b, pos_b)` (positions
  * 0-based char units) walks both suffixes until the first mismatch
  * or either end-of-text and returns the matched length. This is the
  * verify kernel of the suffix-array dedup path
  * ([[graft.operators.SuffixArray]]): adjacent suffix pairs are
  * corpus-sized, so the per-pair LCP must stay inside whole-stage
  * codegen — the alternative formulations either interpret per
  * character (HOF `aggregate` over `sequence`) or re-join the rank
  * tables once per doubling level.
  *
  * ASCII fast path: when both strings are pure ASCII
  * (`numBytes == numChars`, the corpus-table norm) the walk reads
  * bytes in place via `getByte` — zero allocation. Otherwise it falls
  * back to a char walk over the materialized strings (char units
  * match the engine's `split(text, "")` position semantics).
  * Positions past end-of-text yield 0; negative positions clamp to 0
  * (never an error).
  */
object SuffixLcpKernel extends Serializable {
  def lcp(a: UTF8String, pa: Long, b: UTF8String, pb: Long): Long = {
    if (a.numBytes == a.numChars && b.numBytes == b.numChars) {
      var i = math.max(pa, 0L).toInt
      var j = math.max(pb, 0L).toInt
      val la = a.numBytes
      val lb = b.numBytes
      var n = 0L
      while (i < la && j < lb && a.getByte(i) == b.getByte(j)) {
        i += 1; j += 1; n += 1
      }
      n
    } else {
      val sa = a.toString
      val sb = b.toString
      var i = math.max(pa, 0L).toInt
      var j = math.max(pb, 0L).toInt
      var n = 0L
      while (i < sa.length && j < sb.length && sa.charAt(i) == sb.charAt(j)) {
        i += 1; j += 1; n += 1
      }
      n
    }
  }
}

case class SuffixLcp(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == StringType && third.dataType == StringType &&
      second.dataType == LongType && fourth.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"suffix_lcp expects (string, bigint, string, bigint), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  }

  override def nullSafeEval(a: Any, pa: Any, b: Any, pb: Any): Any =
    SuffixLcpKernel.lcp(a.asInstanceOf[UTF8String], pa.asInstanceOf[Long],
      b.asInstanceOf[UTF8String], pb.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Call the object's static forwarder (graft.exprs.SuffixLcpKernel.lcp):
    // Janino cannot resolve the Scala MODULE$ field on the forwarder class.
    val kernel = classOf[SuffixLcpKernel.type].getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, pa, b, pb) =>
      s"${ev.value} = $kernel.lcp($a, $pa, $b, $pb);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SuffixLcp =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

object SuffixLcp {
  import org.apache.spark.sql.GraftShim

  def apply(textA: Column, posA: Column, textB: Column, posB: Column): Column =
    GraftShim.column(SuffixLcp(GraftShim.expression(textA),
      GraftShim.expression(posA), GraftShim.expression(textB),
      GraftShim.expression(posB)))
}
