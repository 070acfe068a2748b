package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a string's CODE-POINT distribution in one
  * codegen'd call — the classic gibberish/repetition signal: natural
  * prose sits near ~4.2 bits, `"aaaa…"` at 0, base64 blobs and random
  * bytes push past 5.5. A corpus quality gate thresholds on it next to
  * [[graft.functions.Text.qualityScore]]'s structural ratios.
  *
  * Cross-engine contract: counts are over Unicode code points (surrogate
  * pairs count once — what a `string_split_regex(s, '')` sees in a SQL
  * engine), H = −Σ (nᵢ/n)·log2(nᵢ/n) accumulated in ascending code-point
  * order with IEEE doubles, 0.0 for the empty string. Callers snap to
  * 4 dp (the repo's float convention) — accumulation ORDER is pinned
  * here, but a SQL mirror aggregates unordered, so only the snapped
  * value is contract.
  *
  * Stays a plain scalar (one static call) → the projection remains
  * inside whole-stage codegen; per-row cost is one pass plus a
  * sorted-key walk of the distinct-code-point map.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    CharEntropy.entropyJava(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.CharEntropy.entropyJava($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column): Column =
    GraftShim.column(CharEntropy(GraftShim.expression(text)))

  private val Log2 = math.log(2.0)

  /** Static entry for generated code (and the interpreted path). */
  def entropyJava(s: String): Double = {
    if (s.isEmpty) return 0.0
    // sorted map ⇒ the Σ accumulates in ascending code-point order — one
    // pinned order on the Spark side, whatever HashMap would have done
    val counts = new java.util.TreeMap[Integer, Array[Int]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Int](1))
      slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * (math.log(p) / Log2)
    }
    h
  }
}
