package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Consecutive-token phrase scan as ONE compiled call: returns [] when
  * the phrase is absent, else [n_hits, first_pos] (overlapping
  * occurrences counted, 0-based token position). Token semantics match
  * [[graft.functions.Text.tokens]] exactly — trim spaces, split on
  * space runs — so this is the codegen'd replacement for the
  * higher-order-function formulation (`filter(sequence(...), ...)`),
  * which Catalyst CANNOT compile (HigherOrderFunction is
  * CodegenFallback — every per-position lambda evaluation is
  * interpreted; measured 25 s → the native scan's time at 100× data on
  * q_phrase_search). One linear pass, no token array materialized.
  */
case class PhraseHits(child: Expression, phrase: Seq[String])
    extends UnaryExpression {

  require(phrase.nonEmpty, "phrase must be non-empty")
  require(phrase.forall(_.nonEmpty), "phrase words must be non-empty")
  require(phrase.forall(!_.contains(' ')), "phrase words must be single tokens")

  @transient private lazy val scanner = new PhraseScanner(phrase.toArray)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"phrase_hits expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    scanner.scan(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseScanner", scanner,
      classOf[PhraseScanner].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scan($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHits =
    copy(child = newChild)
}

object PhraseHits {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column, phrase: Seq[String]): Column =
    GraftShim.column(PhraseHits(GraftShim.expression(text), phrase))
}

/** One linear pass over the chars: stream token spans (space-run
  * delimited, like split(trim(s), " +")) through a ring buffer of the
  * last k spans; a window matches when every span char-equals its word.
  */
final class PhraseScanner(words: Array[String]) extends Serializable {
  private val k = words.length

  def scan(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.length
    // ring buffer of the last k token (start, end) spans
    val starts = new Array[Int](k)
    val ends = new Array[Int](k)
    var tokens = 0 // total tokens seen
    var count = 0L
    var first = -1L
    var i = 0
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      if (i < n) {
        val st = i
        while (i < n && str.charAt(i) != ' ') i += 1
        val slot = tokens % k
        starts(slot) = st
        ends(slot) = i
        tokens += 1
        if (tokens >= k) {
          // window of the last k tokens ends at this token
          var ok = true
          var j = 0
          while (ok && j < k) {
            val slotJ = (tokens - k + j) % k
            val w = words(j)
            val len = ends(slotJ) - starts(slotJ)
            if (len != w.length) ok = false
            else {
              var c = 0
              while (ok && c < len) {
                if (str.charAt(starts(slotJ) + c) != w.charAt(c)) ok = false
                c += 1
              }
            }
            j += 1
          }
          if (ok) {
            count += 1
            if (first < 0) first = (tokens - k).toLong
          }
        }
      }
    }
    if (count == 0) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(Array(count, first))
  }
}
