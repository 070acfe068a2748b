package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL character k-gram hashes of a string, in position order — the
  * verify-stage companion of [[WinnowKeys]] (which emits only the
  * winnow-SELECTED keys): element i (0-based) is the md5 first-4-byte
  * draw of the k-gram starting at character i + 1, bit-identical to
  * [[graft.operators.Split.hashDraw32]] on `substr(i+1, k)` — the
  * contract the repeated-spans SQL oracle relies on.
  *
  * Why an expression: the HOF form (`transform(sequence(...))` over
  * `substr` + a Catalyst md5 tree per character position) is the exact
  * interpreted-kernel shape the fused [[WinnowKeys]] replaced; this is
  * the same single UTF-8 byte walk minus the deque. Used where a
  * candidate document's full gram stream is needed (repeated-substring
  * verification) — per-doc cost O(len) digests, narrow, zero shuffle.
  */
case class GramKeys(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_keys expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    GramKeys.gramHashes(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.GramKeys.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramKeys =
    copy(child = newChild)
}

object GramKeys {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column, k: Int): Column =
    GraftShim.column(GramKeys(GraftShim.expression(text), k))

  /** Static entry for generated code (and the interpreted path). */
  def gramHashes(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val nb = bytes.length
    val offsets = new Array[Int](nb + 1)
    var nChars = 0
    var off = 0
    while (off < nb) {
      offsets(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    offsets(nChars) = nb
    val ng = nChars - k + 1
    if (ng <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      out(i) = Md5Draw.draw32(bytes, offsets(i), math.min(offsets(i + k), nb) - offsets(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
