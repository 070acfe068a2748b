package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined cut offsets of a string, ascending — the fused kernel
  * behind [[graft.operators.Chunk.contentDefinedChunks]]: a cut falls
  * after character i+k−1 (1-based i) when the md5 32-bit draw of the
  * k-gram starting at i — bit-identical to
  * [[graft.operators.Split.hashDraw32]] on `substr(i, k)`, the contract
  * the CDC SQL oracles rely on — is ≡ 0 mod 2^maskBits. Offsets equal to
  * the text length are omitted (they merge with the final boundary the
  * caller appends).
  *
  * Why an expression: the HOF form (`filter(transform(gram_keys(...)))`)
  * walks the gram array through two interpreted lambdas with a boxed
  * `when` per element — the interpreted-kernel shape [[WinnowKeys]] and
  * [[GramKeys]] replaced. This is the same single UTF-8 byte walk as
  * [[GramKeys.gramHashes]], emitting the selected cut offsets directly.
  */
case class CdcCuts(child: Expression, k: Int, maskBits: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")
  require(maskBits >= 1 && maskBits <= 30,
    s"maskBits must be in [1, 30], got $maskBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_cuts expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    CdcCuts.cuts(v.asInstanceOf[UTF8String], k, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.CdcCuts.cuts($c, $k, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column, k: Int, maskBits: Int): Column =
    GraftShim.column(CdcCuts(GraftShim.expression(text), k, maskBits))

  /** Static entry for generated code (and the interpreted path). */
  def cuts(text: UTF8String, k: Int, maskBits: Int): ArrayData = {
    val mask = (1L << maskBits) - 1L
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
    if (ng <= 0) return new GenericArrayData(Array.emptyIntArray)
    val buf = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < ng) {
      val cut = i + k // chars consumed through the gram's last character
      if (cut < nChars &&
        (Md5Draw.draw32(bytes, offsets(i),
          math.min(offsets(i + k), nb) - offsets(i)) & mask) == 0L) {
        buf.add(cut)
      }
      i += 1
    }
    val out = new Array[Int](buf.size)
    var j = 0
    while (j < out.length) { out(j) = buf.get(j); j += 1 }
    new GenericArrayData(out)
  }
}
