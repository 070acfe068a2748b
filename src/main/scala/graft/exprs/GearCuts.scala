package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined cut offsets by a 32-bit XOR-gear rolling hash — the
  * FAST boundary kernel next to [[CdcCuts]]'s md5 one: per byte it costs
  * one table lookup, one shift, one xor (no digest), with the same
  * output contract (ascending char-count cut offsets, text-end cut
  * omitted).
  *
  * Hash: h ← ((h << 1) ^ G[byte]) mod 2³², boundary after a CHARACTER
  * whose final byte leaves (h & (2^maskBits − 1)) == 0. The shift gives
  * an implicit 32-byte window — equivalently the closed form
  * h_p = XOR_{j=0..31} ((G[b_{p−j}] << j) mod 2³²), which is what the
  * SQL oracle evaluates, so the rolling state never needs recursion to
  * reproduce externally. Re-alignment after an edit therefore takes at
  * most 32 bytes (vs k chars for the md5 kernel).
  *
  * Gear table: G[b] = the md5 32-bit draw of the string "gear:b"
  * (b = 0…255) — [[graft.operators.Split.hashDraw32]]'s derivation on a
  * synthetic key, so any engine rebuilds the identical table from the
  * spec alone; it ships as 256 documented constants, not entropy.
  */
case class GearCuts(child: Expression, maskBits: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 30,
    s"maskBits must be in [1, 30], got $maskBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gear_cuts expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    GearCuts.cuts(v.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.GearCuts.cuts($c, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): GearCuts =
    copy(child = newChild)
}

object GearCuts {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column, maskBits: Int): Column =
    GraftShim.column(GearCuts(GraftShim.expression(text), maskBits))

  /** G[b] = first-4-byte md5 draw of "gear:b" — 256 engine-reproducible
    * 32-bit constants.
    */
  val gear: Array[Long] = Array.tabulate(256) { b =>
    val key = s"gear:$b".getBytes("UTF-8")
    Md5Draw.draw32(key, 0, key.length)
  }

  /** Static entry for generated code (and the interpreted path). */
  def cuts(text: UTF8String, maskBits: Int): ArrayData = {
    val mask = (1L << maskBits) - 1L
    val bytes = text.getBytes
    val nb = bytes.length
    if (nb == 0) return new GenericArrayData(Array.emptyIntArray)
    // count chars once so the final boundary can be excluded
    var nChars = 0
    var off = 0
    while (off < nb) {
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    val buf = new java.util.ArrayList[Integer]()
    var h = 0L
    var c = 0
    off = 0
    while (off < nb) {
      // min() guards a truncated final multi-byte sequence (GramKeys
      // applies the same defense)
      val end = math.min(off + UTF8String.numBytesForFirstByte(bytes(off)), nb)
      while (off < end) {
        h = ((h << 1) ^ gear(bytes(off) & 0xFF)) & 0xFFFFFFFFL
        off += 1
      }
      c += 1
      if ((h & mask) == 0L && c < nChars) buf.add(c)
    }
    val out = new Array[Int](buf.size)
    var j = 0
    while (j < out.length) { out(j) = buf.get(j); j += 1 }
    new GenericArrayData(out)
  }
}
