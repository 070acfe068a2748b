package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two INTEGER-quantized vectors
  * (array<tinyint>/<smallint>/<int>) — the int8-ANN scoring kernel.
  *
  * Per-vector scale factors cancel in cosine, so symmetric-quantized
  * vectors compare on raw integer dot products: accumulation runs in
  * `long`, which is EXACT (int8 worst case: 127² · dim ≈ 2²⁰ per
  * thousand dims — nowhere near overflow), so unlike the float kernel
  * there is no accumulation-order noise to snap away; the only doubles
  * are the two terminal sqrts and one division, identical across
  * engines. Same fused-loop/codegen design as [[CosineSim]], same null
  * contract (null on length mismatch or null element; 0.0 on zero norm).
  */
case class CosineSimInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(ByteType | ShortType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_int expects array<tinyint|smallint|int>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    def get(arr: ArrayData, t: DataType, i: Int): Long = t match {
      case ByteType  => arr.getByte(i).toLong
      case ShortType => arr.getShort(i).toLong
      case _         => arr.getInt(i).toLong
    }
    val at = elemType(left); val bt = elemType(right)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, at, i); val y = get(b, bt, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case ByteType  => s"(long) $arr.getByte($i)"
      case ShortType => s"(long) $arr.getShort($i)"
      case _         => s"(long) $arr.getInt($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $dot = 0L, $na = 0L, $nb = 0L;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    final long x = ${getter(left, a, i)};
         |    final long y = ${getter(right, b, i)};
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = ($na == 0L || $nb == 0L)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimInt =
    copy(left = newLeft, right = newRight)
}

object CosineSimInt {
  import org.apache.spark.sql.GraftShim
  /** Column-level entry point: `cosine_sim_int(qvecCol, otherCol)`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      CosineSimInt(GraftShim.expression(a), GraftShim.expression(b)))
}
