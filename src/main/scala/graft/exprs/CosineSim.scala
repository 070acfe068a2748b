package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine-similarity expression over two numeric array columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_) / …`)
  * materializes two intermediate arrays and three lambda frames per row;
  * this expression runs one fused loop over the raw `ArrayData` with no
  * allocation, and generates the same loop via `doGenCode` so it stays
  * inside whole-stage codegen. On the 64-dim embedding corpus this is the
  * ANN scan's hot inner loop (SURVEY §2: custom-Expression preference
  * order (b)).
  *
  * Both inputs may be array<float> or array<double>; accumulation is in
  * double either way. Returns null if either side is null, lengths
  * differ, or any ELEMENT is null (a partial vector has no meaningful
  * cosine — silently reading nulls as 0.0 would distort every
  * threshold downstream); 0.0 when either norm is zero.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null on length mismatch / null element, whatever the children claim
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // only the element widths the accessors actually read: admitting
    // int/decimal would getLong() garbage (unsafe) or ClassCastException
    // (generic) — SQL callers cast to array<double> instead
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float>/array<double>, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val at = elemType(left); val bt = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = at match {
        case FloatType => a.getFloat(i).toDouble
        case _         => a.getDouble(i) // only float/double pass the type check
      }
      val y = bt match {
        case FloatType => b.getFloat(i).toDouble
        case _         => b.getDouble(i)
      }
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
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
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    final double x = ${getter(left, a, i)};
         |    final double y = ${getter(right, b, i)};
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  import org.apache.spark.sql.GraftShim
  /** Column-level entry point: `cosine_sim(vecCol, otherCol)`. */
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      CosineSim(GraftShim.expression(a), GraftShim.expression(b)))
}
