package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-based index of the first position where two long arrays agree; 0 when
  * they never do. The native form of
  * `array_position(zip_with(a, b, _ === _), true)` — the emit-each-pair-once
  * predicate of every LSH plan (MinHash bands, hyperplane tables), evaluated
  * once per CANDIDATE pair, i.e. the largest row stream any LSH plan has.
  * The HOF form allocates a boxed boolean array and two lambda frames per
  * pair and is interpreted; this is one fused loop that stays inside
  * whole-stage codegen.
  *
  * Positions compare up to the SHORTER length (zip_with pads with null,
  * which never equals, so the semantics match). Null elements never match;
  * null input → null.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"first_equal_index expects two array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        return (i + 1).toLong
      i += 1
    }
    0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) {
         |    ${ev.value} = $i + 1L;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

object FirstEqualIndex {
  import org.apache.spark.sql.GraftShim
  def apply(a: Column, b: Column): Column =
    GraftShim.column(
      FirstEqualIndex(GraftShim.expression(a), GraftShim.expression(b)))
}
