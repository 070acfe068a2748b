package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused product-quantization encoder: all `m` subspace codes of a
  * vector in one pass. For subspace s, the code is the index of the
  * codebook entry minimizing the 4-dp-HALF_UP-ROUNDED squared L2 to the
  * subvector, ties to the LARGER index — the repo's cross-engine
  * rounding/tie convention (`operators.Ann.pqEncode`'s contract,
  * mirrored verbatim by the q_ann_pq DuckDB oracle).
  *
  * Why an expression and not literal-folded combinators: the unrolled
  * form is m·k `struct(round(Σ diff²), j)` trees — ~3000 Catalyst nodes
  * for 8×16×8 — and every invocation paid SECONDS of analysis/
  * optimization walking them (measured: a ~5 s per-query constant at
  * every scale factor). ONE expression node with the codebooks as a
  * reference object plans in microseconds and runs one bounded triple
  * loop inside whole-stage codegen — the [[HyperplaneBuckets]] lesson.
  *
  * The rounding uses `BigDecimal.valueOf(d).setScale(4, HALF_UP)` —
  * bit-identical to Spark's own `round(col, 4)` on doubles, so this
  * expression and the unrolled form it replaces produce the same codes.
  * Null elements or a vector shorter than m·sub return null (a partial
  * vector has no meaningful code — the CosineSim policy).
  */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val sub = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == k && cb.forall(_.length == sub)),
    "ragged codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes expects array<float|double>, got $other")
    }

  /** flat(s*k*sub + j*sub + i) = codebooks(s)(j)(i) — one flat array so
    * the generated code indexes without nested object dereferences
    */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * k * sub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        System.arraycopy(codebooks(s)(j), 0, out, (s * k + j) * sub, sub)
        j += 1
      }
      s += 1
    }
    out
  }

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < m * sub) return null
    val isFloat = elemType == FloatType
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var d2 = 0.0
        var i = 0
        while (i < sub) {
          val idx = s * sub + i
          if (a.isNullAt(idx)) return null
          val x = if (isFloat) a.getFloat(idx).toDouble else a.getDouble(idx)
          val diff = x - flat((s * k + j) * sub + i)
          d2 += diff * diff
          i += 1
        }
        val d2r = java.math.BigDecimal.valueOf(d2)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if (best < 0 || d2r <= bestD) { best = j; bestD = d2r }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val d2 = ctx.freshName("d2")
      val d2r = ctx.freshName("d2r")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val diff = ctx.freshName("diff")
      val x = ctx.freshName("x")
      val get =
        if (elemType == FloatType) s"(double) $a.getFloat($idx)"
        else s"$a.getDouble($idx)"
      s"""
         |if ($a.numElements() < ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $out = new int[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    int $best = -1;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $k && !${ev.isNull}; $j++) {
         |      double $d2 = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        final int $idx = $s * $sub + $i;
         |        if ($a.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |        final double $x = $get;
         |        final double $diff = $x - $cbRef[($s * $k + $j) * $sub + $i];
         |        $d2 += $diff * $diff;
         |      }
         |      if (!${ev.isNull}) {
         |        final double $d2r = java.math.BigDecimal.valueOf($d2)
         |          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue();
         |        if ($best < 0 || $d2r <= $bestD) { $best = $j; $bestD = $d2r; }
         |      }
         |    }
         |    $out[$s] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  import org.apache.spark.sql.GraftShim
  def apply(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftShim.column(PqCodes(GraftShim.expression(vec), codebooks))
}
