package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket keys of a vector in one fused pass.
  *
  * For `tables` independent LSH tables of `planes` sign bits each, returns
  * `array<long>` of length `tables`: element t is the bucket
  * `Σ_pl (proj(t,pl) >= 0 ? 1L << pl : 0)` with
  * `proj(t,pl) = Σ_i v_i · sin(1 + t·97 + pl·31 + i·7)` — the fixed
  * pseudo-random hyperplane family of `operators.Dedup.embeddingCosine`
  * (mirrored verbatim by its DuckDB oracle).
  *
  * Why an expression and not HOF combinators: the composable form is
  * `tables × planes` separate interpreted `aggregate(zip_with(...))`
  * lambda trees per row (HOFs never enter whole-stage codegen), and
  * inlining that many independent native loops (e.g. one CosineSim per
  * plane) blows past codegen/JIT method limits and lands in the slow
  * interpreted path. ONE expression with ONE bounded triple loop keeps
  * the whole bucket computation inside a single JIT-compiled method; the
  * hyperplane matrix is precomputed once and referenced, not inlined.
  * Accumulation order matches the HOF form (ascending i) bit-for-bit.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int, dim: Int)
    extends UnaryExpression {

  require(planes > 0 && planes < 63, "planes must fit a long's bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Only element types the typed getters below actually read — a wider
    * NumericType match would route array<decimal> (no primitive getter)
    * or array<int> (getLong misread) into undefined behavior. Null
    * elements are allowed and contribute 0.0 to the projection (the same
    * policy as a sparse-vector missing coordinate).
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType | ShortType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_buckets expects array<float|double|long|int|short>, got $other")
    }

  /** matrix(t*planes + pl)(i) = sin(1 + t·97 + pl·31 + i·7) */
  @transient private lazy val matrix: Array[Array[Double]] =
    Array.tabulate(tables * planes, dim) { (k, i) =>
      math.sin(1.0 + (k / planes) * 97.0 + (k % planes) * 31.0 + i * 7.0)
    }

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val et = elemType
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var pl = 0
      while (pl < planes) {
        val h = matrix(t * planes + pl)
        var proj = 0.0
        var i = 0
        while (i < n) {
          val x =
            if (a.isNullAt(i)) 0.0
            else et match {
              case FloatType   => a.getFloat(i).toDouble
              case DoubleType  => a.getDouble(i)
              case LongType    => a.getLong(i).toDouble
              case IntegerType => a.getInt(i).toDouble
              case ShortType   => a.getShort(i).toDouble
              case other => throw new IllegalStateException(
                s"unreachable: checkInputDataTypes admitted $other")
            }
          proj += x * h(i)
          i += 1
        }
        if (proj >= 0) bucket |= (1L << pl)
        pl += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("matrix", matrix, "double[][]")
    val rawGetter: (String, String) => String = elemType match {
      case FloatType   => (arr, i) => s"(double) $arr.getFloat($i)"
      case DoubleType  => (arr, i) => s"$arr.getDouble($i)"
      case LongType    => (arr, i) => s"(double) $arr.getLong($i)"
      case IntegerType => (arr, i) => s"(double) $arr.getInt($i)"
      case ShortType   => (arr, i) => s"(double) $arr.getShort($i)"
      case other => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admitted $other")
    }
    val getter: (String, String) => String =
      (arr, i) => s"($arr.isNullAt($i) ? 0.0 : ${rawGetter(arr, i)})"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val pl = ctx.freshName("pl")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $dim);
         |final long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $pl = 0; $pl < $planes; $pl++) {
         |    final double[] $h = $mref[$t * $planes + $pl];
         |    double $proj = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $proj += ${getter(a, i)} * $h[$i];
         |    }
         |    if ($proj >= 0) $bucket |= (1L << $pl);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.GraftShim
  def apply(vec: Column, tables: Int, planes: Int, dim: Int): Column =
    GraftShim.column(
      HyperplaneBuckets(GraftShim.expression(vec), tables, planes, dim))
}
