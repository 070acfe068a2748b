package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused arg-max-cosine over a literal centroid matrix: one pass over the
  * input vector per centroid, tracking the best (similarity, id) pair —
  * the IVF assignment kernel.
  *
  * Why an expression: assignment previously built `greatest()` over k
  * `struct(sim, cid)` branches. Struct comparison never enters
  * whole-stage codegen (interpreted `InternalRow` ordering per element),
  * and each branch evaluated its own cosine sub-tree — with the centroid
  * count scaled to corpus size (the semDedup cell-balance requirement)
  * assignment became the measured bottleneck of the 10x rehearsal at
  * 14 s of a 16 s query. This kernel is one codegen'd k×dim loop with
  * zero allocation.
  *
  * Per-centroid arithmetic is bit-identical to [[CosineSim]]:
  * index-order double accumulation, then `dot / (sqrt(na)·sqrt(nb))`,
  * 0.0 on a zero norm. Ties prefer the LARGER centroid id — the same
  * order `greatest` imposed on (sim, cid) structs — so on non-degenerate
  * input a plan migrating from the `greatest(struct(CosineSim, cid))`
  * form assigns identically (NearestCentroidSpec proves it). One
  * DELIBERATE divergence from the pre-kernel HOF form: a zero-norm
  * centroid scores 0.0 here (the CosineSim convention), where the HOF
  * division produced NaN — which Spark's struct ordering ranked above
  * every real similarity, silently assigning ALL rows to a degenerate
  * all-zero centroid. Returns null only for a null, dimension-mismatched, or
  * null-element input vector.
  */
case class NearestCentroid(
    child: Expression,
    cids: Seq[Int],
    centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cids.nonEmpty && cids.length == centroids.length,
    "one id per centroid required")
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must share a dimension")

  override def dataType: DataType = IntegerType

  // a dimension-mismatched vector yields null regardless of the child's
  // nullability — Catalyst must not codegen away the isNull check
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // only the element widths the accessors actually read: admitting
      // int/short/decimal here would getLong() across element boundaries
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float> or array<double>, got $other")
    }

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  /** Flattened row-major matrix + per-centroid norms, computed once. */
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  @transient private lazy val cnorm: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }.toArray
  @transient private lazy val cidArr: Array[Int] = cids.toArray

  private val dim = centroids.head.length

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var p = 0
    while (p < dim) { // a null element has no cosine to any centroid
      if (a.isNullAt(p)) return null
      p += 1
    }
    val at = elemType
    // the input's dot/na accumulate per centroid in index order, exactly
    // as CosineSim would pairwise
    var best = Double.NegativeInfinity
    var bestCid = Int.MinValue
    var j = 0
    while (j < cidArr.length) {
      var dot = 0.0; var na = 0.0
      var i = 0
      val off = j * dim
      while (i < dim) {
        val x = at match {
          case FloatType => a.getFloat(i).toDouble
          case _         => a.getDouble(i) // only float/double pass the type check
        }
        dot += x * flat(off + i); na += x * x
        i += 1
      }
      val s =
        if (na == 0.0 || cnorm(j) == 0.0) 0.0
        else dot / (math.sqrt(na) * cnorm(j))
      if (s > best || (s == best && cidArr(j) > bestCid)) {
        best = s; bestCid = cidArr(j)
      }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val normRef = ctx.addReferenceObj("cnorms", cnorm, "double[]")
    val cidRef = ctx.addReferenceObj("cids", cidArr, "int[]")
    val getter = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _         => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $dim && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) ${ev.isNull} = true;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestCid = Integer.MIN_VALUE;
         |  for (int $j = 0; $j < ${cidArr.length}; $j++) {
         |    double $dot = 0.0, $na = 0.0;
         |    final int off = $j * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      final double x = ${getter(a, i)};
         |      $dot += x * $flatRef[off + $i]; $na += x * x;
         |    }
         |    final double $s = ($na == 0.0 || $normRef[$j] == 0.0)
         |      ? 0.0 : $dot / (java.lang.Math.sqrt($na) * $normRef[$j]);
         |    if ($s > $best || ($s == $best && $cidRef[$j] > $bestCid)) {
         |      $best = $s; $bestCid = $cidRef[$j];
         |    }
         |  }
         |  ${ev.value} = $bestCid;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  import org.apache.spark.sql.GraftShim
  /** Column-level entry point for [[graft.operators.Ann.ivfAssign]]. */
  def apply(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    GraftShim.column(
      NearestCentroid(GraftShim.expression(vec),
        centroids.map(_._1), centroids.map(_._2)))
}
