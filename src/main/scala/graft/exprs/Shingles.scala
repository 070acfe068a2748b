package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-level n-gram shingles of a text column in ONE pass.
  *
  * Semantically identical to `functions.Sim.shingles` (the composable HOF
  * form, kept as the executable reference — ShinglesSpec proves
  * bit-equality): `trim` → split on space runs → n-grams joined by a
  * single space → first-occurrence-order distinct; fewer than n tokens
  * yields an empty array; a null text yields null.
  *
  * Why an expression: the HOF form evaluates an interpreted
  * `transform(sequence(...))` lambda per gram with `element_at` +
  * `concat_ws` sub-trees, then an `array_distinct` rescan — and because
  * higher-order functions never enter whole-stage codegen, it drags the
  * whole projection into the interpreted path. This is the tokenization
  * front of every text-dedup plan (MinHash, n-gram Jaccard), so the
  * constant factor multiplies across the corpus.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "shingle size must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects string, got $other")
    }

  // the exact pattern/separator the HOF reference uses
  @transient private lazy val spaceRe: UTF8String = UTF8String.fromString(" +")
  @transient private lazy val space: UTF8String = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].trim().split(spaceRe, -1)
    val count = toks.length - (n - 1)
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i < count) {
        val gram =
          if (n == 1) toks(i)
          else {
            val win = new Array[UTF8String](n)
            var k = 0
            while (k < n) { win(k) = toks(i + k); k += 1 }
            UTF8String.concatWs(space, win: _*)
          }
        seen.add(gram)
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val reRef = ctx.addReferenceObj("spaceRe", spaceRe,
      "org.apache.spark.unsafe.types.UTF8String")
    val spRef = ctx.addReferenceObj("space", space,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a => {
      val toks = ctx.freshName("toks")
      val count = ctx.freshName("count")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val win = ctx.freshName("win")
      val gram = ctx.freshName("gram")
      s"""
         |final org.apache.spark.unsafe.types.UTF8String[] $toks =
         |  $a.trim().split($reRef, -1);
         |final int $count = $toks.length - ${n - 1};
         |if ($count <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[0]);
         |} else {
         |  final java.util.LinkedHashSet $seen = new java.util.LinkedHashSet();
         |  for (int $i = 0; $i < $count; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $gram;
         |    if ($n == 1) {
         |      $gram = $toks[$i];
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String[] $win =
         |        new org.apache.spark.unsafe.types.UTF8String[$n];
         |      for (int $k = 0; $k < $n; $k++) $win[$k] = $toks[$i + $k];
         |      $gram = org.apache.spark.unsafe.types.UTF8String.concatWs($spRef, $win);
         |    }
         |    $seen.add($gram);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    $seen.toArray());
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  import org.apache.spark.sql.GraftShim
  def apply(text: Column, n: Int): Column =
    GraftShim.column(Shingles(GraftShim.expression(text), n))
}
