package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused 64-bit SimHash of a token-array column in ONE pass.
  *
  * Semantically identical to `functions.Sim.simHash` (the composable HOF
  * form, kept as the executable reference — SimHash64Spec proves
  * bit-equality): per bit, the majority vote of token xxhash64 bits sets
  * the output bit (`(2·ones > n)`); a null token hashes like `xxhash64`'s
  * null (the seed, 42); an empty array votes 0 everywhere → 0L.
  *
  * Why an expression: the HOF form runs 64 separate interpreted
  * `filter` + `size` lambda passes over the token array per row (HOFs
  * never enter whole-stage codegen). This loop hashes each token once
  * and accumulates all 64 bit-counts in one int array — the signing
  * stage of corpus-scale SimHash dedup becomes a single fused pass,
  * the same rewrite that made MinHash signing 63× faster.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ones = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L // xxhash64(null) = the seed
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) ones(bit) += 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (2 * ones(bit) > n) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stype = ctx.addReferenceObj("stringType", StringType,
      "org.apache.spark.sql.types.DataType")
    val xx = classOf[XxHash64Function.type].getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val ones = ctx.freshName("ones")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $ones = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.isNullAt($i) ? 42L
         |    : $xx.hash($a.getUTF8String($i), $stype, 42L);
         |  for (int $bit = 0; $bit < 64; $bit++) {
         |    if ((($h >>> $bit) & 1L) == 1L) $ones[$bit]++;
         |  }
         |}
         |long $out = 0L;
         |for (int $bit = 0; $bit < 64; $bit++) {
         |  if (2 * $ones[$bit] > $n) $out |= (1L << $bit);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.GraftShim
  def apply(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))
}
