package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused MinHash signature of a token-array column in ONE pass.
  *
  * Semantically identical to `functions.Sim.minHash` (the composable HOF
  * form, kept as the executable reference — MinHashSigSpec proves
  * bit-equality): `numHashes` universal hashes h_j(x) = (a_j·x + b_j)
  * mod p over xxhash64 base hashes, p = 2³¹−1, fixed seeds; element j is
  * min over tokens; an empty token array yields all-null elements (the
  * HOF's `array_min(empty)`), and a null token hashes like `xxhash64`'s
  * null (the seed, 42).
  *
  * Why an expression: the HOF form is `numHashes` separate interpreted
  * `transform` + `array_min` lambda trees per row — 64 passes over the
  * token array and 64 intermediate arrays per document. This loop reads
  * each token once, computes its xxhash64 once (`XxHash64Function
  * .hashUnsafeBytes`, the same kernel the builtin uses), and folds all
  * `numHashes` running minima in registers — the signing stage of
  * corpus-scale MinHash dedup collapses from 64 array materializations
  * per row to one.
  */
case class MinHashSig(child: Expression, numHashes: Int,
    md5Base: Boolean = false) extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  private val p = 2147483647L // 2^31 - 1, the HOF form's Mersenne modulus

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  /** Same (a_j, b_j) family as Sim.minHash — bit-compatible signatures. */
  @transient private lazy val coeffA: Array[Long] =
    Array.tabulate(numHashes)(j => (2654435761L * (j + 1) + 40503L) % (p - 1) + 1)
  @transient private lazy val coeffB: Array[Long] =
    Array.tabulate(numHashes)(j => (1103515245L * (j + 1) + 12345L) % p)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      // md5 mode: the engine-reproducible draw (nulls hash as the empty
      // string; the shingle front never emits nulls). xxhash64 mode:
      // null = the seed, matching the builtin.
      val h0 =
        if (md5Base)
          Md5Draw.draw32(
            if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i))
        else if (arr.isNullAt(i)) 42L // xxhash64(null) = the seed
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      val hb = ((h0 % p) + p) % p
      var j = 0
      while (j < numHashes) {
        val hj = (hb * coeffA(j) + coeffB(j)) % p
        if (hj < out(j)) out(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coeffA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("coeffB", coeffB, "long[]")
    val stype = ctx.addReferenceObj("stringType", StringType,
      "org.apache.spark.sql.types.DataType")
    // the public static forwarder on the companion class — same kernel the
    // builtin xxhash64 uses for UTF8String
    val xx = classOf[XxHash64Function.type].getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h0 = ctx.freshName("h0")
      val hb = ctx.freshName("hb")
      val hj = ctx.freshName("hj")
      val s = ctx.freshName("s")
      val baseHash =
        if (md5Base)
          s"""if ($a.isNullAt($i)) {
             |      $h0 = graft.exprs.Md5Draw.draw32(
             |        org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8);
             |    } else {
             |      $h0 = graft.exprs.Md5Draw.draw32($a.getUTF8String($i));
             |    }""".stripMargin
        else
          s"""if ($a.isNullAt($i)) {
             |      $h0 = 42L;
             |    } else {
             |      org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
             |      $h0 = $xx.hash($s, $stype, 42L);
             |    }""".stripMargin
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numHashes]);
         |} else {
         |  final long[] $out = new long[$numHashes];
         |  java.util.Arrays.fill($out, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h0;
         |    $baseHash
         |    final long $hb = (($h0 % ${p}L) + ${p}L) % ${p}L;
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      final long $hj = ($hb * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($hj < $out[$j]) $out[$j] = $hj;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.GraftShim
  def apply(tokens: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(tokens), numHashes))

  /** md5Base = true swaps the xxhash64 base hash for [[Md5Draw]] (the
    * engine-reproducible `Split.hashDraw32` twin) — same universal-hash
    * family on top, so the full MinHash pipeline becomes DuckDB-
    * verifiable. Production keeps xxhash64 (faster, engine-specific).
    */
  def apply(tokens: Column, numHashes: Int, md5Base: Boolean): Column =
    GraftShim.column(MinHashSig(GraftShim.expression(tokens), numHashes, md5Base))
}
