package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All LSH band-bucket keys of a minhash signature in ONE pass.
  *
  * Semantically identical to the bucket field of `functions.Sim.lshBands`
  * (the composable HOF form, kept as the executable reference —
  * LshBandKeysSpec proves bit-equality): band b's bucket is
  * `xxhash64(concat_ws("_", b, array_join(slice(sig, b·rows+1, rows),
  * "_")))` — the same decimal-string key the HOF builds (null signature
  * components are skipped by `array_join`, so an all-null signature keys
  * every band at "b_").
  *
  * Why an expression: the HOF form is a `transform(sequence(...))` whose
  * per-band lambda evaluates `slice` + `array_join` + `concat_ws` +
  * `xxhash64` as interpreted sub-trees — and as a higher-order function
  * it drags the whole banding projection out of whole-stage codegen.
  * This loop formats each band key into one reused buffer and hashes it
  * with the builtin's kernel.
  */
case class LshBandKeys(child: Expression, bands: Int, rows: Int,
    md5Base: Boolean = false) extends UnaryExpression {

  require(bands > 0 && rows > 0, "bands and rows must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_band_keys expects array<long>, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[ArrayData]
    val n = sig.numElements()
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(32)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      sb.append(b).append('_')
      var first = true
      var r = 0
      while (r < rows) {
        val idx = b * rows + r
        if (idx < n && !sig.isNullAt(idx)) {
          if (!first) sb.append('_')
          sb.append(sig.getLong(idx))
          first = false
        }
        r += 1
      }
      val key = UTF8String.fromString(sb.toString)
      out(b) =
        if (md5Base) Md5Draw.draw32(key) // engine-reproducible bucket draw
        else XxHash64Function.hash(key, StringType, 42L)
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stype = ctx.addReferenceObj("stringType", StringType,
      "org.apache.spark.sql.types.DataType")
    val xx = classOf[XxHash64Function.type].getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val sb = ctx.freshName("sb")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val idx = ctx.freshName("idx")
      val first = ctx.freshName("first")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$bands];
         |final java.lang.StringBuilder $sb = new java.lang.StringBuilder(32);
         |for (int $b = 0; $b < $bands; $b++) {
         |  $sb.setLength(0);
         |  $sb.append($b).append('_');
         |  boolean $first = true;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    final int $idx = $b * $rows + $r;
         |    if ($idx < $n && !$a.isNullAt($idx)) {
         |      if (!$first) $sb.append('_');
         |      $sb.append($a.getLong($idx));
         |      $first = false;
         |    }
         |  }
         |  $out[$b] = ${
             if (md5Base)
               s"graft.exprs.Md5Draw.draw32(org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString()))"
             else
               s"$xx.hash(org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString()), $stype, 42L)"
           };
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

object LshBandKeys {
  import org.apache.spark.sql.GraftShim
  def apply(sig: Column, bands: Int, rows: Int): Column =
    GraftShim.column(LshBandKeys(GraftShim.expression(sig), bands, rows))

  /** md5Base = true buckets with [[Md5Draw]] instead of xxhash64 — the
    * oracle-twin mode; see [[MinHashSig.apply]].
    */
  def apply(sig: Column, bands: Int, rows: Int, md5Base: Boolean): Column =
    GraftShim.column(LshBandKeys(GraftShim.expression(sig), bands, rows, md5Base))
}
