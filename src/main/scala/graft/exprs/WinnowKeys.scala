package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused winnowing fingerprint selection ([[graft.operators.Winnow]]) in
  * ONE pass: hash every character k-gram (md5 first-4-bytes, the repo's
  * engine-reproducible draw — bit-identical to [[graft.operators
  * .Split.hashDraw32]]), fold the rightmost-tie rule into the key
  * (key = h·2³⁰ + (2³⁰ − pos), so plain `min` IS "min hash, tie → max
  * position"), take each w-window's minimum with a monotonic deque, and
  * emit the distinct selected keys in first-selection order.
  *
  * Semantically identical to the HOF reference form kept as
  * `Winnow.fingerprintsHof` (WinnowSpec proves bit-equality): `transform(
  * sequence(...))` over `substr` + md5 + `slice`/`array_min` per window +
  * `array_distinct`. Why an expression: the HOF form evaluates an
  * interpreted lambda tree and materializes a Catalyst md5 expression
  * per character position, then a second O(n_w·w) `slice`+`array_min`
  * pass per window. This loop walks the UTF-8 bytes once to find
  * code-point offsets, digests each gram's byte slice directly (no
  * substring materialization), and selects window minima with an O(n)
  * deque — the suite's most expensive kernel collapses to one tight
  * JVM loop per document.
  *
  * Distinct-consecutive equals `array_distinct` here: every key embeds
  * its position (all keys distinct), and the windows for which a given
  * key is the minimum form a contiguous run — any window between two
  * min-runs of the same key contains the same key and any smaller
  * neighbour would contradict one of the end windows.
  *
  * Scale shape: narrow per-document arithmetic, zero shuffles; per-doc
  * cost O(len) md5 digests + O(len) deque ops (amortized), vs the HOF's
  * O(len·w) window scans.
  */
case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size must be >= 1, got $k")
  require(w >= 1, s"window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_keys expects string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WinnowKeys.selectKeys(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.WinnowKeys.selectKeys($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

object WinnowKeys {
  import org.apache.spark.sql.GraftShim

  def apply(text: Column, k: Int, w: Int): Column =
    GraftShim.column(WinnowKeys(GraftShim.expression(text), k, w))

  private val POS_BOUND = 1L << 30

  /** Static entry for generated code (and the interpreted path). */
  def selectKeys(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val nb = bytes.length
    // code-point start offsets — the same character boundaries substr()
    // and length() use (UTF8String walks numBytesForFirstByte)
    val offsets = new Array[Int](nb + 1)
    var nChars = 0
    var off = 0
    while (off < nb) {
      offsets(nChars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      nChars += 1
    }
    offsets(nChars) = nb
    val ng = nChars - k + 1
    if (ng <= 0) return new GenericArrayData(Array.emptyLongArray)
    // fail-loud packing bound (repo convention: Pca.MaxDim, Dedup's
    // maxHamming require): past 2^30 grams the position term would wrap
    // into the hash term and fingerprints would collide silently
    if (ng > POS_BOUND) throw new IllegalArgumentException(
      s"winnow: document has $ng k-grams, past the 2^30 key-packing bound " +
        "— split documents above 1 GiB before fingerprinting")
    val keys = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      val h = Md5Draw.draw32(bytes, offsets(i), math.min(offsets(i + k), nb) - offsets(i))
      keys(i) = h * POS_BOUND + (POS_BOUND - (i + 1))
      i += 1
    }
    if (ng <= w) {
      // single whole-document window
      var best = keys(0)
      var j = 1
      while (j < ng) { if (keys(j) < best) best = keys(j); j += 1 }
      return new GenericArrayData(Array(best))
    }
    val out = new Array[Long](ng - w + 1)
    var nOut = 0
    val dq = new Array[Int](ng) // monotonic deque of indices, keys ascending
    var head = 0
    var tail = 0
    var r = 0
    while (r < ng) {
      while (tail > head && keys(dq(tail - 1)) > keys(r)) tail -= 1
      dq(tail) = r
      tail += 1
      if (r >= w - 1) {
        while (dq(head) <= r - w) head += 1
        val m = keys(dq(head))
        if (nOut == 0 || out(nOut - 1) != m) { out(nOut) = m; nOut += 1 }
      }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }
}
