package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram, slide
  * a window of `w` consecutive hashes, keep the minimum of each window
  * (rightmost on ties). The kept set is a ~2/(w+1)-density local sample
  * with a hard guarantee: any substring match of length ≥ w + k − 1
  * between two documents shares at least one fingerprint — the
  * fine-grained overlap detector that shingle/MinHash dedup (document
  * granularity) and span dedup (exact chunk granularity) both miss.
  *
  * The rightmost-tie rule is folded into integer arithmetic so every
  * engine agrees bit-for-bit: each gram gets key = h·2²⁰ + (2²⁰ − pos),
  * so the plain `min` over a window IS "min hash, tie → max position".
  * (Bound: documents up to 2²⁰ characters; h < 2³² keeps the key under
  * 2⁵³.) Gram hashes go through the repo's md5 draw ([[Split.hashDraw32]])
  * — engine-reproducible, like the split/sample/DSIR operators.
  *
  * Scale shape: fingerprint selection is PER-DOCUMENT arithmetic inside
  * ONE fused codegen'd expression ([[graft.exprs.WinnowKeys]]: byte-walk
  * → gram md5 → monotonic-deque window-min → distinct), so the pass is
  * narrow: zero shuffles, embarrassingly parallel across documents, cost
  * O(len) per doc. Only the final explode-to-rows is corpus-sized, and
  * it feeds the caller's aggregate directly. The original HOF form is
  * kept as [[fingerprintsHof]] — the executable reference WinnowSpec
  * proves the fused kernel bit-equal to.
  */
object Winnow {

  private val POS_BOUND = 1L << 20

  /** One row per selected fingerprint: (id, pos, fp) where `pos` is the
    * 1-based character offset of the k-gram and `fp` its 32-bit hash.
    * Documents shorter than `k` characters have no grams and drop out;
    * documents with fewer than `w` grams contribute their single
    * whole-document window. Bound: documents up to 2²⁰ characters (the
    * key packing above).
    */
  def fingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16): DataFrame = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    require(w >= 1, s"window must be >= 1, got $w")
    val sel = docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol),
        explode(graft.exprs.WinnowKeys(col(textCol), k, w)).as("__key"))
    sel.select(col(idCol),
      (lit(POS_BOUND) - col("__key") % POS_BOUND).as("pos"),
      shiftright(col("__key"), 20).as("fp"))
  }

  /** The original higher-order-function form of [[fingerprints]] — kept
    * as the executable reference the fused [[graft.exprs.WinnowKeys]]
    * kernel is proven bit-equal to (WinnowSpec), the same pattern as
    * `Sim.minHash` vs `MinHashSig`. Not used by any registered query.
    */
  private[graft] def fingerprintsHof(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16): DataFrame = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    require(w >= 1, s"window must be >= 1, got $w")
    val ng = length(col(textCol)) - k + 1
    val keys = transform(sequence(lit(1), ng),
      i => Split.hashDraw32(col(textCol).substr(i, lit(k))) * POS_BOUND
        + (lit(POS_BOUND) - i))
    val sel = docs
      .filter(length(col(textCol)) >= k)
      .select(col(idCol), keys.as("__keys"), greatest(lit(1), ng - w + 1).as("__nw"))
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(1), col("__nw")),
        j => array_min(slice(col("__keys"), j, lit(w)))))).as("__key"))
    sel.select(col(idCol),
      (lit(POS_BOUND) - col("__key") % POS_BOUND).as("pos"),
      shiftright(col("__key"), 20).as("fp"))
  }

  /** Cross-document overlap: pairs sharing at least one fingerprint,
    * with the count of distinct shared fingerprints — the MOSS report.
    * Fingerprints appearing in more than `maxDf` documents are dropped
    * first (boilerplate guard — the same quadratic-bucket defense as the
    * n-gram Jaccard join: a license header shared by every document must
    * not produce an all-pairs clique). One inverted-index shuffle on the
    * fingerprint, pair aggregate on (id_a, id_b); never all-pairs.
    */
  def overlap(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16,
      maxDf: Int = 50,
      minCommon: Int = 1): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp")).distinct()
    val kept = fps.groupBy("fp")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("fp")
    val pruned = fps.join(kept, "fp")
    pruned.as("a")
      .join(pruned.as("b"), col("a.fp") === col("b.fp") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
  }
}
