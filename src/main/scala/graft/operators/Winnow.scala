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
  * engine agrees bit-for-bit: each gram gets key = h·2³⁰ + (2³⁰ − pos),
  * so the plain `min` over a window IS "min hash, tie → max position".
  * (Bound: documents up to 2³⁰ characters — 1 GiB, enforced fail-loud in
  * the kernel; h < 2³² keeps the key under 2⁶², exact in LongType. The
  * decoded (pos, fp) output is bound-INDEPENDENT: for any packing base
  * larger than the document, min over h·B + (B − pos) selects the same
  * fingerprints.) Gram hashes go through the repo's md5 draw ([[Split.hashDraw32]])
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

  private val POS_BOUND = 1L << 30

  /** One row per selected fingerprint: (id, pos, fp) where `pos` is the
    * 1-based character offset of the k-gram and `fp` its 32-bit hash.
    * Documents shorter than `k` characters have no grams and drop out;
    * documents with fewer than `w` grams contribute their single
    * whole-document window. Bound: documents up to 2³⁰ characters (the
    * key packing above; the kernel throws past it rather than corrupt).
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
      shiftright(col("__key"), 30).as("fp"))
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
    // same fail-loud 2^30 bound the native kernel enforces
    // (exprs.WinnowKeys): past it the position term would wrap into the
    // hash term and the two "bit-identical" forms would silently diverge
    // exactly where corruption starts
    val ngRaw = length(col(textCol)) - k + 1
    val ng = when(ngRaw > lit(POS_BOUND.toInt), raise_error(concat(
        lit("winnow: document exceeds 2^30 k-grams: "),
        ngRaw.cast("string"))).cast("int"))
      .otherwise(ngRaw)
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
      shiftright(col("__key"), 30).as("fp"))
  }

  /** Cross-document EXACT repeated-substring extraction — the substring-
    * level signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"): for every candidate pair, the maximal
    * runs of shared character k-grams, i.e. the exact repeated
    * substrings with positions and lengths. Output one row per maximal
    * shared span: (id_a, id_b, start_a, start_b, span_len), spans of
    * length ≥ w + k − 1 only — the winnowing guarantee boundary, below
    * which the candidate stage cannot promise exhaustiveness.
    *
    * Three stages, none all-pairs:
    *  1. candidates — [[overlap]]: winnow fingerprints → inverted-index
    *     join with the `maxDf` boilerplate guard. The winnow guarantee
    *     (any match ≥ w + k − 1 chars shares a fingerprint) makes this
    *     candidate set EXHAUSTIVE for the spans this operator reports,
    *     as long as the shared span's fingerprints survive `maxDf`.
    *     For a passage shared by MORE than `maxDf` documents the guard
    *     drops every interior fingerprint, collapsing the clique's
    *     candidate volume — but selections from windows STRADDLING the
    *     passage boundary are document-specific and can keep a residual
    *     pair alive, so `maxDf` is a volume bound, not a semantic
    *     boilerplate filter (WinnowSpec witnesses both halves). Strip
    *     boilerplate first ([[Boilerplate.removeBoilerplate]]) when the
    *     report must exclude it entirely.
    *  2. gram table — ALL k-gram hashes with positions, computed ONLY
    *     for documents appearing in some candidate pair (semi-join
    *     prune): per-doc narrow arithmetic, corpus cost proportional to
    *     candidate volume, not corpus size.
    *  3. diagonal islands — shared grams of a true repeated substring
    *     lie on one diagonal (pos_a − pos_b constant) at consecutive
    *     positions; a row_number gaps-and-islands window per
    *     (pair, diagonal) merges them into maximal runs; a run of n
    *     grams is an exact shared substring of n + k − 1 characters.
    *
    * Exact up to 32-bit gram-hash collisions (md5 draw, ~2⁻³² per gram
    * pair — the [[Split.hashDraw32]] family, so every stage is
    * engine-reproducible and the whole chain oracles in SQL). The
    * quadratic surface is bounded twice: candidate pairs by Σ df² over
    * maxDf-surviving fingerprints, and the gram join by pair-member
    * documents only.
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16,
      maxDf: Int = 50): DataFrame = {
    val minLen = w + k - 1
    val pairs = overlap(docs, idCol, textCol, k, w, maxDf, minCommon = 1)
      .select(col("id_a"), col("id_b"))
    val ids = pairs.select(col("id_a").as("__id"))
      .unionByName(pairs.select(col("id_b").as("__id"))).distinct()
    val cand = docs.join(ids, col(idCol) === col("__id"), "left_semi")
    // all gram hashes for candidate docs — the verify stage, bounded by
    // the candidate set; fused single-pass kernel ([[graft.exprs
    // .GramKeys]], the WinnowKeys companion), position 1-based like
    // [[fingerprints]]
    val gramsAll = cand.filter(length(col(textCol)) >= k)
      .select(col(idCol).as("__gid"),
        posexplode(graft.exprs.GramKeys(col(textCol), k)))
      .select(col("__gid"), (col("pos") + 1).cast("long").as("gpos"),
        col("col").as("gh"))
    // occurrence pre-filter — a pure optimization, output-identical: a
    // gram occurring ONCE across the whole candidate set can never form
    // a matched row, and in a real corpus most grams are doc-unique, so
    // dropping them shrinks the |pairs| × len expansion stream (the
    // measured cost center at 100×: 1.8 s of candidates vs ~29 s of
    // verify) to |pairs| × |shareable grams|. One count window on gh
    // (occurrence count, not distinct-doc — a within-doc repeat slips
    // through, which only keeps a useless-but-harmless gram)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("gh")
    val grams = gramsAll
      .withColumn("__occ", count(lit(1)).over(wg))
      .filter(col("__occ") >= 2)
      .drop("__occ")
    // pair-bounded gram match: expand each candidate pair with side-a's
    // gram stream, then hash-join side-b on (doc, gram hash). Work is
    // bounded by |pairs| × doc length — the right bound when candidate
    // cliques grow with the corpus. The tempting alternative (gram-level
    // inverted index first, pair semi filter after) is output-
    // proportional at small scale but measured CATASTROPHIC at 100×
    // (Σ df² over grams shared across a large candidate-doc clique:
    // 34 s → 700 s at sf10) — the same all-pairs-bucket failure the
    // winnow/jaccard joins guard against with maxDf.
    val matched = pairs
      .join(grams.select(col("__gid"), col("gpos").as("pos_a"), col("gh")),
        pairs("id_a") === col("__gid"))
      .drop("__gid")
      .join(grams.select(col("__gid"), col("gpos").as("pos_b"),
        col("gh").as("__ghb")),
        col("id_b") === col("__gid") && col("gh") === col("__ghb"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"), col("pos_a") - col("pos_b"))
      .orderBy(col("pos_a"))
    matched
      .withColumn("__grp", col("pos_a") - row_number().over(win))
      .groupBy(col("id_a"), col("id_b"),
        (col("pos_a") - col("pos_b")).as("__diag"), col("__grp"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + (k - 1)).as("span_len"))
      .filter(col("span_len") >= minLen)
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("span_len"))
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
