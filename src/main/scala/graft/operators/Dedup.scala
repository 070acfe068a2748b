package graft.operators

import graft.functions.{Sim, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as a
  * shuffle-minimal distributed plan:
  *
  *  - exact: hash-groupBy on a normalized digest (1 shuffle, map-side
  *    partial agg);
  *  - minhashLsh: shingle → minhash → band-explode → bucket self-join —
  *    the self-join is on (band, bucket), so only colliding docs meet;
  *    never an O(n²) cross join;
  *  - simhash: 64-bit fingerprint + banded key join for hamming ≤ k;
  *  - ngramJaccard: token-postings join (inverted-index style) — pairs
  *    are generated only for docs sharing a token, then exact Jaccard;
  *  - embeddingCosine: LSH-bucketed (random hyperplane) near-dup join.
  */
object Dedup {

  /** Exact dedup: one row per distinct normalized text; keeps min id,
    * reports group size. Single hash shuffle.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("text_hash", Text.exactKey(col(textCol)))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Incremental exact dedup — the daily-increment shape: admit only
    * NEW-batch documents whose normalized text appears nowhere in the
    * historical corpus, deduping within the batch as well (min id wins,
    * batch multiplicity reported).
    *
    * Scale shape mirrors [[Decontam]]: the HISTORY side is the 100 TB
    * one, so it is never shuffled and never broadcast — it is scanned
    * once, digest-projected, and semi-joined map-side against the
    * broadcast batch key set; the resulting "seen" keys (bounded by the
    * batch size) broadcast into the final anti join. Batch-sized data
    * crosses the wire twice; history-sized data never does.
    */
  def incrementalExact(
      batch: DataFrame,
      history: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val bkeys = batch.select(Text.exactKey(col(textCol)).as("text_hash")).distinct()
    val seen = history
      .select(Text.exactKey(col(textCol)).as("text_hash"))
      .join(broadcast(bkeys), "text_hash")
      .distinct()
    batch
      .withColumn("text_hash", Text.exactKey(col(textCol)))
      .join(broadcast(seen), Seq("text_hash"), "left_anti")
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("batch_count"))
  }

  /** Bloom-pruned incremental exact dedup: same OUTPUT as
    * [[incrementalExact]], different history-prune mechanism. The batch's
    * key set is folded into a constant-size Bloom filter — built
    * DISTRIBUTED via Spark's `BloomFilterAggregate` (per-partition
    * sketches, one merged binary blob to the driver) — and pushed into
    * the history scan as a foldable `might_contain` literal predicate.
    * Against 100 TB of history that swaps [[incrementalExact]]'s
    * batch-sized broadcast semi-join for a fixed ~1.2 bytes/expected-key
    * bitset evaluated inline in the scan stage: no join, no broadcast
    * table, codegen'd probe per history row. Bloom false positives
    * survive the prune and are eliminated by the exact key join that
    * follows; false negatives cannot occur — so the result is
    * byte-identical to the exact operator (the spec asserts it).
    * Size `expectedItems` ≥ the batch's distinct-key count: undersizing
    * only raises the false-positive rate (more rows to the exact join),
    * never corrupts the result.
    */
  def incrementalExactBloom(
      batch: DataFrame,
      history: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType

    val bloomAgg = new BloomFilterAggregate(
      GraftShim.eagerExpression(xxhash64(Text.exactKey(col(textCol)))),
      expectedItems).toAggregateExpression()
    val bloom = batch.select(GraftShim.column(bloomAgg).as("bf")).head()
    if (bloom.isNullAt(0)) {
      // empty batch → no keys to admit; keep the exact path's (empty) output
      incrementalExact(batch, history, idCol, textCol)
    } else {
      val mightContain = GraftShim.column(BloomFilterMightContain(
        Literal.create(bloom.getAs[Array[Byte]](0), BinaryType),
        GraftShim.eagerExpression(xxhash64(Text.exactKey(col(textCol))))))
      incrementalExact(batch, history.filter(mightContain), idCol, textCol)
    }
  }

  /** Incremental near-dup: batch-vs-history MinHash LSH — band-bucket
    * join between the NEW batch and the historical corpus only (never a
    * history self-join), returning batch ids colliding with any history
    * doc at estimated Jaccard ≥ threshold. The history side explodes its
    * band keys but, as in [[incrementalExact]], is semi-joined against
    * the broadcast batch bucket set before anything pair-shaped exists,
    * so pair work is bounded by batch collisions.
    */
  def incrementalNearDup(
      batch: DataFrame,
      history: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      md5Base: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    def keyed(df: DataFrame, side: String) = df
      .select(col(idCol).as(s"id_$side"),
        graft.exprs.MinHashSig(
          graft.exprs.Shingles(col(textCol), shingleN), numHashes, md5Base)
          .as(s"sig_$side"))
      .filter(size(col(s"sig_$side")) > 0)
      .select(col(s"id_$side"), col(s"sig_$side"),
        posexplode(graft.exprs.LshBandKeys(col(s"sig_$side"), bands, rows, md5Base)))
      .select(col(s"id_$side"), col(s"sig_$side"),
        col("pos").as("band"), col("col").as("bucket"))
    val b = keyed(batch, "b")
    val bBuckets = b.select(col("band"), col("bucket")).distinct()
    val h = keyed(history, "h")
      .join(broadcast(bBuckets), Seq("band", "bucket"))
    b.join(h, Seq("band", "bucket"))
      .withColumn("est", Sim.minHashJaccard(col("sig_b"), col("sig_h")))
      .filter(col("est") >= threshold)
      .groupBy(col("id_b"))
      // distinct NEIGHBOR count, not band-collision count: a true near-dup
      // pair collides in many bands and would otherwise inflate the tally
      .agg(countDistinct(col("id_h")).as("n_neighbors"),
        round(max(col("est")), 4).as("max_jaccard"))
  }

  /** A candidate pair colliding in k buckets would surface k times; keep
    * it only where the collision index equals the FIRST index at which the
    * two key arrays agree. Emitting each pair exactly once this way is a
    * per-row filter — the alternative, `groupBy(id_a, id_b)`, is a full
    * shuffle of the candidate-pair stream, the largest intermediate of
    * any LSH plan at corpus scale.
    */
  private def firstCollision(keysA: Column, keysB: Column, idx: Column): Column =
    graft.exprs.FirstEqualIndex(keysA, keysB) === idx + 1

  /** MinHash+LSH candidate pairs with estimated Jaccard ≥ threshold.
    *
    * Plan: docs → shingle+sign (narrow) → explode band keys (×bands) →
    * shuffle on (band,bucket) self-join → verify with the signature
    * estimate. The join key cardinality ≈ n·bands, each bucket small, so
    * the shuffle is linear in data size. Pairs colliding in several
    * bands are kept only at their first shared bucket (`firstCollision`
    * over the carried per-band bucket arrays — bucket equality, not raw
    * band-slice equality, so the kept row is exactly one of the emitted
    * ones even under a bucket-hash collision), so no pair-dedup shuffle
    * is needed.
    *
    * ==The hot-bucket guard (`maxBucket`)==
    * A duplicate CLIQUE — 100k mirror pages, a boilerplate template —
    * collides in EVERY band and a pair-exact bucket join emits O(c²)
    * candidates from one bucket: quadratic in exactly the rows a dedup
    * pipeline exists to handle. With `maxBucket` set, buckets of size
    * ≤ maxBucket keep the pair-exact plan above, while HOT buckets emit
    * only O(c) STAR edges (bucket-min-id leader → member), computed from
    * two window aggregates over the SAME (band,bucket) key the join
    * shuffles on. Volume bound: ≤ maxBucket·n exact pairs + bands·n star
    * edges — linear whatever the duplicate distribution.
    *
    * Capped-mode contract (a volume bound, not a semantic guarantee —
    * the [[Winnow.overlap]] maxDf framing):
    *  - a pair sharing ANY small bucket is reported exactly as in
    *    pair-exact mode — including the mixed case where the pair's
    *    FIRST shared bucket is hot but a later shared bucket is small
    *    (the first-collision emit rule is relaxed in capped mode: a
    *    pair may surface from each of its small buckets, and the final
    *    groupBy dedups; the estimate is a pure function of the two
    *    signatures, so re-verification per band changes nothing);
    *  - hot-bucket members are reported through their leader edge
    *    (verified against the same threshold), so transitive connected
    *    components — what the clustering consumers [[Cluster]] build —
    *    are preserved whenever leader–member similarity clears the
    *    threshold, which a genuine duplicate clique does by construction;
    *  - a pair colliding ONLY in hot buckets, both sides non-leaders, is
    *    not reported as an explicit pair (its members remain connected
    *    via the leader). PlantedCliqueSpec proves cluster equality under
    *    a planted power-law clique, where pair-exact mode goes quadratic.
    * The final `groupBy(id_a, id_b)` dedups the small/star union — it
    * shuffles the POST-verification result (output-proportional), never
    * the candidate stream; default Int.MaxValue keeps the historical
    * single-pass plan bit-identical with no window stage at all.
    *
    * `md5Base` swaps the xxhash64 draw for the repo's md5 draw so an
    * external SQL engine can replay every stage (the
    * [[incrementalNearDup]] convention).
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = Int.MaxValue,
      md5Base: Boolean = false): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val rows = numHashes / bands
    val signed = docs
      .select(col(idCol).as("id"),
        // fused native signing (one pass, all minima in registers) —
        // MinHashSigSpec proves bit-equality with the HOF Sim.minHash
        graft.exprs.MinHashSig(
          graft.exprs.Shingles(col(textCol), shingleN), numHashes, md5Base)
          .as("sig"))
      .filter(size(col("sig")) > 0)
    val banded = signed
      .select(col("id"), col("sig"),
        // fused native banding — LshBandKeysSpec proves bit-equality with
        // the HOF Sim.lshBands bucket field
        graft.exprs.LshBandKeys(col("sig"), bands, rows, md5Base).as("bkts"))
      .select(col("id"), col("sig"), col("bkts"), posexplode(col("bkts")))
      .select(col("id"), col("sig"), col("bkts"),
        col("pos").as("band"), col("col").as("bucket"))
    // `firstOnly` governs pair-dedup strategy: the default plan emits a
    // pair only at its first shared bucket (no dedup shuffle exists at
    // all); the capped plan already ends in an output-sized groupBy, so
    // there it emits at EVERY small shared bucket instead — which is
    // what makes "shares any small bucket ⇒ pair-exact" hold even when
    // the pair's first collision lands in a hot bucket
    def exactPairs(srcA: DataFrame, srcB: DataFrame,
        firstOnly: Boolean = true): DataFrame = {
      val a = srcA.select(col("band"), col("bucket"), col("id").as("id_a"),
        col("sig").as("sig_a"), col("bkts").as("bkts_a"))
      val b = srcB.select(col("band"), col("bucket"), col("id").as("id_b"),
        col("sig").as("sig_b"), col("bkts").as("bkts_b"))
      val joined = a.join(b, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
      val kept =
        if (firstOnly)
          joined.filter(firstCollision(col("bkts_a"), col("bkts_b"), col("band")))
        else joined
      kept
        .select(col("id_a"), col("id_b"),
          Sim.minHashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
    }
    if (maxBucket == Int.MaxValue) exactPairs(banded, banded)
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
      // one select, both aggregates: adjacent same-spec window exprs
      // collapse into a single Window node (a withColumn chain would
      // interpose a Project and leave two stacked passes)
      val sized = banded.select(col("*"),
        count(lit(1)).over(w).as("__bsz"),
        min(struct(col("id"), col("sig"))).over(w).as("__lead"))
      // a bucket's size is a property of the bucket, not the row: if the
      // a-side row sits in a small bucket, every b-side row it joins
      // shares that bucket — so the b side stays the UN-windowed banded
      // stream, and only two window evaluations exist in the whole plan
      // (small-side filter + star side), both over one reused exchange
      val small = exactPairs(
        sized.filter(col("__bsz") <= maxBucket)
          .select("id", "sig", "bkts", "band", "bucket"),
        banded, firstOnly = false)
      val star = sized
        .filter(col("__bsz") > maxBucket && col("id") =!= col("__lead.id"))
        .select(col("__lead.id").as("id_a"), col("id").as("id_b"),
          Sim.minHashJaccard(col("__lead.sig"), col("sig")).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
      // one pair can surface from several bands' hot buckets AND from the
      // small side; the estimate is a pure function of the two signatures,
      // so max == the single value — this groupBy only dedups
      small.unionByName(star)
        .groupBy(col("id_a"), col("id_b"))
        .agg(max(col("est_jaccard")).as("est_jaccard"))
    }
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming.
    *
    * Banding: a 64-bit simhash split into (maxHamming+1) chunks — any pair
    * within distance k agrees on at least one chunk (pigeonhole), so a
    * join per chunk index finds all candidates without a cross join.
    */
  def simhash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame =
    hammingPairs64(
      docs.select(col(idCol).as("id"),
        // fused native fingerprinting (one pass per token) — SimHash64Spec
        // proves bit-equality with the HOF Sim.simHash
        graft.exprs.SimHash64(Text.tokens(col(textCol))).as("sh")),
      "id", "sh", maxHamming, maxBucket)

  /** All pairs of 64-bit fingerprints within hamming distance
    * `maxHamming` — the banded-join core shared by text [[simhash]] and
    * image [[Multimodal.dhash64]] near-dup detection (one fingerprint
    * domain, one join implementation).
    *
    * Banding: the hash splits into (maxHamming+1) chunks — any pair
    * within distance k agrees on at least one chunk (pigeonhole; bits
    * past chunks·⌊64/chunks⌋ are uncovered, which only ADDS candidate
    * pairs, never loses one), so a join per chunk index finds all
    * candidates without a cross join. Pairs colliding in several chunks
    * are kept only at their first shared chunk (recomputable from the
    * carried fingerprints — no extra state), so no pair-dedup shuffle.
    */
  def hammingPairs64(
      hashed0: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    // maxHamming = 0 → one 64-bit chunk; (1L << 64) is 1 (shift counts are
    // mod 64), so the generic mask would be 0 and every row would band to
    // key 0 — a silent full self cross join. Full-width mask instead: the
    // candidate join becomes an exact-hash equi-join, as it should.
    val mask = if (bitsPer == 64) -1L else (1L << bitsPer) - 1
    def chunkKey(sh: Column, c: Column): Column =
      call_function("shiftright", sh, (c * bitsPer).cast("int"))
        .bitwiseAND(lit(mask))
    val hashed = hashed0.select(col(idCol).as("id"), col(hashCol).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"), chunkKey(col("sh"), lit(c)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.chunk").as("chunk"), col("bk.key").as("key"))
    // `firstOnly` as in [[minhashLsh]]: first-shared-chunk emit where no
    // dedup shuffle exists (default mode); every-small-chunk emit where
    // the capped mode's output-sized groupBy dedups anyway, so sharing
    // ANY small chunk bucket stays pair-exact
    def exactPairs(srcA: DataFrame, srcB: DataFrame,
        firstOnly: Boolean = true): DataFrame = {
      val a = srcA.select(col("chunk"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
      val b = srcB.select(col("chunk"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
      // chunk keys are recomputable from the carried fingerprints, so the
      // first-collision pair-emit check needs no extra carried state at all
      val chunkMatches = transform(sequence(lit(0), lit(chunks - 1)),
        c => chunkKey(col("sh_a"), c) === chunkKey(col("sh_b"), c))
      val joined = a.join(b, Seq("chunk", "key"))
        .filter(col("id_a") < col("id_b"))
      val kept =
        if (firstOnly)
          joined.filter(array_position(chunkMatches, true) === col("chunk") + 1)
        else joined
      kept
        .select(col("id_a"), col("id_b"), Sim.hamming64(col("sh_a"), col("sh_b")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
    }
    if (maxBucket == Int.MaxValue) exactPairs(banded, banded)
    else {
      // hot-bucket guard — the [[minhashLsh]] contract, fingerprint
      // domain: a clique of identical/near-identical fingerprints lands
      // in one chunk-key bucket in EVERY chunk and would emit O(c²)
      // pairs; buckets past maxBucket emit O(c) star edges to the
      // bucket-min-id leader instead, verified at the same distance
      // bound. The join's b side stays un-windowed (a shared bucket's
      // size is the bucket's, not the row's), so only two window
      // evaluations exist; final groupBy dedups the output-sized union.
      val w = org.apache.spark.sql.expressions.Window.partitionBy("chunk", "key")
      val sized = banded.select(col("*"),
        count(lit(1)).over(w).as("__bsz"),
        min(struct(col("id"), col("sh"))).over(w).as("__lead"))
      val small = exactPairs(
        sized.filter(col("__bsz") <= maxBucket)
          .select("id", "sh", "chunk", "key"),
        banded, firstOnly = false)
      val star = sized
        .filter(col("__bsz") > maxBucket && col("id") =!= col("__lead.id"))
        .select(col("__lead.id").as("id_a"), col("id").as("id_b"),
          Sim.hamming64(col("__lead.sh"), col("sh")).as("hamming"))
        .filter(col("hamming") <= maxHamming)
      small.unionByName(star)
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("hamming")).as("hamming"))
    }
  }

  /** Greedy near-dup removal: given candidate pairs (id_a < id_b), keep
    * every doc that never appears on the b-side — the standard one-pass
    * survivor rule for LSH dedup (each cluster keeps its smallest id;
    * no transitive-closure iteration, which at 100 TB would be an
    * unbounded iterative join). The pair set is usually ≪ corpus, so
    * the anti-join broadcasts.
    */
  def survivors(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    docs.join(
      broadcast(pairs.select(col("id_b").as(idCol)).distinct()),
      Seq(idCol), "left_anti")

  /** Exact bounded-edit-distance near-dup pairs via prefix blocking:
    * candidates share the first `prefixLen` characters AND are within
    * `maxDist` in length (a true edit-distance invariant — blocking by
    * prefix is the recall trade-off, spec'd: a pair whose edits touch
    * the first `prefixLen` chars is not generated). The survivor filter
    * is Spark's THRESHOLDED `levenshtein(l, r, maxDist)` — the banded
    * O(maxDist·n) kernel, not the full O(n²) matrix, returning −1 past
    * the bound.
    *
    * 100 TB shape: one self-join on the prefix key (hash-partitioned;
    * candidate volume is Σ_bucket c², same contract as [[ngramJaccard]]'s
    * df cap) with the length band pushed into the join condition;
    * `maxBucket` drops prefix buckets larger than the cap from pair
    * generation entirely (boilerplate openings are the hot-bucket case
    * here — a dropped bucket is a documented recall gap, never a
    * quadratic blowup).
    */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int,
      prefixLen: Int,
      maxBucket: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy("__p")
    val d = docs.select(
        col(idCol).as("id"), col(textCol).as("__t"),
        substring(col(textCol), 1, prefixLen).as("__p"),
        length(col(textCol)).as("__len"))
      .withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    d.as("x")
      .join(d.as("y"),
        col("x.__p") === col("y.__p") &&
          col("x.id") < col("y.id") &&
          abs(col("x.__len") - col("y.__len")) <= maxDist)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.__t"), col("y.__t"), maxDist).as("dist"))
      .filter(col("dist") =!= -1)
  }

  /** Exact n-gram Jaccard pairs via an inverted-index join: explode
    * distinct n-grams, join postings on the gram, count intersections,
    * then |A∪B| = |A|+|B|−|A∩B|. Only docs sharing ≥1 gram ever meet.
    *
    * `maxDf` caps a gram's document frequency before the postings join:
    * a gram present in d docs yields O(d²) candidate rows, so stop-word
    * grams ("the", "of") form quadratic hot buckets at corpus scale. The
    * standard fix is to drop grams with df > maxDf from BOTH the postings
    * and the per-doc sizes, i.e. Jaccard is computed over the filtered
    * gram sets — still exact for every gram that survives, and pairs
    * sharing only ubiquitous grams (which say nothing about similarity)
    * are never generated. The df filter is a count window over the gram
    * partition — ONE shuffle of the postings on the same key the join
    * needs anyway; the groupBy-then-join alternative shuffles the
    * postings AND the gram-count table per branch (the count table is
    * corpus-sized grams at scale, never broadcastable) and measured
    * ~1.7× slower. Default Long.MaxValue = no cutoff (bit-identical to
    * the plain plan).
    */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      threshold: Double = 0.5,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val allGrams = docs.select(col(idCol).as("id"),
      explode(graft.exprs.Shingles(col(textCol), n)).as("gram"))
    val grams =
      if (maxDf == Long.MaxValue) allGrams
      else allGrams
        .withColumn("__df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("gram")))
        .filter(col("__df") <= maxDf)
        .drop("__df")
    val sizes = grams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val a = grams.select(col("gram"), col("id").as("id_a"))
    val b = grams.select(col("gram"), col("id").as("id_b"))
    val inter = a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      // raw ratio, never rounded: a single division of exact integers is
      // bit-identical in any engine, while rounding a decimal-exact
      // rational can land on a tie and differ between rounding paths
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Corpus-level span dedup (C4-style): cut each document into
    * consecutive `spanTokens`-token chunks, keep only the FIRST occurrence
    * of every distinct chunk corpus-wide (ordered by (id, position)), and
    * reassemble the surviving chunks in position order. A document whose
    * every span was seen earlier disappears entirely. This removes
    * boilerplate repeated ACROSS documents — the complement of document-
    * level near-dup removal.
    *
    * Plan: chunk explode (narrow) → one window shuffle keyed on the span
    * (first-occurrence rank; WindowGroupLimit prunes local losers before
    * the exchange) → one id shuffle for the ordered reassembly. At corpus
    * scale, substitute xxhash64(span) as the window key so the shuffle
    * carries 8-byte keys — kept textual here because the driver oracle
    * replays the span text in SQL.
    */
  def dedupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int = 10,
      carryCols: Seq[String] = Nil): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val nSpans = ceil(size(toks) / lit(spanTokens.toDouble)).cast("int")
    val spanArr = transform(sequence(lit(0), nSpans - 1),
      i => array_join(slice(toks, i * spanTokens + 1, lit(spanTokens)), " "))
    // carried columns ride the explode (duplicated per span — cheap next
    // to the span text) and fold back with first() in the reassembly
    // aggregate, so downstream consumers (e.g. a partitioned packer) need
    // no join back to the input
    val spans = docs
      .select(col(idCol).as("id") +: carryCols.map(col) :+
        posexplode(spanArr).as(Seq("pos", "span")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("span").orderBy(col("id"), col("pos"))
    spans
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col("id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("span")))),
          s => s.getField("span")), " ").as("text_dedup"),
        carryCols.map(c => first(col(c)).as(c)): _*)
  }

  /** Embedding near-dup pairs: random-hyperplane LSH buckets, then exact
    * cosine within buckets. `planes` fixed-seed hyperplanes → bucket key;
    * docs within cosine θ collide with probability (1−θ/π)^planes per
    * table; `tables` repetitions boost recall. Pairs colliding in several
    * tables are kept only in the first shared one (no dedup shuffle).
    *
    * `maxBucket` is the [[minhashLsh]] hot-bucket guard re-expressed for
    * the embedding domain. The minhash star collapse does NOT transfer
    * directly: a hyperplane bucket is a coarse 2^planes-cell partition of
    * the sphere, not a similarity clique — a hot bucket holds the
    * duplicate clique PLUS incidental dissimilar neighbors, so
    * star-collapsing a (table, bucket) would drop true member–member
    * pairs whose cosine-to-leader misses the threshold. The sound
    * collapse unit here is the IDENTICAL-vector group: mirror pages
    * embed byte-identically, share every bucket, and satisfy
    * cos(rep, y) = cos(member, y) for every y — so a group of more than
    * `maxBucket` equal vectors folds to its min-id representative
    * (|G|−1 star edges, verified with the very expression pair-exact
    * would run on the pair), while every row in a group of ≤ maxBucket
    * (including all distinct-vector residents of a coarse bucket) keeps
    * the pair-exact path. Consequences, all exact rather than
    * best-effort:
    *  - connected components are IDENTICAL to pair-exact mode (no
    *    threshold-dependent loss is possible: the representative inherits
    *    the member's buckets and cosines bit-for-bit);
    *  - with no over-cap group the output is row-identical to pair-exact;
    *  - volume is bounded at one bucket row per distinct vector plus
    *    O(c) star edges per duplicate clique — the quadratic
    *    mirror-page blowup cannot occur. A hot bucket of > maxBucket
    *    DISTINCT vectors stays pair-exact by design (no sound O(c)
    *    collapse exists for it; 2^planes cells keep its expected size at
    *    n/2^planes per table).
    * The DEFAULT is a finite cap: mirror cliques are routine in web
    * corpora and the un-guarded plan goes quadratic on exactly those
    * rows, so clique immunity is the production posture (the price is
    * one partial-aggregable group-stats pass — the clique map-side
    * combines, no window, no per-partition clique buffering — plus a
    * join against the over-cap groups only, broadcast-sized whenever
    * hot groups are rare). `maxBucket = Int.MaxValue` restores the
    * historical single-pass pair-exact plan. PlantedCliqueSpec proves
    * cluster equality, the no-hot-group row identity, the volume
    * collapse, and the window-free plan shape.
    */
  def embeddingCosine(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 8,
      tables: Int = 4,
      maxBucket: Int = 256): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val dim = 64
    // all tables×planes sign bits in ONE native fused loop per row
    // (graft.exprs.HyperplaneBuckets): the HOF form is tables×planes
    // interpreted lambda-aggregate trees per row, and inlining that many
    // separate native loops blows codegen method limits — one expression,
    // one JIT'd method. posexplode yields (table, bucket) directly.
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    def bucketed(src: DataFrame): DataFrame = src
      .select(col("id"), col("v"),
        graft.exprs.HyperplaneBuckets(col("v"), tables, planes, dim).as("bks"))
      .select(col("id"), col("v"), col("bks"), posexplode(col("bks")))
      .select(col("id"), col("v"), col("bks"), col("pos").as("table"), col("col").as("bucket"))
    def exactPairs(srcA: DataFrame, srcB: DataFrame): DataFrame = {
      val a = srcA.select(col("table"), col("bucket"), col("id").as("id_a"),
        col("v").as("v_a"), col("bks").as("bks_a"))
      val b = srcB.select(col("table"), col("bucket"), col("id").as("id_b"),
        col("v").as("v_b"), col("bks").as("bks_b"))
      a.join(b, Seq("table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        // keep a pair only in its first shared table: exact cosine then runs
        // once per pair and no pair-dedup shuffle exists in the plan
        .filter(firstCollision(col("bks_a"), col("bks_b"), col("table")))
        .select(col("id_a"), col("id_b"),
          graft.exprs.CosineSim(col("v_a"), col("v_b")).as("cos"))
        .filter(col("cos") >= threshold)
    }
    val pairs =
      if (maxBucket == Int.MaxValue) {
        val keyed = bucketed(base)
        exactPairs(keyed, keyed)
      } else {
        // group stats via a partial-aggregable groupBy, NOT a window: the
        // mirror clique map-side combines to one row per vector (no
        // executor ever buffers a clique, which the window form would),
        // and only the OVER-CAP groups — a handful of (v, lead) rows —
        // flow into the join below, so it broadcasts. The key is the
        // full vector — a digest would merge distinct vectors on a hash
        // collision and silently star-collapse non-duplicates.
        val hot = base.groupBy(col("v"))
          .agg(count(lit(1)).as("__gsz"), min(col("id")).as("__lead"))
          .filter(col("__gsz") > maxBucket)
          .select(col("v"), col("__lead"))
        val flagged = base.join(hot, Seq("v"), "left")
        // star edges carry the member's OWN vector on both sides: the
        // leader's vector is equal by construction, so CosineSim(v, v)
        // is bit-for-bit the value pair-exact would verify (and its
        // degenerate cases — zero vectors, NaN components — degrade
        // identically in both modes)
        val star = flagged
          .filter(col("__lead").isNotNull && col("id") =!= col("__lead"))
          .select(col("__lead").as("id_a"), col("id").as("id_b"),
            graft.exprs.CosineSim(col("v"), col("v")).as("cos"))
          .filter(col("cos") >= threshold)
        // collapsed non-leaders leave the bucketed stream entirely, so a
        // star edge can never duplicate a pair-exact row: plain union,
        // no pair-dedup shuffle
        val kept = bucketed(flagged
          .filter(col("__lead").isNull || col("id") === col("__lead"))
          .select("id", "v"))
        exactPairs(kept, kept).unionByName(star)
      }
    pairs.withColumn("cos", round(col("cos"), 4))
  }
}
