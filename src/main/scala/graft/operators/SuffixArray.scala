package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed suffix array over the document corpus, and the exact
  * repeated-substring semantics it unlocks (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * suffix-array approach to exact-substring training-data dedup).
  *
  * Contrast with [[Winnow.repeatedSpans]]: that path is PAIRWISE
  * (winnow fingerprints propose candidate pairs, a gram join verifies
  * each pair), so its cost tracks candidate volume (Σ df² over shared
  * fingerprints) and a K-document clique costs K². This path is
  * corpus-GLOBAL: every duplicated position is found in O(n log L)
  * total work (n = corpus characters, L = max document length)
  * regardless of how many documents share a passage — repeat
  * multiplicity never enters the complexity.
  *
  * Construction is Manber–Myers prefix doubling, re-expressed in
  * Spark's shuffle vocabulary with TWO exchanges per round and no
  * join:
  *
  *  - rank_c(doc, pos) groups suffixes by their first c characters;
  *    rank_3 seeds the loop with three UTF-16 units packed into one
  *    long (code+1 per unit, so end-of-doc pads with 0 and shorter
  *    suffixes sort first).
  *  - suffixes are DOC-BOUNDED, so the offset lookup
  *    `rank_c(doc, pos + c)` is WITHIN one document: a `lead(r, c)`
  *    window over the per-doc position order — the classic self-join
  *    of distributed doubling collapses into one exchange by doc,
  *    entirely in Tungsten rows.
  *  - re-ranking by the pair avoids any global window AND any driver
  *    traffic: rows are range-repartitioned on the key and the new
  *    rank is the key group's first `monotonically_increasing_id`
  *    (order-consistent across partitions; equal keys colocate under
  *    range partitioning, so a group never spans a boundary) — see
  *    [[groupRanks]].
  *  - the round count is ⌈log₂ max-doc-length⌉, NOT log of corpus
  *    size — a 100 TB corpus of web documents needs the same ~12
  *    rounds as a 1 GB one. The schedule is fixed up front (one
  *    max-length probe), so the build itself runs ZERO driver
  *    actions: all rounds pipeline into whichever single job consumes
  *    the result. (A convergence early-exit would trade that for one
  *    collect per round — measured strictly worse here, since
  *    converged rounds shuffle already-singleton groups cheaply.)
  *
  * LCP: in suffix-array order, a suffix's longest common prefix with
  * ANY other suffix is max(LCP with its two order-neighbors). Adjacent
  * pairing uses the same range-repartition pass (per-partition firsts
  * collected as metadata to stitch boundaries), and each pair's LCP is
  * the codegen'd [[graft.exprs.SuffixLcp]] walk over the two texts,
  * brought in by two doc-keyed joins (the document table is
  * corpus/avg-len sized; AQE broadcasts it at gate scale). At corpus
  * sizes where even the doc table must shuffle, the text join
  * amplifies each document by its position count — the shard-then-
  * merge layout (suffix arrays per corpus shard, global dedup on the
  * shard results) is the documented scale-out, matching how the
  * published pipelines run this operator.
  *
  * `repeatLengths` output: one row per corpus position with
  * `rep_len` = length of the longest substring starting there that
  * occurs at least twice in the corpus (anywhere — intra- or
  * inter-document). `rep_len ≥ t` ⟺ the position's t-gram occurs ≥ 2
  * times, which is what the DuckDB oracle replays at three depths.
  *
  * Character-code note: positions are Java char units (the corpus
  * tables are ASCII; supplementary-plane text would pair surrogate
  * units — consistent engine-side, noted for honesty).
  */
object SuffixArray {

  /** Final rank table and the coverage (chars compared) at which the
    * doubling loop stopped. The build is one lazy DAG — nothing is
    * cached, so there is nothing to release.
    */
  final case class Sa(order: DataFrame, coverage: Long)

  /** Range-repartitioned group-start re-rank. Prefix doubling does
    * not need globally DENSE ranks — any group id that is (a) equal
    * exactly within a key group and (b) monotone with key order works,
    * because the next round only sorts by it and tests equality. So
    * the new rank is `(partitionId << 42) + local index of the row's
    * key-group start`: equal keys colocate under range partitioning
    * (a group never spans a boundary) and partition ids follow key
    * order, so both properties hold — with NO per-round count collect,
    * NO cache, and NO second pass. The whole doubling loop is one lazy
    * DAG; the only jobs the build runs are the max-length probe and
    * whatever action consumes the result. Rank VALUES depend on the
    * sampled partition boundaries, but the induced ORDER and grouping
    * do not, so downstream results are boundary-invariant.
    */
  private def groupRanks(rows: DataFrame, nPart: Int)(
      implicit spark: SparkSession): DataFrame = {
    // monotonically_increasing_id = (partitionId << 33) | rowIndex —
    // order-consistent across the range-sorted layout; min over the
    // (r, r2) window = the group-start id. The window adds NO exchange
    // and NO sort: RangePartitioning(r, r2) satisfies its clustering
    // and the partition sort already matches — and unlike the RDD
    // formulation this stays in Tungsten rows end to end (the boxed
    // per-row tuples were the measured allocation wall at 100× data).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("r", "r2")
    rows
      .repartitionByRange(nPart, col("r"), col("r2"))
      .sortWithinPartitions("r", "r2")
      .withColumn("__mid", monotonically_increasing_id())
      .select(col("doc"), col("pos"),
        min(col("__mid")).over(w).as("r"))
  }

  /** Build the suffix array; returns the final rank table (doc, pos,
    * r) where r totals-orders suffixes (ties ⟺ identical suffixes).
    * The whole build is lazy; only [[adjacentLcp]] caches (its sort,
    * returned as a handle).
    */
  def build(docs: DataFrame, idCol: String, textCol: String, nPart: Int = 0)(
      implicit spark: SparkSession): Sa = {
    import spark.implicits._
    val parts =
      if (nPart > 0) nPart
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val maxLen = docs
      .agg(coalesce(max(length(col(textCol))), lit(0))).head().getInt(0)
    // initial rank: THREE UTF-16 units packed per position (17 bits
    // each, code+1 so end-of-doc pads with 0 and a shorter suffix
    // sorts first — the same order the per-round −1 sentinel gives).
    // Starting coverage at 3 saves two doubling rounds, and the
    // explode is a narrow flatMap — no shuffle.
    var cur: DataFrame = docs
      .select(col(idCol).cast("long").as("doc"), col(textCol).as("__t"))
      .as[(Long, String)].flatMap { case (doc, t) =>
        val n = if (t == null) 0 else t.length
        (0 until n).iterator.map { p =>
          val c0 = t.charAt(p).toLong + 1
          val c1 = if (p + 1 < n) t.charAt(p + 1).toLong + 1 else 0L
          val c2 = if (p + 2 < n) t.charAt(p + 2).toLong + 1 else 0L
          (doc, p, (c0 << 34) | (c1 << 17) | c2)
        }
      }.toDF("doc", "pos", "r")
    var coverage = 3L
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("pos")
    while (coverage < maxLen) {
      val cc = coverage.toInt
      // doc-local offset lookup: `lead` over the per-doc position
      // order — one shuffle by doc, no join, native Tungsten rows —
      // and a fixed ⌈log₂ maxLen⌉-round schedule with no per-round
      // action, so every round pipelines into the consumer's one job.
      // (positions are dense per doc, so lead(·, c) IS rank(pos + c))
      val withR2 = cur.withColumn("r2", lead(col("r"), cc, -1L).over(wDoc))
      cur = groupRanks(withR2, parts)
      coverage *= 2
    }
    Sa(cur, coverage)
  }

  /** Adjacent suffix pairs in array order with exact LCPs:
    * (a_doc, a_pos, b_doc, b_pos, lcp). `docs` supplies the texts for
    * the codegen'd LCP walk.
    */
  def adjacentLcp(sa: Sa, docs: DataFrame, idCol: String, textCol: String,
      nPart: Int = 0)(
      implicit spark: SparkSession): (DataFrame, org.apache.spark.sql.Dataset[_]) = {
    import spark.implicits._
    val parts =
      if (nPart > 0) nPart
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = sa.order
      .repartitionByRange(parts, col("r"), col("doc"), col("pos"))
      .sortWithinPartitions("r", "doc", "pos")
      .as[(Long, Int, Long)]
      .persist()
    // partition firsts: ≤ one row per partition, stitches boundaries
    val firsts = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) Iterator((i, it.next())) else Iterator.empty
    }.collect().toMap
    val nPartActual = sorted.rdd.getNumPartitions
    val nextFirst: Map[Int, (Long, Int, Long)] = (0 until nPartActual).flatMap { i =>
      ((i + 1) until nPartActual).collectFirst {
        case j if firsts.contains(j) => i -> firsts(j)
      }
    }.toMap
    val bc = spark.sparkContext.broadcast(nextFirst)
    val pairs = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var prev: (Long, Int, Long) = null
      val within = it.flatMap { cur =>
        val out =
          if (prev == null) Iterator.empty
          else Iterator((prev._1, prev._2, cur._1, cur._2))
        prev = cur
        out
      }
      within ++ (if (prev == null) Iterator.empty
      else bc.value.get(i) match {
        case Some(nf) => Iterator((prev._1, prev._2, nf._1, nf._2))
        case None => Iterator.empty
      })
    }
    val ta = docs.select(col(idCol).cast("long").as("a_doc"),
      col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).cast("long").as("b_doc"),
      col(textCol).as("__tb"))
    val lcp = spark.createDataset(pairs)
      .toDF("a_doc", "a_pos", "b_doc", "b_pos")
      .join(ta, "a_doc")
      .join(tb, "b_doc")
      .select(col("a_doc"), col("a_pos"), col("b_doc"), col("b_pos"),
        graft.exprs.SuffixLcp(col("__ta"), col("a_pos").cast("long"),
          col("__tb"), col("b_pos").cast("long")).as("lcp"))
    (lcp, sorted)
  }

  /** Maximal duplicated spans per document — the "what to remove"
    * readout of exact substring dedup (Lee et al. 2022 remove every
    * character covered by a duplicated substring of length ≥ L).
    * Equivalence that keeps this oracle-able: a character sits inside
    * SOME duplicated substring of length ≥ L iff it is covered by the
    * fixed-width interval [pos, pos + L) of SOME position with
    * rep_len ≥ L — so the union of those intervals IS the exact
    * removal set. Interval union per doc is gaps-and-islands over the
    * per-doc position order (windows bounded by document length, no
    * skew surface).
    *
    * Output: (doc, span_start, span_end [exclusive], span_chars).
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int, nPart: Int = 0)(implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rep = repeatLengths(docs, idCol, textCol, nPart)
    val iv = rep.filter(col("rep_len") >= minLen)
      .select(col("doc"), col("pos").cast("long").as("s"),
        (col("pos") + lit(minLen.toLong)).cast("long").as("e"))
    val wPrev = Window.partitionBy("doc").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, 0)
    iv
      .withColumn("__gap",
        when(col("s") > coalesce(max(col("e")).over(wPrev), lit(Long.MinValue)),
          1L).otherwise(0L))
      .withColumn("__isl", sum(col("__gap")).over(wRun))
      .groupBy(col("doc"), col("__isl"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_chars"))
  }

  /** One row per corpus position: (doc, pos [0-based], rep_len) where
    * rep_len = length of the longest substring starting at pos that
    * occurs ≥ 2 times anywhere in the corpus. Positions in one-char
    * corpora (no order-neighbor) are absent; callers left-join.
    */
  def repeatLengths(docs: DataFrame, idCol: String, textCol: String,
      nPart: Int = 0)(implicit spark: SparkSession): DataFrame = {
    val sa = build(docs, idCol, textCol, nPart)
    val (pairs, pairSort) = adjacentLcp(sa, docs, idCol, textCol, nPart)
    val out = pairs.select(col("a_doc").as("doc"), col("a_pos").as("pos"), col("lcp"))
      .unionByName(pairs.select(col("b_doc").as("doc"), col("b_pos").as("pos"), col("lcp")))
      .groupBy(col("doc"), col("pos"))
      .agg(max(col("lcp")).as("rep_len"))
      .localCheckpoint(eager = true) // sever lineage before releasing caches
    pairSort.unpersist()
    out
  }

  // ------------------------------------------------- shard-then-merge

  /** The 100 TB layout of [[repeatLengths]]: per-SHARD suffix arrays
    * plus a capped boundary merge (Lee et al. 2022 run their
    * suffix-array dedup sharded for exactly this reason).
    *
    * Why the global build stops scaling: its doc-table LCP join
    * amplifies every document by its position count, and the doubling
    * exchanges range-partition the whole corpus each round — at 100×
    * the LCP join dominated the decade sweep (668 s, 19.7×/decade).
    *
    * Sharded semantics, and why the result is still EXACT for every
    * dedup readout:
    *
    *  - shard = `doc DIV docsPerShard` — every suffix is doc-bounded,
    *    so a shard fully owns its suffixes; no suffix straddles shards.
    *  - WITHIN a shard: the same prefix-doubling build and adjacent-
    *    LCP walk, with `shard` prepended to every exchange key — rank
    *    groups, adjacency, and the text join are all shard-local, so
    *    exchange width scales out with shard count and the LCP join
    *    amplification is bounded by the SHARD's positions, not the
    *    corpus'. Gives exact UNBOUNDED intra-shard rep_len.
    *  - ACROSS shards (the boundary-overlap merge): a repeat of length
    *    t exists across shards iff two positions share their first t
    *    characters. Every position ships ONE bounded record — its
    *    first `cap` characters — into a corpus-wide range sort; the
    *    neighbor LCP in that order (computed in-row, string vs string,
    *    NO text join) is the exact cross-corpus rep_len capped at
    *    `cap`. The classic overlap trick, keyed on prefixes instead of
    *    overlapping byte ranges because suffixes here are doc-bounded.
    *  - output rep_len = max(intra, cross): exact wherever the true
    *    rep_len < cap, and exactly `≥ cap` saturated otherwise — so
    *    every threshold readout with t ≤ cap (Lee et al. remove at a
    *    FIXED length ~50; the dedup queries test 10/20/40) matches the
    *    global build bit for bit, which is what the
    *    `q_suffix_dedup_sharded` twin gates.
    *
    * Cost shape at 100 TB: doubling exchanges are shard-keyed (each
    * range-partition key space is shard-local), the text join touches
    * only shard-sized tables, and the merge is ONE exchange of
    * `cap`-char records — ~2·cap bytes/position, less than a single
    * doubling round's two exchanges, with no join and no window beyond
    * the sort itself.
    */
  def repeatLengthsSharded(docs: DataFrame, idCol: String, textCol: String,
      docsPerShard: Long, cap: Int, nPart: Int = 0)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(docsPerShard >= 1, "docsPerShard must be >= 1")
    require(cap >= 1, "cap must be >= 1")
    val parts =
      if (nPart > 0) nPart
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val maxLen = docs
      .agg(coalesce(max(length(col(textCol))), lit(0))).head().getInt(0)

    // ---- per-shard suffix array: the [[build]] loop with `shard`
    // prepended to the re-rank key (per-doc windows need no change —
    // a doc lives in exactly one shard)
    var cur: DataFrame = docs
      .select(col(idCol).cast("long").as("doc"), col(textCol).as("__t"))
      .as[(Long, String)].flatMap { case (doc, t) =>
        val n = if (t == null) 0 else t.length
        val shard = doc / docsPerShard
        (0 until n).iterator.map { p =>
          val c0 = t.charAt(p).toLong + 1
          val c1 = if (p + 1 < n) t.charAt(p + 1).toLong + 1 else 0L
          val c2 = if (p + 2 < n) t.charAt(p + 2).toLong + 1 else 0L
          (shard, doc, p, (c0 << 34) | (c1 << 17) | c2)
        }
      }.toDF("shard", "doc", "pos", "r")
    var coverage = 3L
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy("pos")
    val wGrp = org.apache.spark.sql.expressions.Window
      .partitionBy("shard", "r", "r2")
    while (coverage < maxLen) {
      val cc = coverage.toInt
      cur = cur
        .withColumn("r2", lead(col("r"), cc, -1L).over(wDoc))
        .repartitionByRange(parts, col("shard"), col("r"), col("r2"))
        .sortWithinPartitions("shard", "r", "r2")
        .withColumn("__mid", monotonically_increasing_id())
        .select(col("shard"), col("doc"), col("pos"),
          min(col("__mid")).over(wGrp).as("r"))
      coverage *= 2
    }

    // ---- intra-shard adjacency + exact LCP (the [[adjacentLcp]]
    // stitch, pairs dropped at shard boundaries)
    val sorted = cur
      .repartitionByRange(parts, col("shard"), col("r"), col("doc"), col("pos"))
      .sortWithinPartitions("shard", "r", "doc", "pos")
      .as[(Long, Long, Int, Long)]
      .persist()
    val firsts = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) Iterator((i, it.next())) else Iterator.empty
    }.collect().toMap
    val nPartActual = sorted.rdd.getNumPartitions
    val nextFirst: Map[Int, (Long, Long, Int, Long)] =
      (0 until nPartActual).flatMap { i =>
        ((i + 1) until nPartActual).collectFirst {
          case j if firsts.contains(j) => i -> firsts(j)
        }
      }.toMap
    val bc = spark.sparkContext.broadcast(nextFirst)
    val pairs = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var prev: (Long, Long, Int, Long) = null
      val within = it.flatMap { c =>
        val out =
          if (prev == null || prev._1 != c._1) Iterator.empty
          else Iterator((prev._2, prev._3, c._2, c._3))
        prev = c
        out
      }
      within ++ (if (prev == null) Iterator.empty
      else bc.value.get(i) match {
        case Some(nf) if nf._1 == prev._1 =>
          Iterator((prev._2, prev._3, nf._2, nf._3))
        case _ => Iterator.empty
      })
    }
    val ta = docs.select(col(idCol).cast("long").as("a_doc"),
      col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).cast("long").as("b_doc"),
      col(textCol).as("__tb"))
    val intraLcp = spark.createDataset(pairs)
      .toDF("a_doc", "a_pos", "b_doc", "b_pos")
      .join(ta, "a_doc")
      .join(tb, "b_doc")
      .select(col("a_doc"), col("a_pos"), col("b_doc"), col("b_pos"),
        graft.exprs.SuffixLcp(col("__ta"), col("a_pos").cast("long"),
          col("__tb"), col("b_pos").cast("long")).as("lcp"))
    val intra = intraLcp
      .select(col("a_doc").as("doc"), col("a_pos").as("pos"), col("lcp"))
      .unionByName(intraLcp
        .select(col("b_doc").as("doc"), col("b_pos").as("pos"), col("lcp")))

    // ---- boundary merge: one bounded record per position (its first
    // `cap` chars), corpus-wide range sort, neighbor LCP in-row. Same-
    // shard neighbors are harmless (their capped LCP never exceeds the
    // exact intra value), so no shard filter is needed.
    val (cross, prefixed) = cappedNeighborLcp(docs, idCol, textCol, cap, parts)

    val out = intra.unionByName(cross)
      .groupBy(col("doc"), col("pos"))
      .agg(max(col("lcp")).as("rep_len"))
      .localCheckpoint(eager = true) // sever lineage before releasing caches
    sorted.unpersist()
    prefixed.unpersist()
    out
  }

  /** The shared cap-prefix neighbor pass: every position as ONE
    * `cap`-char record, range-sorted corpus-wide, neighbor LCP
    * computed in-row. Returns the (doc, pos, lcp) pair rows plus the
    * persisted sort handle (caller unpersists after consuming).
    */
  private def cappedNeighborLcp(docs: DataFrame, idCol: String,
      textCol: String, cap: Int, parts: Int)(
      implicit spark: SparkSession): (DataFrame, org.apache.spark.sql.Dataset[_]) = {
    import spark.implicits._
    val prefixed = docs
      .select(col(idCol).cast("long").as("doc"), col(textCol).as("__t"))
      .as[(Long, String)].flatMap { case (doc, t) =>
        val n = if (t == null) 0 else t.length
        (0 until n).iterator.map(p =>
          (doc, p, t.substring(p, math.min(p + cap, n))))
      }.toDF("doc", "pos", "pfx")
      .repartitionByRange(parts, col("pfx"), col("doc"), col("pos"))
      .sortWithinPartitions("pfx", "doc", "pos")
      .as[(Long, Int, String)]
    // NOT persisted (r17): caching the full prefix table costs
    // positions × (cap + overhead) bytes of cache churn that competes
    // with the very sorts it feeds — measured at the ×100 rehearsal the
    // cache+checkpoint pair turned the layout super-linear. The two
    // consumers (partition-heads collect below, neighbor scan in the
    // caller) share the ONE range exchange through shuffle-file reuse;
    // only the per-partition sort re-runs on the second pass.
    val pFirsts = prefixed.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) Iterator((i, it.next())) else Iterator.empty
    }.collect().toMap
    val pParts = prefixed.rdd.getNumPartitions
    val pNext: Map[Int, (Long, Int, String)] = (0 until pParts).flatMap { i =>
      ((i + 1) until pParts).collectFirst {
        case j if pFirsts.contains(j) => i -> pFirsts(j)
      }
    }.toMap
    val pBc = spark.sparkContext.broadcast(pNext)
    def strLcp(a: String, b: String): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a.charAt(i) == b.charAt(i)) i += 1
      i
    }
    val pairs = spark.createDataset(
      prefixed.rdd.mapPartitionsWithIndex { (i, it) =>
        var prev: (Long, Int, String) = null
        val within = it.flatMap { c =>
          val out =
            if (prev == null) Iterator.empty
            else {
              val l = strLcp(prev._3, c._3).toLong
              Iterator((prev._1, prev._2, l), (c._1, c._2, l))
            }
          prev = c
          out
        }
        within ++ (if (prev == null) Iterator.empty
        else pBc.value.get(i) match {
          case Some(nf) =>
            val l = strLcp(prev._3, nf._3).toLong
            Iterator((prev._1, prev._2, l), (nf._1, nf._2, l))
          case None => Iterator.empty
        })
      }).toDF("doc", "pos", "lcp")
    (pairs, prefixed)
  }

  /** Bounded-depth repeat lengths: min(rep_len, cap) for EVERY corpus
    * position from ONE cap-prefix range sort — no doubling rounds, no
    * doc-table join, no per-shard machinery. Sorting suffixes by their
    * first `cap` characters IS the suffix-array order truncated at
    * depth `cap`, and in that order a position's best-LCP partner is
    * adjacent, so the in-row neighbor LCP (strings ≤ cap chars) equals
    * min(global rep_len, cap) exactly.
    *
    * This is the THRESHOLD-dedup fast path: every Lee et al.-style
    * readout tests `rep_len ≥ t` at fixed depths t ≤ cap, where
    * min(rep, cap) is indistinguishable from rep — so the same DuckDB
    * oracle gates this operator, the sharded layout, and the global
    * build. Cost: one exchange of ~2·cap bytes/position plus a
    * positions-keyed aggregate — compare ⌈log₂ maxLen⌉ doubling rounds
    * × two exchanges + the LCP text join for the unbounded builds
    * (measured: 2.7/5.8/42.5 s at 1×/10×/100× vs the global build's
    * 14.1/38.6/453.6 — 10.7× at 100×). The unbounded builds remain
    * the path for readouts that need rep_len PAST the cap (e.g.
    * longest-repeat mining); for fixed-threshold dedup this is the
    * plan you'd run at 100 TB.
    */
  def boundedRepeatLengths(docs: DataFrame, idCol: String, textCol: String,
      cap: Int, nPart: Int = 0)(implicit spark: SparkSession): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val parts =
      if (nPart > 0) nPart
      else {
        // Scale-adaptive exchange width (guide §2.2): the prefix sort
        // carries ~(cap + row-overhead) bytes per corpus CHARACTER — a
        // static session width turns super-linear the decade this
        // outgrows per-task sort memory (measured at the ×100 rehearsal:
        // ~10 GB over 32 partitions = ~350 MB/task sorts, 6.8 → 119.4 s
        // for 10× data, pure spill). One cheap length-sum scan sizes the
        // exchange to ~128 MB/task instead; at the swept SFs the derived
        // width stays at the session default, so small-scale plans are
        // unchanged. AQE cannot help here: it only coalesces DOWN from
        // the static width, never splits an oversized sort up.
        val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val chars = docs
          .agg(coalesce(sum(length(col(textCol))), lit(0L))).head().getLong(0)
        val estBytes = chars * (cap + 28L)
        math.max(session, math.min(4096L, estBytes / (128L << 20)).toInt)
      }
    val (pairs, _) = cappedNeighborLcp(docs, idCol, textCol, cap, parts)
    // One explicit exchange at the derived width feeds the
    // positions-keyed aggregate (the session-width groupBy exchange
    // would re-create the oversized-sort problem one operator later),
    // and the result stays LAZY: the r16 positions-sized eager
    // localCheckpoint wrote + pinned ~rep-table bytes per call, which —
    // together with the prefix cache removed above — thrashed execution
    // memory at the ×100 rehearsal (6.8 → 119.4 s for 10× data; the
    // restructured layout measures linear again, see SCALING.md r17).
    pairs
      .repartition(parts, col("doc"), col("pos"))
      .groupBy(col("doc"), col("pos"))
      .agg(max(col("lcp")).as("rep_len"))
  }
}
