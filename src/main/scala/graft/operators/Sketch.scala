package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the fixed-size
  * mergeable frequency summary that answers "how often does key x
  * occur?" over a corpus too large to groupBy exactly.
  *
  * Why it matters at 100 TB: an exact token-frequency pass shuffles the
  * full vocabulary (billions of keys on web text); the sketch shuffles AT
  * MOST depth×width rows PER TASK regardless of corpus size, because the
  * cell counts partial-aggregate map-side — the shuffle volume is a
  * constant of the sketch geometry, not of the data. The estimate is
  * one-sided (est ≥ true, overcount ≤ εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉), so a heavy-hitter scan over the
  * sketch can miss nothing — false positives only, each still bounded.
  *
  * Everything is declarative DataFrame code: the bucket draws are the
  * engine's standard 32-bit md5 derivation ([[Split.hashDraw32]] ≡
  * `CAST('0x' || substring(md5(key),1,8) AS BIGINT)` in ANSI SQL), so an
  * external engine rebuilds the identical sketch cell-for-cell — the
  * property the oracle gate checks.
  */
object Sketch {

  /** Bucket of `token` in row `d` of the sketch: the 32-bit md5 draw of
    * "salt:d:token" mod `width` (draws are non-negative, so `%` agrees
    * across engines).
    */
  private def bucket(token: Column, d: Int, width: Int, salt: String): Column =
    Split.hashDraw32(token, s"$salt:$d:") % width

  /** Build the sketch: depth×width cell counts over a token column.
    * Returns `(d, b, c)` — one row per NON-EMPTY cell (absent = 0).
    *
    * Plan shape: explode each token to its `depth` (row, bucket) cells,
    * then a hash aggregate keyed on (d, b) — partial map-side combine
    * collapses every task to ≤ depth·width rows before the exchange, so
    * the shuffle is sketch-sized, never corpus-sized.
    */
  def countMin(
      tokens: DataFrame,
      tokenCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 1, "sketch geometry must be positive")
    val cells = array((0 until depth).map(d =>
      struct(lit(d).as("d"), bucket(col(tokenCol), d, width, salt).as("b"))): _*)
    tokens
      .select(explode(cells).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point-estimate each probe key against a built sketch: the MIN over
    * the key's `depth` cells (a cell no probe hashed into reads 0).
    *
    * The sketch broadcasts (≤ depth·width rows — metadata-sized by
    * construction), so estimation is a broadcast hash join + one
    * aggregate keyed on the probe: no sketch-side shuffle, and the
    * probe side aggregates on the SAME key it arrives grouped by.
    */
  def estimate(
      sketch: DataFrame,
      probes: DataFrame,
      tokenCol: String,
      depth: Int,
      width: Int,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 1, "sketch geometry must be positive")
    val cells = array((0 until depth).map(d =>
      struct(lit(d).as("d"), bucket(col(tokenCol), d, width, salt).as("b"))): _*)
    probes
      .select(col(tokenCol), explode(cells).as("cell"))
      .join(broadcast(sketch),
        col("cell.d") === col("d") && col("cell.b") === col("b"), "left")
      .groupBy(col(tokenCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** HyperLogLog registers (Flajolet et al. 2007) per group: bucket =
    * top `p` bits of the 32-bit md5 draw, register = max over the
    * group's values of rank(low 32−p bits), where rank = leading zeros
    * + 1 (a zero remainder ranks 32−p+1). Unlike the engine-internal
    * `approx_count_distinct` (HLL++, sketch format not replayable
    * outside Spark), every register here derives from the md5 draw —
    * so an external SQL engine rebuilds the register file EXACTLY and
    * the estimate is oracle-checkable.
    *
    * rank via `floor(log2(rem))`: rem < 2³² is an exact double and the
    * nearest double to log2(rem) is > 5×10⁻⁸ from the ceiling integer
    * (vs ulp ≈ 4×10⁻¹⁵), so the floor cannot straddle engines.
    *
    * Plan: per-row draw arithmetic, then a (group, bucket) max — the
    * partial max collapses every task to ≤ groups·2ᵖ rows before the
    * exchange, the same constant-size-shuffle contract as [[countMin]].
    * Registers merge across corpora by bucket-wise MAX (union + the
    * same groupBy), which is what makes HLL a sketch.
    */
  /** The per-row HLL projection (bucket, rank) of a value column — the
    * piece both the batch [[hllSketch]] and a streaming windowed
    * register build ([[graft.streaming.Windows.tumbling]] grouped on
    * (window, group, bucket) with `max(rank)`) share, so batch and
    * stream registers are derivation-identical and merge freely.
    */
  private[graft] def hllBucketRank(
      value: Column, p: Int, salt: String): (Column, Column) = {
    require(p >= 4 && p <= 16, s"precision p=$p outside [4,16]")
    val w = 32 - p
    val draw = Split.hashDraw32(value, s"$salt:")
    val rem = draw % (1L << w)
    val rank = when(rem === 0L, lit(w + 1))
      .otherwise(lit(w) - floor(log2(rem)).cast("int"))
    (shiftright(draw, w), rank)
  }

  def hllSketch(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      p: Int,
      salt: String = "hll"): DataFrame = {
    val (bucket, rank) = hllBucketRank(col(valueCol), p, salt)
    df.select(col(groupCol), bucket.as("bucket"), rank.as("r"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("r")).as("mr"))
  }

  /** The HLL estimate per group from a register file: raw = α·m²/Σ2^−Mⱼ
    * (empty registers contribute 2⁰), linear counting below 2.5m with
    * empties present, the 32-bit large-range correction above 2³²/30.
    * Every Σ term is an exact binary fraction (1/(1<<M), never libm
    * pow), so the sum is EXACT and order-free; only `ln` in the
    * correction branches touches libm, absorbed by the 4-dp snap.
    */
  def hllEstimate(sketch: DataFrame, groupCol: String, p: Int): DataFrame =
    hllEstimate(sketch, Seq(groupCol), p)

  /** Multi-column-keyed variant — the shape [[hllOverlap]]'s pair-keyed
    * union register files need.
    */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // 2^−M as an exact literal table (1/(1<<M) is an exact double for
    // M ≤ 32−p ≤ 28): never libm pow, and the Σ below is a sum of exact
    // binary fractions — bit-identical under any accumulation order
    val pow2neg = array((0 to 33 - p).map(i => lit(1.0 / (1L << i))): _*)
    val agg = sketch.groupBy(groupCols.map(col): _*).agg(
      sum(element_at(pow2neg, col("mr") + 1)).as("s_present"),
      count(lit(1)).as("c"))
    val sigma = col("s_present") + (lit(m.toLong) - col("c")).cast("double")
    val v = (lit(m.toLong) - col("c")).cast("double") // registers still at 0
    val raw = lit(alpha) * lit((m.toLong * m).toDouble) / sigma
    val est = when(raw <= lit(2.5 * m) && v > 0.0,
        lit(m.toDouble) * log(lit(m.toDouble) / v))
      .when(raw > lit(4294967296.0 / 30.0),
        lit(-4294967296.0) * log(lit(1.0) - raw / lit(4294967296.0)))
      .otherwise(raw)
    agg.select(groupCols.map(col) :+ round(est, 4).as("est"): _*)
  }

  /** Pairwise population overlap via HLL inclusion–exclusion:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B), where the A∪B register file is
    * the bucket-wise MAX of A's and B's — sketch ALGEBRA, the property
    * that makes HLL more than a counter. At 100 TB this is the corpus-
    * overlap question ("how many users/documents do sources share?")
    * answered from metadata-sized register files with NO re-scan and no
    * corpus-side join: the pair expansion below touches only
    * groups²·2ᵖ register rows.
    *
    * Returns one row per unordered group pair (ga < gb): the two
    * marginal estimates, the union estimate, and the overlap. All three
    * estimates are 4-dp snapped before the final exact-decimal
    * arithmetic, so the overlap replays in SQL.
    */
  def hllOverlap(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      p: Int,
      salt: String = "hll"): DataFrame = {
    val regs = hllSketch(df, groupCol, valueCol, p, salt)
    val single = hllEstimate(regs, groupCol, p)
    // every unordered pair's union registers: tag each register row with
    // both pair members it belongs to, bucket-wise max per pair — the
    // join is register-file-sized (groups·2^p), broadcast both ways
    val gs = regs.select(col(groupCol)).distinct()
    val pairs = gs.select(col(groupCol).as("ga"))
      .crossJoin(broadcast(gs.select(col(groupCol).as("gb"))))
      .filter(col("ga") < col("gb"))
    val unionRegs = pairs
      .join(broadcast(regs),
        col(groupCol) === col("ga") || col(groupCol) === col("gb"))
      .groupBy(col("ga"), col("gb"), col("bucket"))
      .agg(max(col("mr")).as("mr"))
    val unionEst = hllEstimate(unionRegs, Seq("ga", "gb"), p)
      .withColumnRenamed("est", "est_union")
    unionEst
      .join(broadcast(single.select(col(groupCol).as("ga"), col("est").as("est_a"))), "ga")
      .join(broadcast(single.select(col(groupCol).as("gb"), col("est").as("est_b"))), "gb")
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4).as("est_overlap"))
  }

  /** Heavy hitters by sketch estimate: distinct candidate keys scored
    * against the sketch, top `k` by (estimate DESC, key ASC). One-sided
    * error means every TRUE heavy hitter is present — the sketch can
    * only promote light keys, never hide heavy ones.
    */
  def heavyHitters(
      tokens: DataFrame,
      tokenCol: String,
      depth: Int,
      width: Int,
      k: Int,
      salt: String = "cms"): DataFrame = {
    val sketch = countMin(tokens, tokenCol, depth, width, salt)
    estimate(sketch, tokens.select(col(tokenCol)).distinct(),
      tokenCol, depth, width, salt)
      .orderBy(col("est").desc, col(tokenCol).asc)
      .limit(k)
  }
}
