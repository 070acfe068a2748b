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
  def hllSketch(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      p: Int,
      salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"precision p=$p outside [4,16]")
    val w = 32 - p
    val draw = Split.hashDraw32(col(valueCol), s"$salt:")
    val rem = draw % (1L << w)
    val rank = when(rem === 0L, lit(w + 1))
      .otherwise(lit(w) - floor(log2(rem)).cast("int"))
    df.select(col(groupCol), shiftright(draw, w).as("bucket"), rank.as("r"))
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
  def hllEstimate(sketch: DataFrame, groupCol: String, p: Int): DataFrame = {
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
    val agg = sketch.groupBy(col(groupCol)).agg(
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
    agg.select(col(groupCol), round(est, 4).as("est"))
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
