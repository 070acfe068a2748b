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
