package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle width for STREAMING sections.
  *
  * AQE is disabled inside streaming queries (Spark plans every micro-batch
  * statically and logs exactly that), so `spark.sql.shuffle.partitions` IS
  * the per-stateful-operator state-store partition count, the per-batch
  * task count, and the per-batch output-file count — there is no runtime
  * coalescing to shrink a 32-wide static shuffle around a kilobyte
  * micro-batch. Every stateful operator then pays width × batches state
  * commits and width part files per batch regardless of data volume,
  * which is pure fixed overhead at the micro-batch tail of ANY scale
  * (the last batches of a 100 TB backfill are as small as a local run).
  *
  * [[partitionsFor]] derives the width from the stream's INPUT SIZE — one
  * partition per `targetBytes`, clamped to [floor, cap] — the same
  * size-per-partition rule AQE applies to batch plans, so the width grows
  * with the data instead of being pinned to either the local core count
  * or a cluster constant. `SPARK_GRAFT_STREAM_SHUFFLE` overrides it for
  * deployments where the state-store layout should be sized to the
  * cluster up front (state partitions are fixed at first checkpoint, so a
  * production stream that will GROW should start wide — that judgment
  * call is the operator's, hence env not heuristic, with the adaptive
  * default for bounded replays/backfills whose input size is known).
  */
object StreamScale {

  /** One partition per `targetBytes` of stream input, clamped. The 32 MB
    * default target is deliberately below AQE's 64 MB advisory: streaming
    * state rows (join buffers, HLL registers) amplify input bytes, and a
    * too-narrow width risks per-partition state that cannot fit a task —
    * the asymmetric cost says round the width UP.
    */
  def partitionsFor(
      inputBytes: Long,
      targetBytes: Long = 32L << 20,
      floor: Int = 4,
      cap: Int = 4096): Int =
    sys.env.get("SPARK_GRAFT_STREAM_SHUFFLE").map(_.trim.toInt).getOrElse {
      val bySize = (inputBytes + targetBytes - 1) / targetBytes
      math.max(floor, math.min(cap.toLong, bySize).toInt)
    }

  /** Total bytes under a path — the stream-input size [[partitionsFor]]
    * wants; metadata-only (a recursive listing, never a data read).
    */
  def dirBytes(s: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  /** Run `body` (typically: build the stream, start it, await it) with
    * the session's shuffle width pinned to `n`, restoring the previous
    * value afterwards. The width is captured by the streaming query at
    * its first checkpoint; batch work outside `body` keeps the session
    * default + AQE.
    */
  def withShuffleWidth[A](s: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }
}
