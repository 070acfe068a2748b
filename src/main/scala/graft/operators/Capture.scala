package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped shared-capture registry for frames that several
  * registered queries derive from the same upstream build — the
  * [[Pca]] moments-cache lesson generalized to frames that are NOT
  * metadata-sized, so the capture holds the frame itself (persisted or
  * checkpointed), never a driver collect.
  *
  * Two capture classes with different release mechanics:
  *
  *  - [[persisted]]: edge-scale intermediates (e.g. the distinct trade
  *    edge list every graph ranker starts from). Held at
  *    MEMORY_AND_DISK — spills, never OOMs — and RELEASED by explicit
  *    `unpersist` on [[release]]/overflow/source-mutation. This is the
  *    persist-and-release contract from the round-11 `localCheckpoint`
  *    OOM fix, widened from one invocation to one session.
  *  - [[pinned]]: NODE-sized eager `localCheckpoint` results (e.g. the
  *    HyperBall neighborhood function). A localCheckpoint has no
  *    unpersist API — its blocks free when the RDD is GC'd — so these
  *    entries must stay bounded-small by construction; [[release]]
  *    drops the references and lets the ContextCleaner reclaim them.
  *    Capturing here REDUCES total pinned blocks: three readouts of one
  *    propagation pin one checkpoint instead of three.
  *
  * Keys are caller-supplied and must identify the build function AND
  * its inputs (convention: a tuple led by an operator tag, with input
  * frames contributing their CANONICALIZED analyzed plans — two
  * distinct Dataset objects over the same source and operators share).
  * Invalidation: [[graft.Caches.invalidateAll]] (fired by every
  * in-place [[graft.sources.Layout]] mutation) clears both classes, so
  * a rewritten source never serves a stale capture.
  */
object Capture {
  private val persistedFrames =
    new java.util.concurrent.ConcurrentHashMap[Any, DataFrame]()
  private val pinnedFrames =
    new java.util.concurrent.ConcurrentHashMap[Any, DataFrame]()
  private val MaxEntries = 8
  graft.Caches.register(() => release())

  /** Get-or-build a MEMORY_AND_DISK-persisted capture; `build`'s result
    * is persisted lazily (the first consumer's action materializes it).
    */
  def persisted(key: Any)(build: => DataFrame): DataFrame = {
    if (persistedFrames.size >= MaxEntries &&
      !persistedFrames.containsKey(key)) releasePersisted()
    persistedFrames.computeIfAbsent(key,
      _ => build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Get-or-build a capture whose `build` already returns an eager
    * node-sized localCheckpoint (the graph-operator return contract).
    */
  def pinned(key: Any)(build: => DataFrame): DataFrame = {
    if (pinnedFrames.size >= MaxEntries &&
      !pinnedFrames.containsKey(key)) pinnedFrames.clear()
    pinnedFrames.computeIfAbsent(key, _ => build)
  }

  private def releasePersisted(): Unit = {
    persistedFrames.values.forEach { df =>
      try df.unpersist() catch { case _: Throwable => () }
    }
    persistedFrames.clear()
  }

  /** Unpersist every persisted capture and drop every pinned reference. */
  def release(): Unit = {
    releasePersisted()
    pinnedFrames.clear()
  }

  private[graft] def persistedSize: Int = persistedFrames.size
  private[graft] def pinnedSize: Int = pinnedFrames.size
}
