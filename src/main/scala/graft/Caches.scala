package graft

/** Central invalidation registry for session-scoped derived-result
  * caches (e.g. [[graft.operators.Pca]]'s plan-keyed moments capture).
  *
  * Plan-keyed caches assume their SOURCE is immutable for the session —
  * true of an analytics snapshot, false the moment an in-place mutation
  * path ([[graft.sources.Layout.compact]], `rewriteFiltered`, `expire`)
  * rewrites files under an unchanged logical plan. Caches register an
  * invalidation hook here at class-init; every Layout mutation fires
  * [[invalidateAll]], so a rewritten source can never serve a stale
  * cached derivation. Hooks must be idempotent and cheap (a map clear).
  */
object Caches {
  private val hooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  def register(hook: () => Unit): Unit = hooks.add(hook)

  /** Fire every registered hook — called by in-place source mutators. */
  def invalidateAll(): Unit = hooks.forEach(h => h())
}
