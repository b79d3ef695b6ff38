package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Engine-wide cache lifecycle (round-4 verdict #2).
  *
  * Query builders return LAZY frames, so a builder that persists an
  * intermediate for intra-query reuse cannot `finally`-unpersist it
  * itself — the cache must live until the caller materializes the
  * result. Left unreleased, every such persist leaks cached blocks
  * into a long-lived session (a job server, Bench×3, a notebook).
  *
  * The contract mirrors `CleanPipeline`'s register/finally pattern,
  * hoisted engine-wide: builders call [[register]] instead of bare
  * `persist()`; whoever runs the action calls [[releaseAll]] (or
  * wraps in [[withReleased]]) once the result is materialized.
  * `Verify` and `Bench` do this per query; `CacheLifecycleSpec`
  * asserts the cache manager ends empty for EVERY registry query.
  *
  * Releasing is always correctness-neutral — unpersist never
  * invalidates a plan, it only costs recompute on a later action —
  * so a caller that forgets releaseAll degrades to today's behavior,
  * never to wrong answers.
  */
object Caching {

  private val registered = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and track it for the next [[releaseAll]]. */
  def register[T](ds: Dataset[T],
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    registered.add(ds)
    ds
  }

  /** Unpersist every frame registered since the last drain; returns
    * how many were released. Non-blocking by default (the executors
    * drop blocks asynchronously; the cache-manager entry is removed
    * synchronously either way). */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    var ds = registered.poll()
    while (ds != null) {
      ds.unpersist(blocking)
      n += 1
      ds = registered.poll()
    }
    n
  }

  /** Run `body` (which should materialize whatever it needs) and
    * release every cache registered during it. */
  def withReleased[A](body: => A): A =
    try body finally releaseAll()

  /** Release only the registered frames matching `stale` — the scoped
    * alternative to [[releaseAll]] for a caller that knows WHICH
    * caches went bad (a drifted source table) and must not clobber
    * valid caches its own caller registered moments earlier. Frames
    * the predicate keeps stay registered for the next drain. */
  def releaseIf(stale: Dataset[_] => Boolean, blocking: Boolean = false): Int = {
    val keep = new ConcurrentLinkedQueue[Dataset[_]]()
    var n = 0
    var ds = registered.poll()
    while (ds != null) {
      val isStale =
        try stale(ds)
        catch { case _: Throwable => true } // unevaluable plan: drop it
      if (isStale) { ds.unpersist(blocking); n += 1 }
      else keep.add(ds)
      ds = registered.poll()
    }
    registered.addAll(keep): Unit
    n
  }

  /** Chainable form: `df.registerCache()` ≡ `Caching.register(df)` —
    * drop-in for the bare `.persist()` it replaces. */
  implicit class RegisterSyntax[T](private val ds: Dataset[T]) extends AnyVal {
    def registerCache(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
      register(ds, level)
  }
}
