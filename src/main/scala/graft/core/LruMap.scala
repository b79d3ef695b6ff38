package graft.core

/** Tiny bounded LRU for driver-side metadata memos (r13 verdict #4:
  * the TierStats catalog and the ZoneMap manifest memo used to drop ALL
  * entries at their cap, so a long-lived serving JVM cold-restarted its
  * stats/manifests the moment one more tier than the cap was served).
  * Access-ordered `LinkedHashMap` with eldest-entry eviction, guarded
  * by its own monitor — these maps see a handful of driver-thread
  * lookups per query, so a plain synchronized wrapper beats anything
  * cleverer.
  *
  * A memo, never a correctness structure: every caller treats a miss
  * as "reload from the source of truth". */
final class LruMap[K, V](cap: Int) {
  require(cap > 0, s"LruMap cap must be positive: $cap")

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > cap
  }

  def get(k: K): Option[V] = m.synchronized(Option(m.get(k)))

  def put(k: K, v: V): Unit = m.synchronized { m.put(k, v): Unit }

  def remove(k: K): Unit = m.synchronized { m.remove(k): Unit }

  def size: Int = m.synchronized(m.size())

  def clear(): Unit = m.synchronized(m.clear())

  /** Snapshot of the keys, eldest first (spec introspection). */
  private[graft] def keys: Seq[K] = m.synchronized {
    val it = m.keySet().iterator()
    val b = Seq.newBuilder[K]
    while (it.hasNext) b += it.next()
    b.result()
  }
}
