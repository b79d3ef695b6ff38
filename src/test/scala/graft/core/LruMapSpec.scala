package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-memo primitive behind the TierStats catalog and the
  * ZoneMap manifest memo (r13 verdict #4): eviction must be
  * one-eldest-at-a-time, never the previous clear-everything-at-cap
  * backstop that cold-restarted a long-lived serving JVM's stats. */
class LruMapSpec extends AnyFunSuite {

  test("inserting cap+1 entries evicts only the eldest") {
    val m = new LruMap[Int, String](3)
    (1 to 3).foreach(i => m.put(i, s"v$i"))
    m.put(4, "v4")
    assert(m.size == 3)
    assert(m.get(1).isEmpty, "only the eldest entry is evicted")
    assert(m.get(2).contains("v2") && m.get(3).contains("v3") &&
      m.get(4).contains("v4"))
  }

  test("a read refreshes recency: the LRU victim is least-recently-USED") {
    val m = new LruMap[Int, String](3)
    (1 to 3).foreach(i => m.put(i, s"v$i"))
    assert(m.get(1).contains("v1")) // 1 is now most-recent; 2 is eldest
    m.put(4, "v4")
    assert(m.get(2).isEmpty, "2 was least-recently-used")
    assert(m.get(1).contains("v1"))
  }

  test("put over an existing key replaces without evicting") {
    val m = new LruMap[Int, String](2)
    m.put(1, "a"); m.put(2, "b"); m.put(1, "a2")
    assert(m.size == 2 && m.get(1).contains("a2") && m.get(2).contains("b"))
  }

  test("remove and clear") {
    val m = new LruMap[Int, String](4)
    (1 to 4).foreach(i => m.put(i, s"v$i"))
    m.remove(3)
    assert(m.size == 3 && m.get(3).isEmpty)
    m.clear()
    assert(m.size == 0)
  }
}
