package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-memo cache policy ([[LruCache]]) on exactly the
  * round-13 failure shape: a working set one entry larger than the cap
  * under FIFO evicts the entry about to be reused (every "warm" call
  * rebuilds), while access-ordered LRU keeps the recently-hit entries
  * resident. Plus the eviction hook and lifecycle-clear contracts every
  * call site (Bm25/Dedup/GraphQ/Retrieval/DataOps) relies on. */
class LruCacheSpec extends AnyFunSuite {

  test("hit refreshes recency: re-used entries survive inserts over cap") {
    var builds = Map.empty[String, Int].withDefaultValue(0)
    val c = new LruCache[String, String](2)
    def get(k: String): String = c.getOrElseUpdate(k) {
      builds += k -> (builds(k) + 1); s"v$k"
    }
    get("a"); get("b") // cache = [a, b]
    get("a")           // refresh a → LRU order [b, a]
    get("c")           // evicts b (LRU), NOT a (FIFO would evict a)
    assert(c.size == 2)
    assert(get("a") == "va" && builds("a") == 1,
      "the refreshed entry must still be resident — FIFO would rebuild")
    assert({ get("b"); builds("b") == 2 }, "b was the LRU victim")
  }

  test("a get() lookup also refreshes recency") {
    val c = new LruCache[Integer, String](2)
    c.put(1, "one"); c.put(2, "two")
    assert(c.get(1).contains("one")) // touch 1 → 2 becomes LRU
    c.put(3, "three")
    assert(c.get(1).isDefined && c.get(2).isEmpty && c.get(3).isDefined)
  }

  test("onEvict fires for displaced entries and on clear, not on remove") {
    var evicted = List.empty[(String, Int)]
    val c = new LruCache[String, Int](2, (k, v) => evicted :+= (k, v))
    c.put("a", 1); c.put("b", 2); c.put("c", 3)
    assert(evicted == List(("a", 1)), "over-cap displacement runs the hook")
    // overwriting a key evicts the DISPLACED value too — a refreshed
    // persisted frame must not leak its predecessor
    c.put("c", 30)
    assert(evicted == List(("a", 1), ("c", 3)),
      "put-overwrite must run the hook on the displaced value")
    evicted = List.empty
    assert(c.remove("b").contains(2))
    assert(evicted.isEmpty, "remove() frees nothing — caller owns")
    c.clear()
    assert(evicted == List(("c", 30)) && c.size == 0)
    c.clear() // second sweep: no-op, no throw
    assert(c.size == 0)
  }

  test("getOrElseUpdate builds once per key while resident") {
    var n = 0
    val c = new LruCache[String, String](4)
    (1 to 3).foreach { _ => c.getOrElseUpdate("k") { n += 1; "v" } }
    assert(n == 1)
  }

  test("cap must be positive") {
    intercept[IllegalArgumentException](new LruCache[String, String](0))
  }
}
