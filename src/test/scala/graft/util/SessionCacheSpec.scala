package graft.util

import org.scalatest.funsuite.AnyFunSuite

class SessionCacheSpec extends AnyFunSuite {

  test("getOrCompute computes once per key; invalidate forces a recompute") {
    val key = ("session_cache_spec", "k1")
    SessionCache.invalidate(key)
    var computes = 0
    def get(): Int = SessionCache.getOrCompute(key) { computes += 1; 42 }
    assert(get() === 42 && get() === 42 && computes === 1,
      "second lookup must hit the cache")
    SessionCache.invalidate(key)
    assert(get() === 42 && computes === 2, "invalidate must force a recompute")
    SessionCache.invalidate(key)
  }

  test("distinct keys do not collide") {
    val k1 = ("session_cache_spec", "a", 1)
    val k2 = ("session_cache_spec", "a", 2)
    SessionCache.invalidate(k1); SessionCache.invalidate(k2)
    assert(SessionCache.getOrCompute(k1)("one") === "one")
    assert(SessionCache.getOrCompute(k2)("two") === "two")
    assert(SessionCache.getOrCompute(k1)("never") === "one")
    SessionCache.invalidate(k1); SessionCache.invalidate(k2)
  }
}
