package graft.util

/** Driver-side memo for artifacts with a table-level lifecycle — fitted
  * index structures (IVF centroids) and table statistics (rolling-window
  * decision stats). At 100 TB these are computed once at ingest/index-build
  * time and consulted by every query; recomputing them per query invocation
  * re-scans the corpus for a value that cannot have changed (VERDICT r3
  * #1/#3). Keys must identify IMMUTABLE inputs (a fixture dir + params);
  * callers reading mutable paths must skip the cache or `invalidate` on
  * write — a stale entry is not just slow, it can steer a precondition-
  * gated plan choice wrong.
  *
  * Single-JVM driver state, like a catalog's statistics store; entries are
  * small (a stats row, k×dim centroid floats), never row data.
  */
object SessionCache {
  private val m = new java.util.concurrent.ConcurrentHashMap[Any, Any]()

  /** Compute OUTSIDE the map's bin lock: `computeIfAbsent` would hold the
    * lock for the whole Spark job (minutes for an IVF fit), block
    * unrelated same-bin keys, and throw if the computation ever touches
    * the cache itself. The cost is that two racing first callers may both
    * compute — fine for the idempotent, deterministic artifacts stored
    * here (first write wins, the duplicate is discarded).
    */
  def getOrCompute[V](key: Any)(f: => V): V = {
    val cached = m.get(key)
    if (cached != null) cached.asInstanceOf[V]
    else {
      val computed = f
      val prev = m.putIfAbsent(key, computed)
      (if (prev != null) prev else computed).asInstanceOf[V]
    }
  }

  def invalidate(key: Any): Unit = { m.remove(key); () }

  def clear(): Unit = m.clear()
}
