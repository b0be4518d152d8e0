package graft.core

import org.apache.spark.sql.SparkSession

/** Stable per-SparkSession identity for memo-cache keys — the
  * session-scoped twin of [[Registry.instanceId]]:
  * `System.identityHashCode` can be REUSED after a stopped session is
  * GC'd, silently serving a dead session's cached (and unusable)
  * frames to a new one. Weak keys mean a collected session's entry
  * simply disappears; a fresh session always draws a fresh UUID.
  * (SparkSession does not override equals, so WeakHashMap's
  * equals-based lookup is identity semantics here.) */
object SessionId {
  private val ids =
    new java.util.WeakHashMap[SparkSession, String]()
  def of(s: SparkSession): String = ids.synchronized {
    Option(ids.get(s)).getOrElse {
      val u = java.util.UUID.randomUUID().toString
      ids.put(s, u)
      u
    }
  }
}
