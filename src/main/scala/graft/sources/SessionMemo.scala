package graft.sources

import org.apache.spark.sql.SparkSession

/** Weak-keyed per-(session, key) memoization — the one blessed shape
  * for session-scoped caches in this repo (ADVICE r3: an
  * identity-hash key can be reused after its session is GC'd,
  * silently serving a stale entry to a fresh session, and
  * `SparkSession.sessionUUID` does not exist in Spark 4.1). The weak
  * key lets dead sessions' entries vanish; the lock is held across
  * the compute so a second caller waits for the first
  * materialization instead of double-writing — the contract every
  * call site (catalog registration, processed-table and pair-verdict
  * materializations) needs. */
final class SessionMemo[V] {
  private val m = new java.util.WeakHashMap[
    SparkSession, scala.collection.mutable.Map[String, V]]()

  def getOrElseCompute(s: SparkSession, key: String)(compute: => V): V =
    m.synchronized {
      m.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty[String, V])
        .getOrElseUpdate(key, compute)
    }
}
