package graft.sources

/** JVM-wide compute-once memo keyed by a plain string — the blessed
  * shape for DISK-BACKED materializations whose bytes are a pure
  * function of the key (a derived-artifact temp dir keyed by the
  * input data dir). Unlike [[SessionMemo]] the entry survives a
  * SparkSession stop/rebuild: the artifact lives on disk, not in the
  * session, so a fresh session re-reading the same path gets the
  * same bytes — which is exactly what Bench's session recycling
  * (VERDICT r6 item 1) needs to avoid re-paying every index/verdict
  * build per recycled session. Do NOT use this for session-OWNED
  * state (temp views, catalog entries): those die with the session
  * and must stay on [[SessionMemo]].
  *
  * The lock is held across the compute so a second caller waits for
  * the first materialization instead of double-writing (the
  * [[SessionMemo]] contract).
  */
final class JvmMemo[V] {
  private val m = scala.collection.mutable.Map.empty[String, V]

  def getOrElseCompute(key: String)(compute: => V): V =
    m.synchronized(m.getOrElseUpdate(key, compute))
}
