package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-keyed memo for shared materialized relations (checkpointed
  * pair feeds, PCA parts, BPE fits, …).
  *
  * Entries are keyed by (session, data dir). Every access first purges
  * keys whose owning session has STOPPED: their localCheckpoint blocks
  * died with that session's BlockManager, so holding the DataFrames
  * would strongly pin dead plans (and their checkpoint metadata) for
  * the life of the JVM — the many-short-sessions leak a plain
  * session-keyed ConcurrentHashMap has in a test harness. Live-session
  * entries still die naturally when the session stops and the NEXT
  * access sweeps them; there is no background thread to manage.
  */
final class SessionMemo[V](
    // injectable for specs: local[*] tests share ONE SparkContext, so a
    // real stopped session cannot be staged without killing the harness
    private[graft] val isDead: SparkSession => Boolean =
      _.sparkContext.isStopped) {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]

  def getOrBuild(s: SparkSession, dir: String)(build: => V): V = {
    val it = m.keySet.iterator()
    while (it.hasNext) if (isDead(it.next()._1)) it.remove()
    m.computeIfAbsent((s, dir), _ => build)
  }

  /** Live-entry count, for specs asserting the purge actually fires. */
  private[graft] def size: Int = m.size
}
