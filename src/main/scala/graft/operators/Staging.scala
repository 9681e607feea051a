package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One persisted frame per (session, sf-dir), with dead-session
  * eviction — the "materialize the staged table once" discipline a real
  * pipeline applies to sketch/pair/label/token/weight tables so every
  * derived query is a read, not a recomputation. Entries owned by a
  * stopped session are unpersisted and dropped on the next access. */
private[operators] final class SessionCache {
  SessionCache.register(this)

  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, (java.lang.ref.WeakReference[SparkSession], DataFrame)]()

  def get(s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val owner = e.getValue._1.get()
      if (owner == null || owner.sparkContext.isStopped) {
        try e.getValue._2.unpersist() catch { case _: Throwable => () }
        it.remove()
      }
    }
    val key = org.apache.spark.sql.GraftBridge.sessionUUID(s) + "@" + dir
    m.computeIfAbsent(key, _ => (
      new java.lang.ref.WeakReference(s),
      build.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))._2
  }

  private[operators] def release(s: SparkSession): Unit = {
    val prefix = org.apache.spark.sql.GraftBridge.sessionUUID(s) + "@"
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) {
        try e.getValue._2.unpersist() catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}

/** Registry over every staged-frame cache in the engine, so a harness
  * can bound resident cache mass: with 300+ queries in one JVM the
  * accumulated staged frames (sketch/pair/suffix/weight tables across
  * every module) otherwise stay persisted for the whole run — the
  * late-suite memory pressure behind round 10's phantom bench
  * regression. `releaseAll` drops every frame owned by the given
  * session; the next query that needs one re-stages it (same cost the
  * FIRST query of its family already pays in any fresh session). */
object SessionCache {
  private val all =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.lang.ref.WeakReference[SessionCache]]())

  private def register(c: SessionCache): Unit =
    all.add(new java.lang.ref.WeakReference(c))

  /** Unpersist and drop every staged frame owned by `s`, engine-wide. */
  def releaseAll(s: SparkSession): Unit = all.synchronized {
    val it = all.iterator()
    while (it.hasNext) {
      val c = it.next().get()
      if (c == null) it.remove() else c.release(s)
    }
  }
}
