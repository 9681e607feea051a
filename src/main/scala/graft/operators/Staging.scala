package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One persisted frame per (session, sf-dir), with dead-session
  * eviction — the "materialize the staged table once" discipline a real
  * pipeline applies to sketch/pair/label/token/weight tables so every
  * derived query is a read, not a recomputation. Entries owned by a
  * stopped session are unpersisted and dropped on the next access. */
private[operators] final class SessionCache {
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
}
