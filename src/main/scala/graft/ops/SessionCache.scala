package graft.ops

import org.apache.spark.sql.SparkSession

/** Per-session memo for persisted frames shared across queries (shingle
  * index, signatures, verified pairs…).
  *
  * Lifecycle: sessions are WEAK keys and frames are SOFT values. A
  * cached Dataset strongly references its own SparkSession, so holding
  * frames strongly would make every entry self-referential and pin the
  * session for the JVM lifetime (the WeakHashMap javadoc's warning
  * case); soft values instead let the collector drop frames — and then
  * their sessions — under memory pressure, at the cost of a rebuild on
  * the next request. That is the right trade for a cache of
  * recomputable materializations.
  */
private[ops] final class SessionCache[K, V <: AnyRef] {
  private val maps = new java.util.WeakHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[K, java.lang.ref.SoftReference[V]]]()

  def getOrElseUpdate(spark: SparkSession, key: K)(mk: => V): V = synchronized {
    var inner = maps.get(spark)
    if (inner == null) {
      inner = scala.collection.concurrent.TrieMap.empty[K, java.lang.ref.SoftReference[V]]
      maps.put(spark, inner)
    }
    inner.get(key).flatMap(r => Option(r.get())) match {
      case Some(v) => v
      case None =>
        val v = mk
        inner.put(key, new java.lang.ref.SoftReference(v))
        v
    }
  }
}
