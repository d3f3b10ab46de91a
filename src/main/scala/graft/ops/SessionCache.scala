package graft.ops

import org.apache.spark.sql.SparkSession

/** Per-session memo for persisted frames shared across queries (shingle
  * index, signatures, verified pairs…). Sessions are WEAK keys: a stopped
  * and dereferenced SparkSession takes its cached frames with it instead
  * of being pinned for the JVM lifetime. Values live as long as their
  * session — the intended lifetime for a materialized index.
  */
private[ops] final class SessionCache[K, V] {
  private val maps =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[K, V]]()

  def getOrElseUpdate(spark: SparkSession, key: K)(mk: => V): V = {
    val m = maps.synchronized {
      var inner = maps.get(spark)
      if (inner == null) {
        inner = scala.collection.concurrent.TrieMap.empty[K, V]
        maps.put(spark, inner)
      }
      inner
    }
    m.getOrElseUpdate(key, mk)
  }
}
