package graft

import java.lang.ref.SoftReference

import org.apache.spark.sql.SparkSession

/** Per-session, per-key memo for derived DataFrames and chains.
  *
  * Keyed weakly by the [[SparkSession]] with the per-session map held
  * through a [[SoftReference]]. The soft indirection is what makes the weak
  * keying real: a cached DataFrame strongly references its session, so a
  * `WeakHashMap[SparkSession, Map[_, DataFrame]]` violates the
  * value-must-not-reference-key rule and pins every entry for the JVM
  * lifetime. With the inner map only softly reachable, the session's only
  * path back to itself goes through the soft reference, which the collector
  * may clear — under memory pressure the memo is dropped (and recomputed on
  * next use, it is a cache), and an otherwise-unreferenced session stops
  * being reachable through the cache at the latest before an OOM. In the
  * single-session Verify/Bench/test processes the soft reference behaves
  * like a strong one, so memo hit rates are unchanged there.
  */
private[graft] final class SessionMemo[V] {

  private val cache =
    new java.util.WeakHashMap[SparkSession,
      SoftReference[scala.collection.mutable.Map[String, V]]]()

  def getOrElseUpdate(s: SparkSession, key: String)(compute: => V): V =
    cache.synchronized {
      val inner = Option(cache.get(s)).flatMap(r => Option(r.get))
        .getOrElse {
          val m = scala.collection.mutable.Map.empty[String, V]
          cache.put(s, new SoftReference(m))
          m
        }
      inner.getOrElseUpdate(key, compute)
    }
}
