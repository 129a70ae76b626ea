package graft

import java.lang.ref.SoftReference

import org.apache.spark.sql.SparkSession

private[graft] object SessionMemo {
  /** When true, memo maps are ALSO held strongly (per session), disabling
    * reclamation. Set by the single-session mains (Bench/Verify/Main):
    * there the process lifetime IS the session lifetime, so reclaimability
    * buys nothing — while a GC-cleared soft reference mid-suite silently
    * drops cached (often `localCheckpoint`ed) DataFrames and lands a
    * multi-second recompute spike on whichever timed query touches the
    * cold cache first (the r7 `dedup_semantic_clusters` 2.2s→4.5s bench
    * regression class). Long-lived multi-session servers keep the default
    * soft behavior and its leak-freedom.
    *
    * The flag is symmetric: flipping it back to `false` drops every strong
    * pin across all memo instances (the maps stay reachable through the
    * soft path until the collector decides otherwise), so a multi-session
    * process that pinned temporarily does not leak each session it touched
    * while pinned. Memo *instances* live in static operator objects, so
    * the registry below holds a bounded, process-lifetime set — no leak.
    */
  private val instances =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_]]()

  private[graft] def register(m: SessionMemo[_]): Unit = instances.add(m)

  @volatile private var _pinSessions: Boolean = false

  private[graft] def pinSessions: Boolean = _pinSessions

  private[graft] def pinSessions_=(v: Boolean): Unit = {
    _pinSessions = v
    if (!v) instances.forEach(_.clearPinned())
  }
}

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
  * being reachable through the cache at the latest before an OOM.
  *
  * [[SessionMemo.pinSessions]] opts a single-session process out of the
  * reclamation: the inner map is then also strongly referenced (which
  * intentionally pins the session entry — exactly the behavior the soft
  * design exists to avoid in servers), so bench/verify timings can never
  * be distorted by a collector clearing the memo between queries.
  */
private[graft] final class SessionMemo[V] {

  private val cache =
    new java.util.WeakHashMap[SparkSession,
      SoftReference[scala.collection.mutable.Map[String, V]]]()

  // populated only under pinSessions; values reference their key's session
  // through the cached DataFrames, deliberately defeating the weak keying
  private val pinned =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[String, V]]()

  SessionMemo.register(this)

  /** Drop every strong pin (called when [[SessionMemo.pinSessions]] flips
    * off). Entries remain visible through the soft path until collected.
    */
  private[graft] def clearPinned(): Unit =
    cache.synchronized { pinned.clear() }

  /** Number of sessions currently pinned strongly (test observability). */
  private[graft] def pinnedSessionCount: Int =
    cache.synchronized { pinned.size }

  def getOrElseUpdate(s: SparkSession, key: String)(compute: => V): V =
    cache.synchronized {
      val inner = Option(pinned.get(s))
        .orElse(Option(cache.get(s)).flatMap(r => Option(r.get)))
        .getOrElse(scala.collection.mutable.Map.empty[String, V])
      cache.put(s, new SoftReference(inner))
      if (SessionMemo.pinSessions) pinned.put(s, inner)
      inner.getOrElseUpdate(key, compute)
    }
}
