package graft

import org.apache.spark.sql.DataFrame

/** Join-strategy invariance for the whole registry: every query's VALUE
  * MULTISET must be identical when broadcast joins are disabled
  * (`spark.sql.autoBroadcastJoinThreshold = -1`, plus the AQE runtime
  * twin) and the planner falls back to sort-merge / shuffled-hash.
  *
  * This is a different perturbation axis from DeterminismSpec's
  * shuffle-partition flip: switching BroadcastHashJoin to SortMergeJoin
  * changes the ORDER rows arrive in downstream operators (SMJ emits
  * key-sorted, BHJ emits stream-side order), so a window ORDER BY with
  * unresolved ties, a `first()`-wins aggregation, or any implicit
  * dependence on join output order shows up here even when partition
  * counts alone never flip it. At 100 TB the same queries WILL run as
  * sort-merge (nothing small enough to broadcast), so this gate is the
  * local stand-in for "does the plan's answer survive the strategies a
  * real cluster would pick".
  *
  * Join-free queries are skipped after a cheap plan probe (forcing the
  * threshold cannot change a plan with no join nodes). The sampling
  * sketches are excluded for the DeterminismSpec reasons (their values
  * are not run-invariant by design; error-bound laws gate them). The
  * session-memoized pipelines' caveat from DeterminismSpec applies here
  * identically: their bases serve from the memo, the derived joins
  * still re-plan under the forced threshold.
  */
class JoinStrategySpec extends SparkSpec {

  private val excluded = Set("approx_count_distinct", "stats_approx_percentiles",
    "stats_kll_quantiles")

  private val joinNode =
    ("(BroadcastHashJoin|BroadcastNestedLoopJoin|SortMergeJoin|" +
      "ShuffledHashJoin|CartesianProduct)").r

  /** Physical join nodes in the (initial, pre-execution) plan. The forced
    * and default plans share one logical plan, so join PRESENCE is the
    * same on both sides — probing the forced side alone is enough to
    * decide whether there is anything the threshold could change.
    */
  private def joinSig(df: DataFrame): Seq[String] =
    joinNode.findAllIn(df.queryExecution.executedPlan.toString).toSeq.sorted

  /** Canonical multiset: columns sorted by name, rows rendered and sorted
    * (the check.py hash contract — presentation order is not a value).
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq.map(c => s"`$c`")
    // Binary columns render as hex: String.valueOf on Array[Byte] is JVM
    // identity ("[B@..."), which would spuriously fail the comparison (or
    // trivially pass it when instances are shared) if a registry query
    // ever emits raw sketch bytes.
    def render(v: Any): String = v match {
      case b: Array[Byte] => b.map(x => f"$x%02x").mkString
      case other          => String.valueOf(other)
    }
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(render).mkString("\u0001"))
      .toSeq.sorted
  }

  private val keys = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold")

  for ((name, q) <- Registry.all.toSeq.sortBy(_._1) if !excluded(name)) {
    test(s"$name values are join-strategy invariant (broadcast vs sort-merge)") {
      val prev = keys.map(k => k -> spark.conf.getOption(k))
      def restore(): Unit = prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      try {
        keys.foreach(spark.conf.set(_, "-1"))
        val forced = q.fn(spark, sfDir)
        if (joinSig(forced).isEmpty) {
          info("join-free plan — threshold has nothing to change, skipped")
          succeed
        } else {
          val b = canon(forced)
          restore()
          val a = canon(q.fn(spark, sfDir))
          assert(a == b,
            s"$name changed values when broadcast joins were disabled — " +
              "an output-order-sensitive tie or first-wins aggregation " +
              "downstream of a join; first diff: " +
              s"${a.zipAll(b, "<missing>", "<missing>")
                .find(p => p._1 != p._2)
                .map(p => s"default=${p._1} forced=${p._2}")
                .getOrElse(s"sizes ${a.size} vs ${b.size}")}")
        }
      } finally restore()
    }
  }
}
