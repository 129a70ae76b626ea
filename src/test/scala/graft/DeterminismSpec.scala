package graft

import org.apache.spark.sql.DataFrame

/** Partition-count invariance for the whole registry: every query's VALUE
  * MULTISET (the driver-gate contract — check.py sorts rows by all columns
  * before hashing, so presentation order is not part of it) must be
  * identical under a different `spark.sql.shuffle.partitions`. This is the
  * §10 determinism class made mechanical: a fully-tied window ORDER BY, a
  * partition-sensitive tie-break in a top-k, or any
  * first-row-wins aggregation shows up as a multiset diff the moment the
  * partitioning changes — without waiting for a DuckDB thread-plan to
  * happen to flip it. 7 is chosen as the variant count because it is
  * coprime with every grouping in the data (4, the suite default, divides
  * several of them).
  *
  * The sampling-sketch queries are excluded by design: `approx_percentile`
  * and the KLL sketch merge per-partition state whose merge is NOT
  * partition-invariant — KLL compaction additionally flips unseeded coins
  * (their gates are the error-bound laws in Round7/Round11PropertySpec,
  * not value equality). HLL and Count-Min stay IN the suite: their merges
  * are register-max / counter-addition, fully order-free.
  *
  * Caveat, stated rather than hidden: the handful of session-memoized
  * pipelines (jaccard pair block, graph edge build, BPE chain, …) serve
  * the second run from the memo, so for THOSE the comparison is vacuous
  * here — their partition story is covered by the check.py gate running
  * the same code at 32 partitions against this suite's 4.
  */
class DeterminismSpec extends SparkSpec {

  private val excluded = Set("approx_count_distinct", "stats_approx_percentiles",
    "stats_kll_quantiles")

  /** Canonical multiset: columns sorted by name, rows rendered and sorted. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq.map(c => s"`$c`")
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(v => String.valueOf(v)).mkString("\u0001"))
      .toSeq.sorted
  }

  for ((name, q) <- Registry.all.toSeq.sortBy(_._1) if !excluded(name)) {
    test(s"$name is shuffle-partition invariant (4 vs 7)") {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      try {
        val a = canon(q.fn(spark, sfDir))
        spark.conf.set(key, "7")
        val b = canon(q.fn(spark, sfDir))
        assert(a == b,
          s"$name changed values under a different partition count — " +
            "a partition-sensitive tie or first-wins aggregation; " +
            s"first diff: ${a.zip(b).find(p => p._1 != p._2)
              .orElse(Some((s"sizes ${a.size}", s"${b.size}")))}")
      } finally spark.conf.set(key, prev)
    }
  }
}
