package graft

import org.apache.spark.sql.functions._

/** Round-12 laws for the new oracle-gated operators. Each already
  * hash-matches its DuckDB oracle; the laws here pin what the hash gate
  * cannot see.
  *
  *  - `text_gopher_rules`: the hash certifies the arithmetic, not that the
  *    thresholds MEAN anything — a rule no document ever fails (or every
  *    document fails) is a vacuous filter whose boolean column certifies
  *    nothing. The law: every rule splits the fixture corpus non-trivially.
  *  - `ts_cusum_alarm`: the query computes the one-sided CUSUM recursion
  *    S⁺ᵢ = max(0, S⁺ᵢ₋₁ + devᵢ) via the running-extremum identity
  *    (two stacked windows); the oracle uses the SAME identity, so a bug
  *    in the identity itself would pass the hash gate on both sides. The
  *    law re-derives both statistics with the textbook per-row recursion
  *    in plain Scala and requires exact equality.
  *  - `stats_hll_intersection` (rows-only by design — sketch internals are
  *    engine-specific, the `stats_hll_mergeable` taxonomy): the laws that
  *    stand in for the hash gate are union monotonicity (a register-wise
  *    max can only estimate ≥ either side) and the inclusion–exclusion
  *    band — the I–E intersection estimate within a composed multi-sketch
  *    error bound of the exact twin carried in the output.
  */
class Round12PropertySpec extends SparkSpec {

  test("gopher rules: every rule splits the corpus non-trivially") {
    val out = ops.TextOps.gopherRules(spark, sfDir)
    val n = out.count()
    for (rule <- Seq("r_min_tokens", "r_word_len", "r_stopwords",
        "r_top_bigram", "r_dup_trigram")) {
      val passed = out.filter(col(rule)).count()
      assert(passed > 0 && passed < n,
        s"$rule is vacuous on the fixture: $passed of $n pass")
    }
    val all = out.filter(col("passes_all")).count()
    assert(all > 0 && all < n, s"passes_all is vacuous: $all of $n")
  }

  test("hll intersection: union monotone, inclusion–exclusion within band") {
    val out = ops.StatsOps.hllIntersection(spark, sfDir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      def L(c: String): Long = r.getAs[Long](c)
      val (approxA, approxB) = (L("approx_a"), L("approx_b"))
      val (approxU, exactU) = (L("approx_union"), L("exact_union"))
      val (approxI, exactI) = (L("approx_intersection"),
        L("exact_intersection"))
      // union = register-wise max: its estimate can never drop below
      // either side's own estimate
      assert(approxU >= math.max(approxA, approxB),
        s"union estimate $approxU below a side ($approxA, $approxB)")
      // I–E intersection: |est − exact| bounded by a composed band of the
      // UNION magnitude (the known I–E weakness this query documents):
      // three estimates at lgConfigK=12 RSE ≈ 1.6%, 3σ each, summed —
      // ~15% of |A∪B| plus a fixed grain for tiny fixtures
      val band = math.max(16L, (0.15 * exactU).toLong)
      assert(math.abs(approxI - exactI) <= band,
        s"I–E estimate $approxI vs exact $exactI outside band $band " +
          s"(union $exactU)")
    }
  }

  test("cusum: windowed prefix-extremum form equals the textbook recursion") {
    val rows = ops.TimeSeriesOps.cusumAlarm(spark, sfDir)
      .select("event_type", "day", "n_events", "cusum_pos_m", "cusum_neg_m")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, series) =>
      val ordered = series.sortBy(_._2)
      // the same floored per-type mean the query uses
      val meanM = ordered.map(_._3).sum * 1000 / ordered.length
      var spos = 0L
      var sneg = 0L
      ordered.foreach { case (_, day, n, gotPos, gotNeg) =>
        val dev = n * 1000 - meanM
        spos = math.max(0L, spos + dev) // Page's recursion, directly
        sneg = math.max(0L, sneg - dev)
        assert(spos == gotPos && sneg == gotNeg,
          s"CUSUM mismatch at ($tpe, $day): recursion ($spos, $sneg) vs " +
            s"windowed ($gotPos, $gotNeg)")
      }
    }
  }

}
