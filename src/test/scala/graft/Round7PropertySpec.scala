package graft

import org.apache.spark.sql.functions._

/** Error-bound laws for the two oracle-less sketch queries — the round-6
  * verdict's ask: `approx_count_distinct` and `stats_approx_percentiles`
  * cannot hash-match a DuckDB oracle (sketch internals differ across
  * engines), so their correctness signal is the sketch's own DOCUMENTED
  * error bound checked against the exact twin computed on the same data.
  */
class Round7PropertySpec extends SparkSpec {

  test("approx_count_distinct stays within 3x the default rsd vs its exact twin") {
    // Spark's approx_count_distinct is HLL++ with default maximum relative
    // standard deviation rsd = 0.05; the query carries the exact
    // countDistinct alongside. A deterministic sketch on fixed data has a
    // fixed error — the law bounds it at 3 sigma of the documented rsd.
    val rows = ops.CoreRelational.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(exact > 0)
      val rel = math.abs(approx - exact) / exact
      assert(rel <= 3 * 0.05,
        s"HLL++ relative error $rel exceeds 3x rsd for ${r.get(0)}: " +
          s"approx=$approx exact=$exact")
    }
  }

  test("approx_percentile rank error stays within the 1/accuracy guarantee") {
    // approx_percentile(col, p, accuracy) guarantees the returned ELEMENT
    // has rank within (p ± 1/accuracy)·n of the target. Verify per group:
    // the element's true rank interval [less+1, leq] must intersect the
    // guaranteed window, with one rank of slack for the ceil/floor edges.
    val eps = 1.0 / 1000 // the query's accuracy parameter
    val ap = ops.StatsOps.approxPercentiles(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Number]("ap50").doubleValue(),
          r.getAs[Number]("ap99").doubleValue()))
      .toMap
    assert(ap.nonEmpty)
    val groups = Registry.table(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice").cast("double"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    for ((prio, (ap50, ap99)) <- ap; (p, v) <- Seq(0.5 -> ap50, 0.99 -> ap99)) {
      val xs = groups(prio)
      val n = xs.length.toDouble
      val less = xs.count(_ < v)
      val leq = xs.count(_ <= v)
      val lo = (p - eps) * n - 1
      val hi = (p + eps) * n + 1
      assert(less + 1 <= hi && leq >= lo,
        s"approx p$p for $prio: value $v has rank [${less + 1}, $leq] " +
          s"outside guaranteed [$lo, $hi] of n=$n")
    }
  }
}
