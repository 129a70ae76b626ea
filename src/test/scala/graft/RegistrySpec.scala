package graft

/** Registry-wide smoke: every declared query runs at sf0.001 and returns a
  * stable, non-degenerate result. The value-level gate is the DuckDB oracle
  * compare (scripts/check.py / driver t2); this spec catches regressions
  * cheaply inside `sbt test`.
  */
class RegistrySpec extends SparkSpec {

  test("every query declares either an oracle or a documented rows-only check") {
    assert(Registry.all.nonEmpty)
    val noOracle = Registry.all.collect { case (n, QueryDef(_, None, _)) => n }
    // keep the rows-only list deliberate and small
    assert(noOracle.forall(
      Set("approx_count_distinct", "stats_approx_percentiles").contains),
      s"unexpected oracle-less queries: $noOracle")
  }

  for ((name, q) <- Registry.all.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 with rows > 0") {
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry() smoke (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql only references declared queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
