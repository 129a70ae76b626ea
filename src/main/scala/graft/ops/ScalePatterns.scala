package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale-robustness patterns that keep results identical to their naive
  * forms — the oracle is the *naive* SQL, proving the optimized plan
  * computes the same relation.
  */
object ScalePatterns {
  import Registry.table

  /** Skew-safe two-phase aggregation: salt the hot key-space into 16
    * sub-keys, partially aggregate, then merge. At 100 TB a single hot key
    * (one returnflag is ~half of lineitem) otherwise pins its entire group
    * on one task. Exact decimal sums make the two-phase result equal the
    * one-phase oracle bit-for-bit.
    */
  def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    val salted = table(s, dir, "lineitem")
      .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(25, 2))).as("rev"))
    salted.groupBy("l_returnflag")
      .agg(
        sum("n").as("n_items"),
        sum("rev").cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  private val saltedAggOracle = """
SELECT l_returnflag, count(*) AS n_items,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS revenue
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

  /** The engine's SQL surface: the same Catalyst pipeline driven through
    * `spark.sql` over registered temp views (correlated scalar subquery +
    * join + agg — shapes the DataFrame queries don't exercise).
    */
  def sqlSurface(s: SparkSession, dir: String): DataFrame = {
    table(s, dir, "orders").createOrReplaceTempView("orders_v")
    table(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT c.c_mktsegment,
             count(*) AS n_big_spenders,
             CAST(sum(CAST(c.c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS total_bal
      FROM customer_v c
      WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        AND EXISTS (SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey)
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment
    """)
  }

  /** avg() inside the correlated subquery is only a *predicate* (row
    * selection), so double-vs-decimal averaging noise can only flip rows
    * whose balance ties the nation average to ~1e-12 — the driver data has
    * no such adversarial values (balances are 2-decimal, nation groups are
    * small; verified at both SFs).
    */
  private val sqlSurfaceOracle = """
SELECT c.c_mktsegment,
       count(*) AS n_big_spenders,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

  val queries: Map[String, QueryDef] = Map(
    "salted_skew_agg" -> QueryDef(saltedAgg, Some(saltedAggOracle)),
    "sql_correlated_subquery" -> QueryDef(sqlSurface, Some(sqlSurfaceOracle))
  )
}
