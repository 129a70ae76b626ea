package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H Q2/Q11 analogs over a DERIVED partsupp relation.
  *
  * The bundled testdata has no partsupp table (the reference's reduced
  * schema stops at part/supplier), which left the TPC-H shape suite at 20
  * of 22. Rather than dropping the two shapes, partsupp is derived
  * deterministically from `part` × a fixed per-part supplier formula —
  * TPC-H's own generator does exactly this (each part gets 4 suppliers via
  * a modular formula over the supplier count). The SAME closed-form
  * derivation runs in Spark and in the DuckDB oracle SQL, so hash-equality
  * still proves the query logic end to end.
  *
  * Derivation (S = count(supplier); s_suppkey is contiguous 0..S-1 in the
  * testdata at every SF):
  *   step               = max(1, S div 4)
  *   ps_suppkey(p, i)   = (p_partkey + i·step) mod S          i ∈ 0..3
  *   ps_availqty        = (p_partkey·7   + ps_suppkey·3 ) mod 9999   + 1
  *   ps_supplycost¢     = (p_partkey·523 + ps_suppkey·97) mod 100000 + 100
  * The four offsets i·step are distinct mod S for S ≥ 4, so (partkey,
  * suppkey) pairs are unique. Costs stay integer CENTS end to end — Q11's
  * fraction threshold becomes `value¢ · 10000 > total¢`, an exact int64
  * comparison that cannot flap between engines.
  *
  * 100 TB posture: the derivation is a map-only explode over the part dim
  * (no shuffle); Q2's min-cost-per-part is one window over p_partkey; Q11
  * is two aggregations of an already-tiny grouped result. The supplier
  * count is a 1-row broadcast, same pattern as the corpus stats in
  * [[SearchOps]].
  */
object PartSuppOps {

  import Registry.table

  /** The derived partsupp relation (see object doc). */
  def partsupp(s: SparkSession, dir: String): DataFrame = {
    val sCnt = table(s, dir, "supplier")
      .agg(count(lit(1)).cast("long").as("s_cnt"))
    table(s, dir, "part").select(col("p_partkey"))
      .join(broadcast(sCnt))
      .select(col("p_partkey"), col("s_cnt"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .withColumn("ps_suppkey",
        (col("p_partkey") + col("i") * greatest(lit(1L), expr("s_cnt div 4")))
          % col("s_cnt"))
      .select(
        col("p_partkey").as("ps_partkey"),
        col("ps_suppkey"),
        ((col("p_partkey") * 7 + col("ps_suppkey") * 3) % 9999 + 1)
          .as("ps_availqty"),
        ((col("p_partkey") * 523 + col("ps_suppkey") * 97) % 100000 + 100)
          .as("ps_supplycost_cents"))
  }

  /** The identical derivation as oracle-SQL CTEs (DuckDB `//` = int div). */
  private val PartsuppCte = """
scnt AS (SELECT CAST(count(*) AS BIGINT) AS s_cnt FROM supplier),
ps0 AS (
  SELECT p_partkey, s_cnt,
    (p_partkey + i.i * greatest(1, s_cnt // 4)) % s_cnt AS ps_suppkey
  FROM part, scnt,
    (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT)),
            (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT))) AS i(i)),
partsupp AS (
  SELECT p_partkey AS ps_partkey, ps_suppkey,
    (p_partkey * 7 + ps_suppkey * 3) % 9999 + 1 AS ps_availqty,
    (p_partkey * 523 + ps_suppkey * 97) % 100000 + 100 AS ps_supplycost_cents
  FROM ps0),
eur_supplier AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')"""

  /** Q2 minimum-cost supplier: for each qualifying part, the EUROPE
    * supplier(s) offering it at the region-wide minimum cost — the
    * correlated-min shape, expressed as a window min over p_partkey
    * (one shuffle) instead of a correlated subquery rejoin.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val p = table(s, dir, "part")
      .filter(col("p_type") === "ECONOMY" && col("p_size") < 25)
      .select("p_partkey", "p_brand")
    val eur = table(s, dir, "supplier")
      .join(broadcast(table(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val w = Window.partitionBy("ps_partkey")
    partsupp(s, dir)
      // part scales with the corpus (20M rows at sf100): AQE-sized join;
      // the Europe supplier subset stays hinted (region-bounded)
      .join(p, col("ps_partkey") === p("p_partkey"))
      .join(broadcast(eur), col("ps_suppkey") === eur("s_suppkey"))
      .withColumn("min_cost", min("ps_supplycost_cents").over(w))
      .filter(col("ps_supplycost_cents") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("ps_partkey"), col("p_brand"),
        col("ps_supplycost_cents").as("cost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("ps_partkey"))
      .limit(100)
  }

  private val q2Oracle = s"""
WITH $PartsuppCte,
j AS (
  SELECT s_acctbal, s_name, n_name, ps_partkey, p_brand,
    ps_supplycost_cents,
    min(ps_supplycost_cents) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM partsupp
  JOIN part ON ps_partkey = p_partkey
  JOIN eur_supplier ON ps_suppkey = s_suppkey
  WHERE p_type = 'ECONOMY' AND p_size < 25)
SELECT s_acctbal, s_name, n_name, ps_partkey, p_brand,
  ps_supplycost_cents AS cost_cents
FROM j WHERE ps_supplycost_cents = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey
LIMIT 100
"""

  /** Q11 important stock: per-part inventory value held by EUROPE
    * suppliers, kept when above fraction 1/10000 of the region total.
    * All arithmetic in exact int64 cents; the threshold is the exact
    * comparison `value¢ · 10000 > total¢` (see object doc).
    */
  def q11ImportantStock(s: SparkSession, dir: String): DataFrame = {
    val eur = table(s, dir, "supplier")
      .join(broadcast(table(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(table(s, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val grouped = partsupp(s, dir)
      .join(broadcast(eur), col("ps_suppkey") === eur("s_suppkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty"))
        .as("value_cents"))
    val total = grouped.agg(sum("value_cents").as("total_cents"))
    grouped.join(broadcast(total))
      .filter(col("value_cents") * 10000 > col("total_cents"))
      .select("ps_partkey", "value_cents")
      .orderBy(col("value_cents").desc, col("ps_partkey"))
  }

  private val q11Oracle = s"""
WITH $PartsuppCte,
g AS (
  SELECT ps_partkey,
    CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
  FROM partsupp JOIN eur_supplier ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey)
SELECT ps_partkey, value_cents
FROM g, (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM g) t
WHERE value_cents * 10000 > total_cents
ORDER BY value_cents DESC, ps_partkey
"""

  val queries: Map[String, QueryDef] = Map(
    "q2_min_cost_supplier" -> QueryDef(q2MinCostSupplier, Some(q2Oracle)),
    "q11_important_stock" -> QueryDef(q11ImportantStock, Some(q11Oracle))
  )
}
