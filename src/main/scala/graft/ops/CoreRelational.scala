package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The relational operator families the reference has no implementation for
  * (SURVEY.md §2.8 — joins, sorts/top-k, grouping sets, distinct agg, set
  * ops), exposed as first-class engine queries over the driver's TPC-H-ish
  * star schema.
  *
  * Cross-engine determinism rules (shared with the DuckDB oracles):
  *  - Sums over 2-decimal double columns go through DECIMAL casts
  *    (`dsum`) — double addition is order-dependent and Spark/DuckDB
  *    aggregate in different orders; decimal addition is exact. The final
  *    value is cast back to DOUBLE (correctly-rounded in both engines).
  *  - Sums of integral-valued doubles (l_quantity ∈ 1..50) stay plain
  *    double sums — integer arithmetic below 2^53 is exact in any order.
  *  - Window top-k always carries a unique tiebreaker in the ORDER BY.
  *  - Every query ends in a total ORDER BY so results are row-stable.
  */
object CoreRelational {
  import Registry.table

  // ---------------------------------------------------------------- Q1-style
  /** Pricing summary: the reference's A1 multi-aggregate pattern
    * (`xetra_transformer.py:173-185`) widened to TPC-H Q1 shape — partial
    * (map-side) + final hash aggregation, no shuffle beyond the single
    * group-by exchange.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)
          .as("sum_charge"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val pricingSummaryOracle = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
  sum(l_quantity) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

  // ------------------------------------------------------------------- joins
  /** Star join with broadcast dimensions: revenue per region/nation.
    * nation/region/customer are tiny → explicit `broadcast` keeps the big
    * fact-side scan shuffle-free for those edges; lineitem⋈orders is the one
    * genuine shuffle (sort-merge or shuffled-hash under AQE).
    */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    val c = table(s, dir, "customer")
    val n = table(s, dir, "nation")
    val r = table(s, dir, "region")
    // Eager aggregation (groupjoin pushdown) — a rewrite Catalyst does
    // not perform: this filterless fact⋈fact⋈dim chain re-aggregates at
    // each key level, so 600M lineitem rows collapse to per-order
    // partials BEFORE meeting orders and per-order partials collapse to
    // per-customer partials before meeting customer — every exchange
    // carries (key, decimal partial, count), never fact rows, and the
    // dims join 15M partials instead of 600M facts. DECIMAL addition is
    // associative, so the staged sums equal the one-shot dsum bit-for-
    // bit (hash gate unchanged). r15 sf100: 212 s (fact-level joins) →
    // ~24 s staged. Customer joins by AQE stats, not a forced hint — it
    // scales with the corpus (15M rows at sf100); nation/region are
    // bounded dims.
    val dec = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(30, 4))
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(sum(dec).as("rev"), count(lit(1)).as("cnt"))
    val perCust = perOrder
      .join(o.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum("rev").as("rev"), sum("cnt").as("cnt"))
    perCust
      .join(c.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum("rev").cast("double").as("revenue"),
        sum("cnt").as("n_lineitems"))
      .orderBy("r_name", "n_name")
  }

  private val regionRevenueOracle = """
SELECT r_name, n_name,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""

  /** Large-side equi-join (lineitem ⋈ orders) aggregated by order priority —
    * the shuffle-heavy path; AQE picks the physical join.
    */
  def priorityShipping(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    // Eager aggregation (the join_region_revenue discipline): collapse
    // lineitem to one row per orderkey BEFORE the join, so (a) the join
    // shuffles 150M narrow partials instead of 600M fact rows at 1000×,
    // and (b) countDistinct(l_orderkey) — which Spark plans as a second
    // full expand-aggregate over the joined fact — becomes a plain count
    // of the 1:1-joined partials. Exact: per-order item counts are
    // integers, l_quantity is integral-valued (1..50) so its partial
    // double sums are exact in any order, and o_orderkey is unique.
    val perOrder = li.groupBy("l_orderkey").agg(
      count(lit(1)).as("_n"), sum("l_quantity").as("_q"))
    perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum("_n").as("n_items"),
        sum("_q").as("total_qty"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  private val priorityShippingOracle = """
SELECT o_orderpriority, count(*) AS n_items, sum(l_quantity) AS total_qty,
  count(DISTINCT l_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

  /** Left-semi join: customers having at least one order (≅ EXISTS). */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  private val customersWithOrdersOracle = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""

  /** Left-anti join: customers with no URGENT order (≅ NOT EXISTS) — the
    * relational form of the reference's date-gap set difference
    * (`meta_process.py:95`, SURVEY.md A2). The priority filter keeps the
    * anti side non-trivial (every customer has *some* order in this data).
    */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer")
    val urgent = table(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  private val customersWithoutOrdersOracle = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""

  // ----------------------------------------------------------- top-k / sort
  /** Top-3 orders per customer by price — rank window with a unique
    * tiebreaker (o_orderkey) so the result is deterministic in any engine.
    */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    table(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rk")
  }

  private val topOrdersPerCustomerOracle = """
SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    CAST(row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rk
  FROM orders)
WHERE rk <= 3 ORDER BY o_custkey, rk
"""

  /** Same result as `topk_orders_per_customer`, computed with the custom
    * bounded top-k `Aggregator` ([[graft.functions.TopKByValue]]) instead of
    * a window sort: map-side partial aggregation with O(k) state per group —
    * the shuffle carries ≤ k rows per (group, partition) instead of every
    * row, and nothing is sorted. The two queries sharing one oracle pins
    * the aggregator's total order (value desc, key asc) exactly.
    */
  def topOrdersBoundedAgg(s: SparkSession, dir: String): DataFrame = {
    val topk = graft.functions.TopKByValue.column(3)
    table(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(topk(col("o_orderkey"), col("o_totalprice")).as("t"))
      .select(col("o_custkey"),
        posexplode(arrays_zip(col("t.vs").as("v"), col("t.ks").as("k"))))
      .select(col("o_custkey"),
        (col("pos") + 1).cast("int").as("rk"),
        col("col.k").as("o_orderkey"),
        col("col.v").as("o_totalprice"))
      .orderBy("o_custkey", "rk")
  }

  /** Global sort + limit: the 25 priciest orders (full ORDER BY output —
    * absent from the reference, SURVEY.md §2.8). TakeOrdered physical op:
    * no global shuffle, each partition contributes its local top-k.
    */
  def top25Orders(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private val top25OrdersOracle = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""

  // ------------------------------------------------- grouping sets / rollup
  /** Eager pre-aggregation below a multi-set aggregate: Spark plans
    * ROLLUP/CUBE/GROUPING SETS as Aggregate-over-Expand, and Expand
    * replicates EVERY INPUT ROW once per grouping set — a 3-4× fact-scan
    * blowup through the partial aggregate (the r18 sf10 sweep measured
    * rollup_revenue at 10.4 s where the plain Q1-style aggregate runs ~2 s).
    * Aggregating to the tiny exact key grid FIRST (≤ |distinct keys| rows,
    * single digit here) and expanding THAT leaves Expand with nothing to
    * blow up. Exactness: the inner sums stay on the dsum decimal grid
    * (never doubles), decimal addition is associative, and re-summing
    * partials per grouping set is precisely what the direct plan's partial
    * aggregation does — hash-identical by construction, including on EMPTY
    * input, where a grouping-sets aggregate emits no rows in either form
    * (law-pinned in Round18PropertySpec).
    */
  private def marginAgg(
      base: DataFrame, keys: Seq[String], value: Column,
      shape: DataFrame => org.apache.spark.sql.RelationalGroupedDataset)
      : DataFrame = {
    val pre = base.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("_n"),
      sum(value.cast(DecimalType(30, 2))).as("_s"))
    shape(pre).agg(
      grouping_id().cast("long").as("gid"),
      sum(col("_n")).as("n"),
      sum(col("_s")).cast("double").as("sum_price"))
  }

  /** ROLLUP over (returnflag, linestatus): subtotal rows carry NULL keys and
    * a grouping_id level marker, identical bit-encoding in both engines.
    * Eagerly pre-aggregated (see [[marginAgg]]).
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    marginAgg(
      table(s, dir, "lineitem"),
      Seq("l_returnflag", "l_linestatus"), col("l_extendedprice"),
      _.rollup("l_returnflag", "l_linestatus"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  private val rollupRevenueOracle = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  count(*) AS n,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

  /** CUBE over (status, priority) on orders. Eagerly pre-aggregated
    * (see [[marginAgg]]).
    */
  def cubeOrders(s: SparkSession, dir: String): DataFrame =
    marginAgg(
      table(s, dir, "orders"),
      Seq("o_orderstatus", "o_orderpriority"), col("o_totalprice"),
      _.cube("o_orderstatus", "o_orderpriority"))
      .orderBy("gid", "o_orderstatus", "o_orderpriority")

  private val cubeOrdersOracle = """
SELECT o_orderstatus, o_orderpriority,
  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
  count(*) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""

  /** Explicit GROUPING SETS (beyond rollup/cube's fixed lattices): the
    * (flag, status) detail cells plus flag-only and status-only margins —
    * but NOT the grand total, which neither rollup nor cube can express
    * alone.
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame =
    marginAgg(
      table(s, dir, "lineitem"),
      Seq("l_returnflag", "l_linestatus"), col("l_extendedprice"),
      _.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus")))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  private val groupingSetsOracle = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  count(*) AS n,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag),
                        (l_linestatus))
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""

  // -------------------------------------------------------- set ops / dedup
  /** INTERSECT: nation keys present in both customer and supplier. */
  def intersectNations(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(table(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private val intersectNationsOracle = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY nationkey
"""

  /** EXCEPT: customers who placed an URGENT order but never a LOW one
    * (non-empty by construction in the driver data; both branches scan the
    * same table with different pushed predicates).
    */
  def exceptNations(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      .except(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
      .orderBy("o_custkey")
  }

  private val exceptNationsOracle = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY o_custkey
"""

  /** UNION ALL without dedup — the reference's meta-file concat semantics
    * (U1, `meta_process.py:51`): duplicates are intentionally preserved.
    */
  def unionAllSlices(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val cheap = o.filter(col("o_totalprice") < 50000)
      .select(col("o_orderkey"), lit("cheap").as("slice"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("slice"))
    cheap.unionByName(urgent).orderBy("slice", "o_orderkey")
  }

  private val unionAllSlicesOracle = """
SELECT o_orderkey, 'cheap' AS slice FROM orders WHERE o_totalprice < 50000
UNION ALL
SELECT o_orderkey, 'urgent' AS slice FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY slice, o_orderkey
"""

  /** DISTINCT projection (reference A3's set-build, relational form). */
  def distinctFlagStatus(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  private val distinctFlagStatusOracle = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""

  /** Exact + distinct aggregation per priority (approx variant lives in a
    * separate rows-only query — HLL sketches differ across engines).
    */
  def distinctCustomers(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  private val distinctCustomersOracle = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
  count(*) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

  /** approx_count_distinct (HLL++): sketch differs from DuckDB's HLL, so
    * this is rows-only checked; the exact twin above is the hash-checked one.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey").as("approx_parts"),
        countDistinct("l_partkey").as("exact_parts"))
      .orderBy("l_returnflag")

  // --------------------------------------------------- filter/projection
  /** Pushdown showcase: predicate + 3-column projection must reach the
    * parquet scan (PushedFilters / ReadSchema in explain) — reference P1-P3.
    */
  def filterProject(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("2000-01-01").cast("date") &&
        col("l_shipdate") < lit("2000-07-01").cast("date"))
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  private val filterProjectOracle = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_returnflag = 'R' AND l_shipdate >= DATE '2000-01-01'
  AND l_shipdate < DATE '2000-07-01'
ORDER BY l_orderkey, l_linenumber, l_quantity
"""

  // ------------------------------------------------ null-semantics probe
  /** Three-valued-logic / null-propagation parity probe: a nullable column
    * is derived deterministically (negative balances → null), then the
    * SQL null rules are exercised side by side — null-safe equality
    * (`<=>` / IS NOT DISTINCT FROM), null arithmetic propagation,
    * `x AND false = false` / `x OR true = true` even for null x, and
    * coalesce. Hash equality proves both engines implement the same
    * three-valued logic — the class of semantics bug no rows-only check
    * would ever catch.
    */
  def nullSemanticsProbe(s: SparkSession, dir: String): DataFrame = {
    val nb = when(col("c_acctbal") >= 0, col("c_acctbal"))
    Registry.table(s, dir, "customer")
      .select(col("c_custkey"), nb.as("nb"),
        (nb <=> lit(0.0)).as("null_safe_eq_zero"),
        (nb + lit(1.0)).as("plus_one"),
        ((nb > 0) && lit(false)).as("and_false"),
        ((nb > 0) || lit(true)).as("or_true"),
        coalesce(nb, lit(-1.0)).as("coalesced"))
      .orderBy("c_custkey")
  }

  private val nullSemanticsOracle = """
WITH t AS (
  SELECT c_custkey,
    CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS nb
  FROM customer)
SELECT c_custkey, nb,
  nb IS NOT DISTINCT FROM 0.0 AS null_safe_eq_zero,
  nb + 1.0 AS plus_one,
  (nb > 0) AND FALSE AS and_false,
  (nb > 0) OR TRUE AS or_true,
  coalesce(nb, -1.0) AS coalesced
FROM t ORDER BY c_custkey
"""

  val queries: Map[String, QueryDef] = Map(
    "null_semantics_probe" ->
      QueryDef(nullSemanticsProbe, Some(nullSemanticsOracle)),
    "q1_pricing_summary" -> QueryDef(pricingSummary, Some(pricingSummaryOracle)),
    "join_region_revenue" -> QueryDef(regionRevenue, Some(regionRevenueOracle)),
    "join_priority_shipping" -> QueryDef(priorityShipping, Some(priorityShippingOracle)),
    "semi_customers_with_orders" -> QueryDef(customersWithOrders, Some(customersWithOrdersOracle)),
    "anti_customers_no_urgent" -> QueryDef(customersWithoutOrders, Some(customersWithoutOrdersOracle)),
    "topk_orders_per_customer" -> QueryDef(topOrdersPerCustomer, Some(topOrdersPerCustomerOracle)),
    "topk_orders_bounded_agg" -> QueryDef(topOrdersBoundedAgg, Some(topOrdersPerCustomerOracle)),
    "top25_orders_global" -> QueryDef(top25Orders, Some(top25OrdersOracle)),
    "rollup_revenue" -> QueryDef(rollupRevenue, Some(rollupRevenueOracle)),
    "cube_orders" -> QueryDef(cubeOrders, Some(cubeOrdersOracle)),
    "grouping_sets_margins" -> QueryDef(groupingSets, Some(groupingSetsOracle)),
    "intersect_nations" -> QueryDef(intersectNations, Some(intersectNationsOracle)),
    "except_urgent_not_low" -> QueryDef(exceptNations, Some(exceptNationsOracle)),
    "union_all_slices" -> QueryDef(unionAllSlices, Some(unionAllSlicesOracle)),
    "distinct_flag_status" -> QueryDef(distinctFlagStatus, Some(distinctFlagStatusOracle)),
    "distinct_customers" -> QueryDef(distinctCustomers, Some(distinctCustomersOracle)),
    "approx_count_distinct" -> QueryDef(approxDistinct, None),
    "filter_project_pushdown" -> QueryDef(filterProject, Some(filterProjectOracle))
  )
}
