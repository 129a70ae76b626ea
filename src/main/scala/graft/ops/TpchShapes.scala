package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes over the driver's star schema — the
  * canonical catalog of join/subquery/aggregate patterns a user of any
  * relational engine expects (SURVEY.md §2.8 lists them all as absent from
  * the reference). Q1/Q6/Q14/Q19 shapes live in CoreRelational /
  * RelationalExtras; this module adds Q3, Q4, Q5, Q7, Q8, Q9, Q10, Q12,
  * Q13, Q15, Q16, Q17, Q18, Q20, Q21, Q22 — with Q1/Q6/Q14/Q19 elsewhere,
  * all 22 TPC-H query shapes are covered (Q2/Q11 on the reduced schema
  * appear as their shape twins Q16/Q20: partsupp-correlated subqueries
  * re-targeted at the lineitem-derived part↔supplier relation).
  *
  * The driver data has no `partsupp`, `l_commitdate`/`l_receiptdate`,
  * `l_shipmode` or `c_phone`, so four queries substitute an equivalent
  * predicate on an existing column (noted per query) — the *plan shape*
  * (which joins, which subqueries, where the aggregates sit) is the point,
  * and is unchanged by the substitution.
  *
  * Scale posture, shared across the module: dimension tables (region,
  * nation, supplier, part, customer — all O(SF·200k) or fixed-size) are
  * broadcast explicitly; the only data-sized shuffles are lineitem⋈orders
  * and the final aggregations. Every aggregate a hash-comparison rests on
  * goes through [[dsum]] (exact decimal addition); every query ends in a
  * total ORDER BY with a unique tiebreaker.
  */
object TpchShapes {
  import Registry.table

  private def d(s: String) = lit(s).cast("date")

  // ---------------------------------------------------------------- Q3
  /** Q3 shipping priority: top-10 undelivered orders by accrued revenue for
    * one market segment. Broadcast the filtered customer side; the
    * lineitem⋈orders equi-join is the single shuffle; TakeOrdered caps the
    * sorted output at 10 rows per partition before the driver merge.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = table(s, dir, "orders").filter(col("o_orderdate") < d("2000-07-01"))
    val li = table(s, dir, "lineitem").filter(col("l_shipdate") > d("2000-07-01"))
    // orders⋈customer first: the BUILDING-segment reduction (~1/5)
    // thins orders BEFORE the lineitem shuffle, and customer joins by
    // AQE stats instead of a forced broadcast hint (3M rows at sf100 —
    // the hint AQE cannot override was the 50 s term in the r15 sweep)
    val oc = o.join(c, o("o_custkey") === c("c_custkey"))
    li.join(oc, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  private val q3Oracle = """
SELECT l_orderkey,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '2000-07-01'
  AND l_shipdate > DATE '2000-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

  // ---------------------------------------------------------------- Q4
  /** Q4 order-priority checking: orders in a quarter with at least one late
    * line — EXISTS becomes a left-semi join whose condition mixes the equi
    * key with a non-equi comparison (l_shipdate > o_orderdate substitutes
    * for the missing l_commitdate < l_receiptdate; same shape: correlated
    * inequality between the two tables).
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
      .filter(col("o_orderdate") >= d("2000-01-01") && col("o_orderdate") < d("2000-04-01"))
    // lineitem is deliberately UNfiltered: the transitive bound l_shipdate >
    // o_orderdate ∧ o_orderdate >= 2000-01-01 ⟹ l_shipdate > 2000-01-01 is
    // derived by the engine's own DeriveNonEquiJoinBounds optimizer rule
    // (graft.plans.DerivedPredicates; Catalyst's constraint propagation
    // stops at non-equi join predicates) and reaches the parquet scan as a
    // pushed filter — thinning the 600M-row semi-join probe ~3.7× at sf100
    // (189 s → 7.7 s, the r15 sweep's worst last-decade jump). PlanSpec
    // asserts the derived bound lands in the scan's PushedFilters.
    val li = table(s, dir, "lineitem")
    o.join(li, o("o_orderkey") === li("l_orderkey") && li("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Oracle = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2000-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

  // ---------------------------------------------------------------- Q5
  /** Q5 local-supplier volume: the 6-table star join with the extra
    * *non-star* equality c_nationkey = s_nationkey (customer and supplier
    * in the same nation). Only the fixed dimensions (region, nation, the
    * ≤25-row nation key sets) carry broadcast hints; the ASIA-reduced
    * supplier and customer are O(SF), so AQE sizes those joins from
    * runtime stats (broadcast at bench SFs, shuffle at 100 TB).
    */
  def q5LocalSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
      .filter(col("o_orderdate") >= d("2000-01-01") && col("o_orderdate") < d("2001-01-01"))
    val n = table(s, dir, "nation")
    val r = table(s, dir, "region").filter(col("r_name") === "ASIA")
    // Resolve the ASIA nations FIRST (≤25 rows) so the region predicate
    // semi-reduces supplier AND customer before any fact-table shuffle:
    // c_nationkey = s_nationkey ∧ s_nationkey ∈ ASIA ⟹ c_nationkey ∈
    // ASIA is a transitive bound Catalyst does not infer across the
    // join. The r15 sf100 sweep measured the old shape (600M-row
    // lineitem⋈orders shuffle first + a FORCED 15M-row customer
    // broadcast — a hint AQE cannot override) at 152 s; thinning both
    // fact inputs first and letting AQE size the customer join cut it
    // ~4×. At 100 TB the same plan holds: dims broadcast, customer
    // flips to shuffle by stats instead of by forced hint.
    val nAsia = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
    val su = table(s, dir, "supplier")
      .join(broadcast(nAsia.select(col("n_nationkey").as("sn_key"))),
        col("s_nationkey") === col("sn_key"), "left_semi")
    val c = table(s, dir, "customer")
      .join(broadcast(nAsia.select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"), "left_semi")
    li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c,
        o("o_custkey") === c("c_custkey") && c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Oracle = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2001-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

  // ---------------------------------------------------------------- Q7
  /** Q7 volume shipping: the two-nation trade flow — nation joined TWICE
    * under different roles (supplier side / customer side), with the
    * symmetric pair predicate, grouped by both nations and ship year.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    // The nation scans are deliberately UNfiltered: the pair disjunction
    // (13,19)∨(19,13) implies n1 ∈ {13,19} AND n2 ∈ {13,19} — a bound
    // Catalyst cannot extract from an Or (branch-constraint intersection
    // is empty), derived instead by the engine's DeriveDisjunctiveDomains
    // optimizer rule (graft.plans.DerivedPredicates) and pushed to the
    // nation scans, so supplier and customer arrive 2/25-thinned BEFORE
    // the fact shuffles and orders⋈customer runs at ~8% of orders (125 s
    // → 10.6 s at the r15 sf100 sweep when this was hand-written; PlanSpec
    // asserts the derived IN lands in the nation scans' PushedFilters).
    val n1 = table(s, dir, "nation").as("n1")
    val n2 = table(s, dir, "nation").as("n2")
    val su = table(s, dir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("n1.n_nationkey"))
    val c = table(s, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("n2.n_nationkey"))
    val oc = o.join(c, o("o_custkey") === c("c_custkey"))
    li.join(su, li("l_suppkey") === su("s_suppkey"))
      .join(oc, li("l_orderkey") === o("o_orderkey"))
      .filter(
        // pair chosen to be non-empty at every bundled SF (incl. sf0.001)
        (col("n1.n_name") === "NATION_13" && col("n2.n_name") === "NATION_19") ||
        (col("n1.n_name") === "NATION_19" && col("n2.n_name") === "NATION_13"))
      .groupBy(col("n1.n_name").as("supp_nation"), col("n2.n_name").as("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Oracle = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INTEGER) AS l_year,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""

  // ---------------------------------------------------------------- Q8
  /** Q8 market share: one nation's share of a region's PROMO-part import
    * volume per order year — conditional aggregation over a 7-table join,
    * the share being one IEEE division of two exact decimal sums (the
    * cross-engine-safe form of `sum(case)/sum(all)`).
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    val c = table(s, dir, "customer")
    val su = table(s, dir, "supplier")
    val p = table(s, dir, "part").filter(col("p_type") === "PROMO")
    val n1 = table(s, dir, "nation").as("n1") // customer nation -> region filter
    val n2 = table(s, dir, "nation").as("n2") // supplier nation -> market share
    val r = table(s, dir, "region").filter(col("r_name") === "ASIA")
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    // part (type-filtered), customer (15M rows at sf100) and supplier all
    // scale with the corpus — UNhinted, AQE-sized; nation/region keep
    // their hints (fixed dimensions)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n1), c("c_nationkey") === col("n1.n_nationkey"))
      .join(broadcast(r), col("n1.n_regionkey") === r("r_regionkey"))
      .join(broadcast(n2), su("s_nationkey") === col("n2.n_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        dsum(when(col("n2.n_name") === "NATION_1", vol).otherwise(lit(0.0)), 4).as("nation_volume"),
        dsum(vol, 4).as("total_volume"))
      .withColumn("mkt_share",
        when(col("total_volume") =!= 0.0, col("nation_volume") / col("total_volume")))
      .select("o_year", "nation_volume", "total_volume", "mkt_share")
      .orderBy("o_year")
  }

  private val q8Oracle = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_1'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS nation_volume,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS total_volume,
  CASE WHEN CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) <> 0.0
       THEN CAST(sum(CAST(CASE WHEN n2.n_name = 'NATION_1'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE)
          / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
       END AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""

  // ---------------------------------------------------------------- Q9
  /** Q9 product-type profit: substring part filter fanned across every
    * order year and supplier nation. The driver schema has no
    * ps_supplycost, so profit = discounted revenue (the join tree — part +
    * lineitem + supplier + orders + nation — is Q9's shape unchanged).
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val o = table(s, dir, "orders")
    val su = table(s, dir, "supplier")
    val p = table(s, dir, "part").filter(col("p_name").contains("widget"))
    val n = table(s, dir, "nation")
    // part (substring-filtered, data-dependent selectivity) and supplier
    // (O(SF)) are UNhinted — AQE sizes both from runtime stats; only the
    // fixed 25-row nation keeps its hint
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(su, li("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Oracle = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""

  // ---------------------------------------------------------------- Q10
  /** Q10 returned-item reporting: top-20 customers by revenue lost to
    * returns in a quarter. Group keys include every output dimension
    * (standard Q10); limit is tie-broken by the unique c_custkey.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = table(s, dir, "orders")
      .filter(col("o_orderdate") >= d("2000-01-01") && col("o_orderdate") < d("2000-04-01"))
    val c = table(s, dir, "customer")
    val n = table(s, dir, "nation")
    // customer is UNhinted: 15M rows at sf100 — the forced broadcast was
    // the 61 s term in the r16 sf100 sweep (AQE-sized: broadcast at bench
    // SFs, shuffle at scale); nation stays hinted (fixed 25 rows).
    // Eager aggregation on the custkey (the q16 narrow-key discipline):
    // every output group key is functionally dependent on c_custkey
    // (customer is unique on it), so revenue aggregates per o_custkey
    // BEFORE the customer join — the fact-side shuffle carries (long,
    // decimal partial) instead of dragging c_name/n_name/mktsegment
    // strings through the join and a wide-key group-by; the label join is
    // then 1:1 against the slice's distinct customers. Exact: same group
    // contents (custkey determines the 5-key tuple), and dsum's DECIMAL
    // partials are order-free.
    val revPerCust = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
    revPerCust
      .join(c, col("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"),
        col("c_mktsegment"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Oracle = """
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2000-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

  // ---------------------------------------------------------------- Q12
  /** Q12 shipping-mode priority classes: two conditional counts per group
    * (the driver schema has no l_shipmode, so lines group by l_linestatus —
    * the CASE-inside-SUM pivot is Q12's shape).
    */
  def q12PriorityClass(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= d("2000-01-01") && col("l_shipdate") < d("2001-01-01"))
    val o = table(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  private val q12Oracle = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2001-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

  // ---------------------------------------------------------------- Q13
  /** Q13 customer order distribution: LEFT OUTER join with a predicate in
    * the join condition (not a post-filter — customers with only excluded
    * orders must survive with count 0), then an aggregate OF an aggregate.
    */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer")
    val o = table(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey") && o("o_orderpriority") =!= "5-LOW",
        "left_outer")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Oracle = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

  // ---------------------------------------------------------------- Q15
  /** Q15 top supplier: the revenue "view" (per-supplier aggregate) joined
    * against its own global max — the scalar subquery becomes a 1-row
    * broadcast cross join, so nothing funnels through a single partition.
    * Equality on revenue is safe because both sides are the same exact
    * decimal sum surfaced as double.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= d("2000-01-01") && col("l_shipdate") < d("2000-04-01"))
    val rev = li.groupBy(col("l_suppkey").as("supplier_no"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
    val su = table(s, dir, "supplier")
    // mx is a 1-row scalar (hint stays); supplier is O(SF) — AQE-sized
    rev.join(broadcast(mx), rev("total_revenue") === mx("max_revenue"))
      .join(su, rev("supplier_no") === su("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Oracle = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2000-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""

  // ---------------------------------------------------------------- Q17
  /** Q17 small-quantity-order revenue: the per-part average-quantity
    * correlated subquery becomes an aggregate-then-rejoin (the decorrelated
    * plan every engine runs); the per-part aggregate is small relative to
    * lineitem, so it broadcasts. avg is sum/count of integral doubles —
    * exact, so the 0.2·avg threshold cut can't flap cross-engine.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val p = table(s, dir, "part").filter(col("p_brand") === "Brand#1")
    // brand-filtered part is 1/25 of an O(SF) table and avgQty is a
    // data-dependent per-part aggregate — both UNhinted (AQE broadcasts
    // them at bench SFs, shuffles at scale)
    val filtered = li.join(p, li("l_partkey") === p("p_partkey"))
    val avgQty = filtered.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
    filtered.join(avgQty,
        filtered("l_partkey") === avgQty("a_partkey") &&
        filtered("l_quantity") < lit(0.2) * avgQty("avg_qty"))
      .agg((dsum(col("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"))
  }

  private val q17Oracle = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < 0.2 * (SELECT sum(l_quantity) / count(*) FROM lineitem l2
                          WHERE l2.l_partkey = lineitem.l_partkey)
"""

  // ---------------------------------------------------------------- Q18
  /** Q18 large-volume customers: HAVING over a fact-table aggregate
    * (group lineitem by order, keep quantity sums above the threshold —
    * a tiny survivor set), then enrich survivors via join. The survivor
    * aggregate broadcasts; orders/customer are only probed.
    */
  def q18LargeVolume(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey").as("b_orderkey"))
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 300)
    val o = table(s, dir, "orders")
    val c = table(s, dir, "customer")
    // no forced broadcasts: `big`'s row count is data-dependent (scales
    // with orders) and customer is 15M rows at sf100 — both hints would
    // pin a plan AQE should size from runtime stats (broadcast at bench
    // SFs, shuffle at scale); the r15 sweep measured the hinted shape
    // at 34 s, the stats-sized one at ~8 s
    o.join(big, o("o_orderkey") === big("b_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Oracle = """
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
  o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

  // ---------------------------------------------------------------- Q22
  /** Q22 global sales opportunity: customers with above-average positive
    * balances and no urgent order (the driver data gives every customer
    * *some* order, and has no c_phone — the urgent-order anti join and the
    * n_name group stand in; the shape — scalar subquery + NOT EXISTS +
    * aggregate — is Q22's). The global average is a 1-row broadcast; the
    * anti side only ships urgent orders' custkeys.
    */
  def q22DormantBalance(s: SparkSession, dir: String): DataFrame = {
    val c = table(s, dir, "customer")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((dsum(col("c_acctbal"), 2) / count(lit(1))).as("avg_bal"))
    val urgent = table(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val n = table(s, dir, "nation")
    c.join(broadcast(avgBal), c("c_acctbal") > avgBal("avg_bal"))
      .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy("n_name")
  }

  private val q22Oracle = """
SELECT n_name, count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY n_name
ORDER BY n_name
"""

  // ---------------------------------------------------------------- Q16
  /** Q16 parts/supplier relationship: count distinct suppliers per part
    * group, minus a NOT IN exclusion list (suppliers with negative balance
    * stand in for the missing complaints predicate; the driver schema has no
    * partsupp, so lineitem supplies the part↔supplier relation — same
    * shape: filtered dim ⋈ relation, anti-excluded, count-distinct). The
    * part filter and the exclusion list broadcast; the count-distinct is the
    * only shuffle (Spark expands it to a two-phase distinct+count).
    */
  def q16PartsSupplier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = table(s, dir, "lineitem")
    val p = table(s, dir, "part").filter(
      col("p_brand") =!= "Brand#1" && col("p_type") =!= "SMALL" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excluded = table(s, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select("s_suppkey")
    // Narrow-key discipline (the ann_knn member-join move, applied to the
    // fact shuffles): the distinct-supplier count dedups on the GROUP
    // columns, but (brand, type, size) is a few-hundred-value space —
    // shuffling those strings with every one of the ~77M joined fact rows
    // at 1000× is pure width tax (the r18 sweep's 45.8 s q16 line). Map
    // each combo to a dense int gid ONCE (tiny distinct + row_number),
    // attach gid to partkeys, and every corpus-scaled exchange — the fact
    // join and the (gid, suppkey) dedup — moves 12-16 byte rows. Exact:
    // gid ↔ (brand, type, size) is bijective by construction, so
    // distinct (gid, suppkey) ≡ distinct (combo, suppkey) and the final
    // per-gid count IS countDistinct(l_suppkey) per combo. The join back
    // to combos for the output labels is a broadcast of the same tiny
    // relation. pmap / excluded both scale with the corpus — UNhinted,
    // AQE sizes them (and the runtime bloom filter prunes the lineitem
    // scan against pmap's selective part filter before the shuffle).
    val combos = p.select("p_brand", "p_type", "p_size").distinct()
      .withColumn("gid", row_number().over(
        Window.orderBy("p_brand", "p_type", "p_size")))
      .localCheckpoint() // two consumers (pmap + label join); tiny
    val pmap = p.join(combos, Seq("p_brand", "p_type", "p_size"))
      .select("p_partkey", "gid")
    li.select("l_partkey", "l_suppkey")
      .join(pmap, col("l_partkey") === pmap("p_partkey"))
      .join(excluded, col("l_suppkey") === excluded("s_suppkey"),
        "left_anti")
      .select("gid", "l_suppkey").distinct()
      .groupBy("gid").agg(count(lit(1)).as("supplier_cnt"))
      .join(combos, Seq("gid"))
      .select("p_brand", "p_type", "p_size", "supplier_cnt")
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q16Oracle = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'SMALL'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

  // ---------------------------------------------------------------- Q20
  /** Q20 potential part promotion: suppliers who moved a large volume of a
    * name-matched part within one year — IN over a grouped-HAVING subquery
    * becomes a left-semi join against the qualifying aggregate (the
    * reference's missing partsupp/availqty threshold is replaced by a
    * shipped-quantity threshold on the same grouped keys; shape preserved:
    * dim-filtered fact aggregate → HAVING → semi-join into the supplier
    * dim). The qualifying-supplier set is tiny and broadcasts into the
    * semi-join.
    */
  def q20PromotionSuppliers(s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem").filter(
      col("l_shipdate") >= d("2000-01-01") && col("l_shipdate") < d("2001-01-01"))
    val pSmall = table(s, dir, "part")
      .filter(col("p_name").like("small%")).select("p_partkey")
    // pSmall (name-prefix part subset) and the qualifying-supplier set are
    // both data-dependent O(SF) relations — UNhinted, AQE-sized
    val qualifying = li
      .join(pSmall, li("l_partkey") === pSmall("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("shipped_qty"))
      .filter(col("shipped_qty") > 45.0)
      .select("l_suppkey").distinct()
    val su = table(s, dir, "supplier")
    val n = table(s, dir, "nation").filter(col("n_name").like("NATION_1%"))
    su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(qualifying, su("s_suppkey") === qualifying("l_suppkey"),
        "left_semi")
      .select("s_name", "s_acctbal")
      .orderBy("s_name")
  }

  private val q20Oracle = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name LIKE 'NATION_1%'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2001-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 45.0)
ORDER BY s_name
"""

  // ---------------------------------------------------------------- Q21
  /** Q21 suppliers who kept orders waiting: the hardest TPC-H shape — a
    * fact-table EXISTS *and* NOT EXISTS, both correlated on the same order
    * with a supplier-inequality (the missing receipt/commit dates are
    * replaced by "shipped >60 days after the order date"; the
    * double-correlated self-join shape is intact). Plan posture: the late
    * set is computed once and reused for both the base and the NOT EXISTS
    * side; EXISTS/NOT EXISTS become left-semi/left-anti self-joins on
    * l_orderkey, which co-partition with the base on the same key — one
    * shuffle family, no cartesian anywhere; supplier/nation broadcast.
    */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = table(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    // EXISTS/NOT EXISTS → ONE grouped pass over the order's lines: the
    // correlated subqueries only ask per-order questions ("another
    // supplier exists" / "no other supplier is late"), so a per-order
    // aggregate answers both — one shuffle on l_orderkey instead of three
    // self-joins scanning lineitem thrice (≈2× faster at bench SF, and at
    // 100 TB the saving is two full fact-table shuffles). The oracle keeps
    // the EXISTS form, so hash-equality PROVES the rewrite.
    //
    // collect_set, NOT countDistinct: two multi-column countDistincts plan
    // as Expand (3× the shuffle rows) + a second exchange on
    // (l_orderkey, l_suppkey, gid). Suppliers-per-order is tiny and bounded
    // (TPC-H ≈7 lines/order), so per-order sets keep partial aggregation
    // and the plan at exactly one fact exchange (pinned in PlanSpec).
    val perOrder = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .withColumn("is_late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .cast("int"))
      .groupBy("l_orderkey")
      .agg(
        size(collect_set(col("l_suppkey"))).as("n_supp"),
        size(collect_set(when(col("is_late") === 1, col("l_suppkey"))))
          .as("n_late_supp"),
        sum(col("is_late")).as("late_lines"),
        max(when(col("is_late") === 1, col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val su = table(s, dir, "supplier")
    val n = table(s, dir, "nation")
    perOrder.join(su, col("late_supp") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .groupBy("s_name")
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  private val q21Oracle = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

  val queries: Map[String, QueryDef] = Map(
    "q3_shipping_priority" -> QueryDef(q3ShippingPriority, Some(q3Oracle)),
    "q4_order_priority" -> QueryDef(q4OrderPriority, Some(q4Oracle)),
    "q5_local_supplier_volume" -> QueryDef(q5LocalSupplier, Some(q5Oracle)),
    "q7_volume_shipping" -> QueryDef(q7VolumeShipping, Some(q7Oracle)),
    "q8_market_share" -> QueryDef(q8MarketShare, Some(q8Oracle)),
    "q9_product_profit" -> QueryDef(q9ProductProfit, Some(q9Oracle)),
    "q10_returned_items" -> QueryDef(q10ReturnedItems, Some(q10Oracle)),
    "q12_priority_class" -> QueryDef(q12PriorityClass, Some(q12Oracle)),
    "q13_customer_distribution" -> QueryDef(q13CustomerDistribution, Some(q13Oracle)),
    "q15_top_supplier" -> QueryDef(q15TopSupplier, Some(q15Oracle)),
    "q16_parts_supplier" -> QueryDef(q16PartsSupplier, Some(q16Oracle)),
    "q17_small_quantity" -> QueryDef(q17SmallQuantity, Some(q17Oracle)),
    "q20_promotion_suppliers" -> QueryDef(q20PromotionSuppliers, Some(q20Oracle)),
    "q21_waiting_suppliers" -> QueryDef(q21WaitingSuppliers, Some(q21Oracle)),
    "q18_large_volume" -> QueryDef(q18LargeVolume, Some(q18Oracle)),
    "q22_dormant_balance" -> QueryDef(q22DormantBalance, Some(q22Oracle))
  )
}
