package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join/reshape/window forms that complete the relational surface beyond
  * round 1: full outer join, cross-join grid densification, wide→long
  * unpivot, and a time-RANGE window frame.
  */
object RelationalExtras {

  // --------------------------------------------------------- full outer join
  /** Per-nation count of high-balance customers FULL OUTER JOIN per-nation
    * supplier counts: either side may be missing a nation, and both
    * "unmatched left" and "unmatched right" rows must survive with nulls.
    * Both inputs are pre-aggregated (25 rows) — at scale this is the
    * aggregate-then-join shape (shuffle on the tiny nation key only), and
    * the join itself broadcasts.
    */
  def fullOuterNationBalance(s: SparkSession, dir: String): DataFrame = {
    val cust = Registry.table(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").cast("long").as("c_nation"))
      .agg(count(lit(1)).as("n_rich_customers"))
    val supp = Registry.table(s, dir, "supplier")
      .groupBy(col("s_nationkey").cast("long").as("s_nation"))
      .agg(count(lit(1)).as("n_suppliers"))
    cust.join(supp, cust("c_nation") === supp("s_nation"), "full_outer")
      .select(
        coalesce(col("c_nation"), col("s_nation")).as("nationkey"),
        col("n_rich_customers"), col("n_suppliers"))
      .orderBy("nationkey")
  }

  private val fullOuterOracle = """
WITH cust AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nation,
         CAST(count(*) AS BIGINT) AS n_rich_customers
  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
supp AS (
  SELECT CAST(s_nationkey AS BIGINT) AS s_nation,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM supplier GROUP BY 1)
SELECT coalesce(c_nation, s_nation) AS nationkey,
       n_rich_customers, n_suppliers
FROM cust FULL OUTER JOIN supp ON c_nation = s_nation
ORDER BY nationkey
"""

  // ------------------------------------------------------- cross-join grid
  /** Dense (nation × order-priority) grid of high-value order counts:
    * cross join builds the full key space, a left join + coalesce zero-fills
    * the combinations with no orders — the standard reporting densification.
    * Both grid sides are dimension-sized (≤ 25 × 5), so the cross join and
    * the probe join both broadcast; the only shuffle is the fact-side
    * aggregation.
    */
  def crossJoinGrid(s: SparkSession, dir: String): DataFrame = {
    val nations = Registry.table(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("nationkey"))
    val priorities = Registry.table(s, dir, "orders")
      .select(col("o_orderpriority").as("priority")).distinct()
    val actual = Registry.table(s, dir, "orders")
      .filter(col("o_totalprice") > 480000)
      .join(Registry.table(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"))
    nations.crossJoin(priorities)
      .join(actual, Seq("nationkey", "priority"), "left_outer")
      .select(col("nationkey"), col("priority"),
        coalesce(col("n"), lit(0L)).as("n_big_orders"))
      .orderBy("nationkey", "priority")
  }

  private val crossJoinGridOracle = """
WITH pr AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
actual AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_totalprice > 480000
  GROUP BY 1, 2)
SELECT CAST(n_nationkey AS BIGINT) AS nationkey, pr.priority,
       coalesce(n, 0) AS n_big_orders
FROM nation CROSS JOIN pr
LEFT JOIN actual
  ON actual.nationkey = CAST(n_nationkey AS BIGINT)
 AND actual.priority = pr.priority
ORDER BY 1, 2
"""

  // ------------------------------------------------------------- unpivot
  /** Wide→long reshape of the pricing summary: three measure columns become
    * (measure, value) rows via `Dataset.unpivot` — the relational MELT.
    * Exact decimal sums cast to double at the end (cross-engine rule).
    */
  def unpivotMeasures(s: SparkSession, dir: String): DataFrame = {
    val wide = Registry.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")
  }

  private val unpivotOracle = """
WITH wide AS (
  SELECT l_returnflag,
    sum(l_quantity) AS sum_qty,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
    CAST(sum(CAST(l_discount AS DECIMAL(25,2))) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide)
ORDER BY l_returnflag, measure
"""

  // ------------------------------------------------- RANGE window frame
  /** Per-user trailing 7-day sum/count over events via a RANGE frame on
    * epoch seconds — a *value*-bounded frame (every row within 604800s), not
    * a row-count frame; sliding aggregation that `window()` buckets can't
    * express per-row. Values summed as exact cents.
    */
  def rangeWindow7d(s: SparkSession, dir: String): DataFrame = {
    val base = Registry.events(s, dir).select(
      col("event_id"), col("user_id"),
      col("ts").cast("long").as("sec"),
      (col("value").cast(DecimalType(25, 2)) * 100).cast("long").as("cents"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-7L * 86400, Window.currentRow)
    base.select(col("event_id"), col("user_id"),
        sum("cents").over(w).as("win_cents"),
        count(lit(1)).over(w).as("n_win"))
      .orderBy("event_id")
  }

  private val rangeWindowOracle = """
WITH base AS (
  SELECT event_id, user_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
    CAST(CAST(value AS DECIMAL(25,2)) * 100 AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id,
  CAST(sum(cents) OVER w AS BIGINT) AS win_cents,
  CAST(count(*) OVER w AS BIGINT) AS n_win
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

  // ------------------------------------------ conditional-agg ratio (Q14)
  /** Promo revenue share over one shipping year — the TPC-H Q14 shape:
    * fact⋈dimension join with the filter pushed to the fact scan,
    * conditional aggregation, exact decimal sums, ONE double division at
    * the end. The part side is AQE-sized, NOT hinted: part SCALES with the
    * corpus (200M rows at 1000×), so a forced broadcast is the r15 defect
    * class — AQE still broadcasts it at bench SFs where it fits.
    */
  def promoRevenueRatio(s: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Registry.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .join(Registry.table(s, dir, "part").select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)), 4)
          .as("promo"),
        dsum(rev, 4).as("total"))
      .select(
        (lit(100.0) * col("promo") / col("total")).as("promo_revenue_pct"),
        col("promo").as("promo_revenue"),
        col("total").as("total_revenue"))
  }

  private val promoRevenueOracle = """
WITH f AS (
  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'),
a AS (
  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev
             ELSE CAST(0 AS DECIMAL(25,4)) END) AS promo,
         sum(rev) AS total
  FROM f)
SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)
         AS promo_revenue_pct,
       CAST(promo AS DOUBLE) AS promo_revenue,
       CAST(total AS DOUBLE) AS total_revenue
FROM a
"""

  // ------------------------------------------------ lead / nth_value window
  /** The navigation-function family the rank query doesn't cover: lead,
    * nth_value (explicit full frame — same trap as first/last), and the gap
    * to the next order in days. Output bounded to one customer slice so the
    * verified result stays small while the window shapes are exercised.
    */
  def leadNthWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Registry.table(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_day"),
        col("o_totalprice"),
        lead("o_totalprice", 1).over(w).as("next_price"),
        nth_value(col("o_totalprice"), 2).over(wFull).as("second_price"),
        datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate"))
          .cast("long").as("days_to_next"))
      .orderBy("o_custkey", "order_day", "o_orderkey")
  }

  private val leadNthOracle = """
SELECT o_custkey, o_orderkey,
  CAST(o_orderdate AS DATE) AS order_day,
  o_totalprice,
  lead(o_totalprice, 1) OVER w AS next_price,
  nth_value(o_totalprice, 2) OVER
    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    AS second_price,
  CAST(date_diff('day', o_orderdate,
                 lead(o_orderdate, 1) OVER w) AS BIGINT) AS days_to_next
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_day, o_orderkey
"""

  // --------------------------------------------------- equi-width histogram
  /** Equi-width histogram of order totals: `width_bucket` assigns bins at
    * scan speed (a pure expression — the histogram of 100 TB is one
    * map-side-combined aggregation, never a sort), count + exact decimal
    * mass per bin.
    */
  def histogramTotalprice(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "orders")
      .select(width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0),
        lit(10L)).as("bin"),
        col("o_totalprice"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("bin_mass"))
      .orderBy("bin")

  /** DuckDB has no width_bucket; the oracle mirrors Spark's formula
    * (bucket = floor(v / width) + 1 with width = (max-min)/n computed
    * first). width = 50000.0 is float-exact, so the two forms are the same
    * IEEE ops; the data contains no out-of-range values (pinned by the
    * count matching).
    */
  private val histogramOracle = """
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                 WHEN o_totalprice >= 500000.0 THEN 11
                 ELSE floor(o_totalprice / 50000.0) + 1 END AS BIGINT) AS bin,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS bin_mass
FROM orders GROUP BY 1 ORDER BY 1
"""

  // ------------------------------------------------------- interval join
  /** Batch interval join — each purchase matched to the same user's clicks
    * in the preceding 10 minutes (the batch twin of the stream-stream
    * interval join the streaming suite verifies). Equi-key + band
    * predicate: the shuffle is on user_id only, the time band filters
    * within the co-partitioned groups.
    */
  def intervalJoinPairs(s: SparkSession, dir: String): DataFrame = {
    val ev = Registry.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("interval 10 minutes"))
      .select(col("purchase_id"), col("click_id"))
      .orderBy("purchase_id", "click_id")
  }

  private val intervalJoinOracle = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
ORDER BY purchase_id, click_id
"""

  // -------------------------------------------------- forecast revenue (Q6)
  /** The TPC-H Q6 shape: a pure filter-aggregate whose predicates ALL push
    * to the scan (year band on shipdate, discount band, quantity cap) —
    * the plan is one scan + partial/final agg with zero joins and zero
    * wide shuffles; at 100 TB this query is I/O-bound by construction.
    * Exact decimal sum of price×discount, cast to double at the end.
    */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01" &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue_effect"),
        count(lit(1)).as("n_lineitems"))

  private val forecastRevenueOracle = """
SELECT
  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,4))) AS DOUBLE)
    AS revenue_effect,
  CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

  // ------------------------------------------- disjunctive-predicate join
  /** The TPC-H Q19 shape: an equi-join whose *residual* is a disjunction of
    * conjunction groups (brand × size-band × quantity-band alternatives).
    * Catalyst extracts the common `l_partkey = p_partkey` conjunct so the
    * join stays a hash join and only the OR-residual is evaluated per
    * matched row; a naive engine would fall back to a nested-loop over the
    * cross product. The part side is AQE-sized, NOT hinted: even after the
    * DeriveDisjunctiveDomains brand/size envelope thins the scan, the
    * surviving slice scales with the corpus (~tens of millions of rows at
    * 1000×) — AQE broadcasts it exactly when it fits.
    */
  def disjunctiveJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Registry.table(s, dir, "lineitem")
    val p = Registry.table(s, dir, "part")
    val groups =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 30))
    li.join(p, col("l_partkey") === col("p_partkey") && groups)
      .groupBy("p_brand")
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("p_brand")
  }

  private val disjunctiveJoinOracle = """
SELECT p_brand,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
       AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand ORDER BY p_brand
"""

  // ------------------------------------------------------ RFM segmentation
  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic warehouse scoring op: per customer, days since last order,
    * order count, and exact lifetime cents; each scored into quintiles
    * WITHIN the customer's market segment (the partitioned form — a global
    * ntile would funnel every customer through one task; per-segment
    * quintiles parallelize and are the analytically meaningful
    * comparison). Deterministic: every ntile orders by (metric, custkey).
    * One fact aggregation + one broadcast scalar + three windows over the
    * same segment partitioning (one exchange).
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * lit(100))
      .cast("long")
    val o = Registry.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        cents.as("wt"))
    val refDate = o.agg(max("d").as("ref"))
    val perCust = o.groupBy("o_custkey")
      .agg(max("d").as("last_d"), count(lit(1)).as("frequency"),
        sum("wt").as("monetary_cents"))
      .crossJoin(broadcast(refDate))
      .withColumn("recency_days", datediff(col("ref"), col("last_d")))
    def quintile(metric: Column): Column =
      ntile(5).over(Window.partitionBy("c_mktsegment")
        .orderBy(metric, col("o_custkey").asc)).cast("long")
    perCust
      .join(Registry.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_mktsegment"),
        col("recency_days").cast("long").as("recency_days"),
        col("frequency"), col("monetary_cents"),
        quintile(col("recency_days").asc).as("r_q"),
        quintile(col("frequency").desc).as("f_q"),
        quintile(col("monetary_cents").desc).as("m_q"))
      .orderBy("custkey")
  }

  private val rfmOracle = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
    CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS wt
  FROM orders),
ref AS (SELECT max(d) AS refd FROM o),
pc AS (
  SELECT o_custkey, max(d) AS last_d,
    count(*) AS frequency,
    CAST(sum(wt) AS BIGINT) AS monetary_cents
  FROM o GROUP BY o_custkey),
j AS (
  SELECT o_custkey AS custkey, c_mktsegment,
    CAST(date_diff('day', last_d, refd) AS BIGINT) AS recency_days,
    frequency, monetary_cents
  FROM pc CROSS JOIN ref JOIN customer ON c_custkey = o_custkey)
SELECT custkey, c_mktsegment, recency_days, frequency, monetary_cents,
  CAST(ntile(5) OVER (PARTITION BY c_mktsegment
    ORDER BY recency_days ASC, custkey ASC) AS BIGINT) AS r_q,
  CAST(ntile(5) OVER (PARTITION BY c_mktsegment
    ORDER BY frequency DESC, custkey ASC) AS BIGINT) AS f_q,
  CAST(ntile(5) OVER (PARTITION BY c_mktsegment
    ORDER BY monetary_cents DESC, custkey ASC) AS BIGINT) AS m_q
FROM j ORDER BY custkey
"""

  // ------------------------------------------------- market-basket lift
  /** Market-basket affinity between part brands: for every unordered brand
    * pair co-occurring in an order, support counts and the lift statistic
    * n_ab·N / (n_a·n_b). Pair generation is WITHIN-ORDER: one shuffle
    * groups the fact table into per-basket sorted brand sets, and the
    * unordered pairs come from a per-row array combination — baskets are
    * bounded (≤7 lineitems), so pairs stay linear in orders with no
    * self-join and no brand cross product. The lift threshold is decided
    * in exact integers (n_ab·N > n_a·n_b ⟺ lift > 1); the surfaced lift
    * is one IEEE division sequence. The checkpointed basket table feeds
    * margins, pairs and the order count without replaying the fact scan.
    */
  def basketBrandLift(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus shuffle (groupBy order key → distinct brand set per
    // basket), then pairs are generated per-row by array combination —
    // baskets are bounded, so no okey self-join and no second corpus
    // shuffle; the checkpointed basket table feeds margins, pairs and the
    // order count
    // NO broadcast hint on part: it SCALES with the corpus (20M rows at
    // the 1000x smoke — the forced broadcast was the r17 sweep's worst
    // line, 744 s with 93 s of GC churn building/shipping a multi-GB
    // driver-side hash relation). AQE broadcasts it at bench SFs and
    // shuffle-joins at scale — the r15 q3/q18 de-hinting discipline.
    val baskets = Registry.table(s, dir, "lineitem")
      .join(Registry.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .localCheckpoint()
    // the order count rides the plan as a broadcast 1-row scalar — no
    // separate driver action/job
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val margins = baskets.select(explode(col("bs")).as("brand"))
      .groupBy("brand").agg(count(lit(1)).as("n_b"))
    val pairs = baskets
      .select(explode(flatten(transform(col("bs"), (x, i) =>
        transform(slice(col("bs"), i + 2, size(col("bs"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("brand_a"), col("p.b").as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(margins.select(col("brand").as("brand_a"),
        col("n_b").as("n_a"))), "brand_a")
      .join(broadcast(margins.select(col("brand").as("brand_b"),
        col("n_b").as("n_bb"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .filter(col("n_ab") * col("n_orders") > col("n_a") * col("n_bb"))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        (col("n_ab").cast("double") * col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_bb").cast("double")))
          .as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  private val basketLiftOracle = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
m AS (SELECT brand, count(*) AS n_b FROM ob GROUP BY brand),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2)
SELECT brand_a, brand_b, n_ab,
  CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
    / (CAST(ma.n_b AS DOUBLE) * CAST(mb.n_b AS DOUBLE)) AS lift
FROM pairs
JOIN m ma ON ma.brand = brand_a
JOIN m mb ON mb.brand = brand_b
CROSS JOIN n
WHERE n_ab * n_orders > ma.n_b * mb.n_b
ORDER BY brand_a, brand_b
"""

  // ------------------------------------------------------- skyline operator
  /** 2-D skyline (Pareto frontier) of parts: the price/size points not
    * dominated by any other (cheaper-or-equal AND bigger-or-equal, one
    * strict). The classic OLAP operator, in its DISTRIBUTIVE form —
    * skyline(S) ⊆ ∪ᵢ skyline(partitionᵢ) for ANY partitioning — so phase 1
    * computes a local skyline per hash bucket (sort by price asc / size
    * desc, keep rows whose size exceeds the running max of all
    * strictly-preceding rows: over DISTINCT points that predicate is
    * exactly non-dominance) and only the few local survivors reach the
    * single-partition final pass. The global sort a naive skyline needs
    * never happens; the one unpartitioned window runs on the
    * bucket-skyline union, bounded by #buckets × local-frontier size (on
    * anti-correlated data a frontier can approach the input, at which
    * point the output itself is that large — the information floor, not
    * an implementation artifact). The DuckDB oracle is the quadratic
    * NOT-EXISTS dominance definition — an independent algorithm, so the
    * hash gate certifies the sort-based evaluation against the
    * definitional one. Output keyed by price alone (two frontier points
    * cannot share a price — the larger size would dominate), so every
    * ORDER BY is total: no tie class for a parallel engine to flap on.
    */
  def skylineParts(s: SparkSession, dir: String): DataFrame = {
    val pts = Registry.table(s, dir, "part")
      .groupBy(col("p_retailprice"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("bucket", pmod(hash(col("p_retailprice")), lit(32)))
    def frontier(w: org.apache.spark.sql.expressions.WindowSpec,
        df: DataFrame): DataFrame = {
      val mx = max(col("p_size")).over(
        w.orderBy(col("p_retailprice").asc, col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1))
      df.withColumn("mx", mx)
        .filter(col("mx").isNull || col("p_size") > col("mx"))
        .drop("mx")
    }
    val local = frontier(Window.partitionBy("bucket"), pts).drop("bucket")
    frontier(Window.partitionBy(), local)
      .select("p_retailprice", "p_size", "n_parts")
      .orderBy("p_retailprice")
  }

  /** Definitional dominance oracle — quadratic NOT EXISTS, deliberately
    * NOT the sort-based algorithm the engine runs.
    */
  private val skylineOracle = """
WITH pts AS (
  SELECT p_retailprice AS pr, p_size AS sz, count(*) AS n_parts
  FROM part GROUP BY 1, 2)
SELECT pr AS p_retailprice, sz AS p_size, n_parts
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.pr <= a.pr AND b.sz >= a.sz AND (b.pr < a.pr OR b.sz > a.sz))
ORDER BY p_retailprice
"""

  val queries: Map[String, QueryDef] = Map(
    "skyline_price_size" -> QueryDef(skylineParts, Some(skylineOracle)),
    "basket_brand_lift" -> QueryDef(basketBrandLift, Some(basketLiftOracle)),
    "rfm_customer_segments" -> QueryDef(rfmSegments, Some(rfmOracle)),
    "q19_disjunctive_join" ->
      QueryDef(disjunctiveJoin, Some(disjunctiveJoinOracle)),
    "q6_forecast_revenue" ->
      QueryDef(forecastRevenue, Some(forecastRevenueOracle)),
    "histogram_totalprice" ->
      QueryDef(histogramTotalprice, Some(histogramOracle)),
    "interval_join_clicks" ->
      QueryDef(intervalJoinPairs, Some(intervalJoinOracle)),
    "full_outer_nation_balance" ->
      QueryDef(fullOuterNationBalance, Some(fullOuterOracle)),
    "cross_join_grid" -> QueryDef(crossJoinGrid, Some(crossJoinGridOracle)),
    "unpivot_pricing_measures" -> QueryDef(unpivotMeasures, Some(unpivotOracle)),
    "window_range_7d" -> QueryDef(rangeWindow7d, Some(rangeWindowOracle)),
    "promo_revenue_ratio" ->
      QueryDef(promoRevenueRatio, Some(promoRevenueOracle)),
    "window_lead_nth" -> QueryDef(leadNthWindow, Some(leadNthOracle))
  )
}
