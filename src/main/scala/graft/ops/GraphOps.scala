package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics expressed as composed DataFrame plans — the
  * family that proves the engine can run fixed-point algorithms (PageRank,
  * label propagation, connected components) without leaving Catalyst: each
  * power iteration is a join + aggregate, the loop unrolls in the driver,
  * and AQE still optimizes every stage. `DedupClusters` holds the
  * label-propagation sibling; this module holds weighted PageRank.
  *
  * Cross-engine exactness: ranks live on an integer 1e-9 grid and edge
  * shares on an integer 1e-6 grid; every step is integer multiply +
  * integral division (`div` / DuckDB `//`), so three iterations produce
  * bit-identical longs in any engine — no float accumulation anywhere.
  */
object GraphOps {

  private val Scale = 1000000000L // rank mass = 1e9 units per graph

  /** Weighted PageRank (damping 0.85, 3 unrolled power iterations) over the
    * international trade graph: nations are nodes; an edge u→v carries the
    * lineitem revenue supplied by nation u to customers of nation v. Edge
    * building is the q7-shape star join (fact scan + broadcast dims) and
    * aggregates straight to the (25×25-bounded) edge list, so the fact
    * table is read ONCE and never shuffled by more than (u, v).
    *
    * Each iteration joins ranks to the out-going SHARE table (share =
    * w·1e6 div out-weight, dollar-granularity weights) and re-aggregates
    * per destination — at a 100 TB fact scale the iteration cost is
    * O(edges), independent of the corpus, because the heavy reduction
    * happened once at edge-build time. The 1e-6 share grid keeps every
    * product within int64 up to ~1e12 dollars of single-edge mass;
    * beyond that, coarsen the grid or lift shares to decimal.
    *
    * Rank mass: teleport = (15·Scale) div (100·N) to each node, 85% of
    * each node's rank distributed by share, and DANGLING mass (nodes with
    * no out-edges — at small SFs most nations have customers but no
    * suppliers) redistributed uniformly each step, the textbook
    * completion; without it the dangling nodes bleed the graph (73% of
    * mass gone in 3 iterations at sf0.001). Total mass is conserved up to
    * integral-division remainders (< 1e-4·Scale per step — the mass law in
    * Round5PropertySpec pins it). Deterministic; the oracle replays the
    * identical arithmetic.
    */
  def pagerankNations(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("l_extendedprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * 100).cast("long")
    val li = Registry.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), cents.as("c"))
    val sup = Registry.table(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").as("u"))
    val ord = Registry.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Registry.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("v"))
    // localCheckpoint AFTER the heavy reduction: every iteration (and the
    // share/out-weight/node derivations) re-reads the ≤625-row edge list
    // from memory instead of replaying the fact join per reference — the
    // fact table is scanned exactly once, which is the whole point of
    // separating edge-build from iteration at 100 TB. (Same lineage-cut
    // pattern as DedupClusters' label propagation.)
    val edges = li
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("u", "v").agg(sum("c").as("wc"))
      .withColumn("w6", expr("wc div 100"))
      .filter(col("w6") > 0)
      .localCheckpoint()
    // shares/nodes are ≤625/≤50 rows: checkpoint them too so the three
    // iterations don't re-derive the joins/distinct (each re-derivation is
    // a stage; on a tiny graph the stage COUNT is the whole cost), and
    // resolve the node count to a literal — N is part of the statistic's
    // definition, folding it removes two broadcast exchanges per iteration
    val outw = edges.groupBy("u").agg(sum("w6").as("wu")).localCheckpoint()
    val shares = edges.join(outw, "u")
      .withColumn("share", expr("(w6 * 1000000) div wu"))
      .select("u", "v", "share").localCheckpoint()
    val nodes = edges.select(col("u").as("nk"))
      .union(edges.select(col("v").as("nk"))).distinct().localCheckpoint()
    val nnV: Long = nodes.count()
    // 15·Scale with explicit L: int×int literals would overflow int32
    // under ANSI before any long promotion
    val teleport = s"${15 * Scale}L div ${100 * nnV}"
    var ranks = nodes.withColumn("r", lit(Scale / nnV)).select("nk", "r")
    for (_ <- 1 to 3) {
      val contribs = shares
        .join(ranks.select(col("nk").as("u"), col("r").as("ru")), "u")
        .withColumn("c", expr("(ru * share) div 1000000"))
        .groupBy("v").agg(sum("c").as("sc"))
      val dangling = ranks
        .join(outw.select(col("u").as("nk")), Seq("nk"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dg"))
      ranks = nodes.crossJoin(broadcast(dangling))
        .join(contribs.select(col("v").as("nk"), col("sc")), Seq("nk"),
          "left_outer")
        .withColumn("scn", coalesce(col("sc"), lit(0L)))
        .withColumn("r",
          expr(s"$teleport + (85 * scn) div 100 + (85 * dg) div ${100 * nnV}"))
        .select("nk", "r")
    }
    ranks
      .join(broadcast(Registry.table(s, dir, "nation")
        .select(col("n_nationkey").as("nk"), col("n_name"))), "nk")
      .select(col("n_name"), col("r").as("rank_scaled"),
        (col("r").cast("double") / 1e9).as("pagerank"))
      .orderBy(col("rank_scaled").desc, col("n_name"))
  }

  private val pagerankOracle = s"""
WITH edges AS (
  SELECT u, v, CAST(sum(c) AS BIGINT) // 100 AS w6
  FROM (
    SELECT s.s_nationkey AS u, cu.c_nationkey AS v,
      CAST(CAST(l.l_extendedprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer cu ON o.o_custkey = cu.c_custkey)
  GROUP BY u, v
  HAVING CAST(sum(c) AS BIGINT) // 100 > 0),
outw AS (SELECT u, CAST(sum(w6) AS BIGINT) AS wu FROM edges GROUP BY u),
shares AS (
  SELECT e.u, e.v, (e.w6 * 1000000) // o.wu AS share
  FROM edges e JOIN outw o ON e.u = o.u),
nodes AS (SELECT u AS nk FROM edges UNION SELECT v FROM edges),
tot AS (SELECT count(*) AS nn FROM nodes),
r0 AS (SELECT nk, $Scale // nn AS r FROM nodes CROSS JOIN tot),
d1 AS (
  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dg
  FROM r0 r WHERE r.nk NOT IN (SELECT u FROM outw)),
c1 AS (
  SELECT sh.v, CAST(sum((r.r * sh.share) // 1000000) AS BIGINT) AS sc
  FROM shares sh JOIN r0 r ON r.nk = sh.u GROUP BY sh.v),
r1 AS (
  SELECT n.nk,
    ${15 * Scale} // (100 * nn) + (85 * coalesce(c.sc, 0)) // 100
      + (85 * dg) // (100 * nn) AS r
  FROM nodes n CROSS JOIN tot CROSS JOIN d1 LEFT JOIN c1 c ON c.v = n.nk),
d2 AS (
  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dg
  FROM r1 r WHERE r.nk NOT IN (SELECT u FROM outw)),
c2 AS (
  SELECT sh.v, CAST(sum((r.r * sh.share) // 1000000) AS BIGINT) AS sc
  FROM shares sh JOIN r1 r ON r.nk = sh.u GROUP BY sh.v),
r2 AS (
  SELECT n.nk,
    ${15 * Scale} // (100 * nn) + (85 * coalesce(c.sc, 0)) // 100
      + (85 * dg) // (100 * nn) AS r
  FROM nodes n CROSS JOIN tot CROSS JOIN d2 LEFT JOIN c2 c ON c.v = n.nk),
d3 AS (
  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dg
  FROM r2 r WHERE r.nk NOT IN (SELECT u FROM outw)),
c3 AS (
  SELECT sh.v, CAST(sum((r.r * sh.share) // 1000000) AS BIGINT) AS sc
  FROM shares sh JOIN r2 r ON r.nk = sh.u GROUP BY sh.v),
r3 AS (
  SELECT n.nk,
    ${15 * Scale} // (100 * nn) + (85 * coalesce(c.sc, 0)) // 100
      + (85 * dg) // (100 * nn) AS r
  FROM nodes n CROSS JOIN tot CROSS JOIN d3 LEFT JOIN c3 c ON c.v = n.nk)
SELECT na.n_name, r3.r AS rank_scaled,
  CAST(r3.r AS DOUBLE) / 1e9 AS pagerank
FROM r3 JOIN nation na ON na.n_nationkey = r3.nk
ORDER BY rank_scaled DESC, n_name
"""

  val queries: Map[String, QueryDef] = Map(
    "graph_pagerank_nations" -> QueryDef(pagerankNations, Some(pagerankOracle))
  )
}
