package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Array/map higher-order functions, null-handling scalars, collect-list
  * aggregation, and a theta (range) join — the remaining §2.8 scalar-function
  * families.
  */
object CollectionOps {
  import Registry.table

  // ------------------------------------------------- higher-order functions
  /** Higher-order battery over per-order lineitem arrays: collect_list →
    * transform / filter / exists / aggregate — the declarative form of
    * per-group imperative loops. sort_array gives the arrays a canonical
    * order so engines agree; sums are integral (exact).
    */
  def higherOrder(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qs"))
      .select(
        col("l_orderkey"),
        size(col("qs")).cast("long").as("n_items"),
        aggregate(col("qs"), lit(0L), _ + _).as("total_qty"),
        size(filter(col("qs"), _ > 25)).cast("long").as("n_large"),
        exists(col("qs"), _ === 50).as("has_max"),
        aggregate(transform(col("qs"), q => q * q), lit(0L), _ + _)
          .as("sum_sq"),
        element_at(col("qs"), 1).as("min_qty"),
        element_at(col("qs"), -1).as("max_qty"))
      .orderBy("l_orderkey")

  private val higherOrderOracle = """
WITH per_order AS (
  SELECT l_orderkey,
    list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
  FROM lineitem GROUP BY l_orderkey)
SELECT l_orderkey,
  CAST(len(qs) AS BIGINT) AS n_items,
  CAST(list_sum(qs) AS BIGINT) AS total_qty,
  CAST(len(list_filter(qs, q -> q > 25)) AS BIGINT) AS n_large,
  len(list_filter(qs, q -> q = 50)) > 0 AS has_max,
  CAST(list_sum(list_transform(qs, q -> q * q)) AS BIGINT) AS sum_sq,
  qs[1] AS min_qty,
  qs[-1] AS max_qty
FROM per_order ORDER BY l_orderkey
"""

  // ------------------------------------------------------------- map column
  /** Map construction + lookup: per-priority status→count map, then keyed
    * access. Output is exploded back to rows (map column ordering is not
    * portable; its *content* is).
    */
  def mapOps(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .groupBy("o_orderpriority")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderstatus"), col("n"))))).as("by_status"))
      .select(
        col("o_orderpriority"),
        coalesce(element_at(col("by_status"), "F"), lit(0L)).as("n_f"),
        coalesce(element_at(col("by_status"), "O"), lit(0L)).as("n_o"),
        size(col("by_status")).cast("long").as("n_statuses"))
      .orderBy("o_orderpriority")

  private val mapOpsOracle = """
SELECT o_orderpriority,
  coalesce(count(*) FILTER (o_orderstatus = 'F'), 0) AS n_f,
  coalesce(count(*) FILTER (o_orderstatus = 'O'), 0) AS n_o,
  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

  // ----------------------------------------------------------- null scalars
  /** Null-handling scalar battery (coalesce / nullif / nvl2-style / null
    * comparisons) over the lag column — the one naturally-null column in
    * the daily-bars derivation.
    */
  def nullHandling(s: SparkSession, dir: String): DataFrame = {
    val daily = Registry.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max_by(col("value"), col("ts")).as("close_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    daily
      .withColumn("prev_close", lag("close_value", 1).over(w))
      .select(
        col("user_id"), col("day"),
        coalesce(col("prev_close"), lit(-1.0)).as("prev_or_default"),
        nullif(col("close_value"), col("prev_close")).as("null_if_unchanged"),
        when(col("prev_close").isNull, "first").otherwise("later").as("day_kind"),
        col("prev_close").isNotNull.as("has_prev"),
        (col("prev_close") <=> col("close_value")).as("null_safe_eq"))
      .orderBy("user_id", "day")
  }

  private val nullHandlingOracle = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, max_by(value, ts) AS close_value
  FROM events GROUP BY 1, 2),
lagged AS (
  SELECT *, lag(close_value) OVER (PARTITION BY user_id ORDER BY day)
    AS prev_close
  FROM daily)
SELECT user_id, day,
  coalesce(prev_close, -1.0) AS prev_or_default,
  nullif(close_value, prev_close) AS null_if_unchanged,
  CASE WHEN prev_close IS NULL THEN 'first' ELSE 'later' END AS day_kind,
  prev_close IS NOT NULL AS has_prev,
  prev_close IS NOT DISTINCT FROM close_value AS null_safe_eq
FROM lagged ORDER BY user_id, day
"""

  // ------------------------------------------------------- theta/range join
  /** Theta (range) join: classify each order into a price band via an
    * inequality join against a derived band table. The band side is tiny →
    * broadcast nested loop, which is exactly the right physical plan; at
    * scale the alternative is a CASE ladder (shown by the oracle's
    * equivalence) or Bucketizer-style binning.
    */
  def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("tiny", 0.0, 50000.0), ("small", 50000.0, 150000.0),
      ("large", 150000.0, 300000.0), ("huge", 300000.0, 1e9))
      .toDF("band", "lo", "hi")
    table(s, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double")
          .as("band_revenue"))
      .orderBy("band")
  }

  private val rangeJoinBandsOracle = """
WITH bands(band, lo, hi) AS (VALUES
  ('tiny', 0.0, 50000.0), ('small', 50000.0, 150000.0),
  ('large', 150000.0, 300000.0), ('huge', 300000.0, 1e9))
SELECT band, count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS band_revenue
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band ORDER BY band
"""

  val queries: Map[String, QueryDef] = Map(
    "array_higher_order" -> QueryDef(higherOrder, Some(higherOrderOracle)),
    "map_column_ops" -> QueryDef(mapOps, Some(mapOpsOracle)),
    "null_handling" -> QueryDef(nullHandling, Some(nullHandlingOracle)),
    "range_join_bands" -> QueryDef(rangeJoinBands, Some(rangeJoinBandsOracle))
  )
}
