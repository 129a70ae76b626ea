package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly and change-tracking operators a production training-data
  * pipeline runs after cleaning: heavy-hitter vocabulary extraction,
  * snapshot change classification (CDC), and token-budgeted sequence
  * packing.
  */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "documents")

  // ------------------------------------------------------- heavy hitters
  /** Exact heavy hitters: tokens occurring in more than 0.1% of all token
    * positions. The token aggregation is the classic map-side-combine
    * shape — partial counts per partition collapse the explode before the
    * shuffle, so shuffle volume is O(vocabulary), not O(corpus). The total
    * is a scalar joined in by cross-join (broadcast of one row); the
    * threshold compare stays in exact integers (cnt * 1000 > total).
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val ex = docs(s, dir).select(explode(split(col("text"), " ")).as("tok"))
    val counts = ex.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // total token positions = Σ counts: derived from the (vocabulary-sized)
    // aggregate, not a second pass over the corpus
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt") * 1000 > col("total"))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  private val heavyHittersOracle = """
WITH ex AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY tok)
SELECT tok, cnt FROM counts
WHERE cnt * 1000 > (SELECT count(*) FROM ex)
ORDER BY cnt DESC, tok
"""

  // ---------------------------------------------- vocabulary coverage curve
  private val CoverageRanks = Seq(1, 2, 5, 10, 20, 30)

  /** Cumulative vocabulary coverage curve: what share of all token
    * positions the top-r vocabulary entries cover, for a fixed rank grid —
    * the statistic that sizes a tokenizer vocabulary (the knee of this
    * curve is where extra vocab entries stop paying for themselves).
    *
    * Same map-side-combine reduction as [[heavyHitters]] (shuffle is
    * O(vocabulary)). The curve only needs the grid ranks — all ≤
    * `CoverageRanks.max` — so ranking NEVER touches the full vocabulary:
    * a distributed `TakeOrderedAndProject` keeps the global top
    * `CoverageRanks.max` tokens (each task retains at most that many
    * rows; the merge sees tasks × max rows), and rank + cumulative sum
    * resolve on that ≤-max-row set via a broadcast ≤-self-join — no
    * window operator at all, so nothing single-tasks regardless of
    * vocabulary size (Heaps' law growth included). Ties break on the
    * token itself so the rank order (and hence the curve) is total and
    * engine-independent. Each grid rank resolves to `min(r, |V|)` so the
    * curve saturates at 1.0 instead of dropping rows when the vocabulary
    * is smaller than the grid. Coverage is exact-int cumulative ÷
    * exact-int total — one IEEE division per row.
    */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val counts = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    // global top-k, k = CoverageRanks.max: plans as TakeOrderedAndProject
    // (per-partition heap of k, then a k·partitions merge) — the only
    // vocabulary-global step, and it is bounded by k, not |V|
    val top = counts.orderBy(col("cnt").desc, col("tok"))
      .limit(CoverageRanks.max)
    // rank + inclusive cumulative sum over the ≤ k survivors via a
    // broadcast ≤-join (k² pairs, k = 30): row b precedes-or-equals row a
    // in (cnt desc, tok asc) order ⇒ rk = count(b), cum = Σ cnt(b)
    val ranked = top.as("a")
      .join(broadcast(top.as("b")),
        col("b.cnt") > col("a.cnt") ||
          (col("b.cnt") === col("a.cnt") && col("b.tok") <= col("a.tok")))
      .groupBy(col("a.tok"), col("a.cnt"))
      .agg(count(lit(1)).as("rk"), sum(col("b.cnt")).as("cum"))
    val tot = counts.agg(sum("cnt").as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    val grid = s.range(1).select(
      explode(array(CoverageRanks.map(lit(_)): _*)).as("r"))
    grid.crossJoin(broadcast(tot))
      .join(ranked, col("rk") === least(col("r"), col("vocab_size")))
      .select(col("r").cast("long").as("rank"), col("cum").as("cum_tokens"),
        col("total_tokens"), col("vocab_size"),
        (col("cum").cast("double") / col("total_tokens").cast("double"))
          .as("coverage"))
      .orderBy("rank")
  }

  private val vocabCoverageOracle = s"""
WITH ex AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY tok),
ranked AS (
  SELECT tok, cnt,
    row_number() OVER (ORDER BY cnt DESC, tok) AS rk,
    CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM counts),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
    CAST(count(*) AS BIGINT) AS vocab_size
  FROM counts),
grid AS (SELECT unnest([${CoverageRanks.mkString(", ")}]) AS r)
SELECT CAST(g.r AS BIGINT) AS rank, rk.cum AS cum_tokens,
  t.total_tokens, t.vocab_size,
  CAST(rk.cum AS DOUBLE) / CAST(t.total_tokens AS DOUBLE) AS coverage
FROM grid g
CROSS JOIN tot t
JOIN ranked rk ON rk.rk = least(g.r, t.vocab_size)
ORDER BY rank
"""

  // -------------------------------------------------- MV join-delta rule
  /** Incremental maintenance of a JOIN materialized view — the delta rule
    * every MV refresh engine implements: for V = A ⋈ B aggregated, the
    * view delta after batch inserts ΔA/ΔB is
    * `ΔV = agg(ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB)` — equivalently, the join
    * rows where EITHER side is new. The view here is revenue per nation
    * over orders ⋈ customer; "new" rows are content-hash bucket 0 of 10
    * on each side's key (deterministic stand-ins for a delta feed).
    *
    * THE ORACLE PROVES THE ALGEBRA, not just the arithmetic: the engine
    * computes the incremental form (one pass over the join with the
    * either-side-new filter); the oracle computes `V_new − V_old` by FULL
    * RECOMPUTE of both snapshots. A hash match means the delta rule gave
    * bit-identical results to recomputation — the property an MV refresh
    * must guarantee. Output is anchored on all 25 nations (zero deltas
    * included) so both formulations agree on the row set.
    *
    * At scale the deltas arrive as separate files, so each term scans
    * only ΔA or ΔB joined against the other side (partition-pruned /
    * broadcast); recompute scans everything — that asymmetry is the whole
    * point of the rule. Exact cents; counts and sums only.
    */
  def mvJoinDelta(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * 100)
      .cast("long")
    val o = Registry.table(s, dir, "orders")
      .select(col("o_custkey"), cents.as("c"),
        (pmod(SamplingOps.hash60(col("o_orderkey")), lit(10)) === 0)
          .as("o_new"))
    val cst = Registry.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        (pmod(SamplingOps.hash60(col("c_custkey")), lit(10)) === 0)
          .as("c_new"))
    val delta = o
      // customer joins by AQE stats (scales with the corpus) — r15 audit
      .join(cst, col("o_custkey") === col("c_custkey"))
      .filter(col("o_new") || col("c_new")) // ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("delta_rows"), sum("c").as("delta_rev_cents"))
    Registry.table(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .join(broadcast(delta),
        col("n_nationkey") === col("c_nationkey"), "left_outer")
      .select(col("n_name"),
        coalesce(col("delta_rows"), lit(0L)).as("delta_rows"),
        coalesce(col("delta_rev_cents"), lit(0L)).as("delta_rev_cents"))
      .orderBy("n_name")
  }

  private val mvJoinDeltaOracle = """
WITH o AS (
  SELECT o_custkey,
    CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS c,
    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 10 = 0 AS o_new
  FROM orders),
cst AS (
  SELECT c_custkey, c_nationkey,
    CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 10 = 0 AS c_new
  FROM customer),
v_new AS (
  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS nr,
    CAST(sum(c) AS BIGINT) AS rev
  FROM o JOIN cst ON o_custkey = c_custkey
  GROUP BY 1),
v_old AS (
  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS nr,
    CAST(sum(c) AS BIGINT) AS rev
  FROM o JOIN cst ON o_custkey = c_custkey
  WHERE NOT o_new AND NOT c_new
  GROUP BY 1)
SELECT n.n_name,
  coalesce(vn.nr, 0) - coalesce(vo.nr, 0) AS delta_rows,
  coalesce(vn.rev, 0) - coalesce(vo.rev, 0) AS delta_rev_cents
FROM nation n
LEFT JOIN v_new vn ON vn.nk = n.n_nationkey
LEFT JOIN v_old vo ON vo.nk = n.n_nationkey
ORDER BY n_name
"""

  // --------------------------------------------------- CDC snapshot diff
  /** Snapshot change classification — the merge/CDC pattern: given an old
    * and a new snapshot of a keyed table, emit one row per key present in
    * either, classified INSERT / DELETE / UPDATE / UNCHANGED. Implemented
    * as one full outer join on the key with null-probes for presence — at
    * scale this is a single co-partitioned shuffle on the key (or zero
    * shuffle for bucketed snapshots).
    *
    * The two snapshots are derived deterministically from `customer` by
    * content hash (the testdata carries no real history): keys hashing to
    * bucket 0 exist only in the old snapshot (deletes), bucket 1 only in
    * the new (inserts), buckets 2-3 change their balance (updates).
    */
  def cdcSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Registry.table(s, dir, "customer").select(
      col("c_custkey"),
      pmod(conv(substring(md5(col("c_custkey").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(10)).as("bucket"),
      col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val oldSnap = base.filter(col("bucket") =!= 1)
      .select(col("c_custkey").as("o_key"), col("bal").as("o_bal"))
    val newSnap = base.filter(col("bucket") =!= 0)
      .select(col("c_custkey").as("n_key"),
        when(col("bucket").isin(2, 3), col("bal") + 100).otherwise(col("bal"))
          .as("n_bal"))
    oldSnap.join(newSnap, col("o_key") === col("n_key"), "full_outer")
      .select(
        coalesce(col("o_key"), col("n_key")).as("custkey"),
        when(col("o_key").isNull, "INSERT")
          .when(col("n_key").isNull, "DELETE")
          .when(col("o_bal") =!= col("n_bal"), "UPDATE")
          .otherwise("UNCHANGED").as("change"),
        col("o_bal").cast("double").as("old_bal"),
        col("n_bal").cast("double").as("new_bal"))
      .orderBy("custkey")
  }

  private val cdcSnapshotDiffOracle = """
WITH base AS (
  SELECT c_custkey,
    CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 10 AS bucket,
    CAST(c_acctbal AS DECIMAL(12,2)) AS bal
  FROM customer),
old_snap AS (
  SELECT c_custkey AS o_key, bal AS o_bal FROM base WHERE bucket != 1),
new_snap AS (
  SELECT c_custkey AS n_key,
    CASE WHEN bucket IN (2, 3) THEN bal + 100 ELSE bal END AS n_bal
  FROM base WHERE bucket != 0)
SELECT coalesce(o_key, n_key) AS custkey,
  CASE WHEN o_key IS NULL THEN 'INSERT'
       WHEN n_key IS NULL THEN 'DELETE'
       WHEN o_bal != n_bal THEN 'UPDATE'
       ELSE 'UNCHANGED' END AS change,
  CAST(o_bal AS DOUBLE) AS old_bal,
  CAST(n_bal AS DOUBLE) AS new_bal
FROM old_snap FULL OUTER JOIN new_snap ON o_key = n_key
ORDER BY custkey
"""

  // ---------------------------------------------------- sequence packing
  /** Token-budgeted sequence packing — assembling training sequences: docs
    * are laid out in deterministic hash order within each source shard and
    * greedily assigned to 4096-token bins by running token count (bin =
    * floor(cumulative_before / 4096); docs longer than the budget take
    * bins alone). Partitioned by `source`: the global-sort trap is avoided —
    * each shard packs independently, which is exactly how a 100 TB corpus
    * is packed (per input shard, never one global order). Output: per-bin
    * accounting per source.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val Budget = 4096L
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("source").orderBy(col("h").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"), h.as("h"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("bin", ((col("cum") - col("n_tokens")) / Budget)
        .cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("source", "bin")
  }

  private val packSequencesOracle = """
WITH d AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM documents),
c AS (
  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
    ORDER BY h ASC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM d)
SELECT source, (cum - n_tokens) // 4096 AS bin,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""

  /** SCD2 (slowly-changing-dimension type 2) build: collapse each
    * customer's order-priority timeline into versioned validity ranges —
    * keep only change points (lag ≠ current), then close each version with
    * the next change's date (`valid_to` null = current). Two stacked
    * windows over the same (custkey → date) partitioning, so Catalyst
    * plans ONE hash exchange for both; the classic warehouse op for
    * history tables, expressed with zero custom code.
    */
  def scd2PriorityHistory(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("o_custkey")
      .orderBy(col("valid_from"), col("o_orderkey"))
    val o = Registry.table(s, dir, "orders").select(
      col("o_custkey"), col("o_orderpriority").as("priority"),
      col("o_orderdate").cast("date").as("valid_from"), col("o_orderkey"))
    val changes = o
      .withColumn("prev", lag("priority", 1).over(byTime))
      .filter(col("prev").isNull || col("prev") =!= col("priority"))
    changes
      .withColumn("valid_to", lead("valid_from", 1).over(byTime))
      .withColumn("version", row_number().over(byTime))
      .withColumn("is_current", col("valid_to").isNull)
      .select("o_custkey", "version", "priority", "valid_from", "valid_to",
        "is_current")
      .orderBy("o_custkey", "version")
  }

  private val scd2Oracle = """
WITH o AS (
  SELECT o_custkey, o_orderpriority AS priority,
    CAST(o_orderdate AS DATE) AS valid_from, o_orderkey
  FROM orders),
chg AS (
  SELECT *, lag(priority) OVER (PARTITION BY o_custkey
                                ORDER BY valid_from, o_orderkey) AS prev
  FROM o),
v AS (SELECT * FROM chg WHERE prev IS NULL OR prev <> priority)
SELECT o_custkey,
  CAST(row_number() OVER w AS INT) AS version,
  priority, valid_from,
  lead(valid_from) OVER w AS valid_to,
  lead(valid_from) OVER w IS NULL AS is_current
FROM v
WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey)
ORDER BY o_custkey, version
"""

  /** Sequential conversion funnel over the event stream: users with a
    * view, then a click strictly after their first view, then a purchase
    * strictly after that click — each stage is a min-timestamp aggregate
    * semi-joined into the next (the relational form of funnel analysis; a
    * streaming deployment runs the same logic in
    * [[graft.streaming.EventStream]]'s stateful shape). Stage counts only
    * in the output — cross-engine timestamp round-trips are the
    * cookbook's no-go.
    */
  def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val e = Registry.events(s, dir).select("user_id", "event_type", "ts")
    val view = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val click = e.filter(col("event_type") === "click")
      .join(view, "user_id").filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val purchase = e.filter(col("event_type") === "purchase")
      .join(click, "user_id").filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    view.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_view"))
      .unionByName(click.agg(count(lit(1)).as("users"))
        .withColumn("stage", lit("2_click_after_view")))
      .unionByName(purchase.agg(count(lit(1)).as("users"))
        .withColumn("stage", lit("3_purchase_after_click")))
      .select("stage", "users")
      .orderBy("stage")
  }

  private val funnelOracle = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
  WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
UNION ALL
SELECT '2_click_after_view', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM p
ORDER BY stage
"""

  // --------------------------------------- incremental aggregate maintenance
  /** Incremental (materialized-view) aggregate maintenance: the per-priority
    * order stats are NOT recomputed from the full history — the pre-1997
    * "stored snapshot" partial aggregates (count / exact cent sum / min /
    * max, all algebraic) are merged with the partial aggregates of the new
    * delta by a full-outer join on the group key. At 100 TB this is THE
    * pattern for daily-refreshed aggregates: the base table is never
    * re-scanned (here both sides derive from one table only because the
    * testdata has no real history); the merge cost is O(groups). The oracle
    * recomputes from scratch — hash equality proves the merge algebra.
    */
  def incrementalSnapshotAgg(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * 100).cast("long")
    def partial(df: DataFrame, p: String): DataFrame =
      df.groupBy("o_orderpriority").agg(
        count(lit(1)).as(s"${p}_n"), sum(cents).as(s"${p}_cents"),
        min("o_totalprice").as(s"${p}_min"), max("o_totalprice").as(s"${p}_max"))
    val o = Registry.table(s, dir, "orders")
    val base = partial(o.filter(col("o_orderdate") < "1997-01-01"), "b")
    val delta = partial(o.filter(col("o_orderdate") >= "1997-01-01"), "d")
    base.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(
        col("o_orderpriority"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"),
        ((coalesce(col("b_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
          .cast("double") / 100).as("revenue"),
        least(col("b_min"), col("d_min")).as("min_price"),
        greatest(col("b_max"), col("d_max")).as("max_price"))
      .orderBy("o_orderpriority")
  }

  private val incrementalSnapshotAggOracle = """
SELECT o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT))
       AS DOUBLE) / 100 AS revenue,
  min(o_totalprice) AS min_price,
  max(o_totalprice) AS max_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

  // ------------------------------------------------- global shuffle shards
  /** Deterministic global corpus shuffle into training shards — the layout
    * step before sequence packing: every doc lands in shard
    * `hash(doc_id) mod 16` and is ordered WITHIN its shard by the same
    * content hash, giving a reproducible pseudorandom permutation with no
    * RNG state and no global sort (each shard orders independently — the
    * window partitions by shard, so at 100 TB this is one shuffle at
    * O(corpus keys), never a single-reducer order-by). The order-sensitive
    * checksum Σ position·doc_id proves BOTH the membership and the exact
    * within-shard order against the oracle — a set-equal-but-misordered
    * shard would hash-mismatch.
    */
  def shuffleShards(s: SparkSession, dir: String): DataFrame = {
    val h = SamplingOps.hash60(col("doc_id"))
    val w = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
    docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        h.as("h"), pmod(h, lit(16)).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"),
        sum(col("pos") * col("doc_id")).as("order_checksum"))
      .orderBy("shard")
  }

  private val shuffleShardsOracle = """
WITH d AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM documents),
p AS (
  SELECT *, h % 16 AS shard,
    CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
         AS BIGINT) AS pos
  FROM d)
SELECT shard, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
  CAST(sum(pos * doc_id) AS BIGINT) AS order_checksum
FROM p GROUP BY shard ORDER BY shard
"""

  // ------------------------------------------------ MV top-k maintenance
  /** Incremental maintenance of a TOP-K materialized view under
    * insert-only deltas — the leaderboard-refresh rule: the new top-k is
    * contained in `old-top-k ∪ Δ` (any row of the new top-k is either
    * newly inserted or already ranked ≤ k before — only valid WITHOUT
    * deletes, which is why retractable top-k needs the bigger machinery).
    * The view is the top 25 orders by (totalprice, orderkey); Δ is
    * content-hash bucket 0 of 10 ([[mvJoinDelta]]'s delta stand-in).
    *
    * THE ORACLE PROVES THE CONTAINMENT: the engine re-ranks only the
    * 25 + |Δ| candidate rows; the oracle ranks the FULL new snapshot. A
    * hash match certifies the maintenance rule end-to-end. At scale the
    * old top-k is stored view state (k rows) and only Δ is scanned; both
    * arms here end in TakeOrdered — no global sort of the base table.
    */
  def mvTopkMaintenance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * 100)
      .cast("long")
    val o = Registry.table(s, dir, "orders")
      .select(col("o_orderkey"), cents.as("price_cents"),
        (pmod(SamplingOps.hash60(col("o_orderkey")), lit(10)) === 0)
          .as("is_new"))
    val oldTop = o.filter(!col("is_new"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(25) // stored view state at scale; TakeOrdered here
    val wr = Window.orderBy(col("price_cents").desc, col("o_orderkey").asc)
    oldTop.union(o.filter(col("is_new")))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(25) // re-rank candidates only: 25 + |delta| rows
      .withColumn("rank", row_number().over(wr))
      .select(col("rank"), col("o_orderkey"), col("price_cents"),
        col("is_new"))
  }

  private val mvTopkOracle = """
SELECT CAST(row_number() OVER (ORDER BY price_cents DESC, o_orderkey ASC)
    AS BIGINT) AS rank,
  o_orderkey, price_cents, is_new
FROM (
  SELECT o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
      AS price_cents,
    CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 10 = 0 AS is_new
  FROM orders)
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT 25
"""

  val queries: Map[String, QueryDef] = Map(
    "mv_join_delta" -> QueryDef(mvJoinDelta, Some(mvJoinDeltaOracle)),
    "mv_topk_maintenance" ->
      QueryDef(mvTopkMaintenance, Some(mvTopkOracle)),
    "incremental_snapshot_agg" ->
      QueryDef(incrementalSnapshotAgg, Some(incrementalSnapshotAggOracle)),
    "global_shuffle_shards" -> QueryDef(shuffleShards, Some(shuffleShardsOracle)),
    "heavy_hitter_tokens" -> QueryDef(heavyHitters, Some(heavyHittersOracle)),
    "vocab_coverage_curve" ->
      QueryDef(vocabCoverage, Some(vocabCoverageOracle)),
    "cdc_snapshot_diff" -> QueryDef(cdcSnapshotDiff, Some(cdcSnapshotDiffOracle)),
    "pack_sequences_4k" -> QueryDef(packSequences, Some(packSequencesOracle)),
    "scd2_priority_history" -> QueryDef(scd2PriorityHistory, Some(scd2Oracle)),
    "funnel_conversion" -> QueryDef(funnelConversion, Some(funnelOracle))
  )
}
