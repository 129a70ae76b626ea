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

  /** Skew-safe hot/cold split join — the salting pattern's *join* form: the
    * hot keys (here: users above the mean event count, found with one tiny
    * aggregate collected to the driver) take the broadcast path, everything
    * else takes the normal shuffle join; the union is the same relation the
    * naive join computes — which the oracle (the naive SQL join) proves.
    * At 100 TB this is how one viral user_id stops pinning a whole task:
    * its rows never shuffle at all.
    */
  def skewSplitJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Registry.events(s, dir).select("event_id", "user_id")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("u_events"))
    // one scalar to the driver (never the keys themselves): the hot cutoff
    val cutoff = dim.agg(avg("u_events")).first().getDouble(0) * 1.5
    val hotDim = dim.filter(col("u_events") > cutoff)   // heavy-hitter keys
    val coldDim = dim.filter(col("u_events") <= cutoff)
    // hot rows route through a broadcast join (no shuffle of the skewed
    // keys); cold rows take the ordinary shuffle join; anti-join against
    // the (tiny, broadcast) hot key set splits the stream
    val hot = ev.join(broadcast(hotDim), Seq("user_id"))
    val cold = ev
      .join(broadcast(hotDim.select("user_id")), Seq("user_id"), "left_anti")
      .join(coldDim, Seq("user_id"))
    hot.unionByName(cold)
      .select("event_id", "user_id", "u_events")
      .orderBy("event_id")
  }

  private val skewSplitJoinOracle = """
WITH dim AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS u_events
  FROM events GROUP BY user_id)
SELECT event_id, e.user_id, u_events
FROM events e JOIN dim ON e.user_id = dim.user_id
ORDER BY event_id
"""

  /** Incremental dedup — the steady-state shape of corpus ingestion: a new
    * batch (docs hashing to buckets 0-1, ~20%) is checked for near-dups
    * against the existing corpus (the rest) WITHOUT re-pairing the corpus
    * against itself. The inverted shingle index restricts the join to
    * (new × corpus) candidate pairs only — at 100 TB the corpus side is a
    * prebuilt index you join against, and the quadratic corpus×corpus term
    * never exists.
    *
    * Candidate generation is PREFIX-FILTERED (the SSJoin discipline of
    * `dedup_prefix_filter`, asymmetric form): a pair can reach Jaccard ≥
    * 0.8 only if the two sets share a shingle among each side's smallest
    * `n − ⌈4n/5⌉ + 1` shingles under ANY fixed global order — here the
    * shingle hash value itself, so the prefix is a `slice(array_sort)`
    * over the memoized per-doc arrays: no df join, no ranking window, no
    * extra shuffle before the (already ~5× thinner) posting join. The
    * order-theorem makes the filter LOSSLESS, so the oracle stays the
    * naive exact join and the hash gate certifies candidate completeness
    * (the `prefixJaccardOracle` pattern). Verification is exact
    * `array_intersect` over the candidate pairs.
    *
    * Why this shape: the r10-verdict 100× smoke measured the naive
    * posting join at 104 s isolated — 441 M posting-join rows fed a
    * pair-count aggregation whose shuffle dominated (77 s). On that
    * replica corpus the OUTPUT itself is ~8.5 M pairs (every doc sits in
    * a 100-member near-dup group — corpus construction, not plan
    * defect); the prefix join reaches the same relation through ~18 M
    * candidate rows instead of 441 M. Measured 104.1 s → 16.0 s isolated
    * at /tmp/sf10 with identical output (8 528 849 rows / xxhash64-fold
    * 5076132812360227445, both shapes — r14 notes §5); sf0.1 isolated
    * 1.02 → 0.71 s.
    */
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val bucket = SamplingOps.bucket10(col("doc_id"))
    // per-doc DISTINCT shingle arrays from the session-memoized base;
    // the new/corpus flag is pure doc_id arithmetic, no docs join
    val arrays = Dedup.shingleArrays(s, dir)
      .select(col("doc_id"), col("sh"), (bucket < 2).as("is_new"))
    // hash-order prefix: the (n − ⌈4n/5⌉ + 1) smallest shingle values
    val pre = arrays.select(col("doc_id"), col("is_new"),
      explode(expr(
        "slice(array_sort(sh), 1, size(sh) - ((size(sh)*4 + 4) div 5) + 1)"))
        .as("ss"))
    val cand = pre.filter(col("is_new"))
      .select(col("doc_id").as("new_id"), col("ss"))
      .join(pre.filter(!col("is_new"))
        .select(col("doc_id").as("corpus_id"), col("ss")), "ss")
      .select("new_id", "corpus_id").distinct()
    // exact verify: set intersection over the candidate pairs only
    cand
      .join(arrays.select(col("doc_id").as("new_id"), col("sh").as("sa")),
        "new_id")
      .join(arrays.select(col("doc_id").as("corpus_id"), col("sh").as("sb")),
        "corpus_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb")))
        .cast("long"))
      .select(col("new_id"), col("corpus_id"),
        (col("inter").cast("double")
          / (size(col("sa")) + size(col("sb")) - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy("new_id", "corpus_id")
  }

  private val incrementalDedupOracle = """
WITH sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(t[i:i+4], ' ')
                   for i in range(1, len(t) - 3)]) AS s,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      % 10 < 2 AS is_new
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 5),
ex AS (SELECT doc_id, is_new, unnest(s) AS ss FROM sh),
cand AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS inter
  FROM ex a JOIN ex b ON a.ss = b.ss AND a.is_new AND NOT b.is_new
  GROUP BY 1, 2),
sz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh)
SELECT new_id, corpus_id,
  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
FROM cand JOIN sz sa ON sa.doc_id = new_id JOIN sz sb ON sb.doc_id = corpus_id
WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
ORDER BY new_id, corpus_id
"""

  /** Sketch-pruned join — the explicit form of Spark's runtime bloom-filter
    * join pruning (the `InjectRuntimeFilter` rule, surfaced here as callable
    * `bloom_agg` / `bloom_might_contain` expressions so the pattern is
    * available when the optimizer's size thresholds or a non-join shape keep
    * the automatic rule out): the build side (urgent orders — a selective
    * dim subset) is folded into ONE ~100 KB bloom sketch, materialized as a
    * scalar on the driver (the same thing the rule's ScalarSubquery does —
    * `might_contain` requires a constant/scalar-subquery sketch by
    * contract) and probed as a scan-side filter on lineitem BEFORE the
    * shuffle join, so non-matching fact rows never enter the exchange.
    * False positives are removed by the exact join that follows, which is
    * why the oracle — the naive join — proves the optimized plan computes
    * the identical relation.
    *
    * 100 TB posture: a 10M-key build side is a ~12 MB sketch (1.2 bytes/key
    * at 1% FPP) vs gigabytes for the key set itself — broadcastable when a
    * broadcast-hash join is not — and the fact-side shuffle shrinks by the
    * join's selectivity (~80% here). The same sketch serves partition-level
    * pruning when the probe column is a layout key.
    */
  def bloomPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    // project to the join key alone (r14, guide §2.3): o_orderdate rode
    // through the 30M-row checkpoint and the join build at sf100 without a
    // single consumer — column pruning cannot reach inside a materialized
    // ExistingRDD, so dead columns must be dropped BEFORE the checkpoint
    val urgent = table(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // build: one binary sketch scalar, collected like the optimizer rule's
    // ScalarSubquery result — the SKETCH travels to the driver, never the
    // keys. Sized from the build side's measured cardinality (one cheap
    // count over the filtered dim): the r16 sf100 sweep caught the
    // previous bench-sized constants (100k keys / 800k bits) SATURATING at
    // 30M urgent keys — every probe answered true, zero pruning, and the
    // query ran the naive join plus per-row hash overhead (268 s; 0.76 s
    // at sf0.1 = 353×, the sweep's only super-linear line). 8 bits/key
    // ≈ 2% FPP; the 256M-bit (32 MB) cap keeps the scalar broadcastable —
    // beyond ~32M keys FPP degrades gracefully instead of the size blowing
    // up, and the exact join still removes every false positive.
    // BloomFilterAggregate clamps numItems/numBits to the session's
    // runtime.bloomFilter.maxNumItems/maxNumBits confs via Math.min —
    // GraftSession raises those ceilings to 32M/256M, but a caller-provided
    // vanilla session keeps Spark's 4M/64M defaults, under which an
    // unclamped 30M-key request would be silently cut to ~2 bits/key.
    // Clamp HERE to the effective conf values so the sizing claim (8
    // bits/key ≈ 2% FPP up to the cap) holds on any session, and the cap
    // in force is visible in the plan literals rather than applied
    // invisibly inside the aggregate. localCheckpoint materializes the
    // filtered dim once for the count + the sketch aggregation + the
    // final join (three consumers, one orders scan).
    val conf = s.sessionState.conf
    val maxItems = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    val urgentCp = urgent.localCheckpoint()
    val nKeys = math.min(maxItems, math.max(1L, urgentCp.count()))
    val bits = math.min(maxBits,
      math.min(256L << 20, math.max(800000L, nKeys * 8)))
    val sketch = urgentCp.agg(call_function("bloom_agg",
      xxhash64(col("o_orderkey")), lit(nKeys), lit(bits)).as("bf"))
      .first().getAs[Array[Byte]]("bf")
    val fact = table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_returnflag"))
    // probe: the constant sketch filters the scan before the join
    val pruned = fact.filter(call_function("bloom_might_contain",
      lit(sketch), xxhash64(col("l_orderkey"))))
    pruned.join(urgentCp, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(25, 2))).cast("double")
          .as("urgent_revenue"))
      .orderBy("l_returnflag")
  }

  private val bloomPrunedJoinOracle = """
SELECT l_returnflag, count(*) AS n_items,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE)
    AS urgent_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag ORDER BY l_returnflag
"""

  val queries: Map[String, QueryDef] = Map(
    "bloom_pruned_join" ->
      QueryDef(bloomPrunedJoin, Some(bloomPrunedJoinOracle)),
    "salted_skew_agg" -> QueryDef(saltedAgg, Some(saltedAggOracle)),
    "sql_correlated_subquery" -> QueryDef(sqlSurface, Some(sqlSurfaceOracle)),
    "skew_split_join" -> QueryDef(skewSplitJoin, Some(skewSplitJoinOracle)),
    "dedup_incremental_batch" ->
      QueryDef(incrementalDedup, Some(incrementalDedupOracle))
  )
}
