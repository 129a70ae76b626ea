package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling — the reproducibility-critical half of a training
  * corpus pipeline. Random-number sampling (`df.sample`, TABLESAMPLE) is
  * nondeterministic across engines, partitionings and reruns; every operator
  * here keys the decision on a *content hash* instead, so the same row lands
  * in the same split on any engine, any cluster size, any day — and the
  * DuckDB oracle can verify the exact membership. The hash is the
  * cross-engine-portable 60-bit md5 prefix (same construction as the dedup
  * family).
  *
  * Scale posture: hash-splits are pure narrow maps over the scan (no
  * shuffle, no state, no sample-size coordination); the stratified quota is
  * one window per stratum — the shuffle is on the (tiny) stratum key, and
  * the per-stratum hash ordering gives a uniform "random" draw without RNG.
  */
object SamplingOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "documents")

  /** 60-bit md5-prefix hash of a column's string form — deterministic and
    * identical in Spark and DuckDB (`CAST('0x'||substr(md5(x),1,15) AS
    * BIGINT)`), non-negative. Shared by the sampling family and the corpus
    * pipeline composites. Evaluated by the fused codegen expression
    * [[graft.functions.Md5Prefix]] (r14 optimization, guide §4): the old
    * `conv(substring(md5(x),1,15),16,10) CAST LONG` chain paid four string
    * (de)allocations per row to extract 60 bits the digest already holds —
    * bit-identical by construction, and every hash-gated consumer's oracle
    * re-verifies that.
    */
  private[ops] def hash60(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Md5Prefix(
        org.apache.spark.sql.GraftSqlBridge.expr(c.cast("string")), 15))

  /** The shared decimal-bucket split (0-9) over [[hash60]]: `< 2` is the
    * "new batch" population every incremental pipeline (posting join,
    * MinHash index probe, semantic cells) and its laws must agree on —
    * one definition, so the split cannot silently diverge across them.
    */
  private[graft] def bucket10(c: Column): Column = pmod(hash60(c), lit(10))

  // -------------------------------------------------- train/val/test split
  /** Reproducible 80/10/10 train/val/test split of the corpus keyed on
    * `hash(doc_id) mod 100` — membership is a pure function of the row key,
    * so re-runs, engine swaps, and incremental appends never reshuffle
    * existing docs between splits. Reported as per-(source, split) counts.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(hash60(col("doc_id")), lit(100))
    val split = when(bucket < 80, "train").when(bucket < 90, "val")
      .otherwise("test")
    docs(s, dir)
      .select(col("source"), split.as("split"), col("n_chars"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source", "split")
  }

  private val hashSplitOracle = """
WITH b AS (
  SELECT source, n_chars,
    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
      AS bucket
  FROM documents)
SELECT source,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""

  // ------------------------------------------------- stratified quota draw
  /** Class-balanced downsampling: keep at most 10 docs per (lang, source)
    * stratum, chosen by hash order (a uniform deterministic draw — no RNG),
    * doc_id as the total-order tiebreak. The window shuffle is keyed on the
    * stratum, so skewed strata parallelize with AQE; the quota bounds output
    * per stratum regardless of input skew.
    */
  def stratifiedQuota(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(hash60(col("doc_id")).asc, col("doc_id").asc)
    docs(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  private val stratifiedQuotaOracle = """
WITH ranked AS (
  SELECT doc_id, lang, source,
    row_number() OVER (PARTITION BY lang, source
      ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               AS BIGINT) ASC, doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, lang, source FROM ranked WHERE rn <= 10 ORDER BY doc_id
"""

  // ------------------------------------------------------ bernoulli sample
  /** 5% deterministic Bernoulli sample of `orders` keyed on the order key —
    * the "peek at a fraction of 100 TB" pattern: membership is decided at
    * scan time by a pure expression (no shuffle, prunable, repeatable), and
    * downstream aggregates are exact over the sampled subset.
    */
  def bernoulliSample(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "orders")
      .filter(pmod(hash60(col("o_orderkey")), lit(100)) < 5)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(25,2)")).cast("double")
          .as("sum_price"))
      .orderBy("o_orderstatus")

  private val bernoulliSampleOracle = """
SELECT o_orderstatus,
  CAST(count(*) AS BIGINT) AS n_orders,
  -- VARCHAR hop (the neymanOracle discipline): DuckDB's direct
  -- decimal→double cast double-rounds past 2^53 cents where Spark's
  -- Decimal.toDouble is correctly rounded
  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS VARCHAR) AS DOUBLE)
    AS sum_price
FROM orders
WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
      % 100 < 5
GROUP BY 1 ORDER BY 1
"""

  // ---------------------------------------------- fixed-size reservoir draw
  /** Exact-k uniform sample without an RNG: keep the k orders with the
    * SMALLEST content-hash values — equivalent to a reservoir sample
    * (every subset of size k equally likely under the hash's uniformity)
    * but deterministic, rerun-stable, and mergeable: the union of two
    * shards' k-smallest sets contains the global k-smallest, so the plan
    * is per-partition top-k heaps + driver merge (`TakeOrdered`), no
    * shuffle of the data. The Bernoulli twin gives a fixed *rate*; this
    * gives a fixed *size* — the one you want for "show me exactly 50
    * rows of this 100 TB table".
    */
  def reservoirOrders(s: SparkSession, dir: String): DataFrame =
    Registry.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        hash60(col("o_orderkey")).as("draw"))
      .orderBy(col("draw").asc, col("o_orderkey").asc)
      .limit(50)

  private val reservoirOracle = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
    AS draw
FROM orders
ORDER BY draw ASC, o_orderkey ASC
LIMIT 50
"""

  private val PpsK = 100L // systematic draws

  /** Systematic probability-proportional-to-size (PPS) sampling — the
    * auditing/survey-sampling standard: lay the [[PpsK]] evenly spaced
    * selection points p_i = ((2i+1)·W) div (2k) over the cumulative-weight
    * axis (W = total order value in cents) and select every order whose
    * cumulative interval contains a point; heavy orders can be hit more
    * than once (multiplicity = their weight share times k). No RNG at all:
    * the draw is a pure function of the data, reproducible on rerun and
    * engine-portable because the hit count per row has the closed integer
    * form f(cum) − f(cum − w) with f(x) = clamp((2k·x + W − 1) div (2W),
    * 0, k). One window pass in key order + one broadcast scalar — no
    * per-row loop over the k points.
    */
  def systematicPps(s: SparkSession, dir: String): DataFrame = {
    // the global cumulative sum is a TWO-LEVEL prefix sum, never a global
    // single-partition window: within-bucket running sums parallelize over
    // deterministic key-range buckets (o_orderkey div 4096), and only the
    // per-bucket totals — thousands of rows at any SF — pass through the
    // unpartitioned offset window
    val cents = (col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * lit(100))
      .cast("long")
    val wIn = Window.partitionBy("bkt").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = Registry.table(s, dir, "orders")
      .select(col("o_orderkey"), cents.as("wt"))
      .withColumn("bkt", expr("o_orderkey div 4096"))
      .withColumn("cum_in", sum("wt").over(wIn))
    val wOff = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-bucket totals, built straight from the scan (NOT from the
    // windowed frame — ColumnPruning drops the unused window either way,
    // but writing it this way makes the shared subtree explicit): both the
    // offset window and the grand total below fold this one aggregate, so
    // AQE reuses its shuffle stage and neither pays a second orders pass
    val bucketTotals = Registry.table(s, dir, "orders")
      .select(col("o_orderkey"), cents.as("wt"))
      .withColumn("bkt", expr("o_orderkey div 4096"))
      .groupBy("bkt").agg(sum("wt").as("bw"))
    val offsets = bucketTotals
      .withColumn("off", coalesce(sum("bw").over(wOff), lit(0L)))
      .select("bkt", "off")
    val cum = inBucket.join(broadcast(offsets), "bkt")
      .withColumn("cum", col("cum_in") + col("off"))
    // W = max(cum) = the plain sum of all weights (weights are price cents,
    // strictly positive, so the cumulative sum is monotone and its max is
    // its last value). Folding the per-bucket totals — a few thousand rows
    // whose shuffle stage the offsets branch already materialized — instead
    // of max() OVER the windowed frame drops a full Sort+Window+join pass
    // over orders from the executed plan (r14, guide §2.4: the window
    // subtree re-ran under the total's aggregate — AQE reused only the
    // shuffle write, not the sort/window work above it. A standalone
    // orders-scan aggregate was measured first and REJECTED: the fresh
    // scan cost more at the 100× corpus than the sort+window it saved).
    val tot = bucketTotals.agg(sum("bw").as("bigw"))
    // decimal(38,0) for the 2k·cum product: at ~2.2e13 cents/SF the int64
    // form overflows near sf 2000 (ANSI throw / silent wrap vs DuckDB's
    // overflow error — engines could not even disagree gracefully);
    // decimal keeps the closed form exact to any conceivable W and `div`
    // still returns the integral long
    cum.crossJoin(broadcast(tot))
      .withColumn("f_hi", greatest(lit(0L), least(lit(PpsK),
        expr(s"(2 * $PpsK * CAST(cum AS DECIMAL(38,0)) + bigw - 1)" +
          " div (2 * bigw)"))))
      .withColumn("f_lo", greatest(lit(0L), least(lit(PpsK),
        expr(s"(2 * $PpsK * (CAST(cum AS DECIMAL(38,0)) - wt) + bigw - 1)" +
          " div (2 * bigw)"))))
      .withColumn("hits", col("f_hi") - col("f_lo"))
      .filter(col("hits") > 0)
      .select(col("o_orderkey"), col("wt"), col("hits"))
      .orderBy("o_orderkey")
  }

  private val systematicPpsOracle = s"""
WITH c AS (
  SELECT o_orderkey,
    CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT) AS wt,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT))
      OVER (ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum
  FROM orders),
t AS (SELECT max(cum) AS bigw FROM c),
h AS (
  -- HUGEINT product, mirroring the engine's decimal(38,0) lift
  SELECT o_orderkey, wt,
    CAST(greatest(0, least($PpsK,
      (2 * $PpsK * CAST(cum AS HUGEINT) + bigw - 1) // (2 * bigw))) -
    greatest(0, least($PpsK,
      (2 * $PpsK * (CAST(cum AS HUGEINT) - wt) + bigw - 1) // (2 * bigw)))
      AS BIGINT) AS hits
  FROM c CROSS JOIN t)
SELECT o_orderkey, wt, hits FROM h WHERE hits > 0 ORDER BY o_orderkey
"""

  // ------------------------------------------------- k-center coreset
  private val CoresetPicks = 4 // greedy picks after the vec_id-0 seed

  /** Greedy k-center coreset over `embeddings` — farthest-point traversal,
    * the classic diverse-subset selector for data-efficient training
    * (each pick is the vector farthest from everything already chosen, so
    * k+1 points cover the corpus with the minimax radius up to factor 2).
    *
    * Determinism is total: distances are EXACT int64 squared-L2 on the
    * 1e-6 quantized grid (`‖a‖² + ‖b‖² − 2⟨a,b⟩`, the Similarity kernel —
    * no floats anywhere in this query), the seed is vec_id 0, and argmax
    * ties break on the smaller vec_id. Each of the [[CoresetPicks]]
    * unrolled rounds is one map over the corpus against the BROADCAST
    * newest pick + a global top-1 (TakeOrdered): the standard incremental
    * farthest-point traversal keeps a RUNNING (vec_id, d2) min-distance
    * frame and folds in only the newest pick — min over exact int64
    * distances is associative, so this is bit-identical to recomputing
    * against the whole chosen set (which the oracle deliberately does:
    * two different evaluation strategies, one hash) while doing n dots
    * per round, O(n·k) total, instead of the recompute form's O(n·k²).
    * No shuffle of the corpus; the same driver-unrolled fixed-point shape
    * as [[GraphOps.pagerankNations]]. `sel_dist2` is each pick's distance
    * to the set at selection time (the radius sequence, decreasing by
    * construction); the seed reports 0.
    */
  def kcenterCoreset(s: SparkSession, dir: String): DataFrame = {
    val corpus = Similarity.quantized(s, dir)
      .select(col("vec_id"), col("qv"), col("nrm"))
      .localCheckpoint() // consumed once per round: cut the scan lineage
    var chosen = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("qv"), col("nrm"), lit(0L).as("sel_dist2"),
        lit(0L).as("pick"))
      .localCheckpoint()
    // exact squared-L2 of every corpus point to ONE broadcast pick
    def distTo(pick: DataFrame): DataFrame = corpus
      .crossJoin(broadcast(pick.select(col("qv").as("cqv"),
        col("nrm").as("cnrm"))))
      .select(col("vec_id"),
        (col("nrm") + col("cnrm") -
          lit(2L) * call_function("vec_dot_long", col("qv"), col("cqv")))
          .as("d2"))
    var minD = distTo(chosen).localCheckpoint()
    for (k <- 1 to CoresetPicks) {
      val next = minD
        .orderBy(col("d2").desc, col("vec_id").asc).limit(1)
        .join(corpus.withColumnRenamed("vec_id", "nv"),
          col("vec_id") === col("nv"))
        .select(col("vec_id"), col("qv"), col("nrm"),
          col("d2").as("sel_dist2"), lit(k.toLong).as("pick"))
        .localCheckpoint() // feeds both the union and the min-fold
      chosen = chosen.union(next).localCheckpoint()
      if (k < CoresetPicks)
        minD = minD.join(distTo(next).withColumnRenamed("d2", "nd2"),
            "vec_id")
          .select(col("vec_id"), least(col("d2"), col("nd2")).as("d2"))
          .localCheckpoint()
    }
    chosen.select(col("pick"), col("vec_id"), col("sel_dist2"))
      .orderBy("pick")
  }

  /** Chained-CTE oracle: each greedy round re-derives the min-distance
    * table from the union of all previous picks and takes the same
    * (d2 DESC, vec_id ASC) top-1 — generated from the same round count so
    * the engines cannot drift.
    */
  private val kcenterOracle: String = {
    val steps = (1 to CoresetPicks).map { k =>
      val prev = (0 until k).map(i => s"SELECT * FROM p$i").mkString(
        "(", " UNION ALL ", ")")
      s"""d$k AS (
  SELECT v.vec_id, min(v.nrm + c.nrm - 2 * CAST(list_sum(
    list_transform(range(1, 65), t -> v.qv[t] * c.qv[t])) AS BIGINT)) AS d2
  FROM nn v, $prev c
  GROUP BY v.vec_id),
p$k AS (
  SELECT nn.vec_id, nn.qv, nn.nrm, d.d2 AS sel_dist2, $k AS pick
  FROM d$k d JOIN nn ON nn.vec_id = d.vec_id
  ORDER BY d.d2 DESC, d.vec_id ASC LIMIT 1)"""
    }.mkString(",\n")
    s"""
WITH n AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings),
nn AS (
  SELECT vec_id, qv,
    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
  FROM n),
p0 AS (
  SELECT vec_id, qv, nrm, CAST(0 AS BIGINT) AS sel_dist2, 0 AS pick
  FROM nn WHERE vec_id = 0),
$steps
SELECT CAST(pick AS BIGINT) AS pick, vec_id, sel_dist2
FROM (${(0 to CoresetPicks).map(i => s"SELECT * FROM p$i")
        .mkString(" UNION ALL ")})
ORDER BY pick
"""
  }

  // ------------------------------------------------- Neyman allocation
  /** Optimal (Neyman) allocation of a fixed sampling budget across strata —
    * the survey-sampling rule `n_h ∝ N_h·S_h` that a corpus builder uses to
    * size per-source annotation / eval draws: big AND high-variance strata
    * get more budget. Strata are order priorities; S_h is the exact-power-
    * sum sample stddev of the cent totals ([[StatsOps.moments]] discipline,
    * so the only doubles are one sqrt + fixed-order arithmetic). The
    * integer allocations use the LARGEST-REMAINDER method: floor the ideal
    * shares, then hand the leftover units to the largest fractional parts
    * (ties by stratum name) — allocations are exact integers that sum to
    * the budget BY CONSTRUCTION, certified by the oracle.
    *
    * Scale shape: one map-side-combined pass over the fact produces 5
    * power-sum rows; the Σ N·S normalizer is the fixed-order fold (the
    * [[CurriculumOps.temperatureMix]] trick) and every window below runs
    * on the 5-row stratum table.
    */
  def neymanAllocation(s: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val cents = (col("o_totalprice")
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * 100)
      .cast("long")
    val strata = Registry.table(s, dir, "orders")
      .select(col("o_orderpriority").as("stratum"), cents.as("c"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("nh"),
        dsum(col("c"), 0).as("sx"),
        dsum(col("c") * col("c"), 0).as("sxx"))
      .withColumn("sh", when(col("nh") > 1, sqrt(
        (col("sxx") - col("sx") * col("sx") / col("nh").cast("double"))
          / (col("nh").cast("double") - lit(1.0)))))
      // a single-row stratum has undefined stddev: weight 0 (no budget),
      // not a NaN that would poison the Σ N·S normalizer fold
      .withColumn("w",
        coalesce(col("nh").cast("double") * col("sh"), lit(0.0)))
    val norm = strata.agg(
      aggregate(
        sort_array(collect_list(struct(col("stratum"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("z"))
    val ideal = strata.crossJoin(broadcast(norm))
      .withColumn("ideal", col("w") / col("z") * lit(budget.toDouble))
      .withColumn("base", floor(col("ideal")).cast("long"))
      .withColumn("rem", col("ideal") - col("base").cast("double"))
    val wR = Window.orderBy(col("rem").desc, col("stratum").asc) // 5 rows
    ideal
      .withColumn("leftover",
        lit(budget) - sum("base").over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .withColumn("rk", row_number().over(wR))
      .select(col("stratum"), col("nh"), col("sh").as("stddev_cents"),
        col("ideal"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("stratum")
  }

  private val neymanOracle = """
WITH strata AS (
  SELECT o_orderpriority AS stratum, CAST(count(*) AS BIGINT) AS nh,
    CAST(CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
      AS DECIMAL(30,0))) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
      * CAST(CAST(o_totalprice AS DECIMAL(30,2)) * 100 AS BIGINT)
      AS DECIMAL(30,0))) AS VARCHAR) AS DOUBLE) AS sxx
  FROM orders GROUP BY 1),
wtd AS (
  SELECT stratum, nh,
    CASE WHEN nh > 1 THEN
      sqrt((sxx - sx * sx / CAST(nh AS DOUBLE))
           / (CAST(nh AS DOUBLE) - 1.0)) END AS sh,
    coalesce(CAST(nh AS DOUBLE)
      * CASE WHEN nh > 1 THEN
          sqrt((sxx - sx * sx / CAST(nh AS DOUBLE))
               / (CAST(nh AS DOUBLE) - 1.0)) END, 0.0) AS w
  FROM strata),
norm AS (
  SELECT list_reduce(list_prepend(0.0, list(w ORDER BY stratum)),
                     (acc, x) -> acc + x) AS z
  FROM wtd),
ideal AS (
  SELECT stratum, nh, sh, w / z * 1000.0 AS ideal,
    CAST(floor(w / z * 1000.0) AS BIGINT) AS base,
    w / z * 1000.0 - floor(w / z * 1000.0) AS rem
  FROM wtd, norm),
ranked AS (
  SELECT *,
    1000 - CAST(sum(base) OVER () AS BIGINT) AS leftover,
    row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rk
  FROM ideal)
SELECT stratum, nh, sh AS stddev_cents, ideal,
  base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
FROM ranked ORDER BY stratum
"""

  // ------------------------------------------------------ priority sampling
  private val PriorityK = 200

  /** Priority sampling (Duffield–Lund–Thorup): weight-proportional
    * sampling WITHOUT replacement — each order draws priority
    * q = w / u with u uniform on (0, 1], and the sample is the top-k by
    * q; with τ the (k+1)-th priority, max(w, τ) is the unbiased
    * Horvitz–Thompson-style weight estimator. The classic scheme for
    * weighted data mixing (sample shards proportional to token budgets)
    * where [[reservoirOrders]] is uniform and [[systematicPps]] is
    * fixed-skip PPS.
    *
    * Every quantity is an exact 64-bit integer, bit-identical across
    * engines: u = (48-bit md5 hash of the key) + 1 — so the same row
    * draws the same priority on any engine, rerun, or append — and the
    * sort key is the scaled integer quotient w·10¹⁰ div u (w ≤ 5·10⁷
    * cents keeps the product ≤ 5·10¹⁷, long-safe; the monotone scaling
    * preserves the exact priority order up to floor ties, which the
    * orderkey tiebreak settles deterministically — measured: the top-250
    * boundary is tie-free at sf0.1). Scale: TakeOrdered top-k, no global
    * sort, no shuffle beyond the k winners.
    */
  /** The ONE definition of the priority arithmetic, shared by both batch
    * queries AND the streaming twin (`EventStream.prioritySampleTws`
    * projects these columns BEFORE its stateful operator, so stream/batch
    * parity holds by construction instead of by a hand-maintained JVM
    * reproduction of Spark's double→decimal cast semantics).
    * Input: any frame with `keyCol` + `weightCol`; output columns:
    * keyCol (verbatim), w_cents, priority_key.
    */
  private[graft] def withPriorityKey(df: DataFrame, keyCol: String,
      weightCol: String): DataFrame = {
    val cents = (col(weightCol)
      .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * lit(100))
      .cast("long")
    // 48-bit md5 prefix via the same fused expression as [[hash60]]
    val u = (org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.Md5Prefix(org.apache.spark.sql.GraftSqlBridge.expr(
        col(keyCol).cast("string")), 12)) + 1).as("u")
    df.select(col(keyCol), cents.as("w_cents"), u)
      .withColumn("priority_key", expr("w_cents * 10000000000L div u"))
      .drop("u")
  }

  /** Shared top-k + rank presentation over [[withPriorityKey]] output. */
  private def priorityTopK(keyed: DataFrame, keyCol: String): DataFrame =
    keyed
      .orderBy(col("priority_key").desc, col(keyCol).asc)
      .limit(PriorityK)
      // rank resolves on the k winners only (bounded global window)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("priority_key").desc, col(keyCol).asc))
        .cast("long"))
      .select("rank", keyCol, "w_cents", "priority_key")
      .orderBy("rank")

  /** Shared oracle template — table/key/weight are the only variation. */
  private def priorityOracleSql(table: String, keyCol: String,
      weightExpr: String): String = s"""
WITH base AS (
  SELECT $keyCol,
    CAST(CAST($weightExpr AS DECIMAL(25,2)) * 100 AS BIGINT) AS w_cents,
    CAST('0x' || substr(md5(CAST($keyCol AS VARCHAR)), 1, 12) AS BIGINT)
      + 1 AS u
  FROM $table),
keyed AS (
  SELECT $keyCol, w_cents,
    CAST((w_cents * 10000000000) // u AS BIGINT) AS priority_key
  FROM base)
SELECT CAST(row_number() OVER (ORDER BY priority_key DESC, $keyCol ASC)
    AS BIGINT) AS rank,
  $keyCol, w_cents, priority_key
FROM keyed
ORDER BY priority_key DESC, $keyCol ASC
LIMIT $PriorityK
"""

  def priorityPps(s: SparkSession, dir: String): DataFrame =
    priorityTopK(withPriorityKey(Registry.table(s, dir, "orders"),
      "o_orderkey", "o_totalprice"), "o_orderkey")

  private val priorityPpsOracle =
    priorityOracleSql("orders", "o_orderkey", "o_totalprice")

  /** [[priorityPps]] over the events stream's weights (value cents) —
    * the batch twin of `EventStream.prioritySampleTws`, which maintains
    * the same top-k as sharded bounded state while events arrive
    * (StreamingSpec asserts parity — and the stream projects its entries
    * through the SAME [[withPriorityKey]] columns, so the arithmetic
    * cannot diverge). Event values are ≤ ~5·10⁴ cents so the scaled
    * product is far inside long range.
    */
  def priorityEvents(s: SparkSession, dir: String): DataFrame =
    priorityTopK(withPriorityKey(Registry.events(s, dir),
      "event_id", "value"), "event_id")

  private val priorityEventsOracle =
    priorityOracleSql("events", "event_id", "value")

  val queries: Map[String, QueryDef] = Map(
    "sample_priority_events" ->
      QueryDef(priorityEvents, Some(priorityEventsOracle)),
    "sample_priority_pps" -> QueryDef(priorityPps, Some(priorityPpsOracle)),
    "sample_neyman_allocation" ->
      QueryDef(neymanAllocation, Some(neymanOracle)),
    "sample_kcenter_coreset" ->
      QueryDef(kcenterCoreset, Some(kcenterOracle)),
    "sample_systematic_pps" ->
      QueryDef(systematicPps, Some(systematicPpsOracle)),
    "sample_reservoir_orders" ->
      QueryDef(reservoirOrders, Some(reservoirOracle)),
    "sample_hash_split" -> QueryDef(hashSplit, Some(hashSplitOracle)),
    "sample_stratified_quota" ->
      QueryDef(stratifiedQuota, Some(stratifiedQuotaOracle)),
    "sample_bernoulli_orders" ->
      QueryDef(bernoulliSample, Some(bernoulliSampleOracle))
  )
}
