package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-11 laws.
  *
  * Count-Min heavy hitters (`stats_cms_heavyhitters`, the registry's
  * fourth deliberate rows-only entry): the sketch's defining guarantees
  * stand in for the cross-engine hash gate, checked against the exact
  * hash-checked postings the query itself carries:
  *   1. never-underestimate — a CMS point query is a min over counters
  *      that each received every occurrence of the item, so
  *      est ≥ exact always;
  *   2. the ε·N overestimate band — est ≤ exact + ε·N with
  *      ε = 2/width; probabilistic in general, deterministic here where
  *      the vocabulary (≲100 distinct terms) is far below the 2048-wide
  *      counter rows, so collisions cannot stack N;
  *   3. merge losslessness — the per-source-merged sketch is
  *      BYTE-identical to the single global sketch (counter addition over
  *      identical dims is exact), surfaced by the query as the
  *      `merged_equals_global` column.
  *
  * Hard-negative mining (`ann_hard_negatives`) is fully hash-gated by its
  * DuckDB oracle; the law here pins the candidate bound that the oracle
  * cannot see: the pool is exactly `NegPoolSize` rows, so per-anchor work
  * is O(|pool|) by construction.
  */
class Round11PropertySpec extends SparkSpec {

  test("cms heavy hitters: never-underestimate, ε·N band, lossless merge") {
    val out = ops.StatsOps.cmsHeavyHitters(spark, sfDir).collect()
    assert(out.length == 20)
    val totalOcc = ops.TextOps.termTf(spark, sfDir)
      .agg(sum("tf")).collect().head.getLong(0)
    val epsN = math.ceil(2.0 / 2048 * totalOcc).toLong
    out.foreach { case Row(term: String, exact: Long, est: Long, merged: Boolean) =>
      assert(est >= exact, s"CMS underestimated '$term': est=$est < exact=$exact")
      assert(est <= exact + epsN,
        s"'$term' outside the ε·N band: est=$est exact=$exact epsN=$epsN")
      assert(merged, "merged per-source sketch != global sketch bytes")
    }
  }

  test("cms estimates cover EVERY term, not just the top-20 frame") {
    // point-query the merged sketch for the full vocabulary: the laws must
    // hold off the heavy-hitter path too (the top-20 frame is presentation,
    // not a soundness boundary)
    graft.functions.VectorFunctions.register(spark)
    val tf = ops.TextOps.termTf(spark, sfDir)
    val sk = tf.agg(
      call_function("cms_sketch_2048", col("term"), col("tf")).as("sk"))
    val exact = tf.groupBy("term").agg(sum("tf").as("exact_occ"))
    val rows = exact.crossJoin(broadcast(sk))
      .select(col("term"), col("exact_occ"),
        call_function("cms_estimate", col("sk"), col("term")).as("est_occ"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case Row(term: String, ex: Long, est: Long) =>
      assert(est >= ex, s"CMS underestimated '$term': $est < $ex")
    }
  }

  test("hard negatives: every negative comes from the fixed 64-row pool") {
    val out = ops.Similarity.hardNegatives(spark, sfDir)
    val poolIds = Registry.table(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .orderBy(col("h"), col("vec_id")).limit(64)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val negIds = out.select("neg_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(negIds.nonEmpty && negIds.subsetOf(poolIds),
      s"negatives escaped the pool: ${negIds -- poolIds}")
    // per-anchor output is capped at NegK and labels genuinely differ
    val labels = Registry.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
    val joined = out
      .join(labels.withColumnRenamed("vec_id", "anchor_id")
        .withColumnRenamed("label", "anchor_label"), "anchor_id")
      .join(labels.withColumnRenamed("vec_id", "neg_id")
        .withColumnRenamed("label", "neg_label"), "neg_id")
    assert(joined.filter(col("anchor_label") === col("neg_label")).count() == 0)
    val maxPerAnchor = out.groupBy("anchor_id").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxPerAnchor <= 4)
  }
}
