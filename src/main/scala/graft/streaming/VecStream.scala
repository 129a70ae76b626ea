package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming survivor collapse — the dedup-first ingestion discipline of
  * `ann_knn_join_dedup` / `dedup_semantic_collapsed` as a CONTINUOUS
  * pipeline: vectors arrive over micro-batches and each batch probes the
  * session-memoized survivor base (`Similarity.collapsed` — built once
  * per session, exactly like the MinHash corpus index behind
  * [[DocStream.incrementalMinhashProbe]]). Per arriving vector the probe
  * emits its survivor group:
  *
  *   - KNOWN vector (its quantized form is in the base): `is_known=true`,
  *     `group_id` = the base survivor id, `m` = the base multiplicity —
  *     the row a downstream consumer joins to the survivor kNN graph
  *     (built over the SAME memoized base, so graph and stream can never
  *     disagree about groups).
  *   - NEW vector: `is_known=false`, collapsed WITHIN the batch —
  *     `group_id` = the smallest arriving vec_id among its batch
  *     duplicates, `m` = the batch duplicate count. First arrival is the
  *     survivor (a stream cannot know future ids); a production ingest
  *     compacts these new survivors into the base between triggers, the
  *     same session-memo refresh the batch pipeline performs per corpus.
  *
  * Probe mechanics inherit the batch discipline wholesale: quantization
  * is `Similarity.qvExpr` (the ONE kernel the batch base uses), and the
  * base join rides an 8-byte `xxhash64(qv)` key with the exact arrays as
  * verify payload (`Similarity.memberMap`'s key-thinning) — exact under
  * any hash collision.
  *
  * `foreachBatch` rather than a stateful operator for the same reason as
  * the MinHash probe: the probe is a batch plan over a static index, and
  * foreachBatch runs it with full batch-planner freedom (AQE, broadcast
  * of the small arriving side). Exactly-once delivery is the sink's
  * contract via the checkpointed batchId.
  *
  * 100 TB posture: per-trigger work is O(batch); the survivor base is
  * hash-partitioned on the 8-byte key and never re-shuffles — the
  * arriving batch (orders of magnitude smaller) shuffles to it, or
  * broadcasts when the base fits (survivor count, not member count, is
  * the base's n — the whole point of the collapse).
  */
object VecStream {

  /** One probe pass of an arriving (vec_id, embedding) batch against the
    * survivor base. Exposed for direct testing; [[survivorProbe]] wires
    * it per micro-batch. Output: (vec_id, group_id, m, is_known).
    */
  private[graft] def probeBatch(batch: DataFrame, base: DataFrame)
      : DataFrame = {
    val q = batch.select(col("vec_id"),
      graft.ops.Similarity.qvExpr(col("embedding")).as("qv"))
      .withColumn("hk", xxhash64(col("qv")))
    val baseK = base.select(col("vec_id").as("group_id"),
      col("qv").as("gqv"), col("m"), xxhash64(col("qv")).as("hk"))
    val probed = q.join(baseK,
      q("hk") === baseK("hk") && q("qv") === baseK("gqv"), "left_outer")
    val known = probed.filter(col("group_id").isNotNull)
      .select(col("vec_id"), col("group_id"), col("m"),
        lit(true).as("is_known"))
    // within-batch collapse of the base-miss remainder: the batch twin's
    // min-id survivor rule applied to the only ids a stream can see
    val fresh = probed.filter(col("group_id").isNull)
      .select(col("vec_id"), col("qv"))
    val freshGroups = fresh.groupBy("qv")
      .agg(min("vec_id").as("group_id"), count(lit(1)).as("m"))
    val unknown = fresh.join(freshGroups, "qv")
      .select(col("vec_id"), col("group_id"), col("m"),
        lit(false).as("is_known"))
    known.unionByName(unknown)
  }

  /** The streaming survivor-collapse probe (see object doc). `newVecs` is
    * an embeddings-shaped stream (vec_id, embedding); `sink` receives the
    * probe output and the checkpointed batchId per trigger.
    */
  def survivorProbe(spark: SparkSession, dir: String, newVecs: DataFrame)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val base = graft.ops.Similarity.collapsed(spark, dir)
    newVecs.writeStream.foreachBatch { (batch: Dataset[Row], id: Long) =>
      sink(probeBatch(batch.toDF(), base), id)
    }
  }
}
