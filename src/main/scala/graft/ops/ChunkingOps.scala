package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-preparation operators for a training-data pipeline: splitting
  * long documents into overlapping chunks, bucketing by context length for
  * padding-efficient batch assembly, and one k-means assignment step over
  * the embedding table (the clustering primitive behind corpus maps and
  * IVF codebooks). None of these exist in the reference (SURVEY.md §2.8);
  * all are pure-relational forms that hash-match a DuckDB oracle.
  *
  * 100 TB posture: chunking and bucketing are embarrassingly parallel
  * (per-row generate + one aggregate exchange); the k-means step broadcasts
  * K centroid vectors and streams the corpus — per iteration one scan, one
  * tiny aggregate, no corpus×corpus term.
  */
object ChunkingOps {
  import Registry.table

  private val ChunkSize = 200
  private val Stride = 150 // overlap = ChunkSize - Stride = 50 chars

  // ------------------------------------------------------------- chunking
  /** Fixed-size character windows with overlap: chunk i covers
    * [i·stride, i·stride + size). Chunk count =
    * max(1, ceil((len − overlap) / stride)) — integral arithmetic on both
    * engines (`div`, not `/`: Spark double division would round, not
    * floor). `sequence` + `posexplode` generates chunk indices row-locally:
    * no shuffle at all until the final presentation sort, and at 100 TB the
    * generate inherits the scan's partitioning (a chunker never needs to
    * move data).
    */
  def chunkDocuments(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    docs
      .withColumn("n_chunks",
        greatest(lit(1L), expr(s"(length(text) + ${Stride - 1 - (ChunkSize - Stride)}) div $Stride")))
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)).as(Seq("pos", "chunk_idx")))
      .select(col("doc_id"), col("chunk_idx"),
        substring(col("text"), (col("chunk_idx") * Stride + 1).cast("int"),
          lit(ChunkSize)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val chunkDocumentsOracle = s"""
WITH n AS (
  SELECT doc_id, text,
    greatest(1, (length(text) + ${Stride - 1 - (ChunkSize - Stride)}) // $Stride) AS n_chunks
  FROM documents),
e AS (
  SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_idx FROM n)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  substr(text, CAST(chunk_idx * $Stride + 1 AS INTEGER), $ChunkSize) AS chunk_text,
  CAST(length(substr(text, CAST(chunk_idx * $Stride + 1 AS INTEGER), $ChunkSize)) AS BIGINT)
    AS chunk_len
FROM e
ORDER BY doc_id, chunk_idx
"""

  // ------------------------------------------------------- length buckets
  /** Context-length bucketing: each document lands in the smallest
    * power-of-two token budget that holds it (the batch-assembly layout
    * that minimizes padding); per bucket, the doc count, the real token
    * mass and the padding waste the bucket costs. Tokens follow the
    * engine-wide whitespace convention (TextOps). Pure integer arithmetic —
    * the CASE ladder, not log2: a float log at an exact power boundary
    * could flap cross-engine.
    */
  def contextLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val bucket = when(col("n_tokens") <= 16, 16L)
      .when(col("n_tokens") <= 32, 32L)
      .when(col("n_tokens") <= 64, 64L)
      .otherwise(128L)
    docs.withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        sum(col("bucket") - col("n_tokens")).as("padding_waste"))
      .orderBy("bucket")
  }

  private val contextLengthBucketsOracle = """
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
b AS (
  SELECT n_tokens,
    CASE WHEN n_tokens <= 16 THEN 16
         WHEN n_tokens <= 32 THEN 32
         WHEN n_tokens <= 64 THEN 64
         ELSE 128 END AS bucket
  FROM t)
SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
  CAST(sum(bucket - n_tokens) AS BIGINT) AS padding_waste
FROM b GROUP BY bucket ORDER BY bucket
"""

  // ---------------------------------------------------------- k-means step
  private val NumCentroids = 10

  /** The shared Lloyd-assignment pipeline both k-means steps start from:
    * every vector with its nearest centroid (seed centroids = the first K
    * corpus vectors) by exact squared euclidean distance on the
    * 1e-6-quantized grid — ‖a−b‖² = ‖a‖² + ‖b‖² − 2·a·b, all int64, so the
    * argmin can't flap on float noise (same trick as Similarity's cosine).
    * The corpus is [[Similarity.quantized]] — the session-memoized
    * parse→quantize→norm base every ANN consumer shares (this used to be
    * an inline replay of that pass, duplicated across both steps). K
    * centroid vectors broadcast; the corpus streams once per step.
    */
  private def kmeansAssigned(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val corpus = Similarity.quantized(s, dir).select("vec_id", "qv", "nrm")
    val centroids = corpus.filter(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"),
        col("nrm").as("cnrm"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("dist2").asc, col("centroid_id").asc)
    corpus.join(broadcast(centroids))
      .withColumn("dist2", col("nrm") + col("cnrm") -
        lit(2L) * call_function("vec_dot_long", col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("centroid_id"), col("qv"), col("dist2"))
  }

  /** One Lloyd assignment step rolled up per cluster: the per-cluster
    * re-aggregate of [[kmeansAssigned]] is K rows. The full Lloyd loop is
    * this step iterated with re-averaged centroids — each iteration stays
    * one scan + one K-row exchange.
    */
  def kmeansAssignStep(s: SparkSession, dir: String): DataFrame =
    kmeansAssigned(s, dir)
      .groupBy("centroid_id")
      .agg(
        count(lit(1)).as("n_assigned"),
        sum("dist2").as("sum_dist2"),
        (sum("dist2").cast("double") / count(lit(1))).as("mean_dist2"))
      .orderBy("centroid_id")

  private val kmeansAssignOracle = s"""
WITH q AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings),
n AS (
  SELECT vec_id, qv,
    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
  FROM q),
c AS (SELECT vec_id AS centroid_id, qv AS cv, nrm AS cnrm
      FROM n WHERE vec_id < $NumCentroids),
d AS (
  SELECT v.vec_id, c.centroid_id,
    v.nrm + c.cnrm - 2 * CAST(list_sum(
      list_transform(range(1, 65), k -> v.qv[k] * c.cv[k])) AS BIGINT) AS dist2
  FROM n v, c),
a AS (
  SELECT vec_id, centroid_id, dist2,
    row_number() OVER (PARTITION BY vec_id
                       ORDER BY dist2 ASC, centroid_id ASC) AS rk
  FROM d)
SELECT centroid_id, count(*) AS n_assigned,
  CAST(sum(dist2) AS BIGINT) AS sum_dist2,
  CAST(sum(dist2) AS DOUBLE) / count(*) AS mean_dist2
FROM a WHERE rk = 1
GROUP BY centroid_id ORDER BY centroid_id
"""

  /** The other half of the Lloyd iteration: per-cluster mean vectors from
    * the current assignment — exact int64 coordinate sums on the quantized
    * grid (posexplode → (centroid, dim) aggregate, map-side combined), the
    * mean being the single IEEE division at the end. assign + update
    * together make one full k-means iteration expressible as two queries;
    * the loop at scale re-broadcasts the 10×64 result each round.
    */
  def kmeansUpdateStep(s: SparkSession, dir: String): DataFrame =
    kmeansAssigned(s, dir)
      .select(col("centroid_id"), posexplode(col("qv")).as(Seq("dim", "q")))
      .groupBy("centroid_id", "dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"))
      .select(col("centroid_id"), col("dim").cast("long").as("dim"), col("n"),
        (col("sum_q").cast("double") / col("n").cast("double")).as("mean_q"))
      .orderBy("centroid_id", "dim")

  private val kmeansUpdateOracle = s"""
WITH q AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings),
n AS (
  SELECT vec_id, qv,
    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
  FROM q),
c AS (SELECT vec_id AS centroid_id, qv AS cv, nrm AS cnrm
      FROM n WHERE vec_id < $NumCentroids),
d AS (
  SELECT v.vec_id, v.qv, c.centroid_id,
    v.nrm + c.cnrm - 2 * CAST(list_sum(
      list_transform(range(1, 65), k -> v.qv[k] * c.cv[k])) AS BIGINT) AS dist2
  FROM n v, c),
a AS (
  SELECT vec_id, qv, centroid_id,
    row_number() OVER (PARTITION BY vec_id
                       ORDER BY dist2 ASC, centroid_id ASC) AS rk
  FROM d)
SELECT centroid_id, CAST(k - 1 AS BIGINT) AS dim,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(qv[k]) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_q
FROM a, UNNEST(range(1, 65)) u(k)
WHERE rk = 1
GROUP BY centroid_id, k ORDER BY centroid_id, dim
"""

  // ------------------------------------------------- semantic boundaries
  private val SemChunk = 16 // tokens per block
  private val BoundaryCos = 0.3

  /** Semantic chunk boundaries — the splitting rule RAG/context prep uses
    * instead of a fixed stride: cut where adjacent text stops being about
    * the same thing. One per-row pass via the
    * [[graft.functions.BlockCosines]] expression: every
    * [[SemChunk]]-token block's tf map, adjacent-pair cosine (exact int64
    * dot/norms, ONE IEEE sqrt·sqrt·division per pair, the [[Similarity]]
    * discipline), posexploded to (boundary index, cosine). A pair with no
    * shared tokens gets cosine 0 — the strongest boundary. Boundary where
    * cosine < [[BoundaryCos]].
    *
    * The first form was fully relational — explode to (doc, block, token)
    * rows, tf hash aggregate, adjacency equi-join, norms join — and
    * hash-identical to this one; it measured 3.1s at sf1 because ALL of
    * that work is document-local, so shuffling it was pure overhead. The
    * kernel form is the SURVEY §7.3 escalation (compose → custom
    * Expression when the shuffles are the bottleneck): scan-speed,
    * embarrassingly parallel, ZERO exchanges before the presentation
    * sort — the DuckDB oracle keeps the original grouped/joined SQL, so
    * the hash gate certifies the two evaluation strategies agree
    * bit-for-bit.
    */
  def semanticBoundaries(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val cosine = col("cosine")
    table(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(call_function(s"block_cosines_$SemChunk",
          split(col("text"), " "))).as(Seq("pidx", "cosine")))
      .select(col("doc_id"), col("pidx").cast("long").as("pidx"),
        cosine, (cosine < BoundaryCos).as("is_boundary"))
      .orderBy("doc_id", "pidx")
  }

  private val semanticBoundariesOracle = s"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bl AS (
  SELECT doc_id, pidx,
    t[pidx * $SemChunk + 1 : pidx * $SemChunk + $SemChunk] AS blk
  FROM d, unnest(range(0, (len(t) + ${SemChunk - 1}) // $SemChunk))
    AS u(pidx)),
blocks AS (SELECT doc_id, pidx, unnest(blk) AS tok FROM bl),
tf AS (SELECT doc_id, pidx, tok, count(*) AS c FROM blocks GROUP BY 1, 2, 3),
norms AS (
  SELECT doc_id, pidx, CAST(sum(c * c) AS BIGINT) AS n2
  FROM tf GROUP BY 1, 2),
dot AS (
  SELECT a.doc_id AS ddoc, a.pidx AS dpidx,
    CAST(sum(a.c * b.c) AS BIGINT) AS dp
  FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND a.pidx + 1 = b.pidx
    AND a.tok = b.tok
  GROUP BY 1, 2)
SELECT na.doc_id, CAST(na.pidx AS BIGINT) AS pidx,
  CAST(coalesce(dp, 0) AS DOUBLE)
    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine,
  CAST(coalesce(dp, 0) AS DOUBLE)
    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
    < $BoundaryCos AS is_boundary
FROM norms na JOIN norms nb ON nb.doc_id = na.doc_id
  AND nb.pidx = na.pidx + 1
LEFT JOIN dot ON ddoc = na.doc_id AND dpidx = na.pidx
ORDER BY na.doc_id, pidx
"""

  val queries: Map[String, QueryDef] = Map(
    "chunk_semantic_boundaries" ->
      QueryDef(semanticBoundaries, Some(semanticBoundariesOracle)),
    "chunk_documents_stride" -> QueryDef(chunkDocuments, Some(chunkDocumentsOracle)),
    "context_length_buckets" -> QueryDef(contextLengthBuckets, Some(contextLengthBucketsOracle)),
    "kmeans_assign_step" -> QueryDef(kmeansAssignStep, Some(kmeansAssignOracle)),
    "kmeans_update_step" -> QueryDef(kmeansUpdateStep, Some(kmeansUpdateOracle))
  )
}
