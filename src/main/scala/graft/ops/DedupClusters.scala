package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate *cluster* consolidation: pairwise Jaccard matches form a
  * graph; the survivor of each connected component is its minimum doc_id.
  * Pair-based removal (drop the larger of each pair) over-removes on chains
  * A–B, B–C; component-minimum retention is the correct dedup semantics.
  *
  * Spark has no built-in connected components, so this is iterative
  * min-label propagation over DataFrames — the standard scale pattern
  * (labels converge in O(graph diameter) joins; near-dup graphs are
  * overwhelmingly tiny stars, so 2-3 iterations in practice). The iteration
  * driver checks convergence with a count, each step is one shuffle on the
  * (LSH-bounded, ≪ corpus) edge set. Oracle: recursive transitive closure
  * in SQL.
  */
object DedupClusters {

  def clusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardPairs(s, dir).select("i", "j")
    // undirected edge list, both directions
    val edges = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j"))).distinct().cache()
    val nodes = edges.select(col("i").as("doc_id")).distinct()

    var labels = nodes.withColumn("label", col("doc_id")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      // each node adopts the min label among itself and its neighbours
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "j")
          .withColumnRenamed("label", "nlabel"), Seq("j"))
        .groupBy(col("i").as("doc_id"))
        .agg(min("nlabel").as("nmin"))
      val next = labels.join(neighborMin, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    // wrong-but-silent is the worst failure mode for a dedup pass
    require(changed == 0,
      s"label propagation did not converge after $iter iterations " +
        s"($changed labels still changing) - component diameter exceeds the cap")
    labels
      .select(col("doc_id"), col("label").as("cluster_rep"))
      .orderBy("doc_id")
  }

  private val clustersOracle = """
WITH RECURSIVE pairs AS (
  SELECT i, j FROM (
    WITH sh AS (
      SELECT doc_id,
        list_distinct([array_to_string(t[x:x+4], ' ')
                       for x in range(1, len(t) - 3)]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      WHERE len(t) >= 5),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    cand AS (
      SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    sz AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh)
    SELECT i, j
    FROM cand JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8)),
edges AS (
  SELECT i, j FROM pairs UNION SELECT j, i FROM pairs),
walk(node, reach) AS (
  SELECT i, i FROM edges
  UNION
  SELECT w.node, e.j FROM walk w JOIN edges e ON e.i = w.reach)
SELECT node AS doc_id, min(reach) AS cluster_rep
FROM walk GROUP BY node ORDER BY doc_id
"""

  val queries: Map[String, QueryDef] = Map(
    "dedup_clusters" -> QueryDef(clusters, Some(clustersOracle))
  )
}
