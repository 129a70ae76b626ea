package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composite training-data curation pipeline — the queries the other
  * modules define, chained the way a 100 TB pre-training corpus pass runs
  * them: quality filter → language filter → near-dup removal (keep the
  * smallest doc_id of each duplicate cluster) → curated corpus + per-source
  * accounting. One declarative plan: Catalyst sees the whole pipeline, so
  * the quality/language predicates prune *before* the (more expensive)
  * dedup join, and the doc table is scanned once per use, not per "step".
  */
object Curation {

  private val MinTokens = 40
  private val MinTtr = 0.35
  /** Target-language allowlist — the language-filter stage of the
    * documented pipeline (an English pre-training pass; the knob a
    * multilingual run widens). The catalog `lang` label is authoritative
    * here; `text_langid_confusion` is where the engine measures a
    * classifier against it.
    */
  private val LangAllow = Seq("en")

  /** Candidate docs passing the cheap per-document filters (quality AND
    * target language), projected to the narrow (doc_id, lang, source,
    * n_tokens) the curation consumers read — `text` is dropped before the
    * checkpoint on purpose (the r17 narrow-member-map discipline).
    *
    * Session-memoized (r14 optimization): all three curation queries start
    * here, and [[curatedCorpus]] alone reads it twice per plan (the member
    * join and the final anti-join) — each read previously re-ran the
    * tokenize + array_distinct scan of `documents.text`, the most
    * expensive per-row expression in the family, because ExistingRDD-
    * rooted subtrees are never shared by AQE stage reuse.
    */
  private val passingCache = new graft.SessionMemo[DataFrame]

  private def passing(s: SparkSession, dir: String): DataFrame =
    passingCache.getOrElseUpdate(s, dir) {
      val toks = split(col("text"), " ")
      Registry.table(s, dir, "documents")
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("ttr",
          size(array_distinct(toks)).cast("double") / size(toks))
        .filter(col("n_tokens") >= MinTokens && col("ttr") >= MinTtr &&
          col("lang").isin(LangAllow: _*))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
        .localCheckpoint()
    }

  /** The shared dedup-losers SQL block (sh → ex → cand → sz → losers) —
    * was hand-copied into all three oracles in this file; one definition
    * so the shingle width, the 0.8 threshold, the df cap and the
    * passing-pair restriction cannot drift between them. Expects a
    * `passing` CTE exposing `doc_id` upstream; `losers(doc_id)` comes out.
    */
  private val LosersCte = s"""sh AS (
  SELECT doc_id,
    list_distinct([array_to_string(t[i:i+4], ' ')
                   for i in range(1, len(t) - 3)]) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
  WHERE len(t) >= 5),
ex AS (
  SELECT doc_id, shingle
  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
  QUALIFY count(*) OVER (PARTITION BY shingle) <= ${Dedup.PostingDfCap}),
cand AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS inter
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sz AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
losers AS (
  SELECT DISTINCT j AS doc_id
  FROM cand JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
    AND i IN (SELECT doc_id FROM passing)
    AND j IN (SELECT doc_id FROM passing))"""

  /** Near-dup losers among PASSING docs: from each Jaccard ≥ 0.8 pair
    * whose members BOTH passed the per-doc filters, keep min(doc_id) —
    * the larger id is dropped. The passing restriction is load-bearing:
    * if a pair's smaller id already fell to the quality/language filters,
    * its surviving partner is the cluster's only representative and must
    * be KEPT (the unrestricted form dropped j whenever (i, j) paired,
    * erasing the content entirely when i had failed). (Pairs, not
    * connected components: the driver corpus has no chains — pair i<j
    * removal equals component-minimum retention here, and the oracle pins
    * that.)
    */
  def curatedCorpus(s: SparkSession, dir: String): DataFrame = {
    val p = passing(s, dir)
    // COLLAPSE-FIRST loser marking (r17, same move as DedupClusters
    // .clusterMap): the pair-restricted rule "drop j iff some passing
    // i < j pairs with it at jaccard >= 0.8" needs only each class's
    // MINIMUM PASSING member id, never the pairs themselves —
    //  - intra-class: members are pairwise jaccard-1, so a passing member
    //    b loses iff b > pmin(class b) (gated on the class having a
    //    non-empty capped set, i.e. being pair-reachable at all);
    //  - cross-class: (a in A) x (b in B) pairs exist iff the survivor
    //    edge (A, B) clears 0.8 (jaccard is a set function on the
    //    member-weighted capped universe), so b loses iff
    //    b > min over adjacent A of pmin(A).
    // Everything is linear in distinct content; results are identical to
    // the definitional pair form on any corpus (Round17PropertySpec).
    val members = Dedup.setMembers(s, dir).select("doc_id", "sid")
    // consumed three times below (pmin, intra losers, cross losers);
    // narrow (doc_id, sid), so one materialization beats three re-joins
    val pm = p.select("doc_id").join(members, "doc_id").localCheckpoint()
    val pmin = pm.groupBy("sid").agg(min("doc_id").as("pmin"))
    val edges = Dedup.survivorJaccardCross(s, dir).select("i", "j")
    val nmin = edges
      .unionByName(edges.select(col("j").as("i"), col("i").as("j")))
      .join(pmin.select(col("sid").as("j"), col("pmin").as("apmin")), "j")
      .groupBy(col("i").as("sid")).agg(min("apmin").as("nmin"))
    val intraLosers = pm
      .join(Dedup.survivorCappedClasses(s, dir), Seq("sid"), "left_semi")
      .join(pmin, "sid").filter(col("doc_id") > col("pmin"))
      .select("doc_id")
    val crossLosers = pm.join(nmin, "sid")
      .filter(col("doc_id") > col("nmin")).select("doc_id")
    val losers = intraLosers.unionByName(crossLosers).distinct()
    p.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** The definitional pair-restricted loser form — the collapse-first
    * law's reference; tests only.
    */
  private[graft] def curatedCorpusDefinitional(s: SparkSession, dir: String): DataFrame = {
    val p = passing(s, dir)
    val ids = p.select("doc_id")
    val losers = Dedup.jaccardPairs(s, dir)
      .join(ids.withColumnRenamed("doc_id", "i"), "i")
      .join(ids.withColumnRenamed("doc_id", "j"), "j")
      .select(col("j").as("doc_id")).distinct()
    p.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  private val curatedCorpusOracle = s"""
WITH toks AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
m AS (
  SELECT doc_id, lang, source,
    CAST(len(t) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
  FROM toks),
passing AS (
  SELECT doc_id, lang, source, n_tokens FROM m
  WHERE n_tokens >= 40 AND ttr >= 0.35 AND lang IN ('en')),
$LosersCte
SELECT p.doc_id, p.lang, p.source, p.n_tokens
FROM passing p
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = p.doc_id)
ORDER BY p.doc_id
"""

  /** Per-source curation accounting: kept/dropped splits and token budgets —
    * the report a data-curation run ships with.
    */
  def curationReport(s: SparkSession, dir: String): DataFrame = {
    val kept = curatedCorpus(s, dir)
      .select(col("doc_id"), lit(true).as("kept"))
    val toks = split(col("text"), " ")
    Registry.table(s, dir, "documents")
      .withColumn("n_tokens", size(toks).cast("long"))
      .join(kept, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("kept"), 1)).as("n_kept"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .orderBy("source")
  }

  private val curationReportOracle = s"""
WITH toks AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
m AS (
  SELECT doc_id, lang, source,
    CAST(len(t) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
  FROM toks),
passing AS (
  SELECT doc_id FROM m
  WHERE n_tokens >= 40 AND ttr >= 0.35 AND lang IN ('en')),
$LosersCte,
kept AS (
  SELECT doc_id FROM passing p
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = p.doc_id))
SELECT m.source,
  count(*) AS n_docs,
  count(*) FILTER (m.doc_id IN (SELECT doc_id FROM kept)) AS n_kept,
  CAST(sum(m.n_tokens) AS BIGINT) AS tokens_total,
  CAST(sum(CASE WHEN m.doc_id IN (SELECT doc_id FROM kept)
                THEN m.n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
FROM m GROUP BY m.source ORDER BY m.source
"""

  /** The capstone composite — the whole corpus build as ONE declarative
    * plan: quality filter → near-dup removal → deterministic 80/10/10
    * hash split → per-(split, source) 4096-token sequence packing →
    * shipping accounting (docs / tokens / bins per shard). Catalyst sees
    * all of it: the cheap per-doc predicates prune before the dedup join,
    * the split is a scan-speed expression, and packing windows shuffle
    * once on the output shard key. This is the query a training-data team
    * actually runs; every stage is also individually oracle-verified by
    * its standalone query.
    */
  def corpusBuild(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kept = curatedCorpus(s, dir) // doc_id, lang, source, n_tokens
    val bucket = pmod(SamplingOps.hash60(col("doc_id")), lit(100))
    val split = when(bucket < 80, "train").when(bucket < 90, "val")
      .otherwise("test")
    val w = Window.partitionBy("split", "source")
      .orderBy(SamplingOps.hash60(col("doc_id")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept.withColumn("split", split)
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("bin", ((col("cum") - col("n_tokens")) / 4096L).cast("long"))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        (max("bin") + 1).as("n_bins"))
      .orderBy("split", "source")
  }

  private val corpusBuildOracle = s"""
WITH toks AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS t FROM documents),
m AS (
  SELECT doc_id, lang, source,
    CAST(len(t) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
  FROM toks),
passing AS (
  SELECT doc_id, source, n_tokens FROM m
  WHERE n_tokens >= 40 AND ttr >= 0.35 AND lang IN ('en')),
$LosersCte,
kept AS (
  SELECT p.doc_id, p.source, p.n_tokens,
    CAST('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
      AS h
  FROM passing p
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = p.doc_id)),
assigned AS (
  SELECT *, CASE WHEN h % 100 < 80 THEN 'train'
                 WHEN h % 100 < 90 THEN 'val' ELSE 'test' END AS split
  FROM kept),
packed AS (
  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY split, source
    ORDER BY h ASC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM assigned)
SELECT split, source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
  CAST(max((cum - n_tokens) // 4096) + 1 AS BIGINT) AS n_bins
FROM packed GROUP BY 1, 2 ORDER BY 1, 2
"""

  val queries: Map[String, QueryDef] = Map(
    "curated_corpus" -> QueryDef(curatedCorpus, Some(curatedCorpusOracle)),
    "curation_report" -> QueryDef(curationReport, Some(curationReportOracle)),
    "corpus_build_pipeline" -> QueryDef(corpusBuild, Some(corpusBuildOracle))
  )
}
