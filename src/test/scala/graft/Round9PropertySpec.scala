package graft

import org.apache.spark.sql.execution.ExternalRDD
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

/** Round-9 laws (verdict #6): the driver-side graph discipline is safe
  * only because of its DISPATCH, not its speed. `connectedComponents`
  * collects edges onto the driver below `driverMaxEdges` and falls back to
  * distributed label propagation above it — a corpus-keyed graph (node set
  * grows with the data) must take the distributed branch once it outgrows
  * the bound, and both branches must agree on the components. These laws
  * pin the dispatch itself so a refactor can't quietly route data-sized
  * edge lists through `.collect()`.
  */
class Round9PropertySpec extends SparkSpec {

  /** Seeded pseudo-random corpus-keyed pair list: `nEdges` edges over a
    * ~3×nEdges node id space (many small components plus singleton-free
    * noise — the shape of a near-dup pair list over a large corpus).
    */
  private def corpusPairs(nEdges: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val ids = nEdges * 3
    (0 until nEdges)
      .map(_ => (rnd.nextInt(ids).toLong, rnd.nextInt(ids).toLong))
      .filter { case (i, j) => i != j }
      .toDF("i", "j")
  }

  /** True iff the component map came from the driver branch: union-find
    * returns a lineage-free local relation, label propagation keeps a
    * distributed plan (checkpointed RDD scan).
    */
  private def isDriverSide(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => true
      case _: ExternalRDD[_] => true
    }.isDefined && df.queryExecution.optimizedPlan.collectFirst {
      case s if s.getClass.getSimpleName == "LogicalRDD" => true
    }.isEmpty

  test("a corpus-keyed graph above driverMaxEdges takes the distributed branch") {
    val pairs = corpusPairs(600)
    val dispatched = ops.DedupClusters.connectedComponents(
      spark, pairs, driverMaxEdges = 100L)
    assert(!isDriverSide(dispatched),
      "600 edges with driverMaxEdges=100 still went through the driver " +
        "union-find — the size dispatch is broken, and at corpus scale " +
        "that is a driver-OOM collect()")
  }

  test("below the bound the driver branch engages (lineage-free result)") {
    val pairs = corpusPairs(80)
    val dispatched = ops.DedupClusters.connectedComponents(
      spark, pairs, driverMaxEdges = 10_000L)
    assert(isDriverSide(dispatched),
      "80 edges under a 10k bound should use the driver union-find")
  }

  test("both branches agree on every component assignment") {
    val pairs = corpusPairs(600).localCheckpoint(true)
    val viaDriver = ops.DedupClusters.connectedComponents(
        spark, pairs, driverMaxEdges = Long.MaxValue)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaDistributed = ops.DedupClusters.connectedComponents(
        spark, pairs, driverMaxEdges = 0L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaDriver.nonEmpty && viaDriver == viaDistributed,
      "driver union-find and distributed label propagation disagree")
  }

  /** Synthetic embeddings corpus (same shape as Round8PropertySpec's). */
  private def mkCorpus(n: Int): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(910910L)
    val rows = (0 until n).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat), i % 5)
    }
    val dir = java.nio.file.Files.createTempDirectory(s"sem_linearity_$n")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir.toString
  }

  test("semantic dedup candidate pairs grow linearly in corpus size") {
    // the r9 sf1 smoke caught the semantic family on the SAME fixed-cell
    // quadratic the knn family fixed in r7 (11-35× wall at 10× data);
    // both corpus sizes sit past the scaling knee (n/128 > 16), so a
    // revert to fixed cells fails this at ~4× pair growth for 2× data
    val small = ops.DedupClusters.semanticCandidates(spark, mkCorpus(2048)).count()
    val large = ops.DedupClusters.semanticCandidates(spark, mkCorpus(4096)).count()
    assert(small > 0, "no candidates at n=2048 — vacuous law")
    assert(large.toDouble / small <= 2.8,
      f"semantic candidate pairs grew ${large.toDouble / small}%.2f× for " +
        "2× data — the corpus-scaled cell count is no longer keeping the " +
        "pair set linear")
  }

  test("unpinning SessionMemo drops every strong pin across instances") {
    // the r8 ADVICE leak: pin → touch sessions → unpin used to leave the
    // touched sessions strongly referenced forever. The setter now clears
    // pins on flip-off (entries stay visible via the soft path).
    val memo = new SessionMemo[Int]
    val prev = SessionMemo.pinSessions
    SessionMemo.pinSessions = true
    try {
      assert(memo.getOrElseUpdate(spark, "k")(7) == 7)
      assert(memo.pinnedSessionCount == 1, "pin not recorded while flag on")
    } finally SessionMemo.pinSessions = prev
    if (!prev) {
      assert(memo.pinnedSessionCount == 0,
        "flipping pinSessions off must drop the strong pins")
      assert(memo.getOrElseUpdate(spark, "k")(99) == 7,
        "entry must remain visible through the soft path after unpin")
    }
  }
}
