package graft

/** Round-15 laws: the dedup-collapsed semantic family
  * (`dedup_semantic_collapsed` — the `ann_knn_join_dedup` survivor-first
  * discipline applied to semantic dedup). The fixture corpus is dup-free
  * in the quantized domain (500/500 distinct), so the collapse must be
  * the identity there: the collapsed operator must reproduce
  * `dedup_semantic_clusters` row for row. The dup-heavy end is covered
  * by the DuckDB hash gate (the oracle mirrors the collapse CTE-for-CTE)
  * and the /tmp/sf100 isolated measurement (round-15 notes).
  */
class Round15PropertySpec extends SparkSpec {

  test("semanticCollapsed on a dup-free corpus equals semanticClusters") {
    // survivors == vectors, the survivor cell count equals the member
    // cell count (same n/128 closed form over equal n), and the
    // orderBy.limit seed prefix equals the vec_id < cells filter on the
    // dense fixture ids — so every stage degenerates to the uncollapsed
    // operator and the outputs must be IDENTICAL, not merely equivalent
    val collapsed = ops.DedupClusters.semanticCollapsed(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val plain = ops.DedupClusters.semanticClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(collapsed.nonEmpty)
    assert(collapsed.toSeq === plain.toSeq,
      "dup-free collapse must reproduce the uncollapsed semantic dedup " +
        s"exactly; first diff: ${collapsed.zip(plain).find(p => p._1 != p._2)}")
  }

  test("semanticCollapsed output is internally consistent") {
    val rows = ops.DedupClusters.semanticCollapsed(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (rep, members) =>
      assert(members.map(_._1).min === rep,
        s"cluster_rep $rep must be the minimum member id")
      assert(members.count(_._4 == 1L) === 1 &&
        members.find(_._4 == 1L).get._1 === rep,
        s"exactly the rep row of $rep must be canonical")
      assert(members.forall(_._3 == members.length),
        s"cluster_size of $rep must equal the member count")
    }
  }
}
