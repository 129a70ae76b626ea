package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-5 kernels: histogram-selection quantiles
  * must equal the sorted-position definition on ANY multiset, and the
  * canonical pick must keep exactly one best doc per cluster. Same seeded
  * convention as [[Round2PropertySpec]].
  */
class Round5PropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(5042L + i)).foreach(body)
    }

  // -------------------------------------------- histogram quantile kernel
  private val valueLists: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 40L)) // coarse → heavy ties

  /** The spec: p-th lower quantile = element at 1-based position ceil(p·n)
    * of the sorted list.
    */
  private def quantileSpec(xs: List[Long], p: Double): Long =
    xs.sorted.apply(math.ceil(xs.size * p).toLong.toInt - 1)

  test("histogram selection equals sorted-position quantiles on any multiset") {
    forAllSeeded(valueLists, n = 25) { xs =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val hist = xs.toDF("v").groupBy("v").agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val cum = hist
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      val row = cum.agg(
        min(when(col("cum") >= ceil(col("n") * 0.5), col("v"))).as("p50"),
        min(when(col("cum") >= ceil(col("n") * 0.9), col("v"))).as("p90"),
        min(when(col("cum") >= ceil(col("n") * 0.99), col("v"))).as("p99"))
        .head()
      assert(row.getLong(0) == quantileSpec(xs, 0.5), s"p50 on $xs")
      assert(row.getLong(1) == quantileSpec(xs, 0.9), s"p90 on $xs")
      assert(row.getLong(2) == quantileSpec(xs, 0.99), s"p99 on $xs")
    }
  }

  // ---------------------------------------------------- canonical pick law
  test("canonical pick: exactly one canonical per cluster, and it is the best") {
    val got = ops.DedupClusters.canonicalPick(spark, sfDir).collect()
    val docs = Registry.table(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // total: every document appears exactly once
    assert(got.map(_.getLong(0)).toSet == docs.keySet)
    val byCluster = got.groupBy(_.getLong(1))
    byCluster.foreach { case (rep, members) =>
      val canon = members.filter(_.getLong(2) == 1L)
      assert(canon.length == 1, s"cluster $rep has ${canon.length} canonicals")
      // the canonical is maximal under (n_chars desc, doc_id asc)
      val best = members.map(_.getLong(0))
        .minBy(id => (-docs(id), id))
      assert(canon.head.getLong(0) == best)
      // the representative is a member (for singletons: itself)
      assert(members.exists(_.getLong(0) == rep))
    }
  }
}
