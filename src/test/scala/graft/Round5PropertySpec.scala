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

  // ---------------------------------------------- trimmed-mean kernel law
  /** The spec: drop the lowest `n div 10` and highest `n div 10` values,
    * average the remainder.
    */
  private def trimmedSpec(xs: List[Long]): (Long, Double) = {
    val lo = xs.size / 10
    val kept = xs.sorted.slice(lo, xs.size - lo)
    (kept.size.toLong, kept.sum.toDouble / kept.size)
  }

  test("histogram trimmed mean equals the sorted-slice definition on any multiset") {
    forAllSeeded(valueLists, n = 25) { xs =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val hist = xs.toDF("v").groupBy("v").agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
      val row = hist
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("lo", expr("n div 10"))
        .withColumn("hi", col("n") - col("lo"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("hi")) -
            greatest(col("cum") - col("c"), col("lo"))))
        .agg(max(col("hi") - col("lo")).as("kept_n"),
          sum(col("v") * col("kept")).as("kept_sum"))
        .head()
      val (keptN, mean) = trimmedSpec(xs)
      assert(row.getLong(0) == keptN, s"kept_n on $xs")
      assert(row.getLong(1).toDouble / row.getLong(0) == mean, s"mean on $xs")
    }
  }

  // ------------------------------------------------- containment vs jaccard
  test("containment pairs are a superset of jaccard pairs at the same threshold") {
    // C(A,B) = |A∩B|/min(|A|,|B|) ≥ |A∩B|/|A∪B| = J(A,B), so every
    // jaccard-0.8 pair must appear among the containment-0.8 pairs
    val jac = ops.Dedup.jaccardPairs(spark, sfDir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = ops.Dedup.containmentPairs(spark, sfDir)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.subsetOf(cont),
      s"jaccard pairs missing from containment: ${jac.diff(cont).take(5)}")
    assert(cont.nonEmpty)
  }

  // -------------------------------------------------- pagerank mass laws
  test("pagerank: every rank at least teleport share, total mass bounded by Scale") {
    val ranks = ops.GraphOps.pagerankNations(spark, sfDir)
      .select("rank_scaled").collect().map(_.getLong(0))
    val n = ranks.length
    val teleport = 15L * 1000000000L / (100L * n)
    assert(ranks.forall(_ >= teleport),
      s"a node fell below the teleport floor $teleport")
    // integral-division remainders and damped leakage only ever LOSE mass
    assert(ranks.sum <= 1000000000L, s"mass grew: ${ranks.sum}")
    assert(ranks.sum > 900000000L, s"mass leaked implausibly: ${ranks.sum}")
  }

  // ------------------------------------------------ systematic PPS laws
  private val weightLists: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1L, 5000L))

  test("systematic PPS hit counts partition exactly k draws on any weights") {
    forAllSeeded(weightLists, n = 25) { ws =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val k = 7L
      val w = Window.orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = ws.zipWithIndex.map { case (wt, i) => (i.toLong, wt) }
        .toDF("id", "wt")
        .withColumn("cum", sum("wt").over(w))
      val tot = cum.agg(max("cum").as("bigw"))
      val hits = cum.crossJoin(broadcast(tot))
        .withColumn("f_hi", greatest(lit(0L), least(lit(k),
          expr(s"(2 * $k * cum + bigw - 1) div (2 * bigw)"))))
        .withColumn("f_lo", greatest(lit(0L), least(lit(k),
          expr(s"(2 * $k * (cum - wt) + bigw - 1) div (2 * bigw)"))))
        .withColumn("hits", col("f_hi") - col("f_lo"))
      val rows = hits.select("wt", "hits").collect()
      // the k evenly spaced draws are partitioned among the rows: every
      // hit count non-negative, total exactly k
      assert(rows.forall(_.getLong(1) >= 0), s"negative hits on $ws")
      assert(rows.map(_.getLong(1)).sum == k, s"draw total != $k on $ws")
      // a row hit more than once must carry more than 1/k of total weight
      val bigw = ws.sum.toDouble
      rows.filter(_.getLong(1) >= 2).foreach { r =>
        assert(r.getLong(0) > bigw / k / 2, s"light row multi-hit on $ws")
      }
    }
  }

  // -------------------------------------------------- basket margin law
  test("basket lift pair supports never exceed either margin") {
    val lift = ops.RelationalExtras.basketBrandLift(spark, sfDir).collect()
    val baskets = Registry.table(spark, sfDir, "lineitem")
      .join(Registry.table(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lift.nonEmpty)
    lift.foreach { r =>
      val (a, b, nab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(nab <= math.min(baskets(a), baskets(b)),
        s"support $nab exceeds margin of $a/$b")
      assert(r.getDouble(3) > 1.0, "emitted pair with lift <= 1")
    }
  }

  // ----------------------------------------------------- welch df bounds
  test("welch df lies in [min(n1,n2)-1, n1+n2-2] and t is finite") {
    val r = ops.StatsOps.welchTTest(spark, sfDir).head()
    val n1 = r.getAs[Long]("n_click"); val n2 = r.getAs[Long]("n_purchase")
    val df = r.getAs[Double]("welch_df")
    assert(df >= (math.min(n1, n2) - 1).toDouble - 1e-9)
    assert(df <= (n1 + n2 - 2).toDouble + 1e-9)
    assert(!r.getAs[Double]("t_stat").isNaN)
  }
}
