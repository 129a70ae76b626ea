package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-2 kernels whose correctness is easy to get
  * subtly wrong: the bounded top-k buffer (vs. the obvious sort-take spec)
  * and the hybrid connected-components paths (driver union-find vs.
  * distributed label propagation must agree with brute-force closure on any
  * graph). Deterministic seeded sampling, same convention as
  * [[Report1PropertySpec]] (no scalatest-scalacheck bridge offline).
  */
class Round2PropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(1042L + i)).foreach(body)
    }

  // ------------------------------------------------------------- top-k buffer
  private val entries: Gen[List[(Long, Double)]] =
    Gen.listOf(for {
      k <- Gen.chooseNum(0L, 30L)
      // coarse values force ties so the key tiebreak is actually exercised
      v <- Gen.chooseNum(0, 5).map(_.toDouble)
    } yield (k, v))

  test("TopKByValue equals sort-take for any input split and merge order") {
    val agg = new graft.functions.TopKByValue(3)
    forAllSeeded(entries, n = 40) { xs =>
      val expected = xs.sorted(Ordering.by((e: (Long, Double)) => (-e._2, e._1)))
        .take(3)
      // reduce under an arbitrary split, then merge — the distributed shape
      val (a, b) = xs.splitAt(xs.size / 3)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(bufA, bufB))
      assert(got.vs.toList.zip(got.ks.toList) ==
        expected.map(e => (e._2, e._1)))
      // and merge must commute
      val got2 = agg.finish(agg.merge(bufB, bufA))
      assert(got2.vs.toList.sameElements(got.vs.toList) &&
        got2.ks.toList.sameElements(got.ks.toList))
    }
  }

  // ------------------------------------------------- connected components
  // small node range, short hops: still produces chains + stars + merged
  // components, but bounds the label-propagation iteration count so the
  // suite stays fast (each iteration is several Spark jobs)
  private val edgeLists: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      i <- Gen.chooseNum(0L, 10L)
      d <- Gen.chooseNum(1L, 3L)
    } yield (i, i + d))

  /** Reference components: brute-force closure on the driver. */
  private def bruteComponents(edges: List[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap(e => List(e, e.swap))
      .groupMap(_._1)(_._2).withDefaultValue(Nil)
    val nodes = edges.flatMap(e => List(e._1, e._2)).distinct
    nodes.map { n =>
      var seen = Set(n)
      var frontier = List(n)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj).filterNot(seen)
        seen ++= next
        frontier = next
      }
      n -> seen.min
    }.toMap
  }

  test("driver union-find and distributed label propagation agree with brute force") {
    import spark.implicits._
    forAllSeeded(edgeLists, n = 3) { edges =>
      val pairs = edges.toDF("i", "j")
      val expected = bruteComponents(edges)
      val viaUnionFind = graft.ops.DedupClusters
        .connectedComponents(spark, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaLabelProp = graft.ops.DedupClusters
        .connectedComponents(spark, pairs, driverMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaUnionFind == expected)
      assert(viaLabelProp == expected)
    }
  }
}
