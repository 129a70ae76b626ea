package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-6 kernels. The load-bearing one is the
  * BPE encoding law: the engine carries token sequences as delimited
  * strings and claims `replace(s, " x  y ", " x y ")` IS greedy
  * left-to-right BPE application — here that claim is checked against a
  * direct list-walk reference on adversarial inputs (overlapping x==y
  * chains, merged tokens containing spaces). Same seeded convention as
  * [[Round2PropertySpec]].
  */
class Round6PropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(6042L + i)).foreach(body)
    }

  // ------------------------------------------------- BPE greedy-merge law
  /** Reference semantics: scan left to right, merge the first available
    * (x, y) adjacency, never re-use a consumed token.
    */
  private def mergeRef(toks: List[String], x: String, y: String)
      : List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == x && toks(i + 1) == y) {
        out += (x + " " + y); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toList
  }

  /** The engine's encoding: wrap every token in `|` (boundaries are
    * `||`), one `replace` per rule, merged tokens join with a space.
    */
  private def mergeViaSql(toks: List[String], x: String, y: String)
      : List[String] = {
    import spark.implicits._
    val s0 = "|" + toks.mkString("||") + "|"
    val out = Seq(s0).toDF("s")
      .select(call_function("replace", col("s"),
        lit("|" + x + "||" + y + "|"),
        lit("|" + x + " " + y + "|")).as("s"))
      .head().getString(0)
    val core = out.stripPrefix("|").stripSuffix("|")
    if (core.isEmpty) Nil else core.split("\\|\\|").toList
  }

  private val tokenLists: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf("a", "b", "c")) // short alphabet → many repeats

  test("delimited-string replace equals greedy left-to-right BPE merging") {
    forAllSeeded(tokenLists, n = 10) { toks =>
      val pairs = toks.zip(toks.drop(1))
      if (pairs.nonEmpty) {
        // most frequent adjacency — what topPair would pick
        val (x, y) = pairs.groupBy(identity).toSeq
          .maxBy { case (p, g) => (g.size, -p._1.hashCode) }._1
        val once = mergeViaSql(toks, x, y)
        assert(once == mergeRef(toks, x, y),
          s"merge ($x,$y) diverged on $toks")
        // second rule drawn from the REWRITTEN sequence, so it can contain
        // a merged token with an inner single space — the case the
        // double-space delimiter exists for
        val pairs2 = once.zip(once.drop(1))
        if (pairs2.nonEmpty) {
          val (x2, y2) = pairs2.groupBy(identity).toSeq
            .maxBy { case (p, g) => (g.size, -p._1.hashCode) }._1
          assert(mergeViaSql(once, x2, y2) == mergeRef(once, x2, y2),
            s"chained merge ($x2,$y2) diverged on $once")
        }
      }
    }
  }

  // ----------------------------------------------- pareto two-level law
  test("two-level pareto selection equals brute-force top-k revenue share") {
    val row = ops.StatsOps.paretoShare(spark, sfDir).head()
    val revs = Registry.table(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(30, 2)) * 100)
        .cast("long")).as("rev"))
      .collect().map(_.getLong(1))
    val k = math.ceil(revs.length * 0.01).toLong
    val topk = revs.sorted(Ordering[Long].reverse).take(k.toInt).sum
    assert(row.getAs[Long]("n_customers") == revs.length.toLong)
    assert(row.getAs[Long]("topk") == k)
    assert(row.getAs[Long]("topk_cents") == topk,
      s"two-level selection != brute force (got ${row.getAs[Long]("topk_cents")}, want $topk)")
    assert(row.getAs[Long]("total_cents") == revs.sum)
  }

  // --------------------------------------------- temperature-mix laws
  test("temperature mix: probabilities normalize and strictly flatten") {
    val rows = ops.CurriculumOps.temperatureMix(spark, sfDir).collect()
    val qSum = rows.map(_.getAs[Double]("q_temp")).sum
    assert(math.abs(qSum - 1.0) < 1e-9, s"q does not normalize: $qSum")
    rows.foreach { r =>
      val rate = r.getAs[Double]("sampling_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("tokens"))
    }
    // sqrt-flattening: bigger sources keep a larger q but a SMALLER
    // q-to-mass ratio than smaller sources
    val byTok = rows.sortBy(_.getAs[Long]("tokens"))
    byTok.sliding(2).foreach {
      case Array(lo, hi) =>
        val (tl, th) = (lo.getAs[Long]("tokens"), hi.getAs[Long]("tokens"))
        if (tl < th) {
          val (ql, qh) =
            (lo.getAs[Double]("q_temp"), hi.getAs[Double]("q_temp"))
          assert(qh > ql, "q must grow with mass")
          assert(qh / ql < th.toDouble / tl,
            "q ratio must be flatter than the mass ratio")
        }
      case _ => ()
    }
  }

  // -------------------------------------------- semantic-cluster laws
  test("semantic clusters: total partition, min-rep, consistent sizes, pair cohesion") {
    val got = ops.DedupClusters.semanticClusters(spark, sfDir).collect()
    val all = Registry.table(spark, sfDir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.map(_.getLong(0)).toSet == all, "not a partition of the corpus")
    val byRep = got.groupBy(_.getLong(1))
    byRep.foreach { case (rep, members) =>
      assert(members.map(_.getLong(0)).min == rep,
        s"cluster rep $rep is not the member minimum")
      assert(members.count(_.getLong(3) == 1L) == 1,
        s"cluster $rep canonical count != 1")
      members.foreach(m => assert(m.getLong(2) == members.length.toLong,
        s"cluster $rep size column inconsistent"))
    }
    // every near-dup pair must land in one cluster
    val rep = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    ops.DedupClusters.semanticPairs(spark, sfDir).collect().foreach { p =>
      assert(rep(p.getLong(0)) == rep(p.getLong(1)),
        s"pair (${p.getLong(0)}, ${p.getLong(1)}) split across clusters")
    }
  }

  // ------------------------------------------------- media phash mirror
  test("media phash equals the direct per-byte specification") {
    val got = ops.Multimodal.mediaPhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Registry.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect().foreach { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        val L = bytes.length
        val stot = bytes.map(b => (b & 0xff).toLong).sum
        var ph = 0L
        (0 until 60).foreach { k =>
          val lo = (k.toLong * L / 60).toInt
          val hi = ((k + 1).toLong * L / 60).toInt
          val sb = (lo until hi).map(i => (bytes(i) & 0xff).toLong).sum
          if (sb * L > stot * (hi - lo)) ph |= 1L << k
        }
        assert(got(r.getLong(0)) == ph, s"phash mismatch for doc ${r.getLong(0)}")
      }
  }

  // ------------------------------------------------------ hybrid RRF laws
  test("hybrid RRF: scores decompose into rank terms and order descends") {
    val rows = ops.SearchOps.hybridRrf(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rb = Option(r.get(2)).map(_.asInstanceOf[Long])
      val rd = Option(r.get(3)).map(_.asInstanceOf[Long])
      assert(rb.isDefined || rd.isDefined)
      rb.foreach(x => assert(x >= 1 && x <= 20))
      rd.foreach(x => assert(x >= 1 && x <= 20))
      val want = rb.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rd.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getDouble(1) == want, s"rrf decomposition broke for $r")
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(1) >= b.getDouble(1))
      case _ => ()
    }
  }

  // ------------------------------------------------ triangle-counting laws
  test("triangle clustering: handshake, Σtriangles = 3·T, coefficient bounds") {
    val rows = ops.GraphOps.triangleClustering(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val degSum = rows.map(_.getLong(1)).sum
    assert(degSum % 2 == 0, "handshake lemma: Σdeg must be even")
    val triSum = rows.map(_.getLong(2)).sum
    assert(triSum % 3 == 0,
      "every triangle must be counted at exactly its 3 corners")
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      // a node's triangles can't exceed its neighbor pairs
      assert(tri <= deg * (deg - 1) / 2, s"triangles exceed C(deg,2): $r")
      if (deg >= 2) {
        val cc = r.getDouble(3)
        assert(cc >= 0.0 && cc <= 1.0, s"clustering out of [0,1]: $r")
        assert(cc == 2.0 * tri / (deg * (deg - 1)), s"cc decomposition: $r")
      } else assert(r.isNullAt(3), "degree-1 node must report null cc")
    }
  }

  // ------------------------------------------------- benford screen laws
  test("benford digits: counts partition the orders table, shares decompose") {
    val rows = ops.StatsOps.benfordDigits(spark, sfDir).collect()
    val total = Registry.table(spark, sfDir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "digit counts must partition the table")
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / total,
        s"share decomposition broke for $r")
      assert(r.getDouble(4) == r.getDouble(2) - r.getDouble(3),
        s"excess decomposition broke for $r")
    }
  }

  // ---------------------------------------------------- theil-sen laws
  test("theil-sen trend equals the direct median of pairwise daily slopes") {
    val row = ops.StatsOps.theilSenTrend(spark, sfDir).collect().head
    val daily = Registry.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d")).count()
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- daily.indices if i < j
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1).toDouble).sorted
    val m = slopes.length
    val expect =
      if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2
    assert(row.getLong(0) == daily.length && row.getLong(1) == m)
    assert(row.getDouble(2) == expect,
      s"sen slope ${row.getDouble(2)} != direct median $expect")
  }

  // ----------------------------------------------------- k-center laws
  test("k-center coreset: radius sequence non-increasing, picks distinct, " +
      "distances match the chosen set") {
    val picks = ops.SamplingOps.kcenterCoreset(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(picks.length == 5 && picks.head == ((0L, 0L, 0L)))
    assert(picks.map(_._2).distinct.length == 5, "a vector was picked twice")
    picks.sliding(2).foreach {
      case Array(a, b) =>
        if (a._1 > 0) assert(a._3 >= b._3,
          s"greedy radius must not increase: $a -> $b")
      case _ => ()
    }
    // recompute each pick's min-distance-to-previous-set directly
    val qv = Registry.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 1000000.0).cast("long")).as("qv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    picks.drop(1).zipWithIndex.foreach { case ((_, v, sd), i) =>
      val prev = picks.take(i + 1).map(_._2)
      assert(prev.map(p => d2(qv(v), qv(p))).min == sd,
        s"sel_dist2 of pick ${i + 1} doesn't match the chosen set")
    }
  }

  // --------------------------------------------------------- gini laws
  test("gini quantity equals the direct mean-absolute-difference index") {
    val rows = ops.StatsOps.giniQuantity(spark, sfDir).collect()
    val qs = Registry.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach { r =>
      val xs = qs(r.getString(0))
      assert(r.getLong(1) == xs.length)
      val num = (for { a <- xs; b <- xs } yield math.abs(a - b)).map(BigInt(_)).sum
      val direct = num.toDouble / (2.0 * xs.length.toDouble * xs.sum.toDouble)
      val g = r.getDouble(2)
      assert(g >= 0 && g < 1 && math.abs(g - direct) < 1e-12,
        s"gini $g != direct $direct for ${r.getString(0)}")
    }
  }

  // -------------------------------------------------- mann-whitney laws
  test("mann-whitney U equals the direct pairwise count with half-ties") {
    val row = ops.StatsOps.mannWhitney(spark, sfDir).collect().head
    val vals = Registry.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(30,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val g1 = vals.filter(_._1 == "1-URGENT").map(_._2)
    val g2 = vals.filter(_._1 == "5-LOW").map(_._2)
    assert(row.getLong(0) == g1.length && row.getLong(1) == g2.length)
    // U1 = #{(x,y): x>y} + ties/2, directly over all cross pairs
    val u2x = (for { x <- g1; y <- g2 } yield
      if (x > y) 2L else if (x == y) 1L else 0L).map(BigInt(_)).sum
    assert(row.getDouble(2) == u2x.toDouble / 2.0,
      s"U1 ${row.getDouble(2)} != direct ${u2x.toDouble / 2.0}")
    assert(!row.getDouble(3).isNaN)
  }

  // --------------------------------------------- label propagation laws
  test("label propagation: labels are graph nodes, sizes consistent") {
    val rows = ops.GraphOps.labelPropagation(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCommunity = rows.groupBy(_.getLong(1))
    rows.foreach { r =>
      assert(byCommunity(r.getLong(1)).length == r.getLong(2),
        s"community_size mismatch for $r")
    }
    // one size per distinct community sums back to the node count
    assert(byCommunity.map { case (_, g) => g.head.getLong(2) }.sum ==
      rows.length, "community sizes must partition the node set")
    assert(byCommunity.keySet.forall(l => l >= 0 && l <= 24),
      "community labels must be nation keys")
  }

  // --------------------------------------------------------- cusum laws
  test("cusum changepoint equals the direct argmax of |S_k|") {
    val row = ops.StatsOps.cusumChangepoint(spark, sfDir).collect().head
    val daily = Registry.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d")).count().collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .sortBy(_._1)
    val d = daily.length
    val nt = daily.map(_._2).sum
    var cum = 0L
    val scored = daily.zipWithIndex.map { case ((day, n), i) =>
      cum += n
      (day, cum * d - (i + 1).toLong * nt, cum, i + 1)
    }
    val best = scored.maxBy(t => (math.abs(t._2), -t._1))
    assert(row.getLong(0) == best._1,
      s"changepoint ${row.getLong(0)} != direct ${best._1}")
    assert(row.getDouble(1) == math.abs(best._2).toDouble / d.toDouble)
    assert(row.getDouble(2) == best._3.toDouble / best._4.toDouble)
    assert(row.getLong(4) == d)
  }

  // ----------------------------------------------------- runs test laws
  test("runs test counts sign runs around the lower median exactly") {
    val row = ops.StatsOps.runsTest(spark, sfDir).collect().head
    val daily = Registry.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d")).count().collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .sortBy(_._1)
    val med = daily.map(_._2).zip(daily.map(_._1)).sorted
      .apply((daily.length + 1) / 2 - 1)._1
    val signs = daily.filter(_._2 != med).map(_._2 > med)
    val runs = 1 + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
    assert(row.getLong(0) == runs, s"runs ${row.getLong(0)} != $runs")
    assert(row.getLong(1) == signs.count(identity))
    assert(row.getLong(2) == signs.count(!_))
    assert(row.getLong(0) <= row.getLong(1) + row.getLong(2))
    assert(!row.getDouble(4).isNaN)
  }

  // ------------------------------------------------------ autocorr laws
  test("autocorr: r_k bounded by 1, pair counts shrink by k, r_1 matches direct") {
    val rows = ops.StatsOps.autocorrLag(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    val daily = Registry.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("d")).count().collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .sortBy(_._1).map(_._2)
    val d = daily.length
    val nt = daily.sum
    val c = daily.map(x => BigInt(x * d - nt))
    val den = c.map(v => v * v).sum
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      assert(r.getLong(1) == d - k, s"n_pairs for lag $k")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12, s"|r_$k| > 1")
      val num = (0 until d - k).map(i => c(i) * c(i + k)).sum
      assert(r.getDouble(2) == num.toDouble / den.toDouble,
        s"r_$k ${r.getDouble(2)} != direct ${num.toDouble / den.toDouble}")
    }
  }

  // --------------------------------------------------------- kcore laws
  test("kcore: non-members have zero degree, degree sum even, core size sane") {
    val rows = ops.GraphOps.kcore(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      if (!r.getBoolean(1)) assert(r.getLong(2) == 0L, s"pruned node with degree: $r")
    }
    val inCore = rows.filter(_.getBoolean(1))
    // a 3-core is empty or has >= 4 nodes, and the handshake law holds
    assert(inCore.isEmpty || inCore.length >= 4)
    assert(inCore.map(_.getLong(2)).sum % 2 == 0, "degree sum must be even")
  }

  // ----------------------------------------------------- top paths laws
  test("top paths: at most 4 steps per path, frequencies ranked") {
    val rows = ops.EventOps.topPaths(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getString(0).split(">").length <= 4, s"path too long: $r")
    }
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).toSeq
      .sorted(Ordering[Long].reverse), "paths must rank by frequency")
  }

  // -------------------------------------------------- manifest diff laws
  test("manifest diff: file classes partition each source's file set") {
    val rows = ops.LayoutOps.manifestDiff(spark, sfDir).collect()
    val files = Registry.table(spark, sfDir, "documents")
      .groupBy(col("source"), expr("doc_id div 50")).count().collect()
      .groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(rows.map(_.getString(0)).toSet == files.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) ==
        files(r.getString(0)),
        s"added+rewritten+unchanged must cover the files of $r")
    }
  }

  // ---------------------------------------------------- phrase rank laws
  test("phrase rank: hits bounded by both term frequencies, matches direct count") {
    val rows = ops.SearchOps.phraseRank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Registry.table(spark, sfDir, "documents")
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val hits = r.getLong(2)
      assert(hits <= math.min(r.getLong(3), r.getLong(4)),
        s"phrase hits exceed a term frequency: $r")
      val t = texts(r.getLong(0)).split("[^a-z]+").filter(_.nonEmpty)
      val direct = t.indices.dropRight(1)
        .count(i => t(i) == "sort" && t(i + 1) == "merge")
      assert(hits == direct, s"hits $hits != direct $direct for ${r.getLong(0)}")
      assert(r.getLong(3) == t.count(_ == "sort"))
      assert(r.getLong(4) == t.count(_ == "merge"))
    }
  }

  // ------------------------------------------------------ freshness laws
  test("freshness lag: exactly one fresh feed at lag 0, lags nonnegative") {
    val rows = ops.QualityOps.freshnessLag(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getLong(3) == 0L) >= 1, "freshest feed must lag 0")
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"negative lag: $r")
      // stale is decided on the micros grid; seconds truncate, so the
      // boundary second is ambiguous either way
      if (r.getBoolean(4)) assert(r.getLong(3) >= 86400L, s"stale too early: $r")
      else assert(r.getLong(3) <= 86400L, s"fresh but lagging: $r")
    }
  }

  // ---------------------------------------------------- ivf recall laws
  test("ivf recall: intersections bounded by the exact set, ratios decompose") {
    val rows = ops.Similarity.ivfRecall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ne, cl, cm) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(ne > 0 && cl <= ne && cm <= ne, s"intersection exceeds exact: $r")
      assert(r.getDouble(3) == cl.toDouble / ne.toDouble)
      assert(r.getDouble(5) == cm.toDouble / ne.toDouble)
    }
  }

  // -------------------------------------------------- survivorship laws
  test("survivorship totals agree with canonical pick, rates decompose") {
    val rows = ops.DedupClusters.survivorship(spark, sfDir).collect()
    val pick = ops.DedupClusters.canonicalPick(spark, sfDir).collect()
    val nDocs = Registry.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs,
      "docs_total must partition the corpus")
    assert(rows.map(_.getLong(2)).sum == pick.count(_.getLong(2) == 1L),
      "kept docs must equal the canonical rows")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
      assert(r.getLong(5) <= r.getLong(4))
      assert(r.getDouble(6) ==
        (r.getLong(1) - r.getLong(2)).toDouble / r.getLong(1).toDouble)
    }
  }

  // ------------------------------------------------- zone-map pruning laws
  test("zone-map pruning: file classes partition files, rows decompose") {
    val rows = ops.LayoutOps.zoneMapPruning(spark, sfDir).collect()
    assert(rows.length == 8)
    val files = Registry.table(spark, sfDir, "documents")
      .groupBy(col("source"), expr("doc_id div 50")).count().collect()
    val nFiles = files.length
    val nRows = files.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == nFiles,
        s"pruned+full+partial must partition the files: $r")
      assert(r.getLong(5) + r.getLong(6) == nRows,
        s"skipped+must_scan must partition the rows: $r")
    }
    // thresholds ascend and pruning is monotone in t
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) <= b.getLong(1))
        assert(a.getLong(2) <= b.getLong(2), "pruned files monotone in t")
      case _ => ()
    }
  }
}
