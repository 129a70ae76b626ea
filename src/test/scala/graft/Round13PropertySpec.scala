package graft

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Round-13 laws for the two-level IVF assignment
  * ([[ops.Similarity.ivfAssignTwoLevel]] — the O(n·cells) → O(n·√cells)
  * fix the 100× smoke forced).
  *
  * The heavyweight law is a THIRD independent implementation: the
  * assignment is recomputed in plain Scala nested loops (no Spark, no
  * SQL) over a deterministic synthetic corpus and compared for EXACT set
  * equality. The DuckDB oracles already mirror the Spark plan CTE-for-CTE,
  * but both sides there share one author reading one construction — a
  * shared misreading (wrong tie order, off-by-one probe rank, fine
  * ownership as a relation instead of a function) would hash-match while
  * being wrong. The flat-loop twin breaks that symmetry.
  */
class Round13PropertySpec extends SparkSpec {

  test("coarseCount is the smallest c with c*c >= k") {
    val cases = Seq(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 3L,
      15L -> 4L, 16L -> 4L, 17L -> 5L, 63L -> 8L, 64L -> 8L, 65L -> 9L,
      1563L -> 40L, (1L << 40) -> (1L << 20))
    for ((k, expect) <- cases) {
      val c = ops.Similarity.coarseCount(k)
      assert(c === expect, s"coarseCount($k)")
      assert(c * c >= k && (c - 1) * (c - 1) < k, s"minimality at $k")
    }
  }

  /** Deterministic synthetic corpus: 300 vectors of 8 md5-derived small
    * ints. Small dims keep the flat-loop twin readable; the helper is
    * dimension-agnostic.
    */
  private val Dim = 8
  private val N = 300
  private def vec(id: Int): Array[Long] = {
    val md = MessageDigest.getInstance("md5")
    val h = md.digest(s"r13:$id".getBytes("UTF-8"))
    Array.tabulate(Dim)(d => (h(d) & 0x7fL) - 40L)
  }
  private def nrmOf(v: Array[Long]): Long = v.map(x => x * x).sum
  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum
  private def d2(a: Array[Long], b: Array[Long]): Long =
    nrmOf(a) + nrmOf(b) - 2 * dot(a, b)

  test("two-level assignment equals an independent flat-loop computation") {
    val kCells = 24L // forces a non-trivial hierarchy: coarse = 5
    val probes = 2
    val cc = ops.Similarity.coarseCount(kCells)
    assert(cc === 5)

    // flat-loop twin, written from the CONSTRUCTION (not from the code):
    val vecs = (0 until N).map(i => i.toLong -> vec(i)).toMap
    val fineIds = (0L until kCells).toSeq
    val coarseIds = (0L until cc).toSeq
    // each fine -> its single owning coarse: min (dist2, coarse_id)
    val owner: Map[Long, Long] = fineIds.map { f =>
      f -> coarseIds.minBy(g => (d2(vecs(f), vecs(g)), g))
    }.toMap
    val expected: Set[(Long, Long)] = (0 until N).flatMap { i =>
      val v = vecs(i.toLong)
      val myCoarse = coarseIds.sortBy(g => (d2(v, vecs(g)), g))
        .take(ops.Similarity.CoarseProbes)
      val candidateFines = fineIds.filter(f => myCoarse.contains(owner(f)))
      candidateFines.sortBy(f => (d2(v, vecs(f)), f)).take(probes)
        .map(cell => (i.toLong, cell))
    }.toSet

    // the Spark side, over the same vectors
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("qv", ArrayType(LongType, containsNull = false), false),
      StructField("nrm", LongType, nullable = false)))
    val rows = (0 until N).map { i =>
      val v = vec(i); Row(i.toLong, v.toSeq, nrmOf(v))
    }
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    import org.apache.spark.sql.functions.col
    val fine = corpus.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"),
        col("nrm").as("cnrm"))
    val coarse = corpus.filter(col("vec_id") < cc)
      .select(col("vec_id").as("coarse_id"), col("qv").as("gv"),
        col("nrm").as("gnrm"))
    graft.functions.VectorFunctions.register(spark)
    val got = ops.Similarity.ivfAssignTwoLevel(corpus, fine, coarse, probes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got === expected,
      s"assignment diverged; only-spark=${(got -- expected).take(5)} " +
        s"only-flat=${(expected -- got).take(5)}")
    // structural corollaries of the construction
    val perVec = got.groupBy(_._1).map(_._2.size)
    assert(perVec.forall(c => c >= 1 && c <= probes))
    assert(got.map(_._2).forall(_ < kCells))
  }
}
