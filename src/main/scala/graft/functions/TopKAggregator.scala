package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k state: parallel arrays sorted by (value desc, key asc),
  * length ≤ k. Arrays (not a heap object) so the buffer stays a flat,
  * codegen-friendly Catalyst struct.
  */
case class TopKBuf(vs: Array[Double], ks: Array[Long])

/** Top-k (value, key) per group as a custom typed `Aggregator` — the
  * sort-free alternative to the `row_number` window for top-k-per-group.
  * Spark 4's own rank-limit pushdown (`WindowGroupLimit`, verified in
  * PlanSpec) already caps the window form's shuffle at k rows per group
  * per partition, but it still *fully sorts every input partition* (twice:
  * partial and final) to find those rows — O(n log n) per partition. This
  * aggregates with a bounded insertion buffer instead: O(n·k) with k tiny,
  * no sort anywhere, and hash (not sort) aggregation on both sides of the
  * exchange. At 100 TB with k=3 the two plans shuffle the same bytes but
  * this one never sorts billions of rows to keep three per group.
  *
  * Deterministic total order: value descending, key ascending as the
  * tiebreak — identical to the window query and its oracle.
  */
class TopKByValue(k: Int)
  extends Aggregator[(Long, Double), TopKBuf, TopKBuf] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  private def beats(v1: Double, k1: Long, v2: Double, k2: Long): Boolean =
    v1 > v2 || (v1 == v2 && k1 < k2)

  private def insert(b: TopKBuf, v: Double, key: Long): TopKBuf = {
    val len = b.vs.length
    if (len == k && !beats(v, key, b.vs(len - 1), b.ks(len - 1))) b
    else {
      var i = 0
      while (i < len && beats(b.vs(i), b.ks(i), v, key)) i += 1
      val n = math.min(len + 1, k)
      val vs = new Array[Double](n)
      val ks = new Array[Long](n)
      Array.copy(b.vs, 0, vs, 0, i)
      Array.copy(b.ks, 0, ks, 0, i)
      vs(i) = v; ks(i) = key
      val tail = math.min(len - i, n - i - 1)
      Array.copy(b.vs, i, vs, i + 1, tail)
      Array.copy(b.ks, i, ks, i + 1, tail)
      TopKBuf(vs, ks)
    }
  }

  override def reduce(b: TopKBuf, a: (Long, Double)): TopKBuf =
    insert(b, a._2, a._1)

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var r = b1
    var i = 0
    while (i < b2.vs.length) { r = insert(r, b2.vs(i), b2.ks(i)); i += 1 }
    r
  }

  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

object TopKByValue {
  /** Column-level form: `topk(keyCol, valueCol)` → struct(vs, ks). */
  def column(k: Int): UserDefinedFunction =
    udaf(new TopKByValue(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
}
