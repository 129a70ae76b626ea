package graft.functions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared parameters for the engine's KLL quantile-sketch family — the
  * third mergeable sketch next to HLL (distinct counts) and Count-Min
  * (frequencies). One definition so build / merge / query agree on k, and
  * one place that records the determinism taxonomy:
  *
  * UNLIKE the other two, KLL is a sampling sketch — level compaction flips
  * coins (`KllSketch.random`, an unseeded JVM-wide source) and the result
  * depends on merge order, so per-segment-merged bytes are NOT identical
  * to a single global sketch and repeated runs give slightly different
  * (always within-band) estimates. That is the same taxonomy as Spark's
  * `approx_percentile`: the query is a deliberate rows-only registry entry,
  * excluded from DeterminismSpec, and gated instead by the published
  * normalized-rank-error law against exact order statistics
  * (Round11PropertySpec) — what IS exact and order-free is the stream
  * length n, which the query surfaces as a merge-accounting column.
  *
  * k = 200 ⇒ normalized rank error ≈ 1.65% (two-sided, 99% confidence,
  * `KllSketch.getNormalizedRankError(200, false)`) at a few KiB of state —
  * small enough to broadcast, accurate enough that a 100 TB scan's
  * per-segment sketches merge into global percentiles without a second
  * pass or any shuffle of raw values.
  */
private[graft] object KllDims {
  val K = 200
  def empty(): KllLongsSketch = KllLongsSketch.newHeapInstance(K)
  def toBytes(sk: KllLongsSketch): Array[Byte] = sk.toByteArray
  def fromBytes(b: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(b))
  /** Two-sided normalized rank error bound at 99% confidence for k=200. */
  def rankError: Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(K, false)
}

/** Weighted KLL quantile-sketch aggregate: `kll_sketch_200(value, weight)`
  * ingests `weight` copies of the int64 `value` and evaluates to the
  * serialized sketch. The weight operand plays the same role as in
  * [[CmsSketchAgg]]: a pre-aggregated (value, count) table feeds the
  * sketch without re-exploding to one row per occurrence.
  *
  * 100 TB posture: fixed ~KiB state regardless of input, partial
  * aggregation ships sketches (not rows), merge is a valid KLL union with
  * composed error ≤ the same k=200 bound — the classic
  * sketch-per-segment / merge-for-global pattern for percentile
  * monitoring over data too large to sort.
  */
case class KllSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch]
  with BinaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_200"

  override def createAggregationBuffer(): KllLongsSketch = KllDims.empty()

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null) {
      val n = w.asInstanceOf[Long]
      if (n > 0L) buf.update(v.asInstanceOf[Long], n)
    }
    buf
  }

  override def merge(b1: KllLongsSketch, b2: KllLongsSketch): KllLongsSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllLongsSketch): Any = KllDims.toBytes(buf)

  override def serialize(buf: KllLongsSketch): Array[Byte] = KllDims.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllDims.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllSketchAgg = copy(left = l, right = r)
}

/** Union of serialized KLL sketches: `kll_merge_200(sketch_binary)`. The
  * result is a valid KLL sketch over the concatenated streams whose rank
  * error stays within the k=200 bound (KLL merge does not grow error),
  * and whose total n is EXACTLY the sum of the inputs' — but, being a
  * sampling structure, its retained items are not byte-identical to a
  * single global sketch (see [[KllDims]]).
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllLongsSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_200"

  override def createAggregationBuffer(): KllLongsSketch = KllDims.empty()

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllDims.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: KllLongsSketch, b2: KllLongsSketch): KllLongsSketch = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllLongsSketch): Any = KllDims.toBytes(buf)

  override def serialize(buf: KllLongsSketch): Array[Byte] = KllDims.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllDims.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Quantile point-query over a serialized KLL sketch, INCLUSIVE search
  * criteria (the item whose inclusive rank first reaches the target —
  * `quantile_disc` semantics). `mode` selects the estimate or the
  * sketch's own 99%-confidence bounds:
  * `kll_quantile(sk, p)` / `kll_quantile_lb(sk, p)` / `kll_quantile_ub(sk, p)`.
  * CodegenFallback + a per-instance parse cache (same pattern as
  * [[CmsEstimate]]): queries run on a bounded rank frame × one broadcast
  * sketch, never the raw stream. Null on an empty sketch.
  */
case class KllQuantileQuery(left: Expression, right: Expression, mode: String)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = s"kll_quantile_$mode"

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: KllLongsSketch = _

  override protected def nullSafeEval(sketch: Any, rank: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = KllDims.fromBytes(bytes)
      lastBytes = bytes
    }
    if (lastSketch.isEmpty) null
    else {
      val p = rank.asInstanceOf[Double]
      mode match {
        case "est" => lastSketch.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
        case "lb" => lastSketch.getQuantileLowerBound(p)
        case "ub" => lastSketch.getQuantileUpperBound(p)
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantileQuery = copy(left = l, right = r)
}

/** Exact stream length of a serialized KLL sketch: `kll_n(sk)`. n is the
  * one fully deterministic, order-free component of the sketch — the
  * merge-accounting column queries use to prove no segment was dropped.
  */
case class KllN(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_n"

  override protected def nullSafeEval(sketch: Any): Any =
    KllDims.fromBytes(sketch.asInstanceOf[Array[Byte]]).getN

  override protected def withNewChildInternal(c: Expression): KllN =
    copy(child = c)
}
