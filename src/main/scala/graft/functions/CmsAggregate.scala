package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Shared dimensions for the engine's Count-Min sketch family. All three
  * expressions (build / merge / estimate) must agree on (depth, width,
  * seed) — CMS merge is register-wise counter addition, which is only
  * defined for identically-shaped sketches, and `CountMinSketch
  * .mergeInPlace` throws on a mismatch. One definition, so the family
  * cannot drift apart.
  *
  * Width 2048 / depth 5 ⇒ the standard guarantees ε = 2/width ≈ 9.8e-4
  * (overestimate ≤ ε·N with probability 1 − 2⁻ᵈᵉᵖᵗʰ... precisely
  * 1 − e⁻ᵈᵉᵖᵗʰ for the e/width form; this uses Spark's 2/width variant)
  * and ~80 KiB of state per sketch — small enough to broadcast, big
  * enough that a 100 TB token stream's heavy hitters stay within a few
  * ε·N of exact.
  */
private[graft] object CmsDims {
  val Depth = 5
  val Width = 2048
  val Seed = 42
  def empty(): CountMinSketch = CountMinSketch.create(Depth, Width, Seed)

  def toBytes(sk: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    sk.writeTo(out)
    out.toByteArray
  }

  def fromBytes(b: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
}

/** Weighted Count-Min sketch aggregate: `cms_sketch_2048(item, weight)`
  * ingests `weight` occurrences of `item`'s string form and evaluates to
  * the serialized sketch (binary). Unlike Spark's built-in
  * `count_min_sketch` (one occurrence per row), the weight operand lets a
  * pre-aggregated postings table (term, tf) feed the sketch without
  * re-exploding to one row per occurrence — the shape that matters when
  * the postings are 1000× smaller than the token stream.
  *
  * 100 TB posture: classic sketch mergeability — the buffer is a fixed
  * 80 KiB counter table regardless of input size, partial aggregation
  * applies (each executor ships one sketch per group, not rows), and
  * merge is exact counter addition. Sketches built per-segment on
  * different days/clusters union losslessly into the global sketch
  * ([[CmsMergeAgg]]) with NO second scan of raw data — and because
  * addition is commutative/associative over identical dims, the merged
  * sketch is bit-identical to one built over the whole stream, which the
  * stats_cms_heavyhitters query asserts as an output column.
  */
case class CmsSketchAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with BinaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch_2048"

  override def createAggregationBuffer(): CountMinSketch = CmsDims.empty()

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val item = left.eval(input)
    val w = right.eval(input)
    if (item != null && w != null) {
      val n = w.asInstanceOf[Long]
      if (n > 0L) buf.addString(item.toString, n)
    }
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buf: CountMinSketch): Any = CmsDims.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = CmsDims.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CmsDims.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsSketchAgg = copy(left = l, right = r)
}

/** Lossless union of serialized Count-Min sketches:
  * `cms_merge_2048(sketch_binary)` — register-wise counter addition over
  * [[CmsDims]]-shaped sketches. The distributed half of the
  * sketch-per-segment pattern: per-segment sketches (tiny binaries)
  * shuffle instead of raw keys, and the result equals the
  * single-global-sketch bytes exactly.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_merge_2048"

  override def createAggregationBuffer(): CountMinSketch = CmsDims.empty()

  override def update(buf: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buf.mergeInPlace(CmsDims.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buf: CountMinSketch): Any = CmsDims.toBytes(buf)

  override def serialize(buf: CountMinSketch): Array[Byte] = CmsDims.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CmsDims.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
}

/** Point-query a serialized Count-Min sketch:
  * `cms_estimate(sketch_binary, item)` → the sketch's (never-under)
  * frequency estimate for `item`'s string form. CodegenFallback is fine:
  * estimates are read off a bounded result frame (top-k rows × one
  * broadcast sketch), never the token stream. The deserialized sketch is
  * cached per expression instance keyed on the byte-array reference, so a
  * broadcast sketch column is parsed once per task, not once per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override protected def nullSafeEval(sketch: Any, item: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = CmsDims.fromBytes(bytes)
      lastBytes = bytes
    }
    lastSketch.estimateCount(item.toString)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}
