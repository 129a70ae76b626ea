package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact most-frequent-value aggregate with a deterministic tiebreak
  * (highest count wins; equal counts break to the lexicographically
  * smallest value) — unlike Spark's built-in `mode`, whose tie result is
  * undefined, this is oracle-checkable and stable across partitionings.
  *
  * Implementation note: this is the library's `TypedImperativeAggregate`
  * exemplar — the extension point for aggregation state that is not a flat
  * struct (here a value→count map). The buffer lives as a JVM object inside
  * the hash-aggregate operator, serializes to bytes only at shuffle
  * boundaries (partial aggregation still applies — each executor ships one
  * map per group, not one row per input), and merges associatively, so the
  * 100 TB posture is the same as any built-in agg: map-side combine, one
  * shuffle of compact state. Cardinality caution applies as with any exact
  * mode: state is O(distinct values per group).
  *
  * The reference has no aggregate surface beyond pandas `.agg` min/max/sum
  * (SURVEY.md §2.4, `xetra_transformer.py:173-185`); this extends the
  * engine's aggregate family per §2.8's "UDF/UDAF" row.
  */
case class DeterministicMode(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mode"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.toString
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, n) => b1.update(k, b1.getOrElse(k, 0L) + n) }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    if (buf.isEmpty) null
    else UTF8String.fromString(
      buf.min(Ordering.by[(String, Long), (Long, String)] {
        case (k, n) => (-n, k)
      })._1)

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
  // UTFDataFormatException past 64 KiB and long keys are legal here
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(n)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): DeterministicMode =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DeterministicMode =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DeterministicMode =
    copy(child = c)
}
