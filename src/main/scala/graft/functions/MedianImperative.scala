package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

import scala.collection.mutable.ArrayBuffer

/** Exact median as a native Catalyst `TypedImperativeAggregate` — the
  * low-level aggregate surface (vs the typed `Aggregator` in
  * [[MedianAggregator]]): raw object buffer, explicit binary
  * serialization for shuffle/spill, no row-encoder round-trips. Same
  * `_final_median` semantics (general-functions.sql:7-26): drop NULLs,
  * sort, average the middle one/two.
  *
  * The buffer is a primitive-backed `ArrayBuffer[Double]`; serialize
  * packs it as little-endian doubles (8 bytes/value) — the compact
  * partial-aggregation state shipped between partial and final stages.
  */
case class MedianImperative(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  // input typing: the injection site casts the child to double
  // (ExpectsInputTypes/AbstractDataType are private[sql])
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "median_exact_native"

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    ArrayBuffer.empty[Double]

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double]
    buf
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2
    b1
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    val n = buf.length
    if (n == 0) null
    else {
      val s = buf.sorted
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Double](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getDouble
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MedianImperative =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MedianImperative =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
