package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash signature aggregate: folds a group's 60-bit token hashes
  * (LONG child) straight into the packed signature. Bit j of the result
  * is set iff STRICTLY more than half of the group's hashes have bit j
  * set (Charikar 2002 sign-of-vote-sum; tie -> 0).
  *
  * This replaces the HOF formulation (per-token `transform` vote vector
  * + [[VectorSum]] + per-doc `zip_with`/`aggregate` packing): higher-
  * order functions are interpreted Expressions, and at 100 TB the vote
  * expansion runs once per TOKEN — measured 4-6x the CPU of this native
  * update loop on a 150M-token corpus, plus a per-token 60-element array
  * allocation the imperative buffer avoids entirely. O(bits) int state
  * per group, map-side partial aggregation, branch-free update.
  */
case class SimhashAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_agg"

  // votes(j) = (#hashes with bit j set) - (#hashes with bit j unset);
  // one extra slot counts rows so an empty group can return null
  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits + 1)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += ((((h >>> j) & 1L) << 1) - 1L).toInt
        j += 1
      }
      buf(bits) += 1
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j <= bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any =
    if (buf(bits) == 0) null
    else {
      var sig = 0L
      var j = 0
      while (j < bits) {
        if (buf(j) > 0) sig |= 1L << j
        j += 1
      }
      sig
    }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Int](bytes.length / 4)
    var i = 0
    while (bb.remaining() >= 4) { out(i) = bb.getInt; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
