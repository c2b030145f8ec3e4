package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra-Gries heavy-hitter sketch as a native Catalyst
  * `TypedImperativeAggregate`: a bounded `k`-counter frequency summary
  * (Misra & Gries 1982) whose partial states merge associatively
  * (Agarwal et al., "Mergeable Summaries", PODS 2012), so partial
  * aggregation works exactly like any built-in agg — each partition
  * streams its rows through a k-entry map, and the shuffle carries one
  * O(k) summary per partition instead of the data.
  *
  * Guarantee after any merge tree: every surviving counter is a LOWER
  * bound on the item's true frequency, under-counting by at most
  * N/(k+1). Hence any item with true frequency > N/(k+1) is guaranteed
  * present in the result — the candidate-generation half of the
  * classic two-pass exact heavy-hitter algorithm (see
  * [[graft.llm.HeavyHitters]] for the recount pass).
  *
  * Result type: `array<struct<item: string, lb: bigint>>`, sorted by
  * `lb` descending then `item`, at most `k` entries.
  *
  * 100 TB shape: state is O(k) per partition regardless of input size
  * or key cardinality — this is what you reach for when a plain
  * `GROUP BY` on a billion-key column would shuffle the world just to
  * find the few globally-frequent items.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("lb", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          // classic MG decrement-all; happens at most N/(k+1) times
          // total, so the O(k) sweep amortizes to O(1) per input row
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    if (b1.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // count from every counter and drop the non-positive ones —
      // keeps <= k entries and only widens the under-count by that
      // subtracted value (total under-count stays <= N/(k+1))
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      b1.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else b1.update(key, c - cut)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy { case (item, lb) => (-lb, item) }
    new GenericArrayData(entries.map { case (item, lb) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), lb))
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(bytes.map(_.length + 12).sum)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = mutable.HashMap.empty[String, Long]
    while (bb.remaining() >= 12) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      out.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
