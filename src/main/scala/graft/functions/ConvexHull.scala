package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** ST_ConvexHull as a native `TypedImperativeAggregate` over point
  * groups (the PostGIS aggregate-over-geometry-collection shape,
  * general-functions.sql sibling of the multipoint collect). Returns
  * the hull ring in our polygon model — array<struct<lon,lat>>, CCW,
  * closing vertex implied, starting at the lexicographically smallest
  * vertex — so [[Geo.polygonArea]] / [[Geo.containsPoint]] compose
  * directly on the result.
  *
  * 100 TB shape: the buffer is NOT collect_list — whenever it exceeds
  * `CompactAt` points it is compacted to its own convex hull
  * (hull(hull(A) ∪ B) == hull(A ∪ B)), so partial-aggregation state
  * stays O(hull size), the sketch-like mergeable property that makes
  * map-side partials effective: a billion-point group ships a few
  * hundred vertices between stages, not the group.
  *
  * Determinism: the result is a function of the point SET — monotone
  * chain sorts by (x, y) and strict-turn popping drops collinear and
  * duplicate points — so partition order and merge order cannot change
  * the output, and on integer-valued coordinates every orientation
  * test is an exact cross product (bit-portable across engines).
  */
case class ConvexHullAgg(
    lon: Expression,
    lat: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  import ConvexHullAgg._

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false))))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(lon, lat)
  override def prettyName: String = "convex_hull"

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    ArrayBuffer.empty[Double]

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val x = lon.eval(input); val y = lat.eval(input)
    if (x != null && y != null) {
      buf += x.asInstanceOf[Double] += y.asInstanceOf[Double]
      if (buf.length > CompactAt * 2) compact(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b1 ++= b2
    if (b1.length > CompactAt * 2) compact(b1)
    b1
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    if (buf.isEmpty) return null
    val h = hull(buf)
    new GenericArrayData(h.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    compact(buf) // ship hull vertices only
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

  override def withNewMutableAggBufferOffset(newOffset: Int): ConvexHullAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ConvexHullAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lon = newChildren(0), lat = newChildren(1))
}

object ConvexHullAgg {

  /** Compaction threshold in points; the working buffer is at most 2×
    * this (plus one), independent of group size. */
  val CompactAt = 512

  private def compact(buf: ArrayBuffer[Double]): Unit = {
    val h = hull(buf)
    buf.clear()
    h.foreach { case (x, y) => buf += x += y }
  }

  /** Andrew's monotone chain over an (x0,y0,x1,y1,…) flat buffer: CCW
    * hull, no repeated closing vertex, collinear and duplicate points
    * dropped; 1- and 2-point degenerate sets pass through. */
  private[functions] def hull(flat: ArrayBuffer[Double]): Array[(Double, Double)] = {
    val pts = Array.tabulate(flat.length / 2)(i => (flat(2 * i), flat(2 * i + 1)))
    val s = pts.distinct.sorted
    val n = s.length
    if (n <= 2) return s
    @inline def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val h = new Array[(Double, Double)](2 * n)
    var k = 0
    var i = 0
    while (i < n) { // lower chain, left to right
      while (k >= 2 && cross(h(k - 2), h(k - 1), s(i)) <= 0) k -= 1
      h(k) = s(i); k += 1; i += 1
    }
    val lower = k + 1
    i = n - 2
    while (i >= 0) { // upper chain, right to left
      while (k >= lower && cross(h(k - 2), h(k - 1), s(i)) <= 0) k -= 1
      h(k) = s(i); k += 1; i -= 1
    }
    h.take(k - 1) // last vertex repeats the first
  }
}
