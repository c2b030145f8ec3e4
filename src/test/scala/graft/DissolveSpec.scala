package graft

import org.apache.spark.sql.functions._

import graft.osm.{Dissolve, Point}

/** Coverage dissolve (ST_Union aggregate over polygons): shared-edge
  * cancellation, hole preservation, orientation/closure insensitivity,
  * and the area-conservation invariant. */
class DissolveSpec extends SparkTestBase {
  import spark.implicits._

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double,
      closed: Boolean = true, cw: Boolean = false): Seq[Point] = {
    val ccw = Seq(Point(x0, y0), Point(x1, y0), Point(x1, y1), Point(x0, y1))
    val base = if (cw) ccw.reverse else ccw
    if (closed) base :+ base.head else base
  }

  test("two adjacent rectangles dissolve to one 6-vertex shell, shared edge gone") {
    val df = Seq((1L, rect(0, 0, 1, 1)), (1L, rect(1, 0, 2, 1)))
      .toDF("gid", "ring")
    val out = Dissolve.dissolve(df, "gid", "ring").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Boolean]("is_hole") === false)
    assert(r.getAs[Double]("area_signed") === 2.0)
    val ring = r.getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getDouble(0), p.getDouble(1)))
    assert(ring === Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (2.0, 1.0),
      (1.0, 1.0), (0.0, 1.0)))
  }

  test("3x3 ring of cells keeps its hole: CCW shell area 9, CW hole area -1") {
    val cells = for {
      i <- 0 until 3; j <- 0 until 3 if !(i == 1 && j == 1)
    } yield (2L, rect(i, j, i + 1, j + 1))
    val out = Dissolve.dissolve(cells.toDF("gid", "ring"), "gid", "ring")
      .orderBy("ring_id").collect()
    assert(out.length === 2)
    val shell = out(0); val hole = out(1)
    assert(!shell.getAs[Boolean]("is_hole") &&
      shell.getAs[Double]("area_signed") === 9.0)
    assert(shell.getSeq[org.apache.spark.sql.Row](2).length === 12)
    assert(hole.getAs[Boolean]("is_hole") &&
      hole.getAs[Double]("area_signed") === -1.0)
    val hr = hole.getSeq[org.apache.spark.sql.Row](2)
      .map(p => (p.getDouble(0), p.getDouble(1)))
    assert(hr === Seq((1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0)))
    // area conservation: Σ signed ring areas == Σ input cell areas
    assert(out.map(_.getAs[Double]("area_signed")).sum === 8.0)
  }

  test("input orientation and closure do not matter; disjoint parts stay separate") {
    // same two-rect union but drawn CW and unclosed, plus a disjoint
    // square far away in the same group, and a second group
    val df = Seq(
      (1L, rect(0, 0, 1, 1, closed = false, cw = true)),
      (1L, rect(1, 0, 2, 1, closed = true, cw = true)),
      (1L, rect(10, 10, 11, 11, closed = false)),
      (2L, rect(5, 5, 6, 6))).toDF("gid", "ring")
    val out = Dissolve.dissolve(df, "gid", "ring")
      .orderBy("gid", "ring_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1),
      r.getAs[Boolean]("is_hole"), r.getAs[Double]("area_signed"))).toSeq
      === Seq((1L, 1, false, 2.0), (1L, 2, false, 1.0), (2L, 1, false, 1.0)))
  }

  test("stitchRings: pinch vertex (two rings sharing a corner) splits deterministically") {
    // two diamonds touching at (1,1): edges of both pass through it
    val d1 = Seq(Point(0, 1), Point(1, 0), Point(1, 1))  // triangle
    val d2 = Seq(Point(1, 1), Point(2, 0), Point(2, 2))  // triangle
    def ringEdges(r: Seq[Point]) = r.indices.map(i =>
      (r(i), r((i + 1) % r.length)))
    val rings = Dissolve.stitchRings(ringEdges(d1) ++ ringEdges(d2))
    assert(rings.length === 2)
    assert(rings.map(_.length).sorted === Seq(3, 3))
    // each ring starts at its lexicographic minimum
    rings.foreach { r =>
      assert(r.head === r.min(Ordering.by((p: Point) => (p.lon, p.lat))))
    }
  }
}
