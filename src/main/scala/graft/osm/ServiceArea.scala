package graft.osm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isochrone service-area polygon — the analog of pairing
  * `pgr_drivingDistance` with `pgr_alphaShape` (the reference's
  * pgRouting consumer emits isochrone polygons that way; see
  * osm-road-graphs.sql's exported routing graph). pgRouting's alpha
  * shape is a Delaunay-based concave hull of the reached node set;
  * the scale-honest Spark formulation is its rasterized sibling:
  * snap reached nodes to a grid (one scan + one hash-agg whose output
  * is bounded by service-area extent / cell², NOT by node count), then
  * trace the boundary ring(s) of the occupied-cell union on the
  * driver. The cell size plays alpha's role — it is the concavity
  * resolution. At 100 TB the reached set of a metro-wide isochrone is
  * millions of nodes; the cell relation stays thousands of rows, which
  * is what makes the driver-side ring walk sound (the ring itself is
  * presentation-sized output, exactly like pgr_alphaShape's).
  */
object ServiceArea {

  /** Distinct occupied grid cells of a reached-node set. `reached`
    * carries `node_id` (the SSSP/`multiSourceShortestPaths` output
    * filtered to the cutoff); `coords` maps `node_id -> (lon, lat)`.
    * One equi-join + one hash-agg; output is area-bounded. */
  def isochroneCells(reached: DataFrame, coords: DataFrame,
      cellDeg: Double): DataFrame =
    reached.select("node_id")
      .join(coords.select(col("node_id"), col("lon"), col("lat")),
        "node_id")
      .select(floor(col("lon") / cellDeg).cast("long").as("cx"),
        floor(col("lat") / cellDeg).cast("long").as("cy"))
      .distinct()

  /** Trace the boundary ring(s) of a union of grid cells. Boundary
    * edges are cell sides whose neighbor cell is unoccupied, directed
    * so the occupied interior lies on the LEFT (outer rings come out
    * counter-clockwise, holes clockwise — the OGC polygon convention).
    * Edges chain into closed rings; collinear runs merge. Determinism:
    * each ring starts at its lexicographically smallest (x, y) vertex,
    * rings sort by their start vertex. Driver-side O(#cells) — see the
    * class doc for why that is the sound placement.
    *
    * Returns (ringId, seq, x, y) in cell-grid units scaled by
    * `cellDeg`. */
  def cellUnionRings(cells: Seq[(Long, Long)], cellDeg: Double)
      : Seq[(Int, Int, Double, Double)] = {
    val occ = cells.toSet
    // directed boundary edges, interior on the left:
    //   bottom side (neighbor below empty): (x,y) -> (x+1,y)
    //   right  side (neighbor right empty): (x+1,y) -> (x+1,y+1)
    //   top    side (neighbor above empty): (x+1,y+1) -> (x,y+1)
    //   left   side (neighbor left  empty): (x,y+1) -> (x,y)
    val out = scala.collection.mutable.Map
      .empty[(Long, Long), List[(Long, Long)]]
      .withDefaultValue(Nil)
    def addEdge(a: (Long, Long), b: (Long, Long)): Unit =
      out(a) = (b :: out(a)).sorted
    occ.foreach { case (cx, cy) =>
      if (!occ((cx, cy - 1))) addEdge((cx, cy), (cx + 1, cy))
      if (!occ((cx + 1, cy))) addEdge((cx + 1, cy), (cx + 1, cy + 1))
      if (!occ((cx, cy + 1))) addEdge((cx + 1, cy + 1), (cx, cy + 1))
      if (!occ((cx - 1, cy))) addEdge((cx, cy + 1), (cx, cy))
    }
    // A vertex where two cells touch corner-to-corner has TWO outgoing
    // boundary edges; chaining must pick the one that turns most
    // sharply LEFT relative to the incoming direction so each ring
    // keeps its own interior on the left (the standard marching-
    // squares saddle rule). visited is per-EDGE: both rings through a
    // saddle vertex must be traced.
    def turnRank(din: (Long, Long), dout: (Long, Long)): Int = {
      val cross = din._1 * dout._2 - din._2 * dout._1
      if (cross > 0) 0 // left
      else if (cross == 0 && din == dout) 1 // straight
      else if (cross < 0) 2 // right
      else 3 // U-turn (degenerate; never picked if others exist)
    }
    val visited = scala.collection.mutable.Set
      .empty[((Long, Long), (Long, Long))]
    val rings = scala.collection.mutable.ArrayBuffer
      .empty[Vector[(Long, Long)]]
    out.keys.toSeq.sorted.foreach { start =>
      out(start).foreach { firstNext =>
        if (!visited((start, firstNext))) {
          val ring = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
          var prev = start
          var cur = firstNext
          visited += ((start, firstNext))
          ring += start
          while (cur != start) {
            ring += cur
            val din = (cur._1 - prev._1, cur._2 - prev._2)
            val next = out(cur)
              .filter(n => !visited((cur, n)))
              .minBy(n => turnRank(din, (n._1 - cur._1, n._2 - cur._2)))
            visited += ((cur, next))
            prev = cur
            cur = next
          }
          rings += ring.toVector
        }
      }
    }
    def dropCollinear(r: Vector[(Long, Long)]): Vector[(Long, Long)] =
      r.indices.collect { case i
        if {
          val p = r((i - 1 + r.size) % r.size); val c = r(i)
          val n = r((i + 1) % r.size)
          (c._1 - p._1) * (n._2 - c._2) != (c._2 - p._2) * (n._1 - c._1)
        } => r(i)
      }.toVector
    def canonical(r: Vector[(Long, Long)]): Vector[(Long, Long)] = {
      val i = r.indices.minBy(j => r(j))
      r.drop(i) ++ r.take(i)
    }
    rings.map(r => canonical(dropCollinear(r)))
      .sortBy(_.head)
      .zipWithIndex
      .flatMap { case (r, ri) =>
        r.zipWithIndex.map { case ((x, y), si) =>
          (ri, si, x * cellDeg, y * cellDeg)
        }
      }.toSeq
  }
}
