package graft.osm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Polygon dissolve — the `ST_Union` AGGREGATE over polygon geometries
  * (PostGIS `ST_Union(geom)` GROUP BY, QGIS "dissolve"): merge each
  * group's edge-sharing polygons into union shells with holes
  * preserved. The canonical GIS use is collapsing admin areas upward
  * (municipalities -> region), exactly the geometry family the
  * reference manipulates as assembled multipolygons.
  *
  * Algorithm (coverage dissolve): orient every ring CCW, explode
  * directed edges, CANCEL interior boundaries (an edge shared by two
  * adjacent polygons appears once per direction — remove both), and
  * re-stitch the surviving boundary edges into rings per group. Union
  * shells come out CCW (positive shoelace), holes CW (negative) —
  * orientation classifies them for free.
  *
  * Contract: inputs form a COVERAGE — polygons may touch but not
  * overlap, and shared boundaries use identical vertex chains (true of
  * OSM-derived polygons, which share the boundary ways themselves, the
  * same bit-identical-coordinate argument as
  * [[Multipolygon.assembleRings]]'s stitcher). Overlapping-interior
  * union needs clipping (see `Geo.convexClip`/ear triangulation) and is
  * out of scope here, as it is for PostGIS users who run ST_Union over
  * admin tilings.
  *
  * Scale shape: one shuffle to hash-partition edges (the anti-join key
  * is (group, edge), so both sides co-partition), then one groupByKey
  * whose per-group payload is the union's BOUNDARY — perimeter-sized,
  * orders of magnitude below the input area at any real scale (the
  * interior edges, the bulk, died in the anti-join). The stitch itself
  * is Hierholzer-style successor walking, inherently sequential per
  * ring, hence typed mapGroups (the [[Multipolygon]] policy).
  * Degree-balance at every vertex is invariant under cancellation, so
  * walks can only close, never strand (Euler's argument).
  */
object Dissolve {

  /** Dissolve `ringCol` polygons per `groupCol` (castable to long).
    * Rings may arrive open or closed, either orientation. Returns
    * `(groupCol, ring_id, ring, is_hole, area_signed)` — rings in open
    * form, shells CCW / holes CW, each rotated to start at its
    * lexicographically smallest (lon, lat) vertex, `ring_id` ordered by
    * that start vertex; `area_signed` is the shoelace area in squared
    * coordinate units (shells positive, holes negative). */
  def dissolve(polys: DataFrame, groupCol: String, ringCol: String): DataFrame = {
    val spark = polys.sparkSession
    import spark.implicits._
    val r = col("__ring")
    val open = polys
      .withColumn("__ring", col(ringCol))
      .withColumn("__ring",
        when(element_at(r, 1) === element_at(r, -1),
          slice(r, lit(1), size(r) - 1)).otherwise(r))
      .withColumn("__ring",
        when(Geo.shoelaceSigned(r) < 0, reverse(r)).otherwise(r))
    val edges = open
      .select(col(groupCol).cast("long").as("g"),
        explode(Geo.ringEdges(r)).as("e"))
      .select(col("g"), col("e.a").as("a"), col("e.b").as("b"))
      .filter(!(col("a") <=> col("b")))
    val rev = edges.select(col("g"), col("b").as("a"), col("a").as("b"))
    val boundary = edges.join(rev, Seq("g", "a", "b"), "left_anti")
      .as[(Long, Point, Point)]
    val rings = boundary.groupByKey(_._1)
      .flatMapGroups { (g: Long, it: Iterator[(Long, Point, Point)]) =>
        stitchRings(it.map(t => (t._2, t._3)).toSeq)
          .zipWithIndex.map { case (ring, i) => (g, i + 1, ring) }
      }
      .toDF("g", "ring_id", "ring")
    rings
      .withColumn("__signed", Geo.shoelaceSigned(col("ring")) / 2)
      .select(col("g").as(groupCol), col("ring_id"), col("ring"),
        (col("__signed") < 0).as("is_hole"),
        col("__signed").as("area_signed"))
  }

  private val pointOrd: Ordering[Point] =
    Ordering.by((p: Point) => (p.lon, p.lat))

  /** Hierholzer-style deterministic ring extraction from a degree-
    * balanced directed edge set: repeatedly start at the smallest
    * remaining source vertex (which is its ring's own minimum, since it
    * is the global minimum of the edges that remain) and walk smallest
    * available successors until the walk returns to the start. */
  private[graft] def stitchRings(
      edges: Seq[(Point, Point)]): Seq[IndexedSeq[Point]] = {
    import scala.collection.mutable
    val succ = mutable.TreeMap.empty[Point, mutable.ArrayBuffer[Point]](pointOrd)
    edges.foreach { case (a, b) =>
      succ.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
    }
    succ.values.foreach(v => {
      val sorted = v.sorted(pointOrd); v.clear(); v ++= sorted
    })
    val out = mutable.ArrayBuffer.empty[IndexedSeq[Point]]
    while (succ.nonEmpty) {
      val start = succ.firstKey
      val ring = mutable.ArrayBuffer(start)
      var cur = start
      var done = false
      while (!done) {
        val nexts = succ(cur)
        val nxt = nexts.remove(0)
        if (nexts.isEmpty) succ.remove(cur)
        if (nxt == start) done = true
        else { ring += nxt; cur = nxt }
      }
      out += ring.toIndexedSeq
    }
    out.toSeq
  }
}
