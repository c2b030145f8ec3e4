package graft.osm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.Geo
import graft.ops.RelOps

/** Approach 1 — geometric way splitting (osm-road-graphs-fix.sql).
  *
  * The reference computes candidate intersections with an ALL-PAIRS
  * `ST_Touches OR ST_Crosses` self-join and flags it "Does not work with
  * large maps" (osm-road-graphs-fix.sql:91). This is the scale-correct
  * re-expression: vertices are bucketed by grid cell and the self-join
  * is an EQUI-join on (cell, point) — work proportional to true vertex
  * collisions, not |ways|².
  *
  * In our geometry model (linestring = vertex array) a blade is a shared
  * interior vertex position; splitting at blades is then the same
  * assembly machinery as the topological Approach 2, which the reference
  * itself recommends as more robust (osm-road-graphs-fix.sql:13-14) —
  * the two paths are asserted equivalent on the fixture.
  */
object GeometricSplit {

  /** Interior vertex positions of each way where another way touches:
    * grid-cell + exact point equi-join, distinct (edge_id, pos). */
  def bladePositions(net: DataFrame, cellDeg: Double = 0.01): DataFrame = {
    val verts = net.select(col("edge_id"), size(col("geom")).as("n"),
        posexplode(col("geom")).as(Seq("pos", "pt")))
      .withColumn("cell", Geo.gridCell(col("pt"), cellDeg))
    val l = verts.select(col("cell"), col("pt"), col("edge_id").as("id_a"),
      col("pos").as("pos_a"), col("n").as("n_a"))
    val r = verts.select(col("cell"), col("pt"), col("edge_id").as("id_b"))
    l.join(r, Seq("cell", "pt"))
      .filter(col("id_a") =!= col("id_b") &&
        col("pos_a") > 0 && col("pos_a") < col("n_a") - 1)
      .select(col("id_a").as("edge_id"), col("pos_a").as("pos"))
      .distinct()
  }

  /** Split the network at blade positions — returns the same schema as
    * [[RoadGraph.mergedNetwork]]. Ways without blades pass through via
    * the anti-join append (osm-road-graphs-fix.sql:119 intent). */
  def split(net: DataFrame, cellDeg: Double = 0.01): DataFrame = {
    val blades = bladePositions(net, cellDeg)

    val base = blades.select(col("edge_id"),
      lag(col("pos"), 1, 0)
        .over(Window.partitionBy("edge_id").orderBy("pos")).as("bottom"),
      col("pos").as("top"))
    val maxPos = net.select(col("edge_id"), (size(col("nodes")) - 1).as("maxpos"))
    val lastSeg = RelOps.top1PerGroup(base, Seq("edge_id"), Seq(col("top").desc))
      .join(maxPos.withColumnRenamed("edge_id", "__me"),
        col("edge_id") === col("__me") && col("top") < col("maxpos"))
      .select(col("edge_id"), col("top").as("bottom"), col("maxpos").as("top"))
    val limits = base.unionByName(lastSeg)

    val verts = net.select(col("edge_id").as("__ve"),
      posexplode(arrays_zip(col("nodes"), col("geom"))).as(Seq("pos", "nv")))
    val segs = verts.join(limits,
        col("__ve") === limits("edge_id") &&
          verts("pos").between(col("bottom"), col("top")))
      .groupBy(col("__ve").as("edge_id"), col("top"))
      .agg(
        RelOps.orderedListAgg(col("pos"), col("nv.nodes")).as("nodes"),
        RelOps.orderedListAgg(col("pos"), col("nv.geom")).as("geom"))
      .select(col("edge_id"), col("nodes"), col("geom"))

    val road = net.select(col("edge_id").as("__re"), col("tags"),
      col("speed_limit"), col("highway"), col("oneway"))
    val merged = segs.join(road, col("edge_id") === col("__re"))
      .select(
        element_at(col("nodes"), 1).as("start_node"),
        element_at(col("nodes"), -1).as("end_node"),
        col("edge_id"), col("tags"), col("nodes"),
        Geo.geodesicLengthMeters(col("geom")).as("length"),
        col("speed_limit"), col("highway"), col("oneway"), col("geom"))

    val untouched = net.join(segs.select("edge_id"), Seq("edge_id"), "left_anti")
      .select("start_node", "end_node", "edge_id", "tags", "nodes",
        "length", "speed_limit", "highway", "oneway", "geom")
    merged.unionByName(untouched)
  }

  /** F23 — `pgr_createTopology` analog (osm-road-graphs-fix.sql:128-131):
    * snap edge endpoints to a tolerance grid, assign dense vertex ids
    * over the distinct snapped points, attach `source`/`target`.
    * The ranking window runs over the (small) distinct-vertex set only;
    * edges join back by snapped cell — no global window on the edge set.
    */
  def createTopology(edges: DataFrame, tolerance: Double = 1e-4): DataFrame = {
    def snap(p: org.apache.spark.sql.Column) = struct(
      round(p.getField("lon") / tolerance).cast("long").as("sx"),
      round(p.getField("lat") / tolerance).cast("long").as("sy"))
    val withSnap = edges
      .withColumn("__s", snap(element_at(col("geom"), 1)))
      .withColumn("__t", snap(element_at(col("geom"), -1)))
    val verts = withSnap.select(col("__s").as("cell"))
      .unionByName(withSnap.select(col("__t").as("cell")))
      .distinct()
      .withColumn("vertex_id",
        row_number().over(Window.orderBy(col("cell.sx"), col("cell.sy"))))
    val src = verts.select(col("cell").as("__s"), col("vertex_id").as("source"))
    val tgt = verts.select(col("cell").as("__t"), col("vertex_id").as("target"))
    withSnap.join(broadcast(src), "__s").join(broadcast(tgt), "__t")
      .drop("__s", "__t")
  }
}
