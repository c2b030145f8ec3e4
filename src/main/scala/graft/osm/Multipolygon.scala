package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** OSM multipolygon assembly — the step that turns the pgsnapshot
  * relation surface the reference loads (`relations` +
  * `relation_members`, pgsnapshot_schema_0.6.sql:62-75) into actual
  * polygons-with-holes. In OSM, area features above way size exist ONLY
  * as `type=multipolygon` relations whose member ways carry `outer` /
  * `inner` roles, each ring possibly split across many ways drawn in
  * arbitrary direction; PostGIS users get the assembled geometry from
  * osm2pgsql, but on the raw pgsnapshot schema (what the reference's
  * Osmosis load produces) it must be stitched. This is that operator.
  *
  * Scale shape: one shuffle to co-locate a relation's member ways
  * (equi-join members→ways, then groupByKey on (relation, role)), then
  * per-group imperative ring stitching. Per-group payload is one
  * relation's member geometry — bounded by OSM's relation sizes (10^3
  * ways for the largest coastline-scale objects), never data-scale, so
  * the mapGroups stage is embarrassingly parallel with driver-free
  * memory. Stitching is inherently sequential per ring (each append
  * depends on the accumulated endpoint), which is why this is typed
  * mapGroups and not a Catalyst expression chain.
  */
object Multipolygon {

  /** Assembled rings: `(relation_id, role, ring_id, ring, closed)`.
    * Rings are stitched greedily endpoint-to-endpoint with direction
    * flips (OSM ways within a ring are drawn in arbitrary direction);
    * a group may yield several rings (multipolygons may have many
    * outers and many holes). `ring_id` orders rings deterministically
    * by their first-appearing member way (members arrive
    * sequence_id-sorted). Unclosed chains (broken data) surface with
    * `closed = false` so data-quality checks can anti-join them out
    * instead of silently dropping. */
  def assembleRings(members: DataFrame, ways: DataFrame): DataFrame = {
    val spark = members.sparkSession
    import spark.implicits._
    val segs = members
      .filter(col("member_type") === "W" &&
        col("member_role").isin("outer", "inner"))
      .select(col("relation_id"), col("member_role").as("role"),
        col("sequence_id"), col("member_id").as("way_id"))
      .join(ways.select(col("id").as("way_id"), col("linestring")), "way_id")
      .select(col("relation_id"), col("role"), col("sequence_id"),
        col("linestring"))
      .as[(Long, String, Int, Seq[Point])]
    segs.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, String),
          it: Iterator[(Long, String, Int, Seq[Point])]) =>
        val lines = it.toSeq.sortBy(_._3).map(_._4.toIndexedSeq)
        stitch(lines).zipWithIndex.map { case (ring, i) =>
          (key._1, key._2, i + 1, ring,
            ring.length >= 4 && ring.head == ring.last)
        }
      }
      .toDF("relation_id", "role", "ring_id", "ring", "closed")
  }

  /** Greedy endpoint stitcher: grow from the first unused segment,
    * appending the lowest-index segment that continues the open end
    * (reversed if drawn the other way), until the ring closes or no
    * continuation exists. Exact-coordinate matching is correct on OSM
    * data because ways in a ring SHARE the junction node, hence
    * bit-identical lon/lat.
    *
    * O(n) via an endpoint index (point -> ordered segment ids) — this
    * is the mega-relation skew guard: a pathological 10^5-way relation
    * costs its one task LINEAR work, comparable to any other task's
    * share of normal relations, instead of the quadratic pool scan
    * that made one hot task dominate the stage (MpSmoke's skew variant
    * pins the wall-clock bound). Selection order is bit-identical to
    * the original quadratic scan: smallest surviving index among
    * segments touching the open end, head-match preferred when one
    * segment matches with both ends. */
  private def stitch(
      segs: Seq[IndexedSeq[Point]]): Seq[IndexedSeq[Point]] = {
    import scala.collection.mutable
    val ss = segs.filter(_.length >= 2).toIndexedSeq
    val n = ss.length
    val used = new Array[Boolean](n)
    // endpoint -> (segment id -> bitmask: 1 = matches at head, 2 = at last)
    val idx = mutable.HashMap.empty[Point, java.util.TreeMap[Integer, Integer]]
    def addEnd(p: Point, i: Int, bit: Int): Unit = {
      val tm = idx.getOrElseUpdate(p, new java.util.TreeMap[Integer, Integer])
      tm.merge(i, bit, (a, b) => Integer.valueOf(a | b))
    }
    var i = 0
    while (i < n) { addEnd(ss(i).head, i, 1); addEnd(ss(i).last, i, 2); i += 1 }
    def drop(i: Int): Unit = {
      def rm(p: Point): Unit = idx.get(p).foreach { tm =>
        tm.remove(Integer.valueOf(i)); if (tm.isEmpty) idx.remove(p)
      }
      rm(ss(i).head)
      if (ss(i).last != ss(i).head) rm(ss(i).last)
    }
    val rings = mutable.ArrayBuffer[IndexedSeq[Point]]()
    var next = 0
    while (next < n) {
      if (used(next)) next += 1
      else {
        used(next) = true; drop(next)
        val ring = mutable.ArrayBuffer[Point](ss(next): _*)
        var progress = true
        while (ring.head != ring.last && progress) {
          idx.get(ring.last) match {
            case Some(tm) =>
              val e = tm.firstEntry()
              val j = e.getKey.intValue(); val mask = e.getValue.intValue()
              used(j) = true; drop(j)
              val s = ss(j)
              if ((mask & 1) != 0) ring ++= s.tail
              else ring ++= s.reverse.tail
            case None => progress = false
          }
        }
        rings += ring.toIndexedSeq
      }
    }
    rings.toSeq
  }

  /** Per-relation polygon accounting over the assembled rings:
    * `(relation_id, n_outer, n_inner, area_deg2)` with
    * area = Σ outer ring areas − Σ inner hole areas (planar shoelace in
    * squared degrees; project first for m² — [[Geo.polygonAreaM2]]).
    * Only closed rings count; one hash-agg after assembly. */
  def multipolygonAreas(members: DataFrame, ways: DataFrame): DataFrame =
    assembleRings(members, ways)
      .filter(col("closed"))
      .withColumn("a", Geo.polygonArea(col("ring")))
      .groupBy("relation_id")
      .agg(
        sum(when(col("role") === "outer", 1L).otherwise(0L)).as("n_outer"),
        sum(when(col("role") === "inner", 1L).otherwise(0L)).as("n_inner"),
        sum(when(col("role") === "outer", col("a")).otherwise(-col("a")))
          .as("area_deg2"))

  /** Point-in-multipolygon join (`ST_Contains` against polygons WITH
    * holes): `(pointId, relation_id)` for every point inside one of a
    * relation's outer rings and NOT inside any of its holes. Both legs
    * are the grid-bucketed [[Geo.containsJoin]] (equi-join on cell,
    * ray-cast refinement — never all-pairs), composed with one
    * left-anti on (point, relation): the "which park is this POI in"
    * lookup, distributable at crawl scale. */
  def containsJoin(points: DataFrame, pointId: String,
      pt: org.apache.spark.sql.Column, members: DataFrame, ways: DataFrame,
      cellDeg: Double = 0.005): DataFrame = {
    val rings = assembleRings(members, ways).filter(col("closed"))
      .localCheckpoint(true) // consumed by both the outer and hole legs
    val outer = rings.filter(col("role") === "outer")
      .select(col("relation_id"), col("ring"))
    val holes = rings.filter(col("role") === "inner")
      .select(col("relation_id").as("__hole_rel"), col("ring"))
    val inOuter = Geo.containsJoin(points, pointId, pt,
      outer, "relation_id", col("ring"), cellDeg)
    val inHole = Geo.containsJoin(points, pointId, pt,
        holes, "__hole_rel", col("ring"), cellDeg)
      .withColumnRenamed("__hole_rel", "relation_id")
    inOuter.join(inHole, Seq(pointId, "relation_id"), "left_anti")
  }

  /** Test/demo fixture: four multipolygon regimes on a 0.001° grid —
    * (301) outer split across two ways + a hole; (302) single closed
    * outer; (303) outer split across three ways, one drawn REVERSED;
    * (304) two disjoint outers in one relation. Node-sharing is exact,
    * as in real OSM. */
  def fixture(spark: SparkSession): (DataFrame, DataFrame) = {
    import spark.implicits._
    val t = OsmModel.ts("2020-05-08 12:00:00")
    def way(id: Long, pts: (Double, Double)*) =
      OsmWay(id, 1, 1, t, 1L, Map.empty, Seq.empty,
        pts.map(p => Point(p._1, p._2)))
    val ways = Seq(
      // 301 outer: 4x4 grid-square split across two ways
      way(121, (0.0, 0.0), (0.004, 0.0), (0.004, 0.004)),
      way(122, (0.004, 0.004), (0.0, 0.004), (0.0, 0.0)),
      // 301 inner: 1x1 hole, closed single way
      way(123, (0.001, 0.001), (0.002, 0.001), (0.002, 0.002),
        (0.001, 0.002), (0.001, 0.001)),
      // 302 outer: closed triangle, single way
      way(124, (0.01, 0.0), (0.013, 0.0), (0.01, 0.003), (0.01, 0.0)),
      // 303 outer: 3x3 square in three ways, middle one reversed
      way(125, (0.02, 0.0), (0.023, 0.0)),
      way(126, (0.023, 0.003), (0.023, 0.0)),
      way(127, (0.023, 0.003), (0.02, 0.003), (0.02, 0.0)),
      // 304: two disjoint unit squares
      way(128, (0.03, 0.0), (0.031, 0.0), (0.031, 0.001), (0.03, 0.001),
        (0.03, 0.0)),
      way(129, (0.033, 0.0), (0.034, 0.0), (0.034, 0.001), (0.033, 0.001),
        (0.033, 0.0))).toDF()
    val members = Seq(
      RelationMember(301, 121, "W", "outer", 0),
      RelationMember(301, 122, "W", "outer", 1),
      RelationMember(301, 123, "W", "inner", 2),
      RelationMember(302, 124, "W", "outer", 0),
      RelationMember(303, 125, "W", "outer", 0),
      RelationMember(303, 126, "W", "outer", 1),
      RelationMember(303, 127, "W", "outer", 2),
      RelationMember(304, 128, "W", "outer", 0),
      RelationMember(304, 129, "W", "outer", 1),
      // node member + non-polygon role noise: must be ignored
      RelationMember(301, 5, "N", "admin_centre", 3)).toDF()
    (members, ways)
  }
}
