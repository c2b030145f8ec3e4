package graft

import org.apache.spark.sql.functions._

import graft.osm.Multipolygon

/** Multipolygon assembly: ring stitching across split/reversed member
  * ways, hole subtraction, multi-outer relations, broken-ring
  * surfacing. */
class MultipolygonSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val (members, ways) = Multipolygon.fixture(spark)

  test("ring stitching: split outers close, reversed ways flip, rings count") {
    val rings = Multipolygon.assembleRings(members, ways)
      .select("relation_id", "role", "ring_id", "closed")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    // every fixture ring closes: 301 outer (2 ways) + inner,
    // 302 outer, 303 outer (3 ways, one reversed), 304 two outers
    assert(rings.forall(_._4), s"unclosed ring in ${rings.mkString(",")}")
    val byRel = rings.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byRel === Map(301L -> 2, 302L -> 1, 303L -> 1, 304L -> 2))
    // node member and non-polygon role were ignored (no ring from them)
    assert(rings.count(r => r._1 == 301L && r._2 == "outer") === 1)
  }

  test("areas: outer minus holes, triangle, multi-outer sum") {
    val got = Multipolygon.multipolygonAreas(members, ways)
      .select(col("relation_id"), col("n_outer"), col("n_inner"),
        round(col("area_deg2") * 1e6, 6).as("a"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(301L) === ((1L, 1L, 15.0)))
    assert(got(302L) === ((1L, 0L, 4.5)))
    assert(got(303L) === ((1L, 0L, 9.0)))
    assert(got(304L) === ((2L, 0L, 2.0)))
  }

  test("containsJoin: interior in, hole out, disjoint outers resolve, boundary regimes") {
    val pts = Seq(
      (1L, 0.003, 0.003),   // 301 interior, clear of the hole
      (2L, 0.0015, 0.0015), // dead center of 301's hole
      (3L, 0.011, 0.0005),  // 302 triangle
      (4L, 0.021, 0.001),   // 303
      (5L, 0.0305, 0.0005), // 304 first square
      (6L, 0.0335, 0.0005), // 304 second square
      (7L, 0.05, 0.05))     // outside all
      .toDF("point_id", "lon", "lat")
      .select(col("point_id"), struct(col("lon"), col("lat")).as("p"))
    val got = Multipolygon.containsJoin(pts, "point_id", col("p"),
        members, ways, cellDeg = 0.002)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(got === Set(1L -> 301L, 3L -> 302L, 4L -> 303L,
      5L -> 304L, 6L -> 304L))
  }

  test("broken ring (missing segment) surfaces closed=false, excluded from area") {
    // drop way 122: relation 301's outer can no longer close
    val broken = members.filter(col("member_id") =!= 122L)
    val rings = Multipolygon.assembleRings(broken, ways)
      .filter(col("relation_id") === 301L)
      .select("role", "closed").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(rings === Set(("outer", false), ("inner", true)))
    val area = Multipolygon.multipolygonAreas(broken, ways)
      .filter(col("relation_id") === 301L)
      .select(round(col("area_deg2") * 1e6, 6)).head().getDouble(0)
    // only the (closed) hole remains and it counts negative — data
    // quality checks key off closed=false, the agg stays mechanical
    assert(area === -1.0)
  }
}
