package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal geometry kernel (SURVEY §2.8 F22) over the engine's geometry
  * model: points are `STRUCT<lon: DOUBLE, lat: DOUBLE>`, linestrings are
  * `ARRAY<STRUCT<lon,lat>>` (SRID 4326 by convention).
  *
  * Everything is a composition of codegen'd built-in higher-order
  * functions (`zip_with`, `aggregate`, `transform`) — no UDFs, so the
  * whole kernel stays inside whole-stage codegen and is distributable
  * by construction.
  *
  * Length semantics: the reference mixes planar meters
  * (ST_Length(ST_Transform(g,3347)), osm-road-graphs.sql:11) and
  * geodesic km (ST_Length(g::geography)/1000, osm-road-graphs.sql:156).
  * We standardize on geodesic (haversine, WGS84 mean radius) meters and
  * expose a km helper — SURVEY §7.4-3 documents the deviation.
  */
object Geo {
  /** WGS84 mean Earth radius in meters (IUGG R1). */
  val EarthRadiusM = 6371008.8

  /** Haversine great-circle distance in meters between two lon/lat pairs. */
  def haversineMeters(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusM) * asin(sqrt(a))
  }

  /** Geodesic length in meters of a linestring column — replaces both
    * ST_Length variants (F22). Sum of consecutive-vertex haversine
    * distances via zip_with over the line shifted against itself.
    */
  def geodesicLengthMeters(line: Column): Column = {
    val n1 = greatest(size(line) - 1, lit(0))
    val segs = zip_with(
      slice(line, lit(1), n1),
      slice(line, lit(2), n1),
      (a, b) =>
        haversineMeters(a.getField("lon"), a.getField("lat"),
          b.getField("lon"), b.getField("lat")))
    aggregate(segs, lit(0.0), (acc, x) => acc + x)
  }

  def geodesicLengthKm(line: Column): Column = geodesicLengthMeters(line) / 1000.0

  /** ST_AsText for a point (osm-road-graphs.sql:59). */
  def asTextPoint(p: Column): Column =
    concat(lit("POINT("), p.getField("lon").cast("string"), lit(" "),
      p.getField("lat").cast("string"), lit(")"))

  /** ST_AsText for a linestring. */
  def asTextLine(line: Column): Column =
    concat(lit("LINESTRING("),
      array_join(transform(line, p =>
        concat(p.getField("lon").cast("string"), lit(" "),
          p.getField("lat").cast("string"))), ", "),
      lit(")"))

  /** ST_NumGeometries analog for our multi-point/line arrays (F22). */
  def numGeometries(g: Column): Column = size(g)

  /** A8: ST_Union/ST_Multi over points — in our model a multipoint IS
    * the deduplicated collected array (osm-road-graphs-fix.sql:83,94).
    * Aggregate function: use inside agg(). */
  def collectMultiPoint(p: Column): Column =
    array_distinct(collect_list(p))

  /** F22 ST_Intersection of two vertex sets (the blade computation,
    * osm-road-graphs-fix.sql:96): shared points of two lines. */
  def sharedPoints(a: Column, b: Column): Column =
    array_intersect(array_distinct(a), array_distinct(b))


  /** Grid cell id for a point at the given cell size (degrees) — the
    * scale path for the spatial theta self-join J7: equi-join on cell,
    * then exact predicate, instead of the all-pairs ST_Touches join the
    * reference itself flags as "Does not work with large maps"
    * (osm-road-graphs-fix.sql:91).
    */
  def gridCell(p: Column, cellDeg: Double): Column =
    struct(
      floor(p.getField("lon") / cellDeg).cast("long").as("cx"),
      floor(p.getField("lat") / cellDeg).cast("long").as("cy"))

  /** Distinct grid cells covered by a linestring's vertices. */
  def gridCells(line: Column, cellDeg: Double): Column =
    array_distinct(transform(line, p => gridCell(p, cellDeg)))
}
