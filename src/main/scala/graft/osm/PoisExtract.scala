package graft.osm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.ops.RelOps

/** POI extraction (osm-pois-extract.sql): pivot tagged entities into a
  * long-format table, one row per (entity, matched key). The reference
  * is one INSERT..SELECT per key; here it's a parameterized union of
  * branches (U2) — a single immutable plan, so Catalyst can merge the
  * scans and push each key's `IS NOT NULL` filter down.
  */
object PoisExtract {

  /** Node POI keys, in the reference's insert order (osm-pois-extract.sql:3-48). */
  val nodeKeys: Seq[String] = Seq("leisure", "sport", "shop", "office",
    "amenity", "craft", "tourism", "emergency", "historic")

  /** Way POI keys (osm-pois-extract.sql:51-71). */
  val wayKeys: Seq[String] = Seq("leisure", "landuse", "sport", "amenity")

  /** POIs from nodes: one branch per key where tags->key IS NOT NULL (P5). */
  def poisNodes(nodes: DataFrame, keys: Seq[String] = nodeKeys): DataFrame =
    RelOps.unionAll(keys.map { k =>
      nodes
        .filter(element_at(col("tags"), k).isNotNull)
        .select(
          col("id").as("node_id"), col("geom"),
          lit(k).as("key"),
          element_at(col("tags"), k).as("values"),
          element_at(col("tags"), "name").as("name"),
          col("tags"))
    })

  /** POIs from ways: same, excluding highways (osm-pois-extract.sql:54). */
  def poisWays(ways: DataFrame, keys: Seq[String] = wayKeys): DataFrame =
    RelOps.unionAll(keys.map { k =>
      ways
        .filter(element_at(col("tags"), k).isNotNull &&
          element_at(col("tags"), "highway").isNull)
        .select(
          col("id").as("way_id"), col("linestring").as("geom"),
          lit(k).as("key"),
          element_at(col("tags"), k).as("values"),
          element_at(col("tags"), "name").as("name"),
          col("tags"))
    })
}
