package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.CatalogOps

/** One-call parity runner for ALL of osm-explore.sql's summary tables —
  * the reference's most-used entry point, 22 CTAS blocks
  * (osm-explore.sql:10-241), each a [[TagExplore]] shape parameterized
  * by entity table and tag key. A user of the reference runs the script
  * and gets `tags_summary.*`; a user of this engine calls
  * `ExploreParity.buildAll` (lazy plans) or `materializeAll` (the CTAS
  * behavior, written into the `tags_summary` namespace).
  */
object ExploreParity {

  /** Reference table name -> plan, in script order. `relations` may be
    * empty (the fixture has none) — the shapes still hold. */
  def buildAll(nodes: DataFrame, ways: DataFrame,
      relations: Option[DataFrame] = None): Seq[(String, DataFrame)] = {
    val valueTables = Seq(
      // osm-explore.sql:10-16
      "highway_values" -> TagExplore.tagValueCounts(ways, "highway"),
      // :21-29 — keys co-occurring with highway
      "highway_other_tags" -> TagExplore.coTagKeyCounts(ways, "highway"),
      // :32-40 — the service sub-tag of highway=service
      "highway_service" -> TagExplore.tagValueCountsWhere(ways, "highway", "service", "service"),
      // :43-56 — full k/v with noise exclusions
      "highway_tags_values" -> TagExplore.tagKvCounts(ways, "highway"),
      // :61-75
      "railway_ways_values" -> TagExplore.tagValueCounts(ways, "railway"),
      "railway_nodes_values" -> TagExplore.tagValueCounts(nodes, "railway"),
      // :82-90
      "highway_oneway_values" -> TagExplore.tagPairCounts(ways, "highway", "oneway"))

    val nodeKeys = Seq("amenity", "shop", "leisure", "craft", "sport",
      "tourism", "office") // :96-164
    val wayKeys = Seq("amenity", "sport", "leisure", "landuse") // :169-207
    val relKeys = Seq("amenity", "leisure", "sport", "landuse") // :211-249

    valueTables ++
      nodeKeys.map(k => s"${k}_nodes_values" -> TagExplore.tagValueCounts(nodes, k)) ++
      wayKeys.map(k => s"${k}_ways_values" -> TagExplore.tagValueCounts(ways, k)) ++
      relations.toSeq.flatMap(r =>
        relKeys.map(k => s"${k}_relations_values" -> TagExplore.tagValueCounts(r, k)))
  }

  /** The CTAS behavior: materialize every summary into the
    * `tags_summary` namespace (osm-explore.sql:5). */
  def materializeAll(spark: SparkSession, nodes: DataFrame, ways: DataFrame,
      relations: Option[DataFrame] = None): Seq[String] = {
    CatalogOps.createNamespace(spark, "tags_summary")
    buildAll(nodes, ways, relations).map { case (name, df) =>
      CatalogOps.materialize(df, s"tags_summary.$name")
      s"tags_summary.$name"
    }
  }
}
