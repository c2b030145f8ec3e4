package graft.osm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Tag exploration summaries — the whole of osm-explore.sql re-expressed
  * as parameterized DataFrame transforms (the reference hard-codes one
  * CTAS block per key; parameterization is native here).
  *
  * All shapes are scan -> map-op filter -> project -> hash aggregate ->
  * sort; Catalyst pushes the `map_contains_key` filter into the scan and
  * prunes to the `tags` column (EP2 lifecycle, SURVEY §3).
  */
object TagExplore {

  /** Value frequencies of one tag key (osm-explore.sql:9-16):
    * `SELECT tags->'k', count(*) ... WHERE tags ? 'k' GROUP BY 1`. */
  def tagValueCounts(entities: DataFrame, key: String): DataFrame =
    entities
      .filter(map_contains_key(col("tags"), lit(key)))
      .select(element_at(col("tags"), key).as(key))
      .groupBy(key).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(key))

  /** Key frequencies among entities having `whereKey` (osm-explore.sql:21-29):
    * `each(tags)` -> one row per key. */
  def coTagKeyCounts(entities: DataFrame, whereKey: String): DataFrame =
    entities
      .filter(map_contains_key(col("tags"), lit(whereKey)))
      .select(explode(map_keys(col("tags"))).as("tag"))
      .groupBy("tag").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("tag"))

  /** Values of `valueKey` among entities where `filterKey` = `filterValue`
    * (osm-explore.sql:31-40, the highway=service/service analysis). */
  def tagValueCountsWhere(
      entities: DataFrame, filterKey: String, filterValue: String,
      valueKey: String): DataFrame =
    entities
      .filter(element_at(col("tags"), filterKey) === filterValue)
      .select(element_at(col("tags"), valueKey).as("tag"))
      .groupBy("tag").agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("tag"))

  /** Full key/value frequency with the reference's noise exclusions
    * (osm-explore.sql:43-56): IN-blacklist + substring-absence filters
    * (`position(sub in tag) = 0` -> `instr = 0`, P6).
    */
  def tagKvCounts(
      entities: DataFrame, whereKey: String,
      excludeKeys: Seq[String] = Seq("created_by", "wikidata", "width",
        "wikipedia", "note", "old_ref", "length", "description"),
      excludeSubstrings: Seq[String] = Seq("name", "source", "destination", "addr"))
      : DataFrame = {
    val noSubstr: Column = excludeSubstrings
      .map(s => instr(col("tag"), s) === 0)
      .reduce(_ && _)
    entities
      .filter(map_contains_key(col("tags"), lit(whereKey)))
      .select(explode(col("tags")).as(Seq("tag", "value")))
      .filter(!col("tag").isin(excludeKeys: _*) && noSubstr)
      .groupBy("tag", "value").agg(count(lit(1)).as("count"))
      .orderBy(col("tag"), col("count").desc, col("value"))
  }

  /** Two-key cross frequency (osm-explore.sql:83-90, highway x oneway). */
  def tagPairCounts(entities: DataFrame, key1: String, key2: String): DataFrame =
    entities
      .filter(map_contains_key(col("tags"), lit(key1)) &&
        map_contains_key(col("tags"), lit(key2)))
      .select(element_at(col("tags"), key1).as(key1),
        element_at(col("tags"), key2).as(key2))
      .groupBy(key1, key2).agg(count(lit(1)).as("count"))
      .orderBy(col(key1), col(key2))
}
