package graft.osm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for the tag summaries — the §2.11
  * change-feed slice applied to osm-explore's count tables: instead of
  * recomputing `tagValueCounts` over the full entity table per
  * changeset, fold the changeset's delta into the materialized summary.
  * Count aggregates are self-maintainable: new = old + added - removed,
  * so the work per changeset is O(|changeset|), not O(|table|).
  */
object ExploreIVM {

  private def counts(entities: DataFrame, key: String, as: String): DataFrame =
    entities
      .filter(map_contains_key(col("tags"), lit(key)))
      .select(element_at(col("tags"), key).as(key))
      .groupBy(key).agg(count(lit(1)).as(as))

  /** Fold a changeset into a materialized `tagValueCounts(entities, key)`
    * summary. `removed` = the changed entities' PREVIOUS rows (empty for
    * creates), `added` = their new rows (empty for deletes). Values whose
    * count reaches zero drop out, new values appear — identical to a
    * full recompute (asserted in tests). */
  def applyDelta(summary: DataFrame, key: String,
      removed: DataFrame, added: DataFrame): DataFrame = {
    val minus = counts(removed, key, "__minus")
    val plus = counts(added, key, "__plus")
    val delta = plus.join(minus, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("__plus"), lit(0L)) - coalesce(col("__minus"), lit(0L)))
          .as("__net"))
      .filter(col("__net") =!= 0)
    summary.join(delta, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("count"), lit(0L)) + coalesce(col("__net"), lit(0L)))
          .as("count"))
      .filter(col("count") > 0)
      .orderBy(col("count").desc, col(key))
  }
}
