package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Weighted-median surface re-expressing the reference's plpgsql
  * procedures (general-functions.sql:52-75 `weighted_median`,
  * :84-106 `weighted_median_by_group`). The dynamic-SQL templating of
  * the original is unnecessary — parameterization is native Scala
  * (SURVEY §2.8 F10): these are `DataFrame => DataFrame/scalar`
  * functions over column *names*.
  *
  * Reference semantics, reproduced exactly (and exercised against the
  * FIXTURES.md §1 edge cases — NULL weight, all-zero weights):
  *   - order rows by x; runsum = running sum of coalesce(w,0)
  *     (ROWS UNBOUNDED PRECEDING..CURRENT ROW), prevsum = same frame
  *     ending 1 PRECEDING (NULL on the first row, which therefore never
  *     qualifies — PG BETWEEN with a NULL bound is NULL);
  *   - candidate rows: total/2 BETWEEN prevsum AND runsum;
  *   - scalar version returns AVG(x) of candidates (the reference's
  *     `prevx = last_value(x) ... CURRENT ROW` is the current row's own
  *     x, so its even/odd branch reduces to avg(x));
  *   - grouped version returns MAX(x) of candidates per group (its
  *     branches use max(), general-functions.sql:98).
  */
object WeightedMedian {

  private def cumCols(x: String, w: String, part: Seq[String]): Seq[(String, Column)] = {
    val ord = Window.partitionBy(part.map(col): _*).orderBy(col(x))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    Seq(
      "__runsum" -> sum(coalesce(col(w), lit(0))).over(run),
      "__prevsum" -> sum(coalesce(col(w), lit(0))).over(prev))
  }

  /** X5 scalar form. The global ordering window is inherently
    * single-partition; the reference only ever calls it on small derived
    * tables (osm-road-graphs.sql:176). For large inputs use the grouped
    * form (partition-parallel) or `percentile_approx` with weights
    * pre-expanded.
    */
  def weightedMedian(df: DataFrame, x: String, w: String): Option[Double] = {
    val n = df.count() // J8: driver-composed scalar, spliced as a literal
    val total = df.agg(sum(coalesce(col(w), lit(0))).as("t")).head.get(0)
    if (n == 0 || total == null) return None
    val withCums = cumCols(x, w, Nil).foldLeft(df) { case (d, (c, e)) => d.withColumn(c, e) }
    val cand = withCums.filter(
      (lit(total) / 2).between(col("__prevsum"), col("__runsum")))
    val r = cand.agg(avg(col(x))).head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** X6 grouped form (UDTF-shaped in PG, a plain DataFrame here):
    * returns `(group_id, weighted_median)`. Windows are partitioned by
    * the group key — parallel across groups, one shuffle; the per-group
    * total weight is a window over the same partitioning (no global
    * collapse), and the A14 parity count joins back broadcast.
    */
  def weightedMedianByGroup(df: DataFrame, x: String, w: String, g: String): DataFrame = {
    val withCums = cumCols(x, w, Seq(g)).foldLeft(df) { case (d, (c, e)) => d.withColumn(c, e) }
      .withColumn("__total", sum(coalesce(col(w), lit(0))).over(Window.partitionBy(col(g))))
    val counts = df.groupBy(col(g)).agg(count(lit(1)).as("__cnt"))
    withCums
      .filter((col("__total") / 2).between(col("__prevsum"), col("__runsum")))
      .groupBy(col(g))
      .agg(max(col(x)).as("__mx"))
      .join(broadcast(counts), g)
      .select(
        col(g).cast("string").as("group_id"),
        when(col("__cnt") % 2 === 0, (col("__mx") + col("__mx")) / 2.0)
          .otherwise(col("__mx")).as("weighted_median"))
  }
}
