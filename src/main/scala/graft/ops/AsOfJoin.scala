package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of (point-in-time) join: for every left row, attach the right
  * row with the greatest `rightTs <= leftTs` within the same keys —
  * the temporal join training-data and feature-store pipelines lean on.
  *
  * Spark has no ASOF JOIN operator; per the custom-op preference order
  * the FIRST choice is composition, and as-of composes exactly: tag the
  * two inputs, union them, and carry the latest right values forward
  * with a running `last(ignoreNulls)` window ordered by
  * (ts, right-before-left). Cost: ONE shuffle on the keys + a window
  * sort — no join node at all, no range explosion; scales like any
  * keyed window. (A custom SparkStrategy would only pay off for the
  * unkeyed global case, which partitions degenerately anyway.)
  *
  * Tie semantics: a right row at exactly `leftTs` IS visible
  * (`<=`, matching DuckDB/pandas ASOF). Right rows must be unique per
  * (keys, rightTs) — pre-dedupe with `RelOps.top1PerGroup` otherwise.
  *
  * Row atomicity: all right value columns are carried as ONE struct
  * through a single `last(ignoreNulls)`, so the matched row arrives
  * verbatim — including its NULLs. (Per-column `last` would backfill a
  * NULL value column from an OLDER right row and could mix columns from
  * different rows, diverging from DuckDB/pandas ASOF.)
  */
object AsOfJoin {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val rightVals = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val leftCols = left.columns.filterNot(keys.contains)
    require(rightVals.intersect(leftCols).isEmpty,
      s"overlapping non-key columns: ${rightVals.intersect(leftCols).mkString(",")}")

    val rvStruct = struct(rightVals.toIndexedSeq.map(col): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__src")) ++
        leftCols.map(col) ++
        Seq(lit(null).cast(right.select(rvStruct).schema.head.dataType)
          .as("__rv")): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__src")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(rvStruct.as("__rv")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.filter(col("__src") === 1)
      .select(keys.map(col) ++ leftCols.map(col) ++
        rightVals.map(c => col("__rv").getField(c).as(c)): _*)
  }
}
