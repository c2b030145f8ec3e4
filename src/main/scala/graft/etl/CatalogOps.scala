package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog / materialization surface (SURVEY §2.1): the reference's
  * DDL + CTAS + INSERT + ALTER staging idioms as engine policy.
  *
  * Materialization policy (SURVEY §4): `saveAsTable` only for
  * user-visible outputs; purely intermediate stages should stay lazy or
  * use `cache()`/`localCheckpoint()` — S4 is for the former.
  */
object CatalogOps {

  /** S3 — `CREATE SCHEMA IF NOT EXISTS` (osm-explore.sql:5). */
  def createNamespace(spark: SparkSession, name: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$name`")

  /** S4 — `DROP TABLE IF EXISTS t; CREATE TABLE t AS SELECT ...`
    * (osm-explore.sql:9-16 and 25+ other sites). */
  def materialize(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(table)

  /** S5 — `INSERT INTO t SELECT ...` (osm-pois-extract.sql:9-48). */
  def appendTo(df: DataFrame, table: String): Unit =
    df.write.mode("append").saveAsTable(table)

  /** S9 — `ALTER TABLE ADD COLUMN` + backfill as an immutable rewrite
    * (osm-complete-graphs.sql:59-61): schema evolution is a
    * `withColumn` + overwrite in DataFrame land. */
  def addColumn(spark: SparkSession, table: String, name: String,
      value: org.apache.spark.sql.Column): Unit = {
    val evolved = spark.table(table).withColumn(name, value)
    // write through a temp view to avoid reading the table being overwritten
    val tmp = evolved.localCheckpoint(eager = true)
    tmp.write.mode("overwrite").option("overwriteSchema", "true").saveAsTable(table)
  }

  /** S11 — the `CLUSTER`/index analog (pgsnapshot_schema_0.6.sql:112-116):
    * bucket + sort the table by its hot join key so later equi-joins on
    * that key are co-located — no shuffle on the bucketed sides
    * (asserted in StructureSpec). */
  def materializeBucketed(df: DataFrame, table: String, numBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  /** S11 — physical range-clustering for non-catalog Parquet output:
    * `repartitionByRange` + `sortWithinPartitions` gives the CLUSTER
    * effect (row-group locality + min/max pruning on the sort key). */
  def writeClustered(df: DataFrame, path: String,
      clusterCols: Seq[String]): Unit =
    df.repartitionByRange(clusterCols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(clusterCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet(path)

  /** Morton (Z-order) interleave of the low `bits` of two integer
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * A pure fold of shift/mask/or column ops — whole-stage codegen'd.
    * Callers supply comparable-scale non-negative ints (rank or
    * fixed-grid encode first if the domains differ wildly). */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val ai = a.cast("long")
    val bi = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ai, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(bi, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** S11 — Z-order clustered Parquet write (the lakehouse
    * OPTIMIZE ZORDER analog): range-partition + sort on the Morton
    * value so files own compact rectangles of the (a, b) domain and a
    * narrow min/max-prunable filter on EITHER column touches O(sqrt)
    * of the files — single-key clustering only serves its leading
    * column. StructureSpec asserts the file-locality bound on a
    * uniform grid. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** S11 — stats collection standing in for the reference's manual
    * `n_distinct` overrides (pgsnapshot_schema_0.6.sql:146-170): feed
    * the CBO real numbers instead. */
  def analyze(spark: SparkSession, table: String, cols: Seq[String]): Unit =
    spark.sql(
      s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")

  /** Hive-style directory-partitioned Parquet write (PG's table
    * partitioning analog, and THE 100 TB layout primitive for
    * time-series facts): one directory per distinct partition-column
    * tuple, so a filter on the partition column prunes whole
    * directories at PLANNING time — the scan never lists, opens, or
    * reads a non-matching file (`PartitionFilters` in the scan node,
    * asserted in StructureSpec). A daily-partitioned 10-year events
    * table answers a one-day query by reading 1/3650th of the data.
    * Pair with a sortWithinPartitions on the secondary key for row-group
    * pruning inside each partition. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    // repartition on the partition columns UNCONDITIONALLY: without it
    // every upstream task writes one file per partition value it
    // touches — T tasks × P values = the small-files explosion this
    // helper exists to prevent. The secondary sort (for row-group
    // pruning) is the only optional part.
    val shaped = df.repartition(
      partitionCols.map(org.apache.spark.sql.functions.col): _*)
    val sorted =
      if (sortCols.nonEmpty)
        shaped.sortWithinPartitions(
          (partitionCols ++ sortCols).map(org.apache.spark.sql.functions.col): _*)
      else shaped
    sorted.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(path)
  }
}

/** S10 — export boundary (osm-pg-etl.md:31-113): the reference round-trips
  * edge lists through pandas/igraph via COPY; our hand-offs are
  * Parquet/CSV (fastest columnar path), a real JDBC write-back (the
  * database hand-off the reference documents as its fastest path —
  * COPY-style batched inserts over N parallel connections), or a
  * driver-side collect for the igraph call itself — the ONE sanctioned
  * collect boundary in the engine.
  */
object Export {
  def toParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def toCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JDBC write-back (osm-pg-etl.md:80-113 "Fast Solution" analog):
    * each of `numPartitions` tasks opens one connection and streams
    * `batchSize`-row INSERT batches — Spark's distributed equivalent of
    * the reference's single-connection COPY pipe. At cluster scale the
    * receiving database is the bottleneck: cap `numPartitions` to what
    * it can absorb (the reference's Postgres default would be ~2x its
    * max_worker_processes) rather than letting 1000 executors connect.
    */
  def toJdbc(df: DataFrame, url: String, table: String,
      mode: String = "overwrite", batchSize: Int = 10000,
      numPartitions: Int = 8,
      options: Map[String, String] = Map.empty): Unit = {
    val capped = if (df.rdd.getNumPartitions > numPartitions)
      df.coalesce(numPartitions) else df
    options.foldLeft(
        capped.write.format("jdbc")
          .option("url", url)
          .option("dbtable", table)
          .option("batchsize", batchSize.toString)
          .option("isolationLevel", "READ_COMMITTED")) {
        case (w, (k, v)) => w.option(k, v)
      }
      .mode(mode).save()
  }

  /** Parallel JDBC read-back: `numPartitions` range-pruned scans on
    * `partitionColumn` (each task reads one stride), so re-ingesting an
    * exported table is distributed, not a single-connection pull. */
  def fromJdbc(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int = 8,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
        spark.read.format("jdbc")
          .option("url", url)
          .option("dbtable", table)
          .option("partitionColumn", partitionColumn)
          .option("lowerBound", lowerBound.toString)
          .option("upperBound", upperBound.toString)
          .option("numPartitions", numPartitions.toString)) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load()

  /** The igraph hand-off: (start, end, cost) tuples on the driver. */
  def collectEdgeList(edges: DataFrame, start: String = "start_node",
      end: String = "end_node", cost: String = "length"): Array[(Long, Long, Double)] =
    edges.select(start, end, cost).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
}
