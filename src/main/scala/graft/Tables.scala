package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided testdata tables (TESTDATA.md).
  *
  * These are the engine's scan boundary (SURVEY §2.1 S1): pre-converted
  * Parquet with fixed schemas, read via the DataFrame source API so that
  * Catalyst gets predicate pushdown + column pruning for free.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
