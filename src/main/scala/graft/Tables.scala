package graft

import org.apache.spark.sql.functions._
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
  /** events.ts has shipped as either TIMESTAMP(NANOS) parquet — which Spark
    * reads as a raw long when spark.sql.legacy.parquet.nanosAsLong is set —
    * or native TIMESTAMP(MICROS)/TIMESTAMP_NTZ. Normalize both shapes to a
    * session-local TimestampType column so every downstream query sees one
    * schema regardless of which generator produced the files. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
