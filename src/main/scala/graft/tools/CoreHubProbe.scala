package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated min-of-3 probe for the celebrity-hub coreness smoke
  * (SCALESMOKE_r16 watch item: core_hub_sec read 44 s in-sweep vs 10 s
  * in r15 — is the OPERATOR slower, or the single-shot measurement?).
  * Same fixture as ScaleSmoke.coreHubSmoke: a 1M-spoke star + a K8. */
object CoreHubProbe {
  def main(args: Array[String]): Unit = {
    val spokes = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val star = spark.range(1L, spokes + 1).select(
      lit(0L).as("start_node"), col("id").as("end_node"))
    val k8 = spark.range(8L * 8).select(
      (col("id") / 8 + 1).cast("long").as("start_node"),
      (col("id") % 8 + 1).cast("long").as("end_node"))
      .filter(col("start_node") < col("end_node"))
    val edges = star.unionByName(k8)
    (1 to 3).foreach { i =>
      val t = System.nanoTime()
      val maxCore = graft.osm.GraphCheck.coreness(edges, rounds = 4)
        .agg(max(col("coreness"))).head().getLong(0)
      println(f"core_hub run $i: ${(System.nanoTime() - t) / 1e9}%.2f s " +
        s"maxCore=$maxCore")
    }
    spark.stop()
  }
}
