package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic graph fixtures shared by the scale smokes
  * and the plan-audit specs — one generator, so the closed forms they
  * assert (e.g. the Louvain pairwise-merge label formula) cannot
  * silently diverge between the two gates.
  */
object GraphFixtures {

  /** `n` K4 cliques in a CHAIN (7n − 1 edges): clique k owns nodes
    * [4k, 4k+3]; a single link joins node 4k+3 to node 4(k+1).
    * `labels` plant each clique as its own community (label = k).
    * Closed form: two gated weighted Louvain sweeps merge adjacent
    * cliques PAIRWISE and exactly — final label of node m is
    * (m div 8) * 2 — because at this m the modularity resolution
    * limit makes every adjacent-pair merge Q-positive and the
    * down-only gate forbids anything else. */
  def cliqueChain(spark: SparkSession, n: Long): (DataFrame, DataFrame) = {
    val cliques = spark.range(0L, n)
      .select(explode(array((for (i <- 0 to 3; j <- (i + 1) to 3) yield
        struct((col("id") * 4 + i).as("start_node"),
          (col("id") * 4 + j).as("end_node"))): _*)).as("e"))
      .select(col("e.start_node"), col("e.end_node"))
    val links = spark.range(0L, n - 1)
      .select((col("id") * 4 + 3).as("start_node"),
        ((col("id") + 1) * 4).as("end_node"))
    val labels = spark.range(0L, 4 * n)
      .select(col("id").as("node_id"), floor(col("id") / 4).as("label"))
    (cliques.unionByName(links), labels)
  }
}
