package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed-betweenness scale witness on a graph with a CLOSED-FORM
  * answer: a complete 10-ary tree (bidirectional edges) has exactly one
  * simple path between any two nodes, so from a root source every
  * node's Brandes dependency is just its descendant count, and the
  * total dependency mass is Σ_t (depth(t) − 1). The witness runs the
  * distributed path (the edge count clears the broadcast-local
  * threshold), asserts those two exact numbers, and reports wall time —
  * correctness at scale, not a toy-vs-toy diff.
  *
  * Run: `sbt "runMain graft.tools.BcSmoke [depth]"` (default 6 →
  * 1.11M nodes / 2.22M directed edges).
  */
object BcSmoke {
  def main(args: Array[String]): Unit = {
    val depth = if (args.nonEmpty) args(0).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // complete 10-ary tree, nodes 0..(10^(d+1)-1)/9 - 1 in level order:
    // node k's children are 10k+1 .. 10k+10
    val levels = (0 to depth).map(l => math.pow(10, l).toLong)
    val n = levels.sum
    val nInternal = levels.dropRight(1).sum // nodes with children
    val down = spark.range(nInternal).select(col("id").as("p"),
        explode(sequence(col("id") * 10 + 1, col("id") * 10 + 10)).as("c"))
    val edges = down.select(col("p").as("start_node"), col("c").as("end_node"))
      .unionByName(down.select(col("c").as("start_node"), col("p").as("end_node")))
      .withColumn("w", lit(1L))
      .localCheckpoint(true)
    require(edges.count() == 2 * (n - 1))

    val t0 = System.nanoTime()
    val bc = graft.osm.GraphCheck.betweennessFromSources(
        edges, Seq(0L), localThreshold = 0)
      .localCheckpoint(true)
    val sec = (System.nanoTime() - t0) / 1e9

    // closed form 1: a child-of-root's dependency counts every target
    // in its own subtree except itself (σ ≡ 1 on a tree, and the child
    // is interior on exactly those paths) → subtree size − 1
    val childSubtree = (0 until depth).map(l => math.pow(10, l).toLong).sum
    val got1 = bc.filter(col("node_id") === 1L).head().getDouble(1)
    require(got1 == (childSubtree - 1).toDouble,
      s"child-of-root dependency $got1 != ${childSubtree - 1}")

    // closed form 2: total dependency mass = Σ_t (depth(t) − 1)
    val totalExpect = (2 to depth).map(l =>
      math.pow(10, l).toLong * (l - 1)).sum.toDouble
    val total = bc.agg(sum(col("betweenness"))).head().getDouble(0)
    require(total == totalExpect, s"total mass $total != $totalExpect")

    println(s"""{"metric":"bc_smoke","nodes":$n,"edges":${2 * (n - 1)},""" +
      f""""depth":$depth,"sec":$sec%.2f,"child_dep":$got1%.0f,""" +
      f""""total_mass":$total%.0f,"exact_checked":true}""")
    spark.stop()
  }
}
