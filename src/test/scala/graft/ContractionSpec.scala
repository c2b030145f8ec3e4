package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.osm.{Contraction, GraphCheck}

/** pgr_contraction analog (VERDICT r19 item 5): dead-end + linear
  * contraction semantics on micro graphs, the vertex-conservation
  * invariant, the forbidden list, the multi-cycle cascade, and the
  * property that matters to a routing consumer — junction-to-junction
  * shortest-path distances are IDENTICAL on the contracted graph. */
class ContractionSpec extends SparkTestBase {
  import spark.implicits._

  // the q_osm_contraction fixture (see SparkEntry for the rationale)
  private def microEdges: DataFrame = Seq(
    (1L, 1L, 2L, 1.0), (2L, 2L, 3L, 1.0), (3L, 3L, 4L, 1.0),
    (4L, 4L, 1L, 1.0), (5L, 1L, 3L, 2.5),
    (6L, 1L, 10L, 1.0), (7L, 10L, 11L, 2.0), (8L, 11L, 12L, 3.0),
    (9L, 12L, 2L, 4.0),
    (10L, 3L, 20L, 1.0), (11L, 20L, 21L, 1.5), (12L, 21L, 22L, 2.0),
    (13L, 30L, 31L, 1.0), (14L, 31L, 32L, 1.0), (15L, 32L, 30L, 1.0)
  ).toDF("edge_id", "source", "target", "cost")

  private def canon(r: Contraction.Contracted)
      : (Seq[(Long, Long, Double, Seq[Long])], Seq[(Long, Seq[Long])]) = {
    val e = r.edges.select(col("source"), col("target"), col("cost"),
        col("contracted"))
      .as[(Long, Long, Double, Seq[Long])].collect()
      .map { case (s, t, c, cs) =>
        (math.min(s, t), math.max(s, t), c, cs.sorted) }
      .sortBy(x => (x._1, x._2, x._3)).toSeq
    val v = r.vertexAbsorptions.as[(Long, Seq[Long])].collect()
      .map { case (vid, cs) => (vid, cs.sorted) }.sortBy(_._1).toSeq
    (e, v)
  }

  test("micro fixture: dead-end tree absorbs into its junction, chains " +
      "collapse to shortcuts with summed cost, cycles survive") {
    val (edges, vrows) = canon(Contraction.contractGraph(microEdges))
    assert(vrows == Seq((3L, Seq(20L, 21L, 22L))))
    val shortcuts = edges.filter(_._4.nonEmpty)
    assert(shortcuts == Seq(
      (1L, 2L, 10.0, Seq(10L, 11L, 12L)),
      (1L, 3L, 2.0, Seq(4L))))
    // survivors: square-minus-contracted core + the untouched 3-cycle
    val plain = edges.filter(_._4.isEmpty).map(e => (e._1, e._2))
    assert(plain == Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (30L, 31L), (30L, 32L), (31L, 32L)))
  }

  test("vertex conservation: every input vertex is accounted for " +
      "exactly once across survivors and contracted sets") {
    val r = Contraction.contractGraph(microEdges)
    val surviving = r.edges
      .select(explode(array(col("source"), col("target"))).as("v"))
      .distinct().as[Long].collect().toSet
    val inShortcuts = r.edges
      .select(explode(col("contracted")).as("v")).as[Long].collect()
    val inVmap = r.vertexAbsorptions
      .select(explode(col("contracted")).as("v")).as[Long].collect()
    val contractedAll = inShortcuts ++ inVmap
    assert(contractedAll.distinct.length == contractedAll.length,
      "a vertex was contracted into two places")
    val original = (1L to 4L) ++ Seq(10L, 11L, 12L, 20L, 21L, 22L,
      30L, 31L, 32L)
    assert(surviving ++ contractedAll == original.toSet)
    assert(surviving.intersect(contractedAll.toSet).isEmpty)
  }

  test("free 2-vertex component: larger id absorbs into smaller " +
      "(deterministic where pgRouting is order-dependent)") {
    val r = Contraction.contractGraph(
      Seq((1L, 40L, 41L, 1.0)).toDF("edge_id", "source", "target", "cost"))
    val (edges, vrows) = canon(r)
    assert(edges.isEmpty)
    assert(vrows == Seq((40L, Seq(41L))))
  }

  test("forbidden vertices are never contracted") {
    val r = Contraction.contractGraph(microEdges, forbidden = Seq(11L, 21L))
    val (edges, vrows) = canon(r)
    // 11 splits the long chain (10 and 12 contract up to it), and 21 —
    // left degree-1 after 22's absorption but protected — terminates
    // the 3-20-21 run as an endpoint, so 20 contracts into a 3-21
    // shortcut
    assert(edges.filter(_._4.nonEmpty).map(_._4) ==
      Seq(Seq(4L), Seq(10L), Seq(12L), Seq(20L)))
    // 21 blocks the peel above it: only 22 absorbs (into 21), leaving
    // 20-21 as a surviving path
    assert(vrows == Seq((21L, Seq(22L))))
  }

  test("cascade across cycles: dead-end absorption drops a junction to " +
      "degree 2, the next cycle linear-contracts it") {
    // triangle 1-2-3 with a dead end on 3: after absorption 3 is
    // degree-2 -> contracts into a shortcut 1-2 carrying 3 (and 3's
    // absorbed set stays on record under the fold-into-shortcut rule)
    val r = Contraction.contractGraph(Seq(
      (1L, 1L, 2L, 1.0), (2L, 2L, 3L, 2.0), (3L, 3L, 1L, 4.0),
      (4L, 3L, 9L, 1.0),
      // anchor 1 and 2 so they stay junctions after the cascade
      (5L, 1L, 50L, 1.0), (6L, 1L, 51L, 1.0), (7L, 2L, 52L, 1.0),
      (8L, 2L, 53L, 1.0)
    ).toDF("edge_id", "source", "target", "cost"),
      forbidden = Seq(50L, 51L, 52L, 53L))
    val (edges, vrows) = canon(r)
    val shortcuts = edges.filter(_._4.nonEmpty)
    assert(shortcuts == Seq((1L, 2L, 6.0, Seq(3L, 9L))))
    assert(vrows.isEmpty,
      "vertex 3's absorptions must fold into the shortcut that subsumed it")
  }

  test("broadcast-local path == distributed fixpoint, row-identical (r21)") {
    // the r21 local fast path must reproduce the distributed loop's
    // relations exactly — on the micro fixture AND on a randomized
    // graph mixing trees, chains, cycles, parallel edges and self-loops
    val rnd = new scala.util.Random(13)
    val random = (1 to 40).map { i =>
      (i.toLong, rnd.nextInt(18).toLong + 1L, rnd.nextInt(18).toLong + 1L,
        (rnd.nextInt(8) + 1).toDouble)
    }.toDF("edge_id", "source", "target", "cost")
    for ((df, tag) <- Seq((microEdges, "micro"), (random, "random"))) {
      val local = canon(Contraction.contractGraph(df))
      val dist = canon(Contraction.contractGraph(df, localThreshold = 0L))
      assert(local === dist, s"$tag: local != distributed")
    }
  }

  test("routing invariant: junction-to-junction shortest-path distances " +
      "are unchanged by contraction") {
    def sym(e: DataFrame): DataFrame =
      e.select(col("source").as("start_node"), col("target").as("end_node"),
          col("cost").as("w"))
        .unionByName(e.select(col("target").as("start_node"),
          col("source").as("end_node"), col("cost").as("w")))
    val r = Contraction.contractGraph(microEdges)
    val junctions = Seq(1L, 2L, 3L)
    for (src <- junctions) {
      val before = GraphCheck.shortestPaths(sym(microEdges), src)
        .as[(Long, Double)].collect().toMap
      val after = GraphCheck.shortestPaths(sym(r.edges), src)
        .as[(Long, Double)].collect().toMap
      for (dst <- junctions if dst != src)
        assert(after(dst) == before(dst),
          s"distance $src->$dst changed: ${before(dst)} -> ${after(dst)}")
    }
  }
}
