package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.etl.{CatalogOps, Export}
import graft.osm.{GeometricSplit, OsmModel, RoadGraph}
import graft.streaming.ActionFeed

/** Geometric split path, pgr_createTopology analog, catalog/export
  * helpers, and the streaming action feed. */
class StructureSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val t = OsmModel.microFixture(spark)
  private lazy val net = RoadGraph.imputeSpeedLimits(
    RoadGraph.excludeModes(RoadGraph.carNetwork(t.ways))).cache()

  test("geometric split (grid-bucketed) == topological split on the fixture") {
    val topo = RoadGraph.buildMergedNetwork(t)
      .select("edge_id", "nodes").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    val geo = GeometricSplit.split(net)
      .select("edge_id", "nodes").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    assert(geo === topo)
  }

  test("createTopology: shared snapped endpoints get one vertex id") {
    val merged = RoadGraph.buildMergedNetwork(t)
    val withTopo = GeometricSplit.createTopology(merged)
    // n3 is the endpoint of four segments (W1 halves + W2 halves) — all
    // four must agree on the vertex id at n3's snapped position
    val n3Sides = withTopo
      .filter(col("end_node") === 3 || col("start_node") === 3)
      .select(when(col("end_node") === 3, col("target"))
        .otherwise(col("source")).as("vid"))
      .collect().map(_.getLong(0)).toSet
    assert(n3Sides.size === 1)
    // distinct vertex ids are dense 1..n
    val vids = withTopo.select(explode(array(col("source"), col("target"))))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(vids.toSeq === (1L to vids.length))
  }

  test("true-crossing split: X with no shared node -> 4 edges; endpoint touch doesn't split") {
    val net = GeometricSplit.crossingFixture(spark)
    // the crossing itself: one interior point per way, parameter 0.5
    val cps = GeometricSplit.crossingPoints(net).collect()
    assert(cps.map(r => r.getLong(0) -> r.getDouble(1)).toSet ===
      Set(1L -> 0.5, 2L -> 0.5))
    val out = GeometricSplit.splitWithCrossings(net)
    val rows = out.select("edge_id", "nodes", "geom").collect()
    assert(rows.length === 7, "A and B split in two; C, D, E pass through")
    val byEdge = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byEdge === Map(1L -> 2, 2L -> 2, 3L -> 1, 4L -> 1, 5L -> 1))
    // all four split halves end or start at the intersection and AGREE
    // on one synthetic (negative) node id there
    val splitHalves = rows.filter(r => r.getLong(0) <= 2)
    val crossNodeIds = splitHalves.map { r =>
      val nodes = r.getSeq[Long](1)
      val geom = r.getSeq[org.apache.spark.sql.Row](2)
      val atCross = geom.zipWithIndex.filter { case (p, _) =>
        p.getDouble(0) === 0.01 && p.getDouble(1) === 0.01 }
      assert(atCross.size === 1, s"edge half must touch the crossing: $r")
      nodes(atCross.head._2)
    }
    assert(crossNodeIds.toSet.size === 1, "one shared synthetic node")
    assert(crossNodeIds.head < 0, "synthetic ids are negative")
  }

  test("catalog ops: namespace + CTAS + append + addColumn + analyze") {
    val db = "graft_test_ns"
    CatalogOps.createNamespace(spark, db)
    val tbl = s"$db.edges"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val loc = new java.io.File(s"spark-warehouse/$db.db/edges")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(loc)
    }
    CatalogOps.materialize(Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v"), tbl)
    assert(spark.table(tbl).count() === 2)
    CatalogOps.appendTo(Seq((3L, 4.0)).toDF("id", "v"), tbl)
    assert(spark.table(tbl).count() === 3)
    CatalogOps.addColumn(spark, tbl, "doubled", col("v") * 2)
    val r = spark.table(tbl).filter(col("id") === 3).head
    assert(r.getAs[Double]("doubled") === 8.0)
    CatalogOps.analyze(spark, tbl, Seq("id", "v"))
    spark.sql(s"DROP TABLE $tbl"); spark.sql(s"DROP DATABASE $db")
  }

  test("bucketed materialization: co-located join runs without shuffling the bucketed sides") {
    val db = "graft_test_bk"
    CatalogOps.createNamespace(spark, db)
    Seq(s"$db.wn_b", s"$db.roads_b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CatalogOps.materializeBucketed(t.wayNodes, s"$db.wn_b", 4,
      Seq("way_id"), Seq("way_id", "sequence_id"))
    CatalogOps.materializeBucketed(
      t.ways.select(col("id").as("way_id"), col("tags")), s"$db.roads_b", 4,
      Seq("way_id"))
    val joined = spark.table(s"$db.wn_b")
      .join(spark.table(s"$db.roads_b").hint("merge"), "way_id")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$p")
    Seq(s"$db.wn_b", s"$db.roads_b").foreach(t => spark.sql(s"DROP TABLE $t"))
    spark.sql(s"DROP DATABASE $db")
  }

  test("z-ordered write: narrow filters on EITHER column touch few files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // uniform 256x256 grid -> 16 files ~ the 16 level-2 Z quadrants;
    // a 1/8-range filter on x or y intersects 4 quadrants (plus up to
    // two straddlers: repartitionByRange estimates boundaries by
    // sampling, so a file can span a quadrant edge). A layout clustered
    // on x alone would serve the x filter but leave the y filter
    // touching ALL 16 — the property z-order adds.
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x, y)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    etl.CatalogOps.writeZOrdered(grid, dir, "x", "y", numFiles = 16, bits = 8)
    val t = spark.read.parquet(dir)
    def filesTouched(pred: org.apache.spark.sql.Column): Long =
      t.filter(pred).select(input_file_name()).distinct().count()
    val total = t.select(input_file_name()).distinct().count()
    assert(total === 16L)
    assert(filesTouched($"x" < 32) <= 6L)
    assert(filesTouched($"y" < 32) <= 6L)
    // and the data survives intact
    assert(t.count() === 256L * 256L)
  }

  test("partitioned write: a partition-column filter prunes directories at planning time") {
    // 10 days x 100 events; a one-day query must read exactly the one
    // day's files — PartitionFilters in the scan, not a post-scan filter
    val events = (0 until 1000).map { i =>
      (i.toLong, s"2024-01-${"%02d".format(i % 10 + 1)}", i * 10)
    }.toDF("event_id", "day", "amount")
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    CatalogOps.writePartitioned(events, dir, Seq("day"))
    val t = spark.read.parquet(dir)
    val q = t.filter($"day" === "2024-01-03")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-03"),
      s"day predicate should be a partition filter:\n$plan")
    // the pruned scan touches only the one matching directory's files
    val touched = q.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("day=2024-01-03")),
      s"read outside the pruned partition: ${touched.mkString(", ")}")
    assert(q.count() === 100L)
  }

  test("export: parquet round-trip and the sanctioned edge-list collect") {
    val dir = Files.createTempDirectory("graft-export").toString
    val merged = RoadGraph.buildMergedNetwork(t)
    Export.toParquet(merged.select("start_node", "end_node", "edge_id", "length"), dir + "/p")
    assert(spark.read.parquet(dir + "/p").count() === merged.count())
    val edges = Export.collectEdgeList(merged)
    assert(edges.length === 8)
    assert(edges.forall(_._3 > 0))
  }

  test("export: JDBC round-trip through embedded Derby (S10)") {
    val db = Files.createTempDirectory("graft-derby").toString + "/edges"
    val url = s"jdbc:derby:$db;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val merged = RoadGraph.buildMergedNetwork(t)
      .select($"edge_id", $"start_node", $"end_node", $"length")
    Export.toJdbc(merged, url, "edges", numPartitions = 2, options = opts)
    val back = Export.fromJdbc(spark, url, "edges",
      partitionColumn = "edge_id", lowerBound = 0L, upperBound = 1000L,
      numPartitions = 4, options = opts)
    // the partitioned read produces range-pruned parallel scans
    assert(back.rdd.getNumPartitions === 4)
    val a = merged.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), math.round(r.getDouble(3) * 1000))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), math.round(r.getDouble(3) * 1000))).toSet
    assert(b === a)
    // append mode accumulates
    Export.toJdbc(merged, url, "edges", mode = "append",
      numPartitions = 2, options = opts)
    assert(Export.fromJdbc(spark, url, "edges", "edge_id", 0L, 1000L,
      4, opts).count() === 2 * merged.count())
  }

  test("action feed: affected-way derivation and incremental rebuild merge") {
    // changeset: node 3 modified, way 109 modified
    val batch = Seq(("N", "M", 3L), ("W", "M", 109L))
      .toDF("data_type", "action", "id")
    val affected = ActionFeed.affectedWays(batch, t.wayNodes)
    val ids = affected.collect().map(_.getLong(0)).toSet
    // ways containing n3 (101,102) + way 109 + ways sharing a node with
    // way 109 (n8 -> 103, n12 -> 105,107): the shared-status-flip hop
    assert(ids === Set(101L, 102L, 103L, 105L, 107L, 109L))
    val rebuilt = ActionFeed.rebuildAffected(spark, t, affected)
    // rebuilding the affected subset reproduces exactly their rows from
    // the full pipeline (splits are per-way — SURVEY §7.4-8)
    val full = RoadGraph.buildMergedNetwork(t)
    val expect = full.join(affected, full("edge_id") === affected("way_id"), "left_semi")
      .select("edge_id", "nodes").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    val got = rebuilt.select("edge_id", "nodes").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    assert(got === expect)
    // merge = unaffected rows + rebuilt rows == full rebuild
    val mergedAll = ActionFeed.applyMerge(full, affected, rebuilt)
    assert(mergedAll.count() === full.count())
  }

  test("action feed: W-delete through a shared node un-splits the neighbor (IVM == full)") {
    import graft.osm.OsmTables
    // the advisor's unsoundness case: deleting W102 (5-3-6) makes n3
    // single-way, so untouched neighbor W101 ([1,2,3,4], previously
    // split at n3) must collapse back to one edge. The shared-node hop
    // in affectedWays is what invalidates 101 here.
    val before = RoadGraph.buildMergedNetwork(t)
    val newWays = t.ways.filter($"id" =!= 102L)
    val newTables = OsmTables(t.nodes, newWays,
      graft.osm.OsmModel.wayNodesOf(spark, newWays))
    val batch = Seq(("W", "D", 102L)).toDF("data_type", "action", "id")
    // pre-change way_nodes still carry 102's rows — the delete-case input
    val affected = ActionFeed.affectedWays(batch, t.wayNodes)
    assert(affected.collect().map(_.getLong(0)).toSet === Set(101L, 102L, 108L))
    val rebuilt = ActionFeed.rebuildAffected(spark, newTables, affected)
    val merged = ActionFeed.applyMerge(before, affected, rebuilt)
    val fullNew = RoadGraph.buildMergedNetwork(newTables)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select($"edge_id", $"nodes").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    assert(shape(merged) === shape(fullNew))
    // and the neighbor really is unsplit now
    assert(shape(fullNew).count(_._1 == 101L) === 1)
    assert(shape(before).count(_._1 == 101L) === 2)
  }

  test("action feed end to end over MemoryStream micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val q = ActionFeed.start(
      stream.toDF().toDF("data_type", "action", "id"),
      (batch, id) => {
        val aff = ActionFeed.affectedWays(batch, t.wayNodes)
        seen += ((id, aff.collect().map(_.getLong(0)).toSet))
      })
    stream.addData(("N", "M", 3L))
    q.processAllAvailable()
    stream.addData(("W", "D", 104L))
    q.processAllAvailable()
    q.stop()
    // deleting W104 also invalidates W106, which shares nodes 9,10 and
    // whose endpoints' shared status flips with 104 gone (the wayNodes
    // passed here still carries 104's rows — the pre-change snapshot the
    // delete case needs)
    assert(seen.map(_._2) === Seq(Set(101L, 102L), Set(104L, 106L)))
  }

  test(".osc changeset file: parse, apply, and incremental == full rebuild") {
    import graft.sources.OscChangeset
    // one diff exercising all three actions: node 3 MOVES (lat 0 ->
    // 0.001), way 102 is DELETED, way 120 (4-3, residential) is CREATED
    // through the moved node — so the fresh linestring must pick up the
    // new coordinate, and n3's shared status survives (101 stays split)
    val osc =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osmChange version="0.6" generator="graft-test">
        |  <modify>
        |    <node id="3" version="2" timestamp="2020-06-01T00:00:00Z" uid="7" changeset="99" lat="0.001" lon="0.02">
        |      <tag k="highway" v="crossing"/>
        |    </node>
        |  </modify>
        |  <delete>
        |    <way id="102" version="2" timestamp="2020-06-01T00:00:00Z" uid="7" changeset="99"/>
        |  </delete>
        |  <create>
        |    <way id="120" version="1" timestamp="2020-06-01T00:00:00Z" uid="7" changeset="99">
        |      <nd ref="4"/><nd ref="3"/>
        |      <tag k="highway" v="residential"/>
        |      <tag k="maxspeed" v="40"/>
        |    </way>
        |  </create>
        |</osmChange>""".stripMargin
    val dir = Files.createTempDirectory("osc_test")
    Files.writeString(dir.resolve("000042.osc"), osc)

    val parsed = OscChangeset.read(spark, dir.toString)
    val rows = parsed.collect().map(r => (r.action, r.data_type, r.id)).toSet
    assert(rows === Set(("M", "N", 3L), ("D", "W", 102L), ("C", "W", 120L)))
    val w120 = parsed.filter(_.id == 120L).head()
    assert(w120.node_refs === Seq(4L, 3L))
    assert(w120.tags === Map("highway" -> "residential", "maxspeed" -> "40"))
    val n3 = parsed.filter(_.data_type == "N").head()
    assert(n3.lat.contains(0.001) && n3.lon.contains(0.02))
    assert(n3.changeset_id === 99L && n3.version === 2)

    // apply: base tables -> post-change tables
    val updated = OscChangeset.applyTo(spark, t, parsed.toDF())
    assert(updated.ways.filter($"id" === 102L).isEmpty)
    val movedGeom = updated.nodes.filter($"id" === 3L)
      .select($"geom.lat").head().getDouble(0)
    assert(movedGeom === 0.001)
    // the created way's denormalized linestring reads the MOVED node
    val ls120 = updated.ways.filter($"id" === 120L)
      .select($"linestring").head().getSeq[org.apache.spark.sql.Row](0)
    assert(ls120.map(p => (p.getDouble(0), p.getDouble(1))) ===
      Seq((0.03, 0.0), (0.02, 0.001)))
    // untouched way keeps its original linestring (no global rewrite)
    val ls103 = updated.ways.filter($"id" === 103L)
      .select($"linestring").head().getSeq[org.apache.spark.sql.Row](0)
    assert(ls103.map(p => (p.getDouble(0), p.getDouble(1))) ===
      Seq((0.10, 0.0), (0.12, 0.0)))
    // a MOVED node's containing ways get refreshed linestrings too
    val ls101 = updated.ways.filter($"id" === 101L)
      .select($"linestring").head().getSeq[org.apache.spark.sql.Row](0)
    assert(ls101.map(p => (p.getDouble(0), p.getDouble(1))).lift(2) ===
      Some((0.02, 0.001)))

    // incremental maintenance driven by the parsed diff == full rebuild
    val before = RoadGraph.buildMergedNetwork(t)
    val affected = ActionFeed.affectedWays(
      OscChangeset.actions(parsed.toDF()),
      t.wayNodes.unionByName(updated.wayNodes)) // pre+post snapshot union
    val rebuilt = ActionFeed.rebuildAffected(spark, updated, affected)
    val merged = ActionFeed.applyMerge(before, affected, rebuilt)
    val fullNew = RoadGraph.buildMergedNetwork(updated)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select($"edge_id", $"nodes").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    assert(shape(merged) === shape(fullNew))
    // the new way entered the car network, and 101 is still split at n3
    assert(shape(fullNew).count(_._1 == 120L) === 1)
    assert(shape(fullNew).count(_._1 == 101L) === 2)
  }
}
