package graft.osm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Graph-construction validation utilities over the exported edge list.
  *
  * The reference hands the edge list to igraph for real graph analytics
  * (osm-pg-etl.md:34-52) — that stays the design here too. But a
  * network-build pipeline needs cheap in-engine sanity checks before
  * exporting 10^9 edges: is the graph in one piece, how many isolated
  * fragments did the mode filters create?
  *
  * Connected components via min-label propagation WITH pointer jumping:
  * each round (1) lowers every node's label to the min over its
  * neighbors' labels, then (2) contracts label chains by one hop
  * (label := label's label — sound because a label is always the id of
  * a node in the same component, so the invariant is preserved and the
  * inner join on the label key loses no rows). Plain neighbor
  * propagation needs diameter-many rounds — fatal on a planet road
  * graph whose effective diameter is thousands; the jump step halves
  * label-tree heights so convergence is O(log diameter) (the
  * pointer-doubling idea behind the alternating large-star/small-star
  * MapReduce components algorithm). Terminates at the fixpoint: if
  * neither step changes any label, labels are constant within each
  * component and equal to its min. Each round is two shuffle joins +
  * one aggregate; `localCheckpoint` cuts lineage so plans stay flat.
  */
object GraphCheck {

  /** (node_id, component) for the undirected graph of the edge list. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      localThreshold: Long = 100000L): DataFrame =
    connectedComponentsWithRounds(edges, maxIter, localThreshold)._1

  /** Same, also returning the number of rounds to the fixpoint —
    * observable evidence of the O(log diameter) convergence (asserted
    * on a long chain in RoadGraphSpec, which forces the distributed
    * loop with `localThreshold = 0`). */
  def connectedComponentsWithRounds(edges: DataFrame,
      maxIter: Int = 50, localThreshold: Long = 100000L): (DataFrame, Int) = {
    // Broadcast-local fast path — the multiSourceShortestPaths pattern
    // (GraphCheck:157): a component labelling that fits on the driver
    // pays O(log diameter) multi-stage shuffle rounds for nothing.
    // Union-find with path compression produces THE SAME labels by
    // construction (component = min node id in the component — the
    // hash-min fixpoint). Rounds reports 0 to mark the local path;
    // localThreshold = 0 forces the distributed loop (ScaleSmoke's
    // convergence witness and the composed operators' scale paths).
    if (localThreshold > 0) {
      val eChk = edges
        .select(col("start_node").cast("long"), col("end_node").cast("long"))
        .localCheckpoint(true)
      if (eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
        val spark = eChk.sparkSession
        import spark.implicits._
        val es = eChk.collect().map(r => (r.getLong(0), r.getLong(1)))
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        es.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          // union by MIN root so the final root IS the component min
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val rows = parent.keys.toSeq.sorted.map(n => (n, find(n)))
        return (rows.toDF("node_id", "component"), 0)
      }
      return connectedComponentsDistributed(eChk, maxIter)
    }
    connectedComponentsDistributed(edges, maxIter)
  }

  private def connectedComponentsDistributed(edges: DataFrame,
      maxIter: Int): (DataFrame, Int) = {
    // NOTE (measured, round 7): pre-partitioning this relation on `b`
    // before the checkpoint — so the per-round neighbor join would
    // reuse the partitioning instead of re-exchanging |E| rows — ran
    // 2x SLOWER on the 12.6M-edge smoke (218 s vs 107 s): the preserved
    // hash distribution forces a per-round SORT of the big side for the
    // sort-merge join, which costs more than the exchange it saves, and
    // pins AQE out of the stage. Keep the plain checkpoint.
    val sym = edges.select(col("start_node").as("a"), col("end_node").as("b"))
      .unionByName(edges.select(col("end_node").as("a"), col("start_node").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("node_id"))
      .distinct()
      .withColumn("component", col("node_id"))
      .localCheckpoint(true)
    // labels only ever decrease, so the label SUM is a fixpoint
    // detector: one scalar aggregate per round instead of a
    // join-and-count convergence check
    var prevSum = java.math.BigDecimal.valueOf(Long.MaxValue)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = sym
        .join(labels, sym("b") === labels("node_id"))
        .select(col("a").as("node_id"), col("component"))
      val lowered = labels.unionByName(viaNeighbor)
        .groupBy("node_id").agg(min(col("component")).as("component"))
      // pointer jump: component := component's component (one-hop chain
      // contraction). Every label value is a node_id key of `lowered`,
      // so the inner join is total.
      val ptr = lowered
        .select(col("node_id").as("__c"), col("component").as("__cc"))
      val next = lowered.join(ptr, lowered("component") === ptr("__c"))
        .select(col("node_id"), col("__cc").as("component"))
        .localCheckpoint(true)
      // cast BEFORE summing: planet-scale node ids (~1e10) over ~1e9
      // nodes overflow a Long accumulator (ANSI mode throws); a
      // decimal(38,0) accumulator has ~19 digits of headroom. An empty
      // edge set yields a null sum — treat it as converged.
      val s = next.agg(sum(col("component").cast("decimal(38,0)"))).head()
        .getDecimal(0)
      converged = s == null || s.compareTo(prevSum) == 0
      prevSum = if (s == null) prevSum else s
      labels = next
      i += 1
    }
    (labels, i)
  }

  /** Component count + size of the largest — the one-line health check
    * before export. */
  def componentSummary(edges: DataFrame): (Long, Long) = {
    val sizes = connectedComponents(edges)
      .groupBy("component").agg(count(lit(1)).as("n"))
    val r = sizes.agg(count(lit(1)), max(col("n"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Checkpoint the canonical `(start_node, end_node, w)` edge relation
    * ONCE, idempotently: if the incoming plan is already a bare
    * checkpoint scan of exactly that shape — as produced by this
    * helper in an enclosing call — reuse it. Composite operators
    * (KSP's prune + spur searches, closeness's k sources, A*'s
    * delegation, the pgRouting edge-row projection) route the same
    * relation through several public entry points; without this guard
    * each hop re-materialized the full edge list, which at planet
    * scale multiplies the single largest I/O cost of the whole
    * operator by the call depth. */
  private def materializeEdges(edges: DataFrame): DataFrame = {
    val already =
      edges.columns.toSeq == Seq("start_node", "end_node", "w") &&
        edges.queryExecution.analyzed
          .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    if (already) edges
    else edges.select(col("start_node"), col("end_node"), col("w"))
      .localCheckpoint(true)
  }

  /** Single-source shortest paths over a weighted DIRECTED edge list —
    * the `pgr_dijkstra` analog the reference's graphs are built to
    * feed (`osm-road-graphs.sql` exports exactly this edge shape into
    * pgRouting). Bellman–Ford/Pregel relaxation: each round one
    * equi-join relaxes every edge whose source is settled, a min-agg
    * merges, and the frontier is checkpointed — the GraphX Pregel
    * shape, with rounds bounded by the shortest-path-tree HOP depth
    * (road networks: a few hundred at continent scale; delta-stepping
    * buckets are the refinement when that dominates). Unreachable
    * nodes are absent from the result.
    *
    * `edges` carries `(start_node, end_node, w)`; weights must be
    * non-negative (longs stay exact under path summation — the bench
    * queries ride integer centimeters for cross-engine bit equality).
    *
    * Convergence detector: distances only decrease and the settled set
    * only grows, so the (count, sum) pair is a fixpoint witness — one
    * scalar aggregate per round, no join-and-count. */
  def shortestPathsWithRounds(edges: DataFrame, source: Long,
      maxIter: Int = 100): (DataFrame, Int) =
    multiSourceShortestPaths(edges, Seq(source), maxIter)

  /** Multi-source variant: every seed starts at distance 0, so the
    * result is each node's distance to its NEAREST source — the
    * accessibility query (distance to nearest amenity/stop/service)
    * that street-network analysis runs over these graphs. Identical
    * cost to single-source: seeding is free, the rounds are bounded by
    * the deepest shortest-path tree.
    *
    * FRONTIER relaxation (the Bellman–Ford worklist form): each round
    * joins the edge relation against only the nodes whose distance
    * IMPROVED last round, not the whole settled set. On a road
    * network the frontier is a wavefront — a thin ring of the graph —
    * so per-round work tracks the wavefront size instead of E; once a
    * region settles it is never re-joined. The frontier going empty IS
    * convergence (no separate fixpoint detector needed: a node enters
    * the frontier only by strictly improving, and non-negative weights
    * make improvements finite). */
  def multiSourceShortestPaths(edges: DataFrame, sources: Seq[Long],
      maxIter: Int = 100, localThreshold: Long = 100000L): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    // one upstream execution total: checkpoint the edge relation FIRST,
    // then the threshold probe and either path read the materialized
    // copy instead of re-running the (possibly expensive) upstream DAG
    val eChk = materializeEdges(edges)
    // Broadcast-local fast path — the same adaptive decision a
    // broadcast join makes: a graph that fits on the driver pays tens
    // of per-round job launches in the distributed loop for nothing.
    // Collect it, run Dijkstra, parallelize the result. Distances are
    // identical (path sums accumulate in the same order); rounds
    // reports 0 to mark the local path. Set localThreshold = 0 to
    // force the distributed loop.
    if (localThreshold > 0 &&
        eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val isLong = eChk.schema("w").dataType ==
        org.apache.spark.sql.types.LongType
      val es = eChk.select(col("start_node"), col("end_node"),
          col("w").cast("double")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val dist = scala.collection.mutable.Map[Long, Double]()
      val pq = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long)](Ordering.by[(Double, Long), Double](_._1).reverse)
      sources.foreach { s => dist(s) = 0.0; pq.enqueue((0.0, s)) }
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u)) {
          es.getOrElse(u, Array.empty[(Long, Double)]).foreach { case (v, w) =>
            val nd = d + w
            if (!dist.contains(v) || nd < dist(v)) {
              dist(v) = nd; pq.enqueue((nd, v))
            }
          }
        }
      }
      val rows = dist.toSeq.sortBy(_._1)
      val out =
        if (isLong) rows.map { case (n, d) => (n, d.toLong) }
          .toDF("node_id", "dist")
        else rows.toDF("node_id", "dist")
      return (out, 0)
    }
    val e = eChk.select(col("start_node").as("src"),
      col("end_node").as("dst"), col("w"))
    val wType = e.schema("w").dataType
    var dist = sources.map((_, 0L)).toDF("node_id", "dist")
      .select(col("node_id"), col("dist").cast(wType))
      .localCheckpoint(true)
    var frontier = dist
    var frontierSize = sources.size.toLong
    var i = 0
    while (frontierSize > 0 && i < maxIter) {
      // candidate improvements reachable from last round's winners;
      // min-agg dedups multiple in-round paths to the same node
      val cand = e.join(frontier, e("src") === frontier("node_id"))
        .select(col("dst").as("node_id"), (col("dist") + col("w")).as("dist"))
        .groupBy("node_id").agg(min(col("dist")).as("dist"))
      // keep only strict improvements (or first sightings): these are
      // the next frontier AND the rows that change the settled relation
      val improved = cand.join(dist.withColumnRenamed("dist", "__old"),
          Seq("node_id"), "left_outer")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .select(col("node_id"), col("dist"))
        .localCheckpoint(true)
      frontierSize = improved.count()
      if (frontierSize > 0) {
        dist = dist.unionByName(improved)
          .groupBy("node_id").agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
        frontier = improved
      }
      i += 1
    }
    (dist, i)
  }

  /** [[shortestPathsWithRounds]] without the round count. */
  def shortestPaths(edges: DataFrame, source: Long,
      maxIter: Int = 100): DataFrame =
    shortestPathsWithRounds(edges, source, maxIter)._1

  /** PageRank over the directed edge list — fixed iteration count,
    * classic join-aggregate Pregel shape: one pass computes out-degrees
    * (joined onto the edge relation ONCE, outside the loop), then each
    * iteration is one equi-join (rank flows along edges as
    * rank/outdeg) + one sum-agg + the teleport term. Dangling nodes
    * keep the teleport share only (mass leaks — the simplest
    * consistent semantics, mirrored exactly by the oracle's unrolled
    * iterations). Checkpoint every iteration keeps plans flat.
    *
    * 100 TB shape: per-iteration cost is exactly one shuffle join +
    * one shuffle agg over E — the same loop economics as
    * [[connectedComponentsWithRounds]]; iteration count is a fixed
    * budget (20 ≈ 1e-7 residual at damping 0.85), not data-dependent. */
  /** Turn-restricted single-source shortest paths — the `pgr_trsp`
    * analog: SSSP over the EDGE-EXPANDED graph (the line graph), where
    * a state is "arrived at edge e's head along e" and a transition
    * e1→e2 exists iff e1 ends where e2 starts AND the turn
    * (e1.way, via, e2.way) is not banned. `restrictions` carries
    * `(from_way, via_node, to_way, kind)` from
    * [[RoadGraph.turnRestrictions]]: `no` bans its triple; `only`
    * (mandatory turn) bans every OTHER transition off the from-way at
    * the via node — both expanded here into one ban set, then ONE
    * left-anti join prunes the line graph. U-turns stay legal unless
    * explicitly restricted (pgr_trsp's default).
    *
    * `edges` carries `(edge_id, start_node, end_node, w, way_id)`;
    * edge ids must be positive (id −1 seeds the virtual source state).
    * Returns `(node_id, dist)` with the source at 0; unreachable nodes
    * absent — [[shortestPaths]] semantics, which the expansion then
    * inherits round-for-round.
    *
    * 100 TB shape: the line graph is Σ_v in(v)·out(v) — bounded by
    * (max junction degree)·E, a small constant multiple of E on road
    * networks — built with ONE keyed self-join; bans are a second
    * keyed anti-join; then the standard SSSP loop economics. No
    * per-restriction driver logic. */
  def restrictedShortestPaths(edges: DataFrame, restrictions: DataFrame,
      source: Long, maxIter: Int = 100): DataFrame = {
    val spark = edges.sparkSession
    val (lg, smap) = restrictedStateGraph(edges, restrictions)
    // virtual source state: no from-way, so no restriction can apply
    val seed = edges.filter(col("start_node") === source)
      .select(lit(-1L).as("start_node"), col("edge_id").as("end_node"),
        col("w"))
    val states = shortestPaths(lg.unionByName(seed), source = -1L, maxIter)
    val nodeDist = states
      .join(smap.select(col("state_id").as("node_id"),
        col("arr_node").as("__n")), "node_id")
      .groupBy(col("__n").as("node_id")).agg(min(col("dist")).as("dist"))
    import spark.implicits._
    nodeDist.filter(col("node_id") =!= source)
      .unionByName(Seq((source, 0L)).toDF("node_id", "dist"))
  }

  /** Turn-restricted point-to-point route — the full `pgr_trsp`
    * surface: the banned-turn line graph of
    * [[restrictedShortestPaths]] extended with a virtual SINK state
    * (every edge entering `target` steps to −2 at cost 0), solved by
    * [[shortestPathTo]] over edge states. Returns
    * `(edge sequence, node sequence, total cost)`; None when no
    * restriction-legal path exists. The state path strips its ±
    * sentinels to the edge ids actually driven; node path = source +
    * each edge's head. The final per-path lookups (edge → head node,
    * weight) collect only PATH-sized rows — the documented igraph
    * hand-off boundary, not a corpus collect. */
  def restrictedRoute(edges: DataFrame, restrictions: DataFrame,
      source: Long, target: Long, maxIter: Int = 100)
      : Option[(Seq[Long], Seq[Long], Double)] =
    restrictedRouteOn(restrictedStateGraph(edges, restrictions), edges,
      source, target, maxIter)

  /** [[restrictedRoute]] over a PREBUILT state graph — callers routing
    * several od-pairs on one restricted graph build (and ideally
    * checkpoint) the shadow-state expansion ONCE instead of re-deriving
    * its join chain per pair (r21; guide §1.2). */
  private[graft] def restrictedRouteOn(sg: (DataFrame, DataFrame),
      edges: DataFrame, source: Long, target: Long, maxIter: Int = 100)
      : Option[(Seq[Long], Seq[Long], Double)] = {
    if (source == target) return Some((Seq.empty, Seq(source), 0.0))
    val (lg, smap) = sg
    val seed = edges.filter(col("start_node") === source)
      .select(lit(-1L).as("start_node"), col("edge_id").as("end_node"),
        col("w"))
    val sink = smap.filter(col("arr_node") === target)
      .select(col("state_id").as("start_node"), lit(-2L).as("end_node"),
        lit(0L).cast(edges.schema("w").dataType).as("w"))
    shortestPathTo(lg.unionByName(seed).unionByName(sink), -1L, -2L,
        maxIter)
      .map { case (statePath, cost) =>
        val stateSeq = statePath.filter(id => id != -1L && id != -2L)
        // PATH-sized lookup (shadow states translate to their via edge)
        val real = smap.filter(col("state_id").isin(stateSeq: _*))
          .select(col("state_id"), col("real_edge"), col("arr_node"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        (stateSeq.map(s => real(s)._1),
          source +: stateSeq.map(s => real(s)._2), cost)
      }
  }

  /** The banned-turn-pruned line graph of [[restrictedShortestPaths]],
    * built LAZILY (the SSSP loop materializes eagerly, so the audit of
    * the expansion's plan shape — keyed via-node join, real LeftAnti
    * ban prune, nothing cartesian — needs the pre-loop frame; the
    * corenessRound policy). Returns `(start_node, end_node, w)` over
    * edge-id states. */
  private[graft] def restrictedLineGraph(edges: DataFrame,
      restrictions: DataFrame): DataFrame = {
    val e1 = edges.select(col("edge_id").as("__a"),
      col("end_node").as("__via"), col("way_id").as("__fw"))
    val e2 = edges.select(col("edge_id").as("__b"),
      col("start_node").as("__via2"), col("way_id").as("__tw"),
      col("w").as("__w"))
    val turns = e1.join(e2, col("__via") === col("__via2"))
    val no = restrictions.filter(col("kind") === "no")
      .select(col("from_way"), col("via_node"), col("to_way"))
    val onlyBans = turns.join(
        restrictions.filter(col("kind") === "only"),
        col("__fw") === col("from_way") && col("__via") === col("via_node"))
      .filter(col("__tw") =!= col("to_way"))
      .select(col("__fw").as("from_way"), col("__via").as("via_node"),
        col("__tw").as("to_way"))
    val bans = no.unionByName(onlyBans).distinct()
    turns.join(bans,
        col("__fw") === col("from_way") && col("__via") === col("via_node")
          && col("__tw") === col("to_way"), "left_anti")
      .select(col("__a").as("start_node"), col("__b").as("end_node"),
        col("__w").as("w"))
  }

  /** The full `pgr_trsp` restriction surface: the line graph of
    * [[restrictedLineGraph]] PLUS via-WAY restrictions (OSM's
    * `type=restriction` with a `via` member of type W — "no driving
    * F → across V → onto T"), which a pairwise ban cannot express:
    * banning F→V would outlaw entering V and exiting elsewhere;
    * banning V→T would outlaw reaching T through V from other
    * entries. The classical fix (OSRM/pgRouting): SHADOW STATES —
    * one clone s(F,V) of via-edge V per banned prefix, entered only
    * by the redirected F→V transition, carrying every real
    * continuation of V except the banned T's. Chained via-way
    * restrictions compose: shadow exits are taken from the
    * already-redirected graph and bans compare on the UNDERLYING
    * edge id, so s(F,V) routes into s(V,X) where one exists.
    *
    * `restrictions` may carry `via_node` and/or `via_way` columns
    * (each row exactly one non-null — [[RoadGraph.turnRestrictionsVia]]);
    * without a `via_way` column this degenerates to
    * [[restrictedLineGraph]] byte-for-byte. `only_*` via-way rows
    * enforce BOTH legs: every non-V continuation of F dies (plain
    * transition ban) and every non-T continuation of (F, V) dies
    * (shadow-side ban).
    *
    * LIMITATION: a via way is resolved to the single edge running
    * from F's head to T's tail — a via way SPLIT into several edges
    * by an intermediate junction resolves to zero triples and the
    * restriction goes unenforced (the multi-shadow chain is future
    * work). Audit such rows with [[unresolvedViaWayRestrictions]]
    * before trusting a routing result.
    *
    * Returns `(stateGraph, stateMap)`; the map rows are
    * `(state_id, arr_node, real_edge)` — real edges map to
    * themselves, shadows to their via edge. Shadow ids sit below the
    * −1/−2 routing sentinels.
    *
    * 100 TB shape: the restriction table is KB-sized even planet-wide
    * (broadcast-class), so its resolution joins broadcast and the one
    * shadow-id window over distinct (F, V) prefixes is bounded by the
    * restriction count, never corpus data; everything edge-sized stays
    * keyed (equi-joins and one LeftAnti). */
  private[graft] def restrictedStateGraph(edges: DataFrame,
      restrictions: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val baseMap = edges.select(col("edge_id").as("state_id"),
      col("end_node").as("arr_node"), col("edge_id").as("real_edge"))
    val hasVia = restrictions.columns.contains("via_way")
    val nodeR =
      if (hasVia) restrictions.filter(col("via_node").isNotNull)
        .select(col("from_way"), col("via_node"), col("to_way"), col("kind"))
      else restrictions
    val lg0 = restrictedLineGraph(edges, nodeR)
    if (!hasVia) return (lg0, baseMap)
    val wayR = restrictions.filter(col("via_way").isNotNull)
    val triples = resolveViaWayTriples(edges, wayR)
      .select(col("__f"), col("__v"), col("__t"), col("kind"))
    // only_*: mandatory turn — TWO legs. First leg: off F you MUST
    // enter V, so every other continuation of F dies outright (a
    // plain transition ban, no shadow needed). Second leg: after
    // F→V you must exit to T — ban every other continuation of
    // (F, V), expanded against the real transitions out of V.
    val onlyTriples = triples.filter(col("kind") === "only")
      .localCheckpoint(true)
    val firstLegBans = onlyTriples.select(col("__f")).distinct()
      .join(lg0, lg0("start_node") === col("__f"))
      .select(col("__f"), col("end_node").as("__x"), col("w"))
      .join(onlyTriples.select(col("__f"), col("__v").as("__x"))
        .distinct(), Seq("__f", "__x"), "left_anti")
    val lgA = lg0.join(
      broadcast(firstLegBans.select(col("__f").as("start_node"),
        col("__x").as("end_node")).distinct()),
      Seq("start_node", "end_node"), "left_anti")
    val vOut = lgA.select(col("start_node").as("__v"),
      col("end_node").as("__x"))
    val onlyBans = onlyTriples.select(col("__f"), col("__v")).distinct()
      .join(vOut, "__v")
      .join(onlyTriples.select(col("__f"), col("__v"),
        col("__t").as("__x")), Seq("__f", "__v", "__x"), "left_anti")
      .select(col("__f"), col("__v"), col("__x").as("__t"))
    val bans3 = triples.filter(col("kind") === "no")
      .select(col("__f"), col("__v"), col("__t"))
      .unionByName(onlyBans).distinct().localCheckpoint(true)
    val pairs = bans3.select(col("__f"), col("__v")).distinct()
      .withColumn("__sid", -lit(10L) - row_number().over(
        Window.orderBy(col("__f"), col("__v"))).cast("long"))
      .localCheckpoint(true)
    // kill the real F→V transition, re-enter V through its shadow
    val lg1 = lgA.join(broadcast(pairs.select(
        col("__f").as("start_node"), col("__v").as("end_node"))),
      Seq("start_node", "end_node"), "left_anti")
    val redirect = lgA.join(broadcast(pairs),
        lgA("start_node") === pairs("__f") &&
          lgA("end_node") === pairs("__v"))
      .select(col("start_node"), col("__sid").as("end_node"), col("w"))
    val shadowMap = pairs
      .join(edges.select(col("edge_id").as("__v"),
        col("end_node").as("__vend")), "__v")
      .select(col("__sid").as("state_id"), col("__vend").as("arr_node"),
        col("__v").as("real_edge"))
    val stateMap = baseMap.unionByName(shadowMap)
    val vCont = lg1.unionByName(redirect)
    val shadowOut = broadcast(pairs)
      .join(vCont, pairs("__v") === vCont("start_node"))
      .join(stateMap.select(col("state_id").as("end_node"),
        col("real_edge").as("__xreal")), "end_node")
      .join(bans3.select(col("__f"), col("__v"),
        col("__t").as("__xreal")), Seq("__f", "__v", "__xreal"),
        "left_anti")
      .select(col("__sid").as("start_node"), col("end_node"), col("w"))
    (vCont.unionByName(shadowOut), stateMap)
  }

  /** Way-level via restrictions resolved to edge triples: the via way
    * must be the single edge running F's head → T's tail. Rows
    * `(from_way, via_way, to_way, kind, __f, __v, __t)`. */
  private def resolveViaWayTriples(edges: DataFrame,
      wayR: DataFrame): DataFrame = {
    val eF = edges.select(col("edge_id").as("__f"),
      col("end_node").as("__n1"), col("way_id").as("__fww"))
    val eV = edges.select(col("edge_id").as("__v"),
      col("start_node").as("__vs"), col("end_node").as("__n2"),
      col("way_id").as("__vww"))
    val eT = edges.select(col("edge_id").as("__t"),
      col("start_node").as("__ts"), col("way_id").as("__tww"))
    broadcast(wayR)
      .join(eF, col("__fww") === col("from_way"))
      .join(eV, col("__vww") === col("via_way") && col("__vs") === col("__n1"))
      .join(eT, col("__tww") === col("to_way") && col("__ts") === col("__n2"))
      .select(col("from_way"), col("via_way"), col("to_way"), col("kind"),
        col("__f"), col("__v"), col("__t"))
  }

  /** The via-WAY restrictions [[restrictedStateGraph]] could NOT
    * enforce — rows of `restrictions` whose (F, V, T) resolved to zero
    * edge triples, typically because the via way spans several edges
    * (an intermediate junction splits it). Run this audit before
    * trusting a restricted route; a non-empty result means the routing
    * surface silently under-restricts those relations. */
  def unresolvedViaWayRestrictions(edges: DataFrame,
      restrictions: DataFrame): DataFrame = {
    val wayR = restrictions.filter(col("via_way").isNotNull)
    wayR.join(
      resolveViaWayTriples(edges, wayR)
        .select(col("from_way"), col("via_way"), col("to_way")).distinct(),
      Seq("from_way", "via_way", "to_way"), "left_anti")
  }

  /** Community detection by SYNCHRONOUS label propagation (LPA,
    * Raghavan et al. 2007) with the deterministic contract this
    * engine's oracle policy needs: a FIXED number of rounds, every
    * node updating simultaneously to the most frequent label among its
    * neighbors, ties broken to the SMALLEST label. Fixed rounds + total
    * tie order make the result a pure function of the edge set (classic
    * asynchronous LPA is schedule-dependent and unsuitable for
    * cross-engine value checks); an independent SQL engine replays the
    * rounds exactly.
    *
    * 100 TB shape: each round is ONE keyed join (edges × labels on the
    * neighbor id) and two hash-aggs — (node, label) counts with
    * map-side partials, then the per-node argmax as a `min(struct)`
    * (no window, no skew pivot); `localCheckpoint` per round keeps the
    * plan flat. Same loop economics as [[pageRank]]; round count is a
    * fixed budget, not data-dependent. Isolated nodes (only
    * self-loops) drop with the self-loops. */
  def labelPropagation(edges: DataFrame, rounds: Int,
      localThreshold: Long = 100000L): DataFrame = {
    val sym = edges
      .select(col("start_node").as("a"), col("end_node").as("b"))
      .unionByName(
        edges.select(col("end_node").as("a"), col("start_node").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    // Broadcast-local fast path (the connectedComponents localThreshold
    // pattern): a fixture-sized graph pays `rounds` x (join + 2 hash-agg
    // + checkpoint) driver jobs for microseconds of counting. The local
    // sweep reproduces the synchronous (max count, min label) argmax
    // exactly — counts are exact longs in both forms; pinned
    // local == distributed in RoadGraphSpec. localThreshold = 0 forces
    // the distributed loop (scale witnesses, plan audits).
    collectIfSmallLongs(sym, localThreshold).foreach { rows =>
      val spark = sym.sparkSession
      import spark.implicits._
      return lpaLocal(rows.map(r => (r.getLong(0), r.getLong(1))), rounds)
        .toDF("node_id", "label")
    }
    var labels = sym.select(col("a").as("node_id")).distinct()
      .withColumn("label", col("node_id"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels, sym("b") === labels("node_id"))
        .groupBy(col("a"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("a"))
        // lexicographic struct min = (largest count, then smallest
        // label) — the deterministic argmax, one agg, no window
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
          .as("__w"))
        .select(col("a").as("node_id"), col("__w.l").as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Collect a ≤`threshold`-row all-LongType relation in ONE job, or
    * None when it is larger (or not all-long, which would change the
    * output schema on the local paths). `df` must be materialized
    * (localCheckpoint) so the limit probe is a cheap local scan; when
    * the limit(threshold+1) collect comes back with ≤ threshold rows it
    * IS the whole relation — no second job. */
  private def collectIfSmallLongs(df: DataFrame,
      threshold: Long): Option[Array[org.apache.spark.sql.Row]] = {
    if (threshold <= 0) return None
    if (!df.schema.fields.forall(_.dataType ==
        org.apache.spark.sql.types.LongType)) return None
    val probe = df
      .limit(math.min(threshold + 1, Int.MaxValue.toLong).toInt)
      .collect()
    if (probe.length <= threshold) Some(probe) else None
  }

  /** Broadcast-local twin of the [[labelPropagation]] round loop over a
    * collected SYMMETRIC distinct edge set: every node simultaneously
    * takes the most frequent neighbor label, ties to the smallest —
    * the identical (max count, min label) argmax, exact longs both
    * forms. Returns (node_id, label) sorted by node. */
  private def lpaLocal(sym: Array[(Long, Long)],
      rounds: Int): Seq[(Long, Long)] = {
    val adj = sym.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    var lab: scala.collection.Map[Long, Long] =
      adj.keysIterator.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (a, nbrs) =>
        val cnt = scala.collection.mutable.Map.empty[Long, Long]
        nbrs.foreach { b =>
          val c = lab(b); cnt(c) = cnt.getOrElse(c, 0L) + 1
        }
        a -> cnt.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab.toSeq.sortBy(_._1)
  }

  /** Newman modularity of a community labeling (igraph `modularity`,
    * the first number every user computes after [[labelPropagation]] —
    * the reference hands its edge list to igraph for exactly this,
    * osm-pg-etl.md:34-52): Q = Σ_c [ L_c/m − (D_c/2m)² ] over the
    * canonical simple undirected graph, where m = |edges|, L_c = edges
    * inside community c, D_c = Σ degrees of c's nodes.
    *
    * Numeric contract (the degreeAssortativity policy): everything up
    * to the final ratio is EXACT — the per-community numerator
    * 4·m·L_c − D_c² is formed and summed in DECIMAL(38,0) (room for
    * 1e12 edges), and only the single division Q = Σnum / (4m²) runs
    * in double, reproduced bit-for-bit by an independent SQL engine.
    *
    * Returns ONE row `(m_edges, n_communities, modularity)`.
    *
    * 100 TB shape: two keyed label-attach joins, one degree hash-agg,
    * two per-community hash-aggs, one scalar agg. No window, no
    * collect; the scalar m rides a broadcast cross join. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("start_node"), col("end_node")).as("a"),
        greatest(col("start_node"), col("end_node")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val la = labels.select(col("node_id").as("a"), col("label").as("__ca"))
    val lb = labels.select(col("node_id").as("b"), col("label").as("__cb"))
    val lc = und.join(la, "a").join(lb, "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("label")).agg(count(lit(1)).as("__Lc"))
    val deg = und.select(col("a").as("n"))
      .unionByName(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("__d"))
    val dc = deg.join(labels.select(col("node_id").as("n"), col("label")), "n")
      .groupBy("label").agg(sum(col("__d")).as("__Dc"))
    val m = und.agg(count(lit(1)).as("__m"))
    dc.join(lc, Seq("label"), "left")
      .select(col("label"), coalesce(col("__Lc"), lit(0L)).as("__Lc"),
        col("__Dc"))
      .crossJoin(broadcast(m))
      .agg(first(col("__m")).as("m_edges"),
        count(lit(1)).as("n_communities"),
        sum((col("__m") * 4).cast("decimal(19,0)")
            * col("__Lc").cast("decimal(19,0)")
          - col("__Dc").cast("decimal(19,0)")
            * col("__Dc").cast("decimal(19,0)")).as("__num"))
      .select(col("m_edges"), col("n_communities"),
        round(col("__num").cast("double") /
          (col("m_edges").cast("double") * col("m_edges").cast("double")
            * 4.0), 6).as("modularity"))
  }

  /** One SYNCHRONOUS local-move refinement round over a community
    * labeling — the parallel form of a Louvain phase-1 sweep (Blondel
    * et al. 2008; synchronous variant as in distributed-Louvain
    * implementations): every node evaluates moving to each NEIGHBOR
    * community and takes the best strictly-positive modularity gain,
    * all moves applied simultaneously. Sequential Louvain is
    * schedule-dependent (un-oracle-able); the synchronous round is a
    * pure function of (edges, labels), replayed exactly by SQL.
    *
    * The gain test is EXACT integer arithmetic — no double ΔQ:
    * maximizing ΔQ(n: old→c) over candidates c reduces to maximizing
    * `2m·w_{n,c} − d_n·D_c` (ties to the smallest c), and the move
    * fires iff `2m·(w_new − w_old) > d_n·(D_new − D_old + d_n)`
    * (both sides DECIMAL(38,0); the 1/m and 1/2m² scalings cancel).
    * w_{n,c} = edges from n into c, D_c = degree mass of c, computed
    * BEFORE any move (synchronous semantics; a round can in principle
    * oscillate on adjacent simultaneous movers — the documented
    * parallel-Louvain tradeoff — but each accepted move is individually
    * Q-positive against the pre-round state).
    *
    * 100 TB shape: one neighbor-label join + (node, community)
    * hash-agg for w, one degree agg, one community agg for D, one
    * per-node argmin(struct). No window, no collect.
    *
    * Implementation: the unit-weight instance of
    * [[refineCommunitiesWeighted]] — on a simple loop-free graph the
    * weight sums degenerate to the edge counts above, value-for-value
    * (oracle-re-certified after the unification). */
  def refineCommunities(edges: DataFrame, labels: DataFrame,
      localThreshold: Long = 100000L): DataFrame =
    refineCommunitiesRounds(edges, labels, rounds = 1, localThreshold)

  /** Canonical unit-weight frame `(a, b, __ew = 1)` of a simple graph
    * — [[refineWeightedCore]] input without the weighted
    * re-aggregation shuffle (the rows are already distinct). */
  private def canonUnitEdges(edges: DataFrame): DataFrame =
    edges
      .select(least(col("start_node"), col("end_node")).as("a"),
        greatest(col("start_node"), col("end_node")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .withColumn("__ew", lit(1L))

  /** The distributed Louvain phase-1 loop: `rounds` synchronous
    * [[refineCommunities]] sweeps, each recomputing community stats
    * from the previous round's labels. Fixed round count (not
    * converge-detect) keeps it a pure function of (edges, labels) for
    * the oracle, the [[labelPropagation]] policy; localCheckpoint per
    * round keeps plans flat. Each accepted move is individually
    * Q-positive against its round's state, so on fixtures without
    * simultaneous-mover interference modularity is non-decreasing
    * round over round (spec-gated). */
  def refineCommunitiesRounds(edges: DataFrame, labels: DataFrame,
      rounds: Int, localThreshold: Long = 100000L): DataFrame = {
    // canonicalize ONCE; every sweep reuses the materialized frame
    // instead of re-paying the distinct() shuffle
    val und = canonUnitEdges(edges).localCheckpoint(true)
    // Broadcast-local fast path (the connectedComponents localThreshold
    // pattern): each distributed sweep is ~6 joins + 4 hash-aggs + a
    // checkpoint of driver jobs for a fixture-sized graph. The local
    // sweep is the step-for-step twin of [[refineWeightedCore]] — same
    // exact-integer gain algebra (BigInt == the DECIMAL(38,0)
    // products), same (max gain, min community) tie order, same
    // synchronous move gate — pinned row-identical in RoadGraphSpec.
    // localThreshold = 0 forces the distributed loop.
    localRefineInputs(und, labels, localThreshold).foreach {
      case (wedges, lab0) =>
        val spark = und.sparkSession
        import spark.implicits._
        var l = lab0
        for (_ <- 1 to rounds) l = refineWeightedLocal(wedges, l, None)
        return l.toSeq.sortBy(_._1).toDF("node_id", "label")
    }
    refineRoundsCore(und, labels, rounds)
  }

  /** Distributed [[refineCommunitiesRounds]] loop over an ALREADY
    * canonical, materialized unit frame — shared with
    * [[louvainTwoLevel]]'s phase 1 so the canonicalization shuffle is
    * paid once per pipeline. */
  private def refineRoundsCore(undChk: DataFrame, labels: DataFrame,
      rounds: Int): DataFrame = {
    var l = labels.localCheckpoint(true)
    for (_ <- 1 to rounds) {
      l = refineWeightedCore(undChk, l).localCheckpoint(true)
    }
    l
  }

  /** Gate + one-job collect for the louvain-family local paths: the
    * MATERIALIZED canonical weighted frame `(a, b, __ew)` and the
    * labeling, both under `threshold` rows and all-long. */
  private def localRefineInputs(undChk: DataFrame, labels: DataFrame,
      threshold: Long)
      : Option[(Array[(Long, Long, Long)], Map[Long, Long])] =
    collectIfSmallLongs(undChk, threshold).flatMap { es =>
      collectIfSmallLongs(
        labels.select(col("node_id").cast("long"),
          col("label").cast("long")).localCheckpoint(true), threshold)
        .map { ls =>
          (es.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))),
            ls.map(r => r.getLong(0) -> r.getLong(1)).toMap)
        }
    }

  /** Broadcast-local twin of ONE [[refineWeightedCore]] sweep over
    * collected canonical weighted edges (a ≤ b, parallel rows summed,
    * self-loops kept): strengths, community masses, neighbor-community
    * weights, the exact-integer gain argmax (max gain, then smallest
    * community — the struct-min order), and the synchronous move gate,
    * all in BigInt (== the distributed DECIMAL(38,0) products). With
    * `parity = Some(p)` only nodes of that id parity may move and only
    * DOWN (candidate community < current), exactly like the gated
    * distributed rounds. */
  private def refineWeightedLocal(und: Array[(Long, Long, Long)],
      labels: Map[Long, Long],
      parity: Option[Int]): Map[Long, Long] = {
    import scala.collection.mutable
    val deg = mutable.Map.empty[Long, Long]
    und.foreach { case (a, b, w) =>
      if (a == b) deg(a) = deg.getOrElse(a, 0L) + 2 * w
      else {
        deg(a) = deg.getOrElse(a, 0L) + w
        deg(b) = deg.getOrElse(b, 0L) + w
      }
    }
    // community degree mass: labeled nodes only (the dc inner join)
    val dc = mutable.Map.empty[Long, Long]
    deg.foreach { case (n, d) =>
      labels.get(n).foreach(c => dc(c) = dc.getOrElse(c, 0L) + d)
    }
    // w_{n,c}: weight from n into community c, LABELED neighbors only
    // (the w-side inner join on the neighbor's label), self-loops out
    val w = mutable.Map.empty[(Long, Long), Long]
    def addW(n: Long, nbr: Long, ew: Long): Unit =
      labels.get(nbr).foreach { c =>
        w((n, c)) = w.getOrElse((n, c), 0L) + ew
      }
    und.foreach { case (a, b, ew) =>
      if (a != b) { addW(a, b, ew); addW(b, a, ew) }
    }
    val twoM = und.foldLeft(BigInt(0))((s, e) => s + e._3) * 2
    // per-node best candidate: max gain 2m·w − d·D_c, ties to smallest
    // c ((gain, c) determines (w, D_c), so the struct-min order reduces
    // to exactly this); scored nodes are labeled-with-degree only
    val best = mutable.Map.empty[Long, (BigInt, Long, Long, Long)]
    w.foreach { case ((n, c), wnc) =>
      for (lab <- labels.get(n); d <- deg.get(n); dcc <- dc.get(c)) {
        val admissible =
          if (parity.isDefined) c < lab else c != lab
        if (admissible) {
          val gain = twoM * BigInt(wnc) - BigInt(d) * BigInt(dcc)
          val cand = (gain, c, wnc, dcc)
          best.get(n) match {
            case Some((g0, c0, _, _))
              if g0 > gain || (g0 == gain && c0 < c) => ()
            case _ => best(n) = cand
          }
        }
      }
    }
    labels.map { case (n, lab) =>
      val gate = parity.forall(p => java.lang.Math.floorMod(n, 2L) == p)
      val moved = if (!gate) None else best.get(n).collect {
        case (_, cNew, wNew, dNew)
          if twoM * (BigInt(wNew) - BigInt(w.getOrElse((n, lab), 0L))) >
            BigInt(deg(n)) *
              (BigInt(dNew) - BigInt(dc(lab)) + BigInt(deg(n))) =>
          cNew
      }
      n -> moved.getOrElse(lab)
    }
  }

  /** Louvain phase-2 coarsening: collapse each community of `labels`
    * to one super-node. Output `(start_node, end_node, w)` is the
    * canonical weighted community graph — start ≤ end, `w` = number
    * of original edges between (or, on the diagonal, inside) the two
    * communities; a community's internal edge count rides its
    * self-loop. Feeding the result to [[modularityWeighted]] under
    * identity labels reproduces [[modularity]] of the original graph
    * EXACTLY (spec-gated) — the invariant that makes multi-level
    * Louvain correct.
    *
    * 100 TB shape: two keyed label-attach joins + one (cA, cB)
    * hash-agg; output is |communities|²-bounded but in practice tiny
    * relative to the input — the whole point of coarsening. */
  def coarsenGraph(edges: DataFrame, labels: DataFrame,
      localThreshold: Long = 100000L): DataFrame = {
    val und = canonUnitEdges(edges).localCheckpoint(true)
    // Broadcast-local fast path (the connectedComponents localThreshold
    // pattern): both label-attach joins + the (cA, cB) hash-agg become
    // one in-memory group-by over the collected canonical edge set —
    // labeled endpoints only (the inner joins), ties oriented
    // (min, max) exactly like the distributed agg keys. Pinned
    // local == distributed in RoadGraphSpec; localThreshold = 0 forces
    // the distributed form.
    localRefineInputs(und, labels, localThreshold).foreach {
      case (wedges, lm) =>
        val spark = und.sparkSession
        import spark.implicits._
        return wedges
          .flatMap { case (a, b, _) =>
            for (ca <- lm.get(a); cb <- lm.get(b))
              yield (math.min(ca, cb), math.max(ca, cb))
          }
          .groupBy(identity).toSeq
          .map { case ((ca, cb), xs) => (ca, cb, xs.length.toLong) }
          .sortBy(e => (e._1, e._2))
          .toDF("start_node", "end_node", "w")
    }
    und
      .join(labels.select(col("node_id").as("a"), col("label").as("__ca")),
        "a")
      .join(labels.select(col("node_id").as("b"), col("label").as("__cb")),
        "b")
      .groupBy(least(col("__ca"), col("__cb")).as("start_node"),
        greatest(col("__ca"), col("__cb")).as("end_node"))
      .agg(count(lit(1)).as("w"))
  }

  /** Newman modularity of a WEIGHTED graph (self-loops allowed) — the
    * form [[louvainTwoLevel]] needs on coarsened graphs. Input rows
    * `(start_node, end_node, w)`; parallel rows are summed, direction
    * ignored. W = Σw (each undirected edge once, self-loops once);
    * strength s_i = Σ_{j≠i} w_ij + 2·w_ii;
    * Q = Σ_c [ Win_c/W − (S_c/2W)² ] with Win_c counting self-loop
    * weight. Same numeric contract as [[modularity]]: the summed
    * numerator 4·W·Win_c − S_c² is exact DECIMAL(38,0); one double
    * division at the end. Returns `(w_total, n_communities,
    * modularity)`. */
  def modularityWeighted(wedges: DataFrame, labels: DataFrame): DataFrame = {
    val und = canonWeighted(wedges)
    val la = labels.select(col("node_id").as("a"), col("label").as("__ca"))
    val lb = labels.select(col("node_id").as("b"), col("label").as("__cb"))
    val win = und.join(la, "a").join(lb, "b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("label")).agg(sum(col("__ew")).as("__Wc"))
    val sc = strengths(und)
      .join(labels.select(col("node_id"), col("label")), "node_id")
      .groupBy("label").agg(sum(col("__d")).as("__Sc"))
    val m = und.agg(sum(col("__ew")).as("__W"))
    sc.join(win, Seq("label"), "left")
      .select(col("label"), coalesce(col("__Wc"), lit(0L)).as("__Wc"),
        col("__Sc"))
      .crossJoin(broadcast(m))
      .agg(first(col("__W")).as("w_total"),
        count(lit(1)).as("n_communities"),
        sum((col("__W") * 4).cast("decimal(19,0)")
            * col("__Wc").cast("decimal(19,0)")
          - col("__Sc").cast("decimal(19,0)")
            * col("__Sc").cast("decimal(19,0)")).as("__num"))
      .select(col("w_total"), col("n_communities"),
        round(col("__num").cast("double") /
          (col("w_total").cast("double") * col("w_total").cast("double")
            * 4.0), 6).as("modularity"))
  }

  /** Canonical weighted simple form: a ≤ b, parallel rows summed,
    * self-loops KEPT. Idempotent. */
  private def canonWeighted(wedges: DataFrame): DataFrame =
    wedges
      .select(least(col("start_node"), col("end_node")).as("a"),
        greatest(col("start_node"), col("end_node")).as("b"),
        col("w").cast("long").as("__ew"))
      .groupBy("a", "b").agg(sum(col("__ew")).as("__ew"))

  /** Weighted node strengths s_i = Σ_{j≠i} w_ij + 2·w_ii over the
    * canonical form. */
  private def strengths(und: DataFrame): DataFrame =
    und.filter(col("a") =!= col("b"))
      .select(col("a").as("node_id"), col("__ew").as("__s"))
      .unionByName(und.filter(col("a") =!= col("b"))
        .select(col("b").as("node_id"), col("__ew").as("__s")))
      .unionByName(und.filter(col("a") === col("b"))
        .select(col("a").as("node_id"), (col("__ew") * 2).as("__s")))
      .groupBy("node_id").agg(sum(col("__s")).as("__d"))

  /** One synchronous local-move round over a WEIGHTED graph with
    * self-loops — the [[refineCommunities]] gain algebra with edge
    * counts replaced by weight sums (the 1/W scalings cancel the same
    * way; self-loop weight moves with its node so it drops out of the
    * candidate comparison, entering only through the strength s_n).
    * All arithmetic stays exact: coarse weights are original-edge
    * counts, so DECIMAL(38,0) products hold to 1e12 edges.
    *
    * `parity`: when `Some(p)`, the round is GATED: only nodes with
    * `node_id % 2 == p` may move, and only to a community with a
    * SMALLER id than their current one (candidates restricted before
    * the argmax). Down-only makes the two-node synchronous swap
    * structurally impossible — a swap needs both `c_b < c_a` and
    * `c_a < c_b` — for ANY id pair, where gating on parity alone
    * still let two same-parity communities swap forever and never
    * merge; every pair merge stays reachable as higher-id → lower-id.
    * Node labels are non-increasing under gated rounds, so there is
    * no oscillation, only monotone convergence. Deterministic, hence
    * oracle-replayable. */
  def refineCommunitiesWeighted(wedges: DataFrame, labels: DataFrame,
      parity: Option[Int] = None): DataFrame =
    refineWeightedCore(canonWeighted(wedges).localCheckpoint(true),
      labels, parity)

  /** [[refineCommunitiesWeighted]] body over an ALREADY-canonical
    * weighted frame `(a, b, __ew)` (a ≤ b, parallel rows summed) —
    * round loops canonicalize once and call this per sweep instead of
    * paying the canonicalization shuffle every round. */
  private[graft] def refineWeightedCore(und: DataFrame, labels: DataFrame,
      parity: Option[Int] = None): DataFrame = {
    val noLoop = und.filter(col("a") =!= col("b"))
    val sym = noLoop.unionByName(
      noLoop.select(col("b").as("a"), col("a").as("b"), col("__ew")))
    val deg = strengths(und)
    val lbl = labels.select(col("node_id"), col("label"))
    val dc = deg.join(lbl, "node_id")
      .groupBy("label").agg(sum(col("__d")).as("__Dc"))
    val w = sym
      .join(lbl.select(col("node_id").as("b"), col("label").as("__c")), "b")
      .groupBy(col("a").as("node_id"), col("__c"))
      .agg(sum(col("__ew")).as("__w"))
    val m = und.agg((sum(col("__ew")) * 2).cast("decimal(19,0)").as("__2m"))
    val scored = w
      .join(dc.select(col("label").as("__c"), col("__Dc")), "__c")
      .join(lbl, "node_id").join(deg, "node_id")
      .crossJoin(broadcast(m))
      .withColumn("__gain2m2",
        col("__2m") * col("__w").cast("decimal(19,0)")
          - col("__d").cast("decimal(19,0)")
            * col("__Dc").cast("decimal(19,0)"))
    val own = scored.filter(col("__c") === col("label"))
      .select(col("node_id"), col("__w").as("__wOld"))
    // gated rounds admit only DOWN candidates (see scaladoc)
    val candidate =
      if (parity.isDefined) col("__c") < col("label")
      else col("__c") =!= col("label")
    val best = scored.filter(candidate)
      .groupBy(col("node_id"))
      .agg(min(struct((-col("__gain2m2")).as("ng"), col("__c").as("c"),
        col("__w").as("w"), col("__Dc").as("D"))).as("__b"))
      .select(col("node_id"), col("__b.c").as("__cNew"),
        col("__b.w").as("__wNew"), col("__b.D").as("__DNew"))
    val gate = parity match {
      case Some(p) => pmod(col("node_id"), lit(2L)) === lit(p.toLong)
      case None    => lit(true)
    }
    lbl.join(deg, Seq("node_id"), "left")
      .join(dc.select(col("label"), col("__Dc").as("__DOld")),
        Seq("label"), "left")
      .join(own, Seq("node_id"), "left")
      .join(best, Seq("node_id"), "left")
      .crossJoin(broadcast(m))
      .select(col("node_id"),
        when(gate && col("__cNew").isNotNull &&
          col("__2m") * (col("__wNew").cast("decimal(19,0)")
            - coalesce(col("__wOld"), lit(0L)).cast("decimal(19,0)"))
          > col("__d").cast("decimal(19,0)")
            * (col("__DNew").cast("decimal(19,0)")
              - col("__DOld").cast("decimal(19,0)")
              + col("__d").cast("decimal(19,0)")),
          col("__cNew")).otherwise(col("label")).as("label"))
  }

  /** Two-level Louvain (Blondel et al. 2008 phases 1+2+1): refine the
    * input labeling `level1Rounds` synchronous sweeps on the original
    * graph, coarsen communities to super-nodes via [[coarsenGraph]],
    * run `level2Rounds` GATED weighted sweeps on the community graph
    * (round k gates movers to id parity `k % 2` AND down-only moves —
    * see [[refineCommunitiesWeighted]]; community merges that no
    * single-node move can reach happen without the synchronous swap
    * pathology, for ANY label parities), then project super-node
    * labels back to original nodes. A pure function of (edges, labels,
    * rounds) — every step replayed exactly by the SQL oracle.
    *
    * 100 TB shape: level 1 is the [[refineCommunitiesRounds]] loop;
    * level 2 runs on the coarsened graph, typically orders of
    * magnitude smaller; the projection is one keyed join. */
  def louvainTwoLevel(edges: DataFrame, labels: DataFrame,
      level1Rounds: Int, level2Rounds: Int,
      localThreshold: Long = 100000L): DataFrame = {
    val und = canonUnitEdges(edges).localCheckpoint(true)
    // Broadcast-local fast path (the connectedComponents localThreshold
    // pattern): the whole two-level pipeline — phase-1 sweeps, coarsen,
    // gated phase-2 sweeps, projection — runs driver-local on the
    // collected canonical edge set. Each local step is the twin of its
    // distributed counterpart ([[refineWeightedLocal]] both phases —
    // same BigInt gain algebra, same parity/down-only gating; coarsen
    // is the same inner-label-join + (min,max) count). Pinned
    // local == distributed in RoadGraphSpec; localThreshold = 0 forces
    // the distributed pipeline.
    localRefineInputs(und, labels, localThreshold).foreach {
      case (wedges, lab0) =>
        val spark = und.sparkSession
        import spark.implicits._
        var l1 = lab0
        for (_ <- 1 to level1Rounds) l1 = refineWeightedLocal(wedges, l1, None)
        // coarsen: labeled endpoints only (the inner joins), internal
        // edges on the diagonal as self-loops — already canonical
        val coarse = wedges
          .flatMap { case (a, b, w) =>
            for (ca <- l1.get(a); cb <- l1.get(b))
              yield ((math.min(ca, cb), math.max(ca, cb)), w)
          }
          .groupBy(_._1).map { case ((ca, cb), ws) =>
            (ca, cb, ws.map(_._2).sum)
          }.toArray
        var cl: Map[Long, Long] = l1.valuesIterator.map(c => c -> c).toMap
        for (k <- 1 to level2Rounds)
          cl = refineWeightedLocal(coarse, cl, parity = Some(k % 2))
        return l1.toSeq.map { case (n, c1) => (n, cl(c1)) }
          .sortBy(_._1).toDF("node_id", "label")
    }
    val l1 = refineRoundsCore(und, labels, level1Rounds)
    // coarsenGraph output is already canonical (least/greatest keyed
    // agg) — the level-2 loop feeds the core directly, one frame;
    // und IS coarsenGraph's canonical simple edge set, so coarsening
    // reuses the materialized frame instead of re-paying the distinct
    val coarse = und
      .join(l1.select(col("node_id").as("a"), col("label").as("__ca")),
        "a")
      .join(l1.select(col("node_id").as("b"), col("label").as("__cb")),
        "b")
      .groupBy(least(col("__ca"), col("__cb")).as("a"),
        greatest(col("__ca"), col("__cb")).as("b"))
      .agg(count(lit(1)).as("__ew"))
      .localCheckpoint(true)
    var cl = l1.select(col("label").as("node_id")).distinct()
      .withColumn("label", col("node_id"))
      .localCheckpoint(true)
    for (k <- 1 to level2Rounds) {
      cl = refineWeightedCore(coarse, cl, parity = Some(k % 2))
        .localCheckpoint(true)
    }
    l1.select(col("node_id"), col("label").as("__c1"))
      .join(cl.select(col("node_id").as("__c1"), col("label").as("__c2")),
        "__c1")
      .select(col("node_id"), col("__c2").as("label"))
  }

  /** Exact per-node triangle counts + local clustering coefficient —
    * the igraph `count_triangles` / `transitivity_local` pair, the
    * standard cohesion metrics over a road/social graph.
    *
    * Algorithm (the MapReduce-era standard, Suri & Vassilvitskii's
    * degree-ordered wedge join): canonicalize to a simple undirected
    * edge set (a < b, self-loops dropped), orient every edge from its
    * (degree, id)-SMALLER endpoint to the larger, enumerate wedges as
    * the self-join of the oriented list on the source, and close each
    * wedge against the id-canonical edge set. Each triangle is counted
    * exactly once — anchored at its (degree, id)-minimum vertex.
    *
    * 100 TB shape: the orientation caps every out-neighborhood at
    * O(√m), so the wedge self-join materializes O(m^{3/2}) rows worst
    * case instead of Σdeg² (a single celebrity hub with 10⁶ neighbors
    * would otherwise wedge 10¹² pairs); all joins are keyed shuffles
    * (src; then the (y,z) pair key spreads hot closings), counts are
    * hash-aggs with map-side partials, no driver state.
    *
    * Returns (node_id, degree, triangles, clustering) with
    * clustering = 2·T_v / (deg_v·(deg_v−1)), 0 where degree < 2. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("start_node"), col("end_node")).as("a"),
        greatest(col("start_node"), col("end_node")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(explode(array(col("a"), col("b"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    val dir = und
      .join(deg.select(col("node_id").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("node_id").as("b"), col("degree").as("__db")), "b")
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
    val e1 = dir.select(col("src"), col("dst").as("__d1"))
    val e2 = dir.select(col("src"), col("dst").as("__d2"))
    val wedges = e1.join(e2, "src").filter(col("__d1") < col("__d2"))
      .select(col("src").as("x"), col("__d1").as("y"), col("__d2").as("z"))
    val closing = dir.select(least(col("src"), col("dst")).as("y"),
      greatest(col("src"), col("dst")).as("z"))
    val tris = wedges.join(closing, Seq("y", "z"))
      .select(explode(array(col("x"), col("y"), col("z"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("triangles"))
    deg.join(tris, Seq("node_id"), "left")
      .select(col("node_id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          coalesce(col("triangles"), lit(0L)) * 2.0 /
            (col("degree") * (col("degree") - lit(1L))))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** k-core numbers (igraph `coreness`) by SYNCHRONOUS H-index
    * iteration (Lü–Zhou–Zhang–Stanley, PNAS 2016): start every node at
    * its degree, then repeatedly replace each node's value with the
    * H-index of its neighbors' values (the largest h such that at
    * least h neighbors hold value ≥ h). The fixpoint is exactly the
    * node's core number — but the oracle-deterministic CONTRACT here
    * is "`rounds` synchronous H-rounds" (the labelPropagation policy):
    * a pure function of the edge set that an independent SQL engine
    * replays round-for-round, which equals coreness whenever the
    * iteration has stabilized (spec-verified against a sequential
    * peeling reference, and monotonically non-increasing so stability
    * is checkable by running one more round).
    *
    * 100 TB shape: per round ONE keyed join (edges × values) and TWO
    * hash-aggs — WINDOW-FREE. The H-index needs only the multiset of
    * neighbor values, so the round first histograms `(node, value)`
    * pairs (map-side partial aggregation absorbs a celebrity hub: a
    * 10⁶-degree node whose neighbors hold v distinct values arrives at
    * the reducer as ≤v·partitions partial rows, never 10⁶ rows into
    * one sorted window partition), then folds each node's (value,
    * count) histogram — sorted by value DESCENDING, cumulating counts
    * c — as H = max over prefixes of min(value, c) (the classic
    * citation-curve intersection). Histogram width is bounded by the
    * node's distinct neighbor values (≤ current max value, which only
    * shrinks round over round — values are H-indices after round 1),
    * so the per-node fold is tiny. localCheckpoint per round keeps
    * plans flat. */
  def coreness(edges: DataFrame, rounds: Int,
      localThreshold: Long = 100000L): DataFrame = {
    val sym = edges
      .select(col("start_node").as("a"), col("end_node").as("b"))
      .unionByName(
        edges.select(col("end_node").as("a"), col("start_node").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    // Broadcast-local fast path (the connectedComponents localThreshold
    // pattern): `rounds` x (join + 2 hash-agg + checkpoint) driver jobs
    // collapse to an in-memory H-index sweep over the collected
    // symmetric edge set. The local H-index over the sorted-descending
    // neighbor values equals the distributed histogram fold exactly
    // (same max-over-prefixes of min(value, count) — integer algebra,
    // no floats); pinned local == distributed in RoadGraphSpec.
    // localThreshold = 0 forces the distributed loop (the Window-free
    // plan audit and scale witnesses run that form).
    collectIfSmallLongs(sym, localThreshold).foreach { rows =>
      val spark = sym.sparkSession
      import spark.implicits._
      return corenessLocal(rows.map(r => (r.getLong(0), r.getLong(1))),
        rounds).toDF("node_id", "coreness")
    }
    var vals = sym.groupBy(col("a")).agg(count(lit(1)).as("value"))
      .select(col("a").as("node_id"), col("value"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      vals = corenessRound(sym, vals).localCheckpoint(true)
    }
    vals.select(col("node_id"), col("value").as("coreness"))
  }

  /** Broadcast-local twin of the [[coreness]] H-index loop over a
    * collected SYMMETRIC distinct edge set: values start at degree;
    * each synchronous round replaces a node's value with the H-index
    * of its neighbors' values — max over the descending-sorted prefix
    * of min(value_i, i+1), exactly the expanded multiset the
    * distributed histogram fold evaluates. Returns (node_id, coreness)
    * sorted by node. */
  private def corenessLocal(sym: Array[(Long, Long)],
      rounds: Int): Seq[(Long, Long)] = {
    val adj = sym.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
    var vals: scala.collection.Map[Long, Long] =
      adj.map { case (a, nbrs) => a -> nbrs.length.toLong }
    for (_ <- 1 to rounds) {
      vals = adj.map { case (a, nbrs) =>
        val sorted = nbrs.map(vals).sortBy(v => -v)
        var h = 0L
        var i = 0
        while (i < sorted.length) {
          val m = math.min(sorted(i), i + 1L)
          if (m > h) h = m
          i += 1
        }
        a -> h
      }
    }
    vals.toSeq.sortBy(_._1)
  }

  /** ONE H-index round of [[coreness]], built lazily (no checkpoint) so
    * the plan can be audited: PlanAuditSpec asserts it contains no
    * Window node — the whole point of the histogram-fold rewrite. */
  private[graft] def corenessRound(sym: DataFrame, vals: DataFrame): DataFrame = {
    val nb = sym.join(vals, sym("b") === vals("node_id"))
      .select(sym("a").as("a"), col("value"))
    val hist = nb.groupBy(col("a"), col("value"))
      .agg(count(lit(1)).as("__c"))
    hist.groupBy(col("a"))
      .agg(sort_array(collect_list(struct(col("value"), col("__c"))),
        asc = false).as("__h"))
      .select(col("a").as("node_id"),
        hIndexFromHistogram(col("__h")).as("value"))
  }

  /** H-index from a (value, count) histogram sorted by value DESC:
    * fold cumulating the count `c`; H = max over prefixes of
    * min(value, c). Equals the H-index of the expanded multiset (at
    * threshold t = valueᵢ the number of elements ≥ t is exactly the
    * cumulated count), evaluated on distinct values only — the
    * window-free form of the neighbor ranking. */
  private[graft] def hIndexFromHistogram(hist: Column): Column =
    aggregate(hist,
      struct(lit(0L).as("c"), lit(0L).as("h")),
      (st, x) => {
        val c = st.getField("c") + x.getField("__c")
        struct(c.as("c"),
          greatest(st.getField("h"), least(x.getField("value"), c)).as("h"))
      },
      st => st.getField("h"))

  /** Degree assortativity (igraph `assortativity_degree`, Newman 2002):
    * the Pearson correlation of (deg(u), deg(v)) over the SYMMETRIZED
    * edge list (each undirected edge contributes both orientations, so
    * the x/y marginals coincide). The moment SUMS are exact and
    * overflow-safe at the 100 TB shape: per-row products are formed in
    * DECIMAL(19,0)×DECIMAL(19,0) → DECIMAL(38,0) (degrees to ~1e19
    * cannot wrap the way a silent non-ANSI long product would) and
    * summed in DECIMAL(38,0) (exact to 1e38 — room for 1e12 edges of
    * 1e9-degree hubs, and Spark raises on overflow instead of
    * wrapping). Only the FINAL `n·Σxy − (Σx)²` products and the ratio
    * run in double — order-free (the sums are exact, so no partial-sum
    * nondeterminism) and reproduced bit-for-bit by an independent SQL
    * engine applying the same casts. Precision bound: each double
    * product carries ≤2 ulp, so the absolute error of the correlation
    * is ~1e-15·(n·Σxy)/denominator — only coefficients within that of
    * 0 lose digits. Regular graphs (zero degree variance) return 0.0
    * by convention (igraph returns NaN; NaN does not hash portably).
    *
    * 100 TB shape: one degree hash-agg, two keyed joins to attach
    * endpoint degrees, one scalar aggregate. No window, no collect. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("start_node"), col("end_node")).as("a"),
        greatest(col("start_node"), col("end_node")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val sym = und.unionByName(
      und.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("node_id"))
      .agg(count(lit(1)).as("degree"))
    val pairs = sym
      .join(deg.select(col("node_id").as("a"), col("degree").as("__da")), "a")
      .join(deg.select(col("node_id").as("b"), col("degree").as("__db")), "b")
    val da = col("__da").cast("decimal(19,0)")
    val db = col("__db").cast("decimal(19,0)")
    pairs.agg(count(lit(1)).as("__n"),
        sum(da).as("__sx"),
        sum(da * da).as("__sxx"),
        sum(da * db).as("__sxy"),
        min(col("__da")).as("__dmin"),
        max(col("__da")).as("__dmax"))
      .select(col("__n").as("n_pairs"),
        // Zero variance detected EXACTLY (all endpoint degrees equal), not
        // via the double-rounded denominator: on a large regular graph with
        // n·Σxx > 2^53 the double test can read nonzero and, since Σxy=Σxx
        // there, return 1.0 instead of the documented 0.0 convention.
        when(col("__dmin") === col("__dmax"), 0.0)
          .otherwise(
            (col("__n").cast("double") * col("__sxy").cast("double")
              - col("__sx").cast("double") * col("__sx").cast("double")) /
            (col("__n").cast("double") * col("__sxx").cast("double")
              - col("__sx").cast("double") * col("__sx").cast("double")))
          .as("assortativity"))
  }

  /** Global transitivity (igraph `transitivity_undirected`): one row
    * `(n_triangles, wedges_x2, transitivity)` where transitivity =
    * 3·triangles / wedges = 6·T / Σ deg·(deg−1). Σ per-node triangle
    * incidences is exactly 3T, so this is one extra scalar aggregate
    * over [[triangleCounts]] — all arithmetic on exact longs until the
    * final ratio. */
  def globalTransitivity(edges: DataFrame): DataFrame =
    triangleCounts(edges)
      .agg(sum(col("triangles")).as("__ti"),
        sum(col("degree") * (col("degree") - lit(1L))).as("__w2"))
      .select((col("__ti") / 3).cast("long").as("n_triangles"),
        col("__w2").cast("long").as("wedges_x2"),
        when(col("__w2") > 0, col("__ti") * 2.0 / col("__w2"))
          .otherwise(lit(0.0)).as("transitivity"))

  def pageRank(edges: DataFrame, iters: Int = 20,
      damping: Double = 0.85, localThreshold: Long = 100000L): DataFrame = {
    val e = edges.select(col("start_node").as("src"),
      col("end_node").as("dst")).localCheckpoint(true)
    // Broadcast-local fast path (same adaptive decision as
    // [[multiSourceShortestPaths]]): a graph that fits on the driver
    // pays `iters` join+agg job launches for nothing. The local loop is
    // the identical synchronous update (teleport + damping * sum of
    // inbound rank/outdeg, dangling mass leaking), so ranks agree with
    // the distributed path to float addition order — which the
    // consumer-side round(…, 8) absorbs. localThreshold = 0 forces the
    // distributed loop.
    if (localThreshold > 0 &&
        e.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ids = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val idx = ids.zipWithIndex.toMap
      val n = ids.length
      val deg = new Array[Long](n)
      es.foreach { case (s, _) => deg(idx(s)) += 1 }
      val teleport = (1.0 - damping) / n
      var rank = Array.fill(n)(1.0 / n)
      var it = 0
      while (it < iters) {
        val next = Array.fill(n)(teleport)
        es.foreach { case (s, d) =>
          next(idx(d)) += damping * rank(idx(s)) / deg(idx(s)) }
        rank = next
        it += 1
      }
      return ids.toIndexedSeq.map(id => (id, rank(idx(id))))
        .toDF("node_id", "rank")
    }
    val nodes = e.select(col("src").as("node_id"))
      .unionByName(e.select(col("dst").as("node_id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    val teleport = (1.0 - damping) / n
    // out-degree rides the edge relation from the start: the per-round
    // join is rank-only
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("__deg")), "src")
      .localCheckpoint(true)
    var rank = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val inbound = ew.join(rank, ew("src") === rank("node_id"))
        .select(col("dst"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__s"))
      rank = nodes.join(inbound, nodes("node_id") === inbound("dst"), "left_outer")
        .select(col("node_id"),
          (lit(teleport) + lit(damping) * coalesce(col("__s"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
      i += 1
    }
    rank
  }

  /** Personalized PageRank (igraph `personalized_pagerank`, the
    * random-walk-with-restart relevance score): [[pageRank]] with the
    * teleport mass concentrated on `seeds` — restart probability
    * (1−d)/|S| on each seed, 0 elsewhere; rank starts 1/|S| on seeds.
    * Same loop economics and broadcast-local fast path as
    * [[pageRank]]; dangling mass leaks identically, the oracle unrolls
    * the identical chain. */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
      iters: Int = 20, damping: Double = 0.85,
      localThreshold: Long = 100000L): DataFrame = {
    // dedup seeds and make them part of the node universe: a repeated
    // seed must not halve its restart share, and a seed with no edges
    // must still hold its teleport mass (igraph keeps the vertex)
    val seedIds = seeds.distinct
    require(seedIds.nonEmpty, "personalizedPageRank: seeds must be non-empty")
    val e = edges.select(col("start_node").as("src"),
      col("end_node").as("dst")).localCheckpoint(true)
    val seedSet = seedIds.toSet
    val tp = (1.0 - damping) / seedIds.size
    if (localThreshold > 0 &&
        e.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ids = (es.map(_._1) ++ es.map(_._2) ++ seedIds).distinct.sorted
      val idx = ids.zipWithIndex.toMap
      val n = ids.length
      val deg = new Array[Long](n)
      es.foreach { case (s, _) => deg(idx(s)) += 1 }
      var rank = ids.map(id =>
        if (seedSet(id)) 1.0 / seedIds.size else 0.0).toArray
      var it = 0
      while (it < iters) {
        val next = ids.map(id => if (seedSet(id)) tp else 0.0).toArray
        es.foreach { case (s, d) =>
          next(idx(d)) += damping * rank(idx(s)) / deg(idx(s)) }
        rank = next
        it += 1
      }
      return ids.toIndexedSeq.map(id => (id, rank(idx(id))))
        .toDF("node_id", "rank")
    }
    val spark = edges.sparkSession
    import spark.implicits._
    val nodes = e.select(col("src").as("node_id"))
      .unionByName(e.select(col("dst").as("node_id")))
      .unionByName(seedIds.toDF("node_id"))
      .distinct()
      .withColumn("__tp",
        when(col("node_id").isin(seedIds: _*), lit(tp)).otherwise(lit(0.0)))
      .localCheckpoint(true)
    val ew = e.join(e.groupBy("src").agg(count(lit(1)).as("__deg")), "src")
      .localCheckpoint(true)
    var rank = nodes.select(col("node_id"),
        when(col("node_id").isin(seedIds: _*), lit(1.0 / seedIds.size))
          .otherwise(lit(0.0)).as("rank"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val inbound = ew.join(rank, ew("src") === rank("node_id"))
        .select(col("dst"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__s"))
      rank = nodes
        .join(inbound, nodes("node_id") === inbound("dst"), "left_outer")
        .select(col("node_id"),
          (col("__tp") + lit(damping) * coalesce(col("__s"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
      i += 1
    }
    rank
  }

  /** Many-to-many cost matrix (`pgr_dijkstraCost` / igraph
    * `distances(v, to)`): one SSSP per source over ONE materialized
    * edge relation, filtered to the target set — pgRouting-shaped rows
    * `(start_vid, end_vid, agg_cost)`, unreachable pairs absent and —
    * pgr_dijkstraCost semantics — no self rows. Exact integers on
    * integer weights; the VRP/logistics input surface. */
  def costMatrix(edges: DataFrame, sources: Seq[Long],
      targets: Seq[Long], maxIter: Int = 100,
      localThreshold: Long = 100000L): DataFrame = {
    require(sources.nonEmpty, "costMatrix: sources must be non-empty")
    val eChk = materializeEdges(edges)
    sources.map { s0 =>
      multiSourceShortestPaths(eChk, Seq(s0), maxIter, localThreshold)._1
        .filter(col("node_id").isin(targets: _*) &&
          col("node_id") =!= s0)
        .select(lit(s0).as("start_vid"), col("node_id").as("end_vid"),
          col("dist").as("agg_cost"))
    }.reduce(_.unionByName(_))
  }

  /** Sampled closeness centrality: per node, the SUM of network
    * distances from each of `sources` that reaches it, plus the
    * reaching-source count — the exact integer pieces of avg distance
    * (emit the division at presentation time; sums and counts stay
    * hash-exact). Exact closeness is all-pairs SSSP — O(V) relaxations,
    * off the table at road-network scale — so the standard estimator
    * runs k sampled sources; this is that, as k driver-orchestrated
    * SSSP jobs over ONE materialized edge relation (each run takes the
    * broadcast-local or distributed path per its own size check). This
    * is the space-syntax accessibility surface the reference's exports
    * feed (osm-pg-etl.md's igraph hand-off). */
  def closenessFromSources(edges: DataFrame, sources: Seq[Long],
      maxIter: Int = 100, localThreshold: Long = 100000L): DataFrame = {
    require(sources.nonEmpty, "closenessFromSources: sources must be non-empty")
    val eChk = materializeEdges(edges)
    // Broadcast-local fast path: ONE collect of the edge relation, k
    // driver-side Dijkstras, one result relation — instead of k
    // independent (probe + collect + createDataFrame) round-trips plus
    // a k-way union-aggregate. Integer-centimeter weights stay exact in
    // doubles (< 2^53), so sums match the distributed path bit-for-bit.
    if (localThreshold > 0 &&
        eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val isLong = eChk.schema("w").dataType ==
        org.apache.spark.sql.types.LongType
      val es = eChk.select(col("start_node"), col("end_node"),
          col("w").cast("double")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val sumD = scala.collection.mutable.Map[Long, Double]()
      val cnt = scala.collection.mutable.Map[Long, Long]()
      sources.foreach { s0 =>
        val dist = scala.collection.mutable.Map[Long, Double]()
        val pq = scala.collection.mutable.PriorityQueue
          .empty[(Double, Long)](Ordering.by[(Double, Long), Double](_._1).reverse)
        dist(s0) = 0.0; pq.enqueue((0.0, s0))
        while (pq.nonEmpty) {
          val (d, u) = pq.dequeue()
          if (d <= dist(u)) {
            es.getOrElse(u, Array.empty[(Long, Double)]).foreach { case (v, w) =>
              val nd = d + w
              if (!dist.contains(v) || nd < dist(v)) {
                dist(v) = nd; pq.enqueue((nd, v))
              }
            }
          }
        }
        dist.foreach { case (nd, d) =>
          sumD(nd) = sumD.getOrElse(nd, 0.0) + d
          cnt(nd) = cnt.getOrElse(nd, 0L) + 1L
        }
      }
      val rows = sumD.keys.toSeq.sorted
      return if (isLong)
        rows.map(nd => (nd, sumD(nd).toLong, cnt(nd)))
          .toDF("node_id", "sum_dist", "n_from")
      else rows.map(nd => (nd, sumD(nd), cnt(nd)))
        .toDF("node_id", "sum_dist", "n_from")
    }
    sources.map { s0 =>
      multiSourceShortestPaths(eChk, Seq(s0), maxIter, localThreshold)._1
    }.reduce(_.unionByName(_))
      .groupBy("node_id")
      .agg(sum(col("dist")).as("sum_dist"), count(lit(1)).as("n_from"))
  }

  /** Sampled HARMONIC centrality (igraph `harmonic_centrality`, the
    * disconnected-robust sibling of closeness: unreachable pairs
    * contribute 0 instead of poisoning the mean): per node,
    * `inv_sum` = Σ_s 1/d(s, node) over the sources that reach it at
    * d > 0, plus the reaching count. Same sampled-sources estimator
    * and loop economics as [[closenessFromSources]] — k SSSP jobs over
    * one materialized edge relation — only the final fold differs.
    * The 1/d terms are double; consumers round for cross-engine
    * comparison (the pageRank contract). */
  def harmonicFromSources(edges: DataFrame, sources: Seq[Long],
      maxIter: Int = 100, localThreshold: Long = 100000L): DataFrame = {
    require(sources.nonEmpty, "harmonicFromSources: sources must be non-empty")
    val eChk = materializeEdges(edges)
    sources.map { s0 =>
      multiSourceShortestPaths(eChk, Seq(s0), maxIter, localThreshold)._1
    }.reduce(_.unionByName(_))
      .filter(col("dist") > 0)
      .groupBy("node_id")
      .agg(sum(lit(1.0) / col("dist")).as("inv_sum"),
        count(lit(1)).as("n_from"))
  }

  /** Sampled eccentricity (igraph `eccentricity` on chosen vertices):
    * for each SOURCE, the max shortest-path distance to any node it
    * reaches, plus the reached count. max over the sampled sources is
    * the classic diameter lower bound, min an upper bound on radius
    * (exact when sources = V — all-pairs, micro-scale only; sample at
    * road scale, or take [[pseudoDiameter]]'s two-sweep bound).
    * Exact integer output on integer weights. */
  def eccentricityFromSources(edges: DataFrame, sources: Seq[Long],
      maxIter: Int = 100, localThreshold: Long = 100000L): DataFrame = {
    require(sources.nonEmpty, "eccentricityFromSources: sources must be non-empty")
    val spark = edges.sparkSession
    import spark.implicits._
    val eChk = materializeEdges(edges)
    sources.map { s0 =>
      multiSourceShortestPaths(eChk, Seq(s0), maxIter, localThreshold)._1
        .agg(max(col("dist")).as("ecc"), count(lit(1)).as("reached"))
        .select(lit(s0).as("node_id"), col("ecc"), col("reached"))
    }.reduce(_.unionByName(_))
  }

  /** Pseudo-diameter by the classical DOUBLE SWEEP (igraph
    * `pseudo_diameter`): BFS from `seed` to its farthest node u (hop
    * metric, ties to the smallest id), BFS again from u to its
    * farthest v — d(u, v) is a high-quality diameter lower bound at
    * the cost of exactly two SSSP runs (exact all-pairs eccentricity
    * is O(V·E), off the table at road scale). Returns one row
    * `(from_node, to_node, pseudo_diameter)`; deterministic, so an
    * independent BFS replay reproduces it. */
  def pseudoDiameter(edges: DataFrame, seed: Long,
      maxIter: Int = 100, localThreshold: Long = 100000L): DataFrame = {
    val hop = edges.select(col("start_node"), col("end_node"),
      lit(1L).as("w"))
    def farthest(s: Long): DataFrame =
      multiSourceShortestPaths(hop, Seq(s), maxIter, localThreshold)._1
        .agg(min(struct((-col("dist")).as("nd"),
          col("node_id").as("n"))).as("__b"))
        .select(col("__b.n").as("node_id"), (-col("__b.nd")).as("dist"))
    val u = farthest(seed).head()
    val v = farthest(u.getLong(0)).head()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((u.getLong(0), v.getLong(0), v.getLong(1)))
      .toDF("from_node", "to_node", "pseudo_diameter")
  }

  /** HITS hubs & authorities (Kleinberg 1999; igraph `hub_score` /
    * `authority_score`) over the directed graph, `iters` synchronous
    * rounds: a_k(v) = Σ_{u→v} h_{k−1}(u), h_k(u) = Σ_{u→v} a_k(v),
    * each vector SUM-normalized every round (deterministic scaling —
    * igraph rescales by max at the end; sum-norm is replayed exactly
    * by the oracle chain, consumers round like [[pageRank]]'s).
    *
    * 100 TB shape: identical loop economics to [[pageRank]] — two
    * keyed join+agg passes per round over the edge relation, scalar
    * norms ride broadcast cross joins, localCheckpoint keeps plans
    * flat; broadcast-local fast path below the same threshold. */
  def hits(edges: DataFrame, iters: Int = 10,
      localThreshold: Long = 100000L): DataFrame = {
    val e = edges.select(col("start_node").as("src"),
      col("end_node").as("dst")).localCheckpoint(true)
    if (localThreshold > 0 &&
        e.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ids = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val idx = ids.zipWithIndex.toMap
      val n = ids.length
      var hub = Array.fill(n)(1.0 / n)
      var auth = Array.fill(n)(0.0)
      var it = 0
      while (it < iters) {
        val a = new Array[Double](n)
        es.foreach { case (u, v) => a(idx(v)) += hub(idx(u)) }
        val as = a.sum
        auth = if (as > 0) a.map(_ / as) else a
        val h = new Array[Double](n)
        es.foreach { case (u, v) => h(idx(u)) += auth(idx(v)) }
        val hs = h.sum
        hub = if (hs > 0) h.map(_ / hs) else h
        it += 1
      }
      return ids.toIndexedSeq
        .map(id => (id, hub(idx(id)), auth(idx(id))))
        .toDF("node_id", "hub", "authority")
    }
    val nodes = e.select(col("src").as("node_id"))
      .unionByName(e.select(col("dst").as("node_id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    var hub = nodes.withColumn("hub", lit(1.0 / n)).localCheckpoint(true)
    var auth = nodes.withColumn("authority", lit(0.0))
    var i = 0
    while (i < iters) {
      val aRaw = e.join(hub, e("src") === hub("node_id"))
        .groupBy(col("dst").as("node_id")).agg(sum(col("hub")).as("__a"))
      val aN = aRaw.agg(sum(col("__a")).as("__s"))
      auth = nodes.join(aRaw, Seq("node_id"), "left_outer")
        .crossJoin(broadcast(aN))
        .select(col("node_id"),
          when(col("__s") > 0, coalesce(col("__a"), lit(0.0)) / col("__s"))
            .otherwise(lit(0.0)).as("authority"))
        .localCheckpoint(true)
      val hRaw = e.join(auth, e("dst") === auth("node_id"))
        .groupBy(col("src").as("node_id"))
        .agg(sum(col("authority")).as("__h"))
      val hN = hRaw.agg(sum(col("__h")).as("__s"))
      hub = nodes.join(hRaw, Seq("node_id"), "left_outer")
        .crossJoin(broadcast(hN))
        .select(col("node_id"),
          when(col("__s") > 0, coalesce(col("__h"), lit(0.0)) / col("__s"))
            .otherwise(lit(0.0)).as("hub"))
        .localCheckpoint(true)
      i += 1
    }
    hub.join(auth, "node_id")
  }

  /** Sampled betweenness centrality (Brandes 2001) from `sources` —
    * the other half of the space-syntax centrality surface the
    * reference's igraph hand-off computes (closeness is
    * [[closenessFromSources]]). For each sampled source s, every node
    * v accumulates Σ_{t≠v≠s} σ_st(v)/σ_st — the pair-dependency of
    * Brandes' algorithm restricted to sampled sources (the standard
    * estimator; all-sources exact betweenness is all-pairs SSSP, off
    * the table at road scale).
    *
    * Broadcast-local fast path: textbook Dijkstra-Brandes per source.
    * Distributed path (localThreshold = 0 forces it): per source,
    * (1) the existing distributed SSSP settles distances; (2) the
    * shortest-path DAG is one join (`dist(u) + w = dist(v)` — exact on
    * integer weights); (3) path counts σ flow FORWARD over the DAG by
    * monotone fixpoint (one join+agg per round, rounds = shortest-path
    * hop depth, the same bound ScaleSmoke pins for SSSP); (4)
    * dependencies δ flow BACKWARD the same way. Per-source cost is
    * therefore ~3 SSSP-equivalents; sources is the sample budget.
    * Returns every graph node with its (float) centrality — consumers
    * round for cross-engine comparison. */
  def betweennessFromSources(edges: DataFrame, sources: Seq[Long],
      maxIter: Int = 100, localThreshold: Long = 100000L,
      waveSize: Int = 32): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val eChk = materializeEdges(edges)
    // Brandes requires strictly positive weights: a zero-weight edge
    // (e.g. a degenerate sub-centimeter edge rounded to 0) breaks the
    // local tie guard AND makes the dist(u)+w=dist(v) shortest-path DAG
    // cyclic, so the distributed sigma fixpoint diverges (ADVICE r12).
    // Fail fast with a clear message instead.
    require(eChk.filter(col("w") <= 0).limit(1).count() == 0L,
      "betweennessFromSources: edge weights must be > 0 " +
        "(clamp rounded lengths to a positive minimum before calling)")
    val allNodes = eChk.select(col("start_node").as("node_id"))
      .unionByName(eChk.select(col("end_node").as("node_id")))
      .distinct().localCheckpoint(true)
    if (localThreshold > 0 &&
        eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val es = eChk.select(col("start_node"), col("end_node"),
          col("w").cast("double")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val bc = scala.collection.mutable.Map[Long, Double]()
      sources.foreach { s =>
        val dist = scala.collection.mutable.Map[Long, Double]()
        val sigma = scala.collection.mutable.Map[Long, Double]()
        val preds = scala.collection.mutable.Map[Long,
          scala.collection.mutable.ArrayBuffer[Long]]()
        val settled = scala.collection.mutable.ArrayBuffer[Long]()
        val done = scala.collection.mutable.Set[Long]()
        val pq = scala.collection.mutable.PriorityQueue
          .empty[(Double, Long)](Ordering.by[(Double, Long), Double](_._1).reverse)
        dist(s) = 0.0; sigma(s) = 1.0; pq.enqueue((0.0, s))
        while (pq.nonEmpty) {
          val (d, u) = pq.dequeue()
          if (d <= dist(u) && !done.contains(u)) {
            done += u; settled += u
            es.getOrElse(u, Array.empty[(Long, Double)]).foreach { case (v, w) =>
              val nd = d + w
              if (!dist.contains(v) || nd < dist(v)) {
                dist(v) = nd; sigma(v) = sigma(u)
                preds(v) = scala.collection.mutable.ArrayBuffer(u)
                pq.enqueue((nd, v))
              } else if (nd == dist(v) && !done.contains(v)) {
                sigma(v) += sigma(u); preds(v) += u
              }
            }
          }
        }
        val delta = scala.collection.mutable.Map[Long, Double]()
        settled.reverseIterator.foreach { wn =>
          preds.getOrElse(wn, Nil).foreach { u =>
            delta(u) = delta.getOrElse(u, 0.0) +
              sigma(u) / sigma(wn) * (1.0 + delta.getOrElse(wn, 0.0))
          }
          if (wn != s)
            bc(wn) = bc.getOrElse(wn, 0.0) + delta.getOrElse(wn, 0.0)
        }
      }
      val ids = allNodes.collect().map(_.getLong(0)).sorted
      return ids.toIndexedSeq.map(id => (id, bc.getOrElse(id, 0.0)))
        .toDF("node_id", "betweenness")
    }
    // distributed: sources advance in WAVES of source-keyed fixpoints
    // (state rows are (src, node)) — each round is ONE join+agg no
    // matter how many sources are in flight, so a wave's job count is
    // the graph's hop depth, not depth × |sources| (the previous serial
    // per-source loop paid b× the rounds; VERDICT r12 item 8). Wave
    // state is waveSize × |reached| rows; `waveSize` bounds memory for
    // igraph-style whole-network sweeps with hundreds of seeds.
    val eb = eChk.select(col("start_node").as("src_n"),
      col("end_node").as("dst_n"), col("w"))
    val wType = eChk.schema("w").dataType
    val waveDeltas = sources.grouped(waveSize).map { wave =>
      // batched SSSP: per-(src, node) distances, the frontier-relaxation
      // loop of multiSourceShortestPaths widened with the source key
      var dist = wave.toDF("src")
        .select(col("src"), col("src").as("node_id"),
          lit(0L).cast(wType).as("dist"))
        .localCheckpoint(true)
      var frontier = dist
      var frontierSize = wave.size.toLong
      var i = 0
      while (frontierSize > 0 && i < maxIter) {
        val cand = eb.join(frontier, eb("src_n") === frontier("node_id"))
          .select(col("src"), col("dst_n").as("node_id"),
            (col("dist") + col("w")).as("dist"))
          .groupBy("src", "node_id").agg(min(col("dist")).as("dist"))
        val improved = cand
          .join(dist.withColumnRenamed("dist", "__old"),
            Seq("src", "node_id"), "left_outer")
          .filter(col("__old").isNull || col("dist") < col("__old"))
          .select(col("src"), col("node_id"), col("dist"))
          .localCheckpoint(true)
        frontierSize = improved.count()
        if (frontierSize > 0) {
          dist = dist.unionByName(improved)
            .groupBy("src", "node_id").agg(min(col("dist")).as("dist"))
            .localCheckpoint(true)
          frontier = improved
        }
        i += 1
      }
      // per-source shortest-path DAG: dist(u) + w = dist(v) edges
      val du = dist.select(col("src"), col("node_id").as("u"),
        col("dist").as("__du"))
      val dv = dist.select(col("src").as("__sv"), col("node_id").as("v"),
        col("dist").as("__dv"))
      val sp = eb.join(du, eb("src_n") === du("u"))
        .join(dv, col("__sv") === du("src") && eb("dst_n") === dv("v"))
        .filter(col("__du") + col("w") === col("__dv"))
        .select(col("src"), col("u"), col("v"))
        .localCheckpoint(true)
      // forward σ keyed (src, node): each key's value is monotone
      // toward its fixpoint, so the TOTAL sum is monotone and a stable
      // global sum is convergence for every source in the wave at once
      var sigma = dist.select(col("src"), col("node_id"),
          when(col("node_id") === col("src"), 1.0).otherwise(0.0)
            .as("sigma"))
        .localCheckpoint(true)
      var prevSum = Double.NaN
      i = 0
      var stable = false
      while (!stable && i < maxIter) {
        val sg = sigma.select(col("src"), col("node_id").as("u"),
          col("sigma"))
        val inflow = sp.join(sg, Seq("src", "u"))
          .groupBy(col("src"), col("v")).agg(sum(col("sigma")).as("__in"))
          .withColumnRenamed("v", "node_id")
        sigma = dist.select(col("src"), col("node_id"))
          .join(inflow, Seq("src", "node_id"), "left_outer")
          .select(col("src"), col("node_id"),
            when(col("node_id") === col("src"), 1.0)
              .otherwise(coalesce(col("__in"), lit(0.0))).as("sigma"))
          .localCheckpoint(true)
        val sSum = sigma.agg(sum(col("sigma"))).head().getDouble(0)
        stable = sSum == prevSum
        prevSum = sSum
        i += 1
      }
      // backward δ: same monotone-fixpoint argument on the reversed DAG
      var delta = dist.select(col("src"), col("node_id"),
          lit(0.0).as("delta"))
        .localCheckpoint(true)
      prevSum = Double.NaN
      i = 0
      stable = false
      while (!stable && i < maxIter) {
        val su = sigma.select(col("src"), col("node_id").as("u"),
          col("sigma").as("__sigu"))
        val sv = sigma.select(col("src"), col("node_id").as("v"),
          col("sigma").as("__sigv"))
        val dl = delta.select(col("src"), col("node_id").as("v"),
          col("delta").as("__dl"))
        val terms = sp.join(su, Seq("src", "u")).join(sv, Seq("src", "v"))
          .join(dl, Seq("src", "v"))
          .select(col("src"), col("u").as("node_id"),
            (col("__sigu") / col("__sigv") * (lit(1.0) + col("__dl")))
              .as("__t"))
          .groupBy("src", "node_id").agg(sum(col("__t")).as("__d"))
        delta = dist.select(col("src"), col("node_id"))
          .join(terms, Seq("src", "node_id"), "left_outer")
          .select(col("src"), col("node_id"),
            coalesce(col("__d"), lit(0.0)).as("delta"))
          .localCheckpoint(true)
        val dSum = delta.agg(sum(col("delta"))).head().getDouble(0)
        stable = dSum == prevSum
        prevSum = dSum
        i += 1
      }
      delta.filter(col("node_id") =!= col("src"))
        .select(col("node_id"), col("delta"))
    }.toSeq
    val acc = waveDeltas.reduce(_.unionByName(_))
      .groupBy("node_id").agg(sum(col("delta")).as("__bc"))
    allNodes.join(acc, Seq("node_id"), "left_outer")
      .select(col("node_id"),
        coalesce(col("__bc"), lit(0.0)).as("betweenness"))
  }

  /** A* shortest path (`pgr_aStar` analog) with the great-circle
    * heuristic. Result contract is IDENTICAL to [[shortestPathTo]]:
    * edge weights are haversine-summed centimeter lengths, so the
    * straight-line great-circle distance to the target never
    * overestimates (admissible) and obeys the spherical triangle
    * inequality (consistent) — A* returns THE shortest path while
    * settling fewer nodes. The heuristic is a visit-order acceleration
    * for the collected regime; above `localThreshold` the search
    * delegates to [[shortestPathTo]]'s distributed frontier relaxation
    * (whose improved-only frontier plays the same pruning role), so
    * results are identical at any scale.
    *
    * `coords` is `(node_id, lon, lat)` in degrees — semi-join-pruned to
    * the graph's node universe before collection, so passing the full
    * planet node table costs one broadcast join, not a planet collect.
    * Weights must be centimeters for unit agreement with the heuristic.
    * Equal-cost ties keep the smaller predecessor (same contract as
    * [[shortestPathTo]]).
    *
    * Returns (path, total distance, settled-node count); the count is
    * -1 on the distributed delegation (no meaningful single count). */
  def aStarPathTo(edges: DataFrame, coords: DataFrame, source: Long,
      target: Long, maxIter: Int = 100,
      localThreshold: Long = 100000L): Option[(Seq[Long], Double, Long)] = {
    val eChk = materializeEdges(edges)
    val isLocal = localThreshold > 0 &&
      eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
        .count() <= localThreshold
    if (!isLocal)
      return aStarDistributed(eChk, coords, source, target, maxIter)
    val nodes = eChk.select(col("start_node").as("node_id"))
      .unionByName(eChk.select(col("end_node").as("node_id"))).distinct()
    val xy = coords.select(col("node_id"), col("lon"), col("lat"))
      .join(nodes, Seq("node_id"), "left_semi")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val adj = eChk.select(col("start_node"), col("end_node"),
        col("w").cast("double")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    if (!xy.contains(target)) return None
    val (tLon, tLat) = xy(target)
    // rounding slack: stored integer-cm weights can round DOWN up to
    // 0.5 cm per edge, so the exact great-circle heuristic could
    // overestimate the rounded remaining cost by 0.5·hops — deflate by
    // 0.5·(node count) (a simple path's hop bound) to restore strict
    // admissibility; negligible vs meter-scale edges
    val nNodes = (adj.keysIterator ++
      adj.valuesIterator.flatMap(_.iterator.map(_._1))).toSet.size
    val slackCm = 0.5 * nNodes
    def hCm(v: Long): Double = xy.get(v).map { case (lon, lat) =>
      val dLat = math.toRadians(tLat - lat)
      val dLon = math.toRadians(tLon - lon)
      val a = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(lat)) * math.cos(math.toRadians(tLat)) *
          math.pow(math.sin(dLon / 2), 2)
      math.max(0.0,
        2.0 * 6371008.8 * math.asin(math.sqrt(a)) * 100.0 - slackCm)
    }.getOrElse(0.0) // unknown coords: h=0 stays admissible
    val dist = scala.collection.mutable.Map(source -> 0.0)
    val pred = scala.collection.mutable.Map(source -> source)
    val closed = scala.collection.mutable.Set[Long]()
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Double, Long)](Ordering.by[(Double, Long), Double](_._1).reverse)
    pq.enqueue((hCm(source), source))
    var settled = 0L
    var done = false
    while (pq.nonEmpty && !done) {
      val (_, u) = pq.dequeue()
      if (!closed(u)) {
        closed += u
        settled += 1
        if (u == target) done = true
        else adj.getOrElse(u, Array.empty[(Long, Double)]).foreach {
          case (v, w) =>
            val nd = dist(u) + w
            if (!dist.contains(v) || nd < dist(v)) {
              // REOPEN on improvement: the slacked heuristic is
              // admissible but not provably consistent, and admissible
              // + reopening + stop-at-target-pop is exact
              dist(v) = nd; pred(v) = u; closed -= v
              pq.enqueue((nd + hCm(v), v))
            } else if (nd == dist(v) && u < pred(v)) pred(v) = u
        }
      }
    }
    if (!closed(target)) None
    else {
      var path = List(target); var cur = target
      while (cur != source) { cur = pred(cur); path = cur :: path }
      Some((path, dist(target), settled))
    }
  }

  /** Distributed goal-directed best-path search — the scale branch of
    * [[aStarPathTo]]. The relaxation loop is [[shortestPathTo]]'s, plus
    * one A*-style frontier prune per round once the target is reached:
    * rows with `dist(v) + h(v) > bestKnown` are dropped, where `h` is
    * the great-circle lower bound to the target (minus the 0.5·maxIter
    * rounding slack, clamped at 0) and `bestKnown` is the target's
    * current distance, read for free off the convergence aggregate.
    * Pruning never removes a node of any optimal path (its
    * `dist + h ≤ total ≤ bestKnown`), and equal-distance predecessor
    * candidates share one prune decision, so path, total, AND the
    * smaller-predecessor tie contract are identical to
    * [[shortestPathTo]] — the search just settles the ellipse around
    * the route instead of the full distance ball (witnessed in
    * ScaleSmoke on a directional lattice).
    *
    * Returns the settled-relation size as the third component; nodes
    * without coords get h=0 (admissible), and a target without coords
    * degrades to plain distributed Dijkstra (marked `settled = -1`). */
  private def aStarDistributed(eChk: DataFrame, coords: DataFrame,
      source: Long, target: Long,
      maxIter: Int): Option[(Seq[Long], Double, Long)] = {
    val spark = eChk.sparkSession
    import spark.implicits._
    val tRow = coords.filter(col("node_id") === target)
      .select(col("lon").cast("double"), col("lat").cast("double"))
      .collect()
    if (tRow.isEmpty)
      return shortestPathTo(eChk, source, target, maxIter, 0L)
        .map { case (p, d) => (p, d, -1L) }
    val (tLon, tLat) = (tRow.head.getDouble(0), tRow.head.getDouble(1))
    val e = eChk.select(col("start_node").as("src"),
      col("end_node").as("dst"), col("w").cast("double").as("w"))
    val nodesRel = e.select(col("src").as("node_id"))
      .unionByName(e.select(col("dst").as("node_id"))).distinct()
    val dLat = radians(lit(tLat) - col("lat"))
    val dLon = radians(lit(tLon) - col("lon"))
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(col("lat"))) * cos(radians(lit(tLat))) * pow(sin(dLon / 2), 2)
    val hCol = greatest(
      lit(2.0 * 6371008.8 * 100.0) * asin(sqrt(a)) - lit(0.5 * maxIter),
      lit(0.0))
    val hRel = nodesRel
      .join(coords.select(col("node_id"), col("lon").cast("double").as("lon"),
        col("lat").cast("double").as("lat")), Seq("node_id"), "left_outer")
      .select(col("node_id").as("__hn"),
        coalesce(hCol, lit(0.0)).as("__h"))
      .localCheckpoint(true)
    var dist = Seq((source, 0.0, source)).toDF("node_id", "dist", "pred")
      .localCheckpoint(true)
    var bestKnown = Double.PositiveInfinity
    var prev = (0L, java.math.BigDecimal.ZERO)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val relaxed = e.join(dist, e("src") === dist("node_id"))
        .select(col("dst").as("node_id"),
          (col("dist") + col("w")).as("dist"), col("src").as("pred"))
      var next = dist.unionByName(relaxed)
        .groupBy("node_id")
        .agg(min(struct(col("dist"), col("pred"))).as("__b"))
        .select(col("node_id"), col("__b.dist").as("dist"),
          col("__b.pred").as("pred"))
      if (!bestKnown.isPosInfinity)
        next = next.join(hRel, next("node_id") === hRel("__hn"), "left_outer")
          .filter(col("dist") + coalesce(col("__h"), lit(0.0)) <= bestKnown)
          .select(col("node_id"), col("dist"), col("pred"))
      val nextChk = next.localCheckpoint(true)
      val s = nextChk.agg(count(lit(1)),
        sum(col("dist").cast("decimal(38,6)")),
        min(when(col("node_id") === target, col("dist")))).head()
      val cur = (s.getLong(0),
        Option(s.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
      if (!s.isNullAt(2)) bestKnown = s.getDouble(2)
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      dist = nextChk
      i += 1
    }
    val settledCount = dist.count()
    reconstructPath(dist, source, target, maxIter)
      .map { case (p, d) => (p, d, settledCount) }
  }

  /** Yen's K shortest LOOPLESS paths (`pgr_ksp` analog) from `source`
    * to `target` over the weighted directed edge list. The reference's
    * exports feed pgRouting, whose KSP answers "give me alternatives" —
    * the navigation query one path can't.
    *
    * Driver-orchestrated Yen: each spur computation is a full
    * [[shortestPathTo]] over the edge relation with the root-path nodes
    * and the already-used continuation edges removed (one broadcast
    * anti-join + an isin filter — the removal set is O(k · path)
    * rows), so every sub-search independently takes the broadcast-local
    * or distributed loop per its own size check. The driver holds only
    * the k result paths and the per-prefix costs — path-sized state,
    * never the graph.
    *
    * Determinism: candidates order by (total, comma-joined path) and
    * parallel edges collapse to their min weight (the only weight
    * Dijkstra can use), so an independent enumerate-all-simple-paths
    * oracle ranks identically. (As in any Yen implementation, spur
    * searches returning one of several EQUAL-cost spur paths can hide
    * the others; weights from real geometry make exact ties
    * measure-zero, and the fixture has none.)
    *
    * Returns up to k `(path nodes, total distance)` in rank order.
    *
    * 100 TB shape — ellipse prune: Yen's spur searches are the scale
    * hazard (k·|path| SSSPs over the near-full edge relation). Before
    * the loop, TWO fixed SSSPs — forward from `source` and backward
    * from `target` — bound every node's best possible through-cost;
    * an edge (u,v,w) can sit on a path of cost ≤ B only if
    * `dS(u) + w + dT(v) ≤ B`. With B = best·(1+slack) the pruned
    * relation contains EVERY path of cost ≤ B (each such path lies
    * entirely inside the ellipse), so Yen restricted to it returns the
    * exact global top-k as long as the k-th cost is ≤ B — which the
    * wrapper verifies, doubling the slack (re-prune, re-run) when it
    * is not, and falling back to the unpruned relation after
    * `maxEscalations`. On a road network the ellipse around one route
    * is a vanishing fraction of the planet graph, so every spur search
    * runs the broadcast-local Dijkstra path: spur-search job count is
    * independent of full-graph size. */
  def kShortestPaths(edges: DataFrame, source: Long, target: Long,
      k: Int, maxIter: Int = 100,
      localThreshold: Long = 100000L, pruneSlack: Double = 0.5,
      maxEscalations: Int = 3,
      localYen: Boolean = true): Seq[(Seq[Long], Double)] = {
    val eChk = materializeEdges(edges)
    // Fully-local fast path (r21): when the WHOLE graph fits the
    // broadcast-local threshold, every spur search was already running
    // the local Dijkstra — but each spur still paid a DataFrame
    // anti-join + re-materialization + probe count to build its
    // filtered edge relation (3-4 driver jobs per spur, dozens per
    // query, pure fixed cost). Collect the adjacency ONCE and run Yen
    // in memory with the exact same semantics: spur SSSPs use the same
    // smaller-predecessor tie rule as shortestPathTo's local path, the
    // candidate ordering is the same (cost, path-string), so the
    // result is bit-identical. The ellipse prune is a cost device for
    // planet graphs and is unnecessary here (both paths return the
    // exact global top-k).
    if (localYen && localThreshold > 0 &&
        eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val es = eChk.select(col("start_node"), col("end_node"),
          col("w").cast("double")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      return yenLocal(es, source, target, k)
    }
    val first = shortestPathTo(eChk, source, target, maxIter, localThreshold)
    if (first.isEmpty || k <= 0) return Seq.empty
    if (k == 1) return Seq(first.get)
    val best = first.get._2
    val rev = eChk.select(col("end_node").as("start_node"),
      col("start_node").as("end_node"), col("w")).localCheckpoint(true)
    val fullEdges = eChk.count()
    var slack = pruneSlack
    var esc = 0
    while (esc < maxEscalations) {
      val bound = best * (1.0 + slack)
      // two DISTANCE-BOUNDED SSSPs per escalation: forward tree from
      // source, backward tree from target. Bounding is exact for the
      // ellipse membership test (w > 0 makes prefix costs monotone, so
      // every node with dS <= bound is reached through within-bound
      // prefixes only) and makes the round count ellipse-local — the
      // searches never settle the far side of a planet graph.
      val dS = boundedSssp(eChk, source, bound + 1e-6, maxIter,
          localThreshold)
        .select(col("node_id").as("__u"),
          col("dist").cast("double").as("__ds"))
      val dT = boundedSssp(rev, target, bound + 1e-6, maxIter,
          localThreshold)
        .select(col("node_id").as("__v"),
          col("dist").cast("double").as("__dt"))
      val pruned = eChk
        .join(dS, eChk("start_node") === dS("__u"))
        .join(dT, eChk("end_node") === dT("__v"))
        .filter(col("__ds") + col("w").cast("double") + col("__dt")
          <= lit(bound) + lit(1e-6))
        .select(col("start_node"), col("end_node"), col("w"))
        .localCheckpoint(true)
      val res = yenCore(pruned, source, target, k, maxIter, localThreshold)
      // STRICT <= bound: the completeness guarantee only covers paths
      // of cost <= bound — an epsilon band above it could admit a path
      // whose equal-or-cheaper competitor was pruned (the 1e-6 stays
      // on the SSSP bound and the edge filter, where it is
      // conservative-only)
      val within = res.takeWhile(_._2 <= bound)
      // every path of cost <= bound lives in the pruned graph, so a
      // within-bound prefix of size k is the exact global answer
      if (within.size >= k) return within.take(k)
      // when the prune kept EVERY edge, yenCore just ran on the full
      // graph: its answer is exact regardless of the bound — return it
      // instead of escalating into strictly repeated work (the
      // fewer-than-k regime on dead-end/service-road graphs)
      if (pruned.count() == fullEdges) return res.take(k)
      slack = (1.0 + slack) * 2.0 - 1.0 // double the bound over best
      esc += 1
    }
    yenCore(eChk, source, target, k, maxIter, localThreshold)
  }

  /** Single-source shortest distances RESTRICTED to `dist <= bound` —
    * the ellipse-prune primitive. Exact over positive weights: any
    * node at true distance <= bound is reached through prefixes that
    * are all <= bound themselves, so pruning the frontier (and the
    * settled relation) at the bound loses nothing inside it. Rounds
    * are bounded by the hop length of within-bound paths — local to
    * the bound's neighborhood, independent of graph size. */
  private def boundedSssp(edges: DataFrame, source: Long, bound: Double,
      maxIter: Int, localThreshold: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val eChk = materializeEdges(edges)
    if (localThreshold > 0 &&
        eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val adj = eChk.select(col("start_node"), col("end_node"),
          col("w").cast("double")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2) }
      val dist = scala.collection.mutable.Map(source -> 0.0)
      val pq = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long)](Ordering.by[(Double, Long), Double](_._1).reverse)
      pq.enqueue((0.0, source))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u) && d <= bound) {
          adj.getOrElse(u, Array.empty[(Long, Double)]).foreach { case (v, w) =>
            val nd = d + w
            if (nd <= bound && (!dist.contains(v) || nd < dist(v))) {
              dist(v) = nd; pq.enqueue((nd, v))
            }
          }
        }
      }
      return dist.toSeq.sortBy(_._1).toDF("node_id", "dist")
    }
    val e = eChk.select(col("start_node").as("src"),
      col("end_node").as("dst"), col("w").cast("double").as("w"))
    var dist = Seq((source, 0.0)).toDF("node_id", "dist")
      .localCheckpoint(true)
    var frontier = dist
    var frontierSize = 1L
    var i = 0
    while (frontierSize > 0 && i < maxIter) {
      val cand = e.join(frontier, e("src") === frontier("node_id"))
        .select(col("dst").as("node_id"), (col("dist") + col("w")).as("dist"))
        .filter(col("dist") <= bound)
        .groupBy("node_id").agg(min(col("dist")).as("dist"))
      val improved = cand.join(dist.withColumnRenamed("dist", "__old"),
          Seq("node_id"), "left_outer")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .select(col("node_id"), col("dist"))
        .localCheckpoint(true)
      frontierSize = improved.count()
      if (frontierSize > 0) {
        dist = dist.unionByName(improved)
          .groupBy("node_id").agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
        frontier = improved
      }
      i += 1
    }
    dist
  }

  /** In-memory Yen over a collected edge array — [[kShortestPaths]]'s
    * broadcast-local fast path. Semantics mirror the DataFrame loop
    * exactly: spur Dijkstras keep the SMALLER predecessor on
    * equal-distance ties (shortestPathTo's local rule), removed
    * continuation edges / root-path nodes are filtered per spur, and
    * candidates rank by (cost, path-string). Pinned bit-identical to
    * the distributed loop in RoadGraphSpec. */
  private def yenLocal(es: Array[(Long, Long, Double)], source: Long,
      target: Long, k: Int): Seq[(Seq[Long], Double)] = {
    val adj = es.map { case (a, b, w) => (a, (b, w)) }
      .groupBy(_._1).map { case (kk, v) => kk -> v.map(_._2) }
    // Dijkstra with excluded edges/nodes; smaller-pred tie rule
    def sp(removedEdges: Set[(Long, Long)], removedNodes: Set[Long],
        from: Long): Option[(Seq[Long], Double)] = {
      if (removedNodes.contains(from)) return None
      val dist = scala.collection.mutable.Map(from -> 0.0)
      val pred = scala.collection.mutable.Map(from -> from)
      val pq = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long)](
          Ordering.by[(Double, Long), Double](_._1).reverse)
      pq.enqueue((0.0, from))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u)) {
          adj.getOrElse(u, Array.empty[(Long, Double)]).foreach {
            case (v, w) =>
              if (!removedNodes.contains(v) &&
                  !removedEdges.contains((u, v))) {
                val nd = d + w
                if (!dist.contains(v) || nd < dist(v)) {
                  dist(v) = nd; pred(v) = u; pq.enqueue((nd, v))
                } else if (nd == dist(v) && u < pred(v)) pred(v) = u
              }
          }
        }
      }
      dist.get(target).map { total =>
        var path = List(target); var cur = target
        while (cur != from) { cur = pred(cur); path = cur :: path }
        (path, total)
      }
    }
    val first = sp(Set.empty, Set.empty, source)
    if (first.isEmpty || k <= 0) return Seq.empty
    if (k == 1) return Seq(first.get)
    // per-pair min weights (pairWeights' local twin)
    val minW = es.groupBy(e => (e._1, e._2))
      .map { case (kk, v) => kk -> v.map(_._3).min }
    val accepted = scala.collection.mutable.ArrayBuffer(first.get)
    implicit val candOrd: Ordering[(Double, Seq[Long])] =
      Ordering.by { case (c, p) => (c, p.mkString(",")) }
    val candidates =
      scala.collection.mutable.SortedSet.empty[(Double, Seq[Long])]
    while (accepted.size < k) {
      val prev = accepted.last._1
      val prefixCost = prev.zip(prev.tail)
        .scanLeft(0.0) { case (acc, pair) => acc + minW(pair) }
      for (i <- 0 until prev.size - 1) {
        val spurNode = prev(i)
        val rootPath = prev.take(i + 1)
        val removedEdges = accepted.map(_._1)
          .filter(p => p.size > i + 1 && p.take(i + 1) == rootPath)
          .map(p => (p(i), p(i + 1))).toSet
        val removedNodes = rootPath.dropRight(1).toSet
        sp(removedEdges, removedNodes, spurNode).foreach {
          case (spur, spurDist) =>
            val full = rootPath.dropRight(1) ++ spur
            if (!accepted.exists(_._1 == full))
              candidates += ((prefixCost(i) + spurDist, full))
        }
      }
      if (candidates.isEmpty) return accepted.toSeq
      val best = candidates.head
      candidates -= best
      accepted += ((best._2, best._1))
    }
    accepted.toSeq
  }

  /** Unpruned Yen loop over exactly the given edge relation (see
    * [[kShortestPaths]] for the prune wrapper and semantics). */
  private def yenCore(edges: DataFrame, source: Long, target: Long,
      k: Int, maxIter: Int,
      localThreshold: Long): Seq[(Seq[Long], Double)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val eChk = materializeEdges(edges)
    val first = shortestPathTo(eChk, source, target, maxIter, localThreshold)
    if (first.isEmpty || k <= 0) return Seq.empty
    // per-pair min weights along one accepted path: a path-sized
    // broadcast join, collected once per outer iteration
    def pairWeights(p: Seq[Long]): Map[(Long, Long), Double] = {
      val pdf = p.zip(p.tail).distinct.toDF("start_node", "end_node")
      eChk.join(broadcast(pdf), Seq("start_node", "end_node"))
        .groupBy("start_node", "end_node")
        .agg(min(col("w").cast("double")).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    }
    val accepted = scala.collection.mutable.ArrayBuffer(first.get)
    implicit val candOrd: Ordering[(Double, Seq[Long])] =
      Ordering.by { case (c, p) => (c, p.mkString(",")) }
    val candidates = scala.collection.mutable.SortedSet.empty[(Double, Seq[Long])]
    while (accepted.size < k) {
      val prev = accepted.last._1
      val w = pairWeights(prev)
      val prefixCost = prev.zip(prev.tail)
        .scanLeft(0.0) { case (acc, pair) => acc + w(pair) }
      for (i <- 0 until prev.size - 1) {
        val spurNode = prev(i)
        val rootPath = prev.take(i + 1)
        // continuation edges of every accepted path sharing this root
        val removedEdges = accepted.map(_._1)
          .filter(p => p.size > i + 1 && p.take(i + 1) == rootPath)
          .map(p => (p(i), p(i + 1))).distinct
        val removedNodes = rootPath.dropRight(1)
        var filtered = eChk.join(
          broadcast(removedEdges.toSeq.toDF("start_node", "end_node")),
          Seq("start_node", "end_node"), "left_anti")
        if (removedNodes.nonEmpty)
          filtered = filtered.filter(
            !col("start_node").isin(removedNodes: _*) &&
            !col("end_node").isin(removedNodes: _*))
        shortestPathTo(filtered, spurNode, target, maxIter, localThreshold)
          .foreach { case (spur, spurDist) =>
            val full = rootPath.dropRight(1) ++ spur
            if (!accepted.exists(_._1 == full))
              candidates += ((prefixCost(i) + spurDist, full))
          }
      }
      if (candidates.isEmpty) return accepted.toSeq
      val best = candidates.head
      candidates -= best
      accepted += ((best._2, best._1))
    }
    accepted.toSeq
  }

  /** Strongly connected components of the DIRECTED edge list — the
    * `pgr_strongComponents` analog. A directed road graph's routable
    * core is its giant SCC: oneway tags (and tag errors) create
    * one-way-in pockets that routing must not treat as reachable both
    * ways, so the SCC pass is the directed-graph health check that
    * belongs next to [[connectedComponents]] before an edge-list export
    * (`osm-road-graphs.sql:223-254` hands exactly this edge shape to
    * pgRouting, whose `pgr_strongComponents` answers the same
    * question).
    *
    * Coloring algorithm (Orzan's forward-max / backward-confirm, the
    * standard Pregel SCC shape), peeling rounds on the remaining
    * subgraph:
    *   1. forward MAX-label propagation: `color(v)` converges to the
    *      largest remaining id with a directed path to `v` (rounds
    *      bounded by remaining diameter — same loop economics as one
    *      SSSP);
    *   2. roots are nodes whose color is their own id; a root `c`'s SCC
    *      is every node of color `c` that reaches `c` BACKWARD through
    *      nodes of color `c` (stepwise growth enforces the color class
    *      at every hop);
    *   3. emit those SCCs, anti-join them out, repeat. Every peel
    *      settles at least the SCC of the max remaining id, and road
    *      networks (one giant routable core + oneway tails) finish in
    *      a handful of peels.
    *
    * The emitted label is the MAX node id of the SCC (the root `c` has
    * color `c`, so no larger id reaches it; any member larger than `c`
    * would propagate its id onto `c`) — deterministic, so an
    * independent mutual-reachability oracle can reproduce it exactly.
    * Isolated nodes (no edges) are not in the node universe, matching
    * the edge-list domain. */
  def stronglyConnectedComponents(edges: DataFrame,
      maxIter: Int = 50, localThreshold: Long = 100000L): DataFrame = {
    // Broadcast-local fast path: the peel loop costs O(peels × rounds)
    // job launches, pure overhead on a driver-sized graph. Iterative
    // Tarjan gives the exact same relation — labels are defined as the
    // max node id of each SCC in BOTH paths, so results are
    // bit-identical, not merely equivalent. localThreshold = 0 forces
    // the distributed peel loop (what ScaleSmoke witnesses).
    val e0 = edges.select(col("start_node").as("src"), col("end_node").as("dst"))
      .distinct().localCheckpoint(true)
    if (localThreshold > 0 &&
        e0.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = e0.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ids = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
      val idx = ids.zipWithIndex.toMap
      val n = ids.length
      val adj = Array.fill(n)(List.empty[Int])
      es.foreach { case (a, b) => adj(idx(a)) ::= idx(b) }
      val index = Array.fill(n)(-1)
      val low = new Array[Int](n)
      val onStack = new Array[Boolean](n)
      val comp = Array.fill(n)(-1)
      val sccStack = scala.collection.mutable.ArrayBuffer[Int]()
      var counter = 0
      var nComp = 0
      for (root <- 0 until n if index(root) == -1) {
        // explicit call stack: (vertex, remaining-children iterator)
        val call = scala.collection.mutable.Stack[(Int, Iterator[Int])]()
        index(root) = counter; low(root) = counter; counter += 1
        sccStack += root; onStack(root) = true
        call.push((root, adj(root).iterator))
        while (call.nonEmpty) {
          val (v, it) = call.top
          if (it.hasNext) {
            val w = it.next()
            if (index(w) == -1) {
              index(w) = counter; low(w) = counter; counter += 1
              sccStack += w; onStack(w) = true
              call.push((w, adj(w).iterator))
            } else if (onStack(w)) low(v) = math.min(low(v), index(w))
          } else {
            call.pop()
            if (call.nonEmpty) {
              val p = call.top._1
              low(p) = math.min(low(p), low(v))
            }
            if (low(v) == index(v)) {
              var done = false
              while (!done) {
                val w = sccStack.remove(sccStack.length - 1)
                onStack(w) = false
                comp(w) = nComp
                if (w == v) done = true
              }
              nComp += 1
            }
          }
        }
      }
      val maxId = Array.fill(nComp)(Long.MinValue)
      for (i <- 0 until n)
        maxId(comp(i)) = math.max(maxId(comp(i)), ids(i))
      return ids.toIndexedSeq.map(id => (id, maxId(comp(idx(id)))))
        .toDF("node_id", "scc")
    }
    stronglyConnectedComponentsWithStats(e0
      .withColumnRenamed("src", "start_node")
      .withColumnRenamed("dst", "end_node"), maxIter)._1
  }

  /** [[stronglyConnectedComponents]] plus its loop-economics witnesses:
    * `(labels, outer peel count, max forward-propagation rounds)` —
    * what the scale smoke asserts (peels stay single-digit on a
    * core-plus-pockets road topology; forward rounds track diameter,
    * not node count). */
  def stronglyConnectedComponentsWithStats(edges: DataFrame,
      maxIter: Int = 50): (DataFrame, Int, Int) = {
    var maxFwd = 0
    val e0 = edges.select(col("start_node").as("src"), col("end_node").as("dst"))
      .distinct().localCheckpoint(true)
    var remE = e0
    var remaining = e0.select(col("src").as("node_id"))
      .unionByName(e0.select(col("dst").as("node_id")))
      .distinct().localCheckpoint(true)
    var out: DataFrame = remaining.limit(0)
      .withColumn("scc", col("node_id"))
    var outer = 0
    while (remaining.limit(1).count() > 0 && outer < maxIter) {
      // (1) forward max-color propagation to fixpoint. Colors only
      // increase, so the color SUM is a one-scalar fixpoint witness
      // (decimal accumulator: planet ids ~1e10 over ~1e9 nodes
      // overflow a Long).
      var color = remaining.withColumn("color", col("node_id"))
        .localCheckpoint(true)
      var prevSum: java.math.BigDecimal = null
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        val prop = remE.join(color, remE("src") === color("node_id"))
          .select(col("dst").as("node_id"), col("color"))
        val next = color.unionByName(prop)
          .groupBy("node_id").agg(max(col("color")).as("color"))
          .localCheckpoint(true)
        val s = next.agg(sum(col("color").cast("decimal(38,0)"))).head()
          .getDecimal(0)
        converged = prevSum != null && s.compareTo(prevSum) == 0
        prevSum = s
        color = next
        i += 1
      }
      maxFwd = math.max(maxFwd, i)
      // (2) backward containment from the roots, restricted to the
      // color class at every hop. Membership only grows; count is the
      // fixpoint witness.
      var scc = color.filter(col("color") === col("node_id"))
        .select(col("node_id"), col("node_id").as("scc"))
        .localCheckpoint(true)
      var prevN = -1L
      var n = scc.count()
      var j = 0
      while (n != prevN && j < maxIter) {
        prevN = n
        val grow = remE.join(scc, remE("dst") === scc("node_id"))
          .select(remE("src").as("node_id"), col("scc"))
          .join(color, Seq("node_id"))
          .filter(col("color") === col("scc"))
          .select(col("node_id"), col("scc"))
        scc = scc.unionByName(grow)
          .groupBy("node_id").agg(min(col("scc")).as("scc"))
          .localCheckpoint(true)
        n = scc.count()
        j += 1
      }
      out = out.unionByName(scc).localCheckpoint(true)
      // (3) peel: drop settled nodes and every edge touching them
      remaining = remaining.join(scc, Seq("node_id"), "left_anti")
        .localCheckpoint(true)
      val settledIds = scc.select(col("node_id"))
      remE = remE
        .join(settledIds.withColumnRenamed("node_id", "src"), Seq("src"), "left_anti")
        .join(settledIds.withColumnRenamed("node_id", "dst"), Seq("dst"), "left_anti")
        .localCheckpoint(true)
      outer += 1
    }
    (out, outer, maxFwd)
  }

  /** Shortest PATH (node sequence + distance) from `source` to
    * `target` — what `pgr_dijkstra` actually returns. Same relaxation
    * loop but the per-node state is `min(struct(dist, pred))`, so on
    * equal-distance ties the smaller predecessor wins deterministically
    * (an independent oracle can reproduce the exact node sequence).
    * The walk back from `target` is one filtered lookup per hop —
    * O(path length) driver round-trips against the settled relation,
    * never a full collect (the distance table may be a whole
    * continent; the path is a few hundred rows).
    *
    * Returns (path nodes source..target, total distance), or None if
    * unreachable. */
  def shortestPathTo(edges: DataFrame, source: Long, target: Long,
      maxIter: Int = 100, localThreshold: Long = 100000L): Option[(Seq[Long], Double)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    // broadcast-local fast path (see multiSourceShortestPaths); the
    // equal-distance tie keeps the SMALLER predecessor, matching the
    // distributed min(struct(dist, pred)) exactly
    val eChk = materializeEdges(edges)
    if (localThreshold > 0 &&
        eChk.limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val adj = eChk.select(col("start_node"), col("end_node"),
          col("w").cast("double")).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val dist = scala.collection.mutable.Map(source -> 0.0)
      val pred = scala.collection.mutable.Map(source -> source)
      val pq = scala.collection.mutable.PriorityQueue
        .empty[(Double, Long)](Ordering.by[(Double, Long), Double](_._1).reverse)
      pq.enqueue((0.0, source))
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (d <= dist(u)) {
          adj.getOrElse(u, Array.empty[(Long, Double)]).foreach { case (v, w) =>
            val nd = d + w
            if (!dist.contains(v) || nd < dist(v)) {
              dist(v) = nd; pred(v) = u; pq.enqueue((nd, v))
            } else if (nd == dist(v) && u < pred(v)) pred(v) = u
          }
        }
      }
      return dist.get(target).map { total =>
        var path = List(target); var cur = target
        while (cur != source) { cur = pred(cur); path = cur :: path }
        (path, total)
      }
    }
    val e = eChk.select(col("start_node").as("src"),
      col("end_node").as("dst"), col("w").cast("double").as("w"))
    var dist = Seq((source, 0.0, source)).toDF("node_id", "dist", "pred")
      .localCheckpoint(true)
    var prev = (0L, java.math.BigDecimal.ZERO)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val relaxed = e.join(dist, e("src") === dist("node_id"))
        .select(col("dst").as("node_id"),
          (col("dist") + col("w")).as("dist"), col("src").as("pred"))
      val next = dist.unionByName(relaxed)
        .groupBy("node_id")
        .agg(min(struct(col("dist"), col("pred"))).as("__b"))
        .select(col("node_id"), col("__b.dist").as("dist"),
          col("__b.pred").as("pred"))
        .localCheckpoint(true)
      val s = next.agg(count(lit(1)),
        sum(col("dist").cast("decimal(38,6)"))).head()
      val cur = (s.getLong(0),
        Option(s.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      dist = next
      i += 1
    }
    reconstructPath(dist, source, target, maxIter)
  }

  /** Rebuild the source→target node sequence from a settled SSSP
    * relation `(node_id, dist, pred)` in **O(log |path|) Spark
    * rounds** — binary lifting + ancestor marking — instead of one
    * driver round-trip per hop (a continental 10³–10⁴-hop route must
    * not cost 10³–10⁴ jobs).
    *
    * Shape per round k: (1) one broadcast join marks the 2^k-ancestor
    * of every already-marked path node (the marked set is path-sized,
    * always the broadcast side); (2) one self-join doubles the lifting
    * relation `node → 2^k-ancestor` to 2^(k+1). The lifting relation is
    * first restricted to `dist <= dist(target)` — closed under `pred`
    * because positive weights make every predecessor strictly closer —
    * so the heavy self-joins run over the target's distance ball, not
    * the whole settled continent. The source's `pred` self-loop makes
    * chains saturate; `min(offset)` keeps its true depth. After
    * ceil(log₂ L) rounds every path offset 0..L is marked exactly once
    * and one path-sized collect per round (doubling as the early-exit
    * check) yields the sequence.
    *
    * Returns (path source..target, total distance), None if `target`
    * is not settled or its chain doesn't reach `source` within
    * `maxHops`. */
  def reconstructPath(settled: DataFrame, source: Long, target: Long,
      maxHops: Int): Option[(Seq[Long], Double)] = {
    val spark = settled.sparkSession
    import spark.implicits._
    val tgt = settled.filter(col("node_id") === target)
      .select(col("dist").cast("double")).collect()
    if (tgt.isEmpty) return None
    val total = tgt.head.getDouble(0)
    if (target == source) return Some((Seq(source), total))
    var lift = settled.filter(col("dist").cast("double") <= total)
      .select(col("node_id"), col("pred").as("anc"))
      .localCheckpoint(true)
    // driver state is path-sized: node -> offset (hops before target)
    val marked = scala.collection.mutable.Map(target -> 0L)
    var reach = 1L
    var rounds = 0
    val maxRounds = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, maxHops.toLong)) + 2
    while (!marked.contains(source) && rounds < maxRounds) {
      val mDf = marked.toSeq.toDF("node_id", "off")
      val jumped = lift.join(broadcast(mDf), Seq("node_id"))
        .select(col("anc"), (col("off") + reach).as("off"))
        .collect()
      jumped.foreach { r =>
        val (n, off) = (r.getLong(0), r.getLong(1))
        if (marked.getOrElse(n, Long.MaxValue) > off) marked(n) = off
      }
      if (!marked.contains(source)) {
        lift = lift.as("a")
          .join(lift.select(col("node_id").as("anc"),
            col("anc").as("anc2")).as("b"), Seq("anc"))
          .select(col("a.node_id"), col("anc2").as("anc"))
          .localCheckpoint(true)
        reach *= 2
      }
      rounds += 1
    }
    marked.get(source).filter(_ <= maxHops).map { srcOff =>
      val byOff = marked.collect {
        case (n, off) if off <= srcOff => off -> n
      }.toMap
      ((srcOff to 0L by -1L).map(byOff).toList, total)
    }
  }

  /** `pgr_drivingDistance` result relation: per node reachable within
    * `cutoff` of the (multi-)source seed set, the edge INTO it from
    * its shortest-path predecessor — `(node_id, edge, cost, agg_cost)`
    * with `edge = -1, cost = 0` on seed rows, exactly the service-area
    * relation pgRouting consumers script against.
    *
    * Derivation is fully relational and loop-free beyond the SSSP
    * itself: run [[multiSourceShortestPaths]] (cutoff-filtered), then
    * ONE join attributes each settled node to the edges that realize
    * its distance (`dist(u) + w = dist(v)`, exact on integer-centimeter
    * weights) and a hash-agg picks `min(pred, edge_id)` — the same
    * smaller-predecessor tie rule as [[shortestPathTo]], with the edge
    * id as the final tiebreak over parallel edges. No predecessor
    * state rides the relaxation loop, so the SSSP keeps its frontier
    * shape; the attribution join is one shuffle over the
    * service-area-sized settled relation, not the graph.
    *
    * `edges` must carry `(start_node, end_node, edge_id, w)`. */
  def drivingDistanceRows(edges: DataFrame, sources: Seq[Long],
      cutoff: Double, maxIter: Int = 100,
      localThreshold: Long = 100000L): DataFrame = {
    val eChk = edges
      .select(col("start_node"), col("end_node"), col("edge_id"), col("w"))
      .localCheckpoint(true)
    val dist = multiSourceShortestPaths(
        eChk.select("start_node", "end_node", "w"),
        sources, maxIter, localThreshold)._1
      .filter(col("dist").cast("double") <= cutoff)
      .localCheckpoint(true)
    val spark = edges.sparkSession
    import spark.implicits._
    val du = dist.select(col("node_id").as("__u"),
      col("dist").cast("double").as("__du"))
    val dv = dist.select(col("node_id").as("__v"),
      col("dist").cast("double").as("__dv"))
    // per settled non-seed node: among edges realizing its distance,
    // the smallest predecessor wins, then the smallest edge id (the
    // realized weight is determined by the predecessor, so carrying
    // __du third in the min-struct is a free ride, not a tiebreak)
    val best = eChk
      .join(du, eChk("start_node") === du("__u"))
      .join(dv, eChk("end_node") === dv("__v"))
      .filter(col("__du") + col("w").cast("double") === col("__dv"))
      .groupBy(col("__v").as("node_id"))
      .agg(min(struct(col("__u").as("p"),
          col("edge_id").cast("long").as("e"),
          col("__du").as("d"))).as("__b"),
        first(col("__dv")).as("agg_cost"))
      .select(col("node_id"), col("__b.e").as("edge"),
        (col("agg_cost") - col("__b.d")).as("cost"), col("agg_cost"))
    val seeds = sources.distinct.sorted
      .toDF("node_id")
      .select(col("node_id"), lit(-1L).as("edge"),
        lit(0.0).as("cost"), lit(0.0).as("agg_cost"))
    // zero-weight edges could otherwise re-attribute a seed (du+0 = 0)
    seeds.unionByName(
      best.join(seeds.select("node_id"), Seq("node_id"), "left_anti"))
  }

  /** pgRouting result-relation projection: expand node-sequence paths
    * into the exact per-edge row shape `pgr_dijkstra`/`pgr_ksp`
    * consumers script against (`osm-pg-etl.md:55-78`): one row per
    * visited node carrying the edge LEAVING it — `(seq, path_id,
    * path_seq, node, edge, cost, agg_cost)`, terminal row `edge = -1,
    * cost = 0`. `edges` must carry `(start_node, end_node, edge_id,
    * w)`; parallel edges collapse to min `(w, edge_id)` — the cheapest
    * edge is the only one Dijkstra can have used, and the id tiebreak
    * makes the relation deterministic. `edge` is the reference
    * surface's way-derived edge id (split ways share their way's id,
    * exactly as the reference's exported edge list does).
    *
    * Scale shape: ONE broadcast join of the O(k·|path|) pair set
    * against the edge relation, then driver-side expansion of
    * path-sized state — never a graph-sized collect. */
  def routeEdgeRows(edges: DataFrame,
      paths: Seq[(Long, Seq[Long])]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val pairs = paths.flatMap { case (_, p) => p.zip(p.tail) }.distinct
    val pw: Map[(Long, Long), (Double, Long)] =
      if (pairs.isEmpty) Map.empty
      else edges
        .join(broadcast(pairs.toDF("start_node", "end_node")),
          Seq("start_node", "end_node"))
        .groupBy("start_node", "end_node")
        .agg(min(struct(col("w").cast("double").as("w"),
          col("edge_id").cast("long").as("edge_id"))).as("__b"))
        .select(col("start_node"), col("end_node"),
          col("__b.w"), col("__b.edge_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getLong(3))).toMap
    var seq = 0L
    val rows = paths.sortBy(_._1).flatMap { case (pid, p) =>
      var agg = 0.0
      p.zipWithIndex.map { case (n, i) =>
        seq += 1
        if (i < p.size - 1) {
          val (c, eid) = pw((n, p(i + 1)))
          val r = (seq, pid, i.toLong + 1, n, eid, c, agg)
          agg += c
          r
        } else (seq, pid, i.toLong + 1, n, -1L, 0.0, agg)
      }
    }
    rows.toDF("seq", "path_id", "path_seq", "node", "edge",
      "cost", "agg_cost")
  }
}
