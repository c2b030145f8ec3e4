package graft

/** Shared DuckDB-SQL oracle fragments for the OSM pipeline queries: the
  * micro fixture's way_nodes as VALUES CTEs plus a reference-shaped SQL
  * re-derivation of the way-splitting chain (osm-road-graphs.sql:66-165)
  * — shared nodes, way lengths, split points, lag-window merge limits,
  * dead-end append, range join, ordered re-assembly.
  */
object OsmOracle {
  val graphPrefix: String =
    """WITH way_nodes(way_id, sequence_id, node_id) AS (VALUES
         (101,0,1),(101,1,2),(101,2,3),(101,3,4),
         (102,0,5),(102,1,3),(102,2,6),
         (103,0,7),(103,1,8),
         (104,0,9),(104,1,10),
         (106,0,10),(106,1,9),
         (109,0,8),(109,1,12)),
       shared AS (SELECT node_id FROM way_nodes GROUP BY node_id HAVING count(*) > 1),
       lengths AS (SELECT way_id, max(sequence_id) AS length
                   FROM way_nodes WHERE sequence_id > 1 GROUP BY way_id),
       splits AS (
         SELECT n.way_id, n.node_id, n.sequence_id
         FROM way_nodes n
         JOIN shared s ON n.node_id = s.node_id
         JOIN lengths l ON n.way_id = l.way_id AND n.sequence_id < l.length
         WHERE n.sequence_id > 0),
       base AS (
         SELECT way_id,
                lag(sequence_id, 1, 0) OVER (PARTITION BY way_id ORDER BY sequence_id) AS bottom_limit,
                sequence_id AS top_limit
         FROM way_nodes
         WHERE sequence_id > 0
           AND way_id IN (SELECT way_id FROM splits)
           AND node_id IN (SELECT node_id FROM shared)),
       lastseg AS (
         SELECT b.way_id, b.top_limit AS bottom_limit, l.length AS top_limit
         FROM (SELECT way_id, max(top_limit) AS top_limit FROM base GROUP BY way_id) b
         JOIN lengths l ON b.way_id = l.way_id AND b.top_limit < l.length),
       lims AS (SELECT * FROM base UNION ALL SELECT * FROM lastseg),
       ntm AS (
         SELECT w.way_id, l.top_limit AS group_id, w.sequence_id, w.node_id
         FROM way_nodes w
         JOIN lims l ON w.way_id = l.way_id
                    AND w.sequence_id BETWEEN l.bottom_limit AND l.top_limit),
       merged AS (
         SELECT way_id AS edge_id, group_id,
                (list(node_id ORDER BY sequence_id))[1] AS start_node,
                (list(node_id ORDER BY sequence_id))[-1] AS end_node,
                array_to_string(list(CAST(node_id AS VARCHAR) ORDER BY sequence_id), ',') AS nodes_csv,
                array_to_string(list(CAST(node_id AS VARCHAR) ORDER BY sequence_id DESC), ',') AS nodes_csv_rev
         FROM ntm GROUP BY way_id, group_id
         UNION ALL
         SELECT way_id, -1,
                (list(node_id ORDER BY sequence_id))[1],
                (list(node_id ORDER BY sequence_id))[-1],
                array_to_string(list(CAST(node_id AS VARCHAR) ORDER BY sequence_id), ','),
                array_to_string(list(CAST(node_id AS VARCHAR) ORDER BY sequence_id DESC), ',')
         FROM way_nodes
         WHERE way_id NOT IN (SELECT DISTINCT way_id FROM ntm)
         GROUP BY way_id)"""
}
