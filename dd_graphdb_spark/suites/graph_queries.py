"""GQL + traversal operator suite over the TPC-H-derived property graph.

Every query runs through the real engine surface (GQLEngine /
operators.traversal) and is verified against DuckDB re-deriving the same
graph relationally (GRAPH_CTE) — FIXTURES.md F8's approach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dd_graphdb_spark.graph import GRAPH_CTE, PropertyGraph, materialized_tpch_graph
from dd_graphdb_spark.operators import traversal as T
from dd_graphdb_spark.plans.lower import GQLEngine

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


# Vertex-id namespace helpers (see graph.OFFSET)
CUST = 10_000_000
SUPP = 20_000_000
ORD = 30_000_000
NATION = 100


# ---------------------------------------------------------------------------
# GQL: property filter MATCH (F1 golden shape — executor.rs:742-790)
# ---------------------------------------------------------------------------
@_q(
    "gql_match_filter",
    GRAPH_CTE
    + """
    SELECT name AS v_name, acctbal AS v_acctbal
    FROM vertices WHERE label = 'Customer' AND acctbal > 5000.0
    """,
)
def gql_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute("MATCH (v:Customer) WHERE v.acctbal > 5000.0 RETURN v.name, v.acctbal")


# ---------------------------------------------------------------------------
# GQL: inline property map match (find_matching_vertices, executor.rs:280-313)
# ---------------------------------------------------------------------------
@_q(
    "gql_inline_props",
    GRAPH_CTE
    + """
    SELECT id AS c_id FROM vertices
    WHERE label = 'Customer' AND mktsegment = 'BUILDING'
    """,
)
def gql_inline_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute("MATCH (c:Customer {mktsegment: 'BUILDING'}) RETURN c.id")


# ---------------------------------------------------------------------------
# GQL: 1-hop edge pattern (F2 golden shape — executor.rs:793-842)
# ---------------------------------------------------------------------------
@_q(
    "gql_match_edge",
    GRAPH_CTE
    + """
    SELECT v1.name AS c_name, v2.name AS n_name
    FROM vertices v1
    JOIN edges e ON v1.id = e.src AND e.label = 'located_in'
    JOIN vertices v2 ON e.dst = v2.id
    WHERE v1.label = 'Customer' AND v2.label = 'Nation' AND v1.acctbal > 9000.0
    """,
)
def gql_match_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[e:located_in]->(n:Nation) WHERE c.acctbal > 9000.0 RETURN c.name, n.name"
    )


# ---------------------------------------------------------------------------
# GQL: multi-hop chain (match_pattern binding enumeration, executor.rs:219-277)
# ---------------------------------------------------------------------------
@_q(
    "gql_multi_hop",
    GRAPH_CTE
    + """
    SELECT o.id AS o_id, c.name AS c_name, n.name AS n_name
    FROM vertices o
    JOIN edges e1 ON o.id = e1.src AND e1.label = 'placed_by'
    JOIN vertices c ON e1.dst = c.id
    JOIN edges e2 ON c.id = e2.src AND e2.label = 'located_in'
    JOIN vertices n ON e2.dst = n.id
    WHERE o.label = 'Order' AND c.label = 'Customer' AND n.label = 'Nation'
      AND o.acctbal > 400000.0
    """,
)
def gql_multi_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (o:Order)-[:placed_by]->(c:Customer)-[:located_in]->(n:Nation) "
        "WHERE o.acctbal > 400000.0 RETURN o.id, c.name, n.name"
    )


# ---------------------------------------------------------------------------
# GQL: incoming edge direction  <-[]-
# ---------------------------------------------------------------------------
@_q(
    "gql_incoming_edge",
    GRAPH_CTE
    + f"""
    SELECT c.name AS c_name, o.id AS o_id
    FROM vertices c
    JOIN edges e ON c.id = e.dst AND e.label = 'placed_by'
    JOIN vertices o ON e.src = o.id
    WHERE c.label = 'Customer' AND c.id = {CUST + 7} AND o.label = 'Order'
    """,
)
def gql_incoming_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        f"MATCH (c:Customer {{id: {CUST + 7}}})<-[:placed_by]-(o:Order) RETURN c.name, o.id"
    )


# ---------------------------------------------------------------------------
# GQL: undirected edge  --  (executor.rs:322-326 → both directions)
# ---------------------------------------------------------------------------
@_q(
    "gql_undirected",
    GRAPH_CTE
    + f"""
    SELECT x.id AS x_id, x.label AS x_label
    FROM vertices n
    JOIN (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) e
      ON n.id = e.src
    JOIN vertices x ON e.dst = x.id
    WHERE n.id = {NATION + 5}
    """,
)
def gql_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(f"MATCH (n {{id: {NATION + 5}}})--(x) RETURN x.id, x.label")


# ---------------------------------------------------------------------------
# Traversals (graph/storage/src/lib.rs:738-830)
# ---------------------------------------------------------------------------
@_q(
    "traverse_out_neighbors",
    GRAPH_CTE + f"SELECT dst AS neighbor_id FROM edges WHERE src = {CUST + 42} GROUP BY dst",
)
def traverse_out_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.out_neighbors(materialized_tpch_graph(spark, sf_dir), CUST + 42)


@_q(
    "traverse_in_neighbors",
    GRAPH_CTE + f"SELECT src AS neighbor_id FROM edges WHERE dst = {NATION + 3} GROUP BY src",
)
def traverse_in_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.in_neighbors(materialized_tpch_graph(spark, sf_dir), NATION + 3)


@_q(
    "traverse_all_neighbors",
    GRAPH_CTE
    + f"""
    SELECT neighbor_id FROM (
        SELECT dst AS neighbor_id FROM edges WHERE src = {NATION + 3}
        UNION
        SELECT src FROM edges WHERE dst = {NATION + 3}
    ) GROUP BY neighbor_id
    """,
)
def traverse_all_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.all_neighbors(materialized_tpch_graph(spark, sf_dir), NATION + 3)


@_q(
    "traverse_2hop",
    GRAPH_CTE
    + f"""
    SELECT DISTINCT e2.dst AS neighbor_id
    FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
    WHERE e1.src = {ORD + 7} AND e2.dst != {ORD + 7}
    """,
)
def traverse_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.traverse_2hop(materialized_tpch_graph(spark, sf_dir), ORD + 7)


# ---------------------------------------------------------------------------
# Degrees (graph/collection/src/lib.rs:210-223) — top-k by in-degree
# ---------------------------------------------------------------------------
@_q(
    "degree_top_customers",
    GRAPH_CTE
    + """
    SELECT dst AS id, COUNT(*) AS in_degree
    FROM edges WHERE label = 'placed_by'
    GROUP BY dst
    ORDER BY in_degree DESC, id ASC
    LIMIT 10
    """,
)
def degree_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = materialized_tpch_graph(spark, sf_dir)
    sub = PropertyGraph(g.vertices, g.edges.filter(F.col("label") == "placed_by"))
    return (
        sub.in_degrees()
        .select(F.col("dst").alias("id"), "in_degree")
        .orderBy(F.col("in_degree").desc(), F.col("id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Common neighbors (src/social_network_platform.rs:527-554): supplier pairs
# co-located in the same nation.
# ---------------------------------------------------------------------------
@_q(
    "common_neighbors_suppliers",
    GRAPH_CTE
    + f"""
    SELECT e1.src AS a, e2.src AS b, COUNT(*) AS common_count
    FROM edges e1 JOIN edges e2
      ON e1.dst = e2.dst AND e1.label = 'located_in' AND e2.label = 'located_in'
    WHERE e1.src < e2.src AND e1.src >= {SUPP} AND e2.src >= {SUPP}
      AND e1.src < {ORD} AND e2.src < {ORD}
    GROUP BY e1.src, e2.src
    """,
)
def common_neighbors_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = materialized_tpch_graph(spark, sf_dir)
    supplier_edges = g.edges.filter(
        (F.col("label") == "located_in") & (F.col("src") >= SUPP) & (F.col("src") < ORD)
    )
    return T.common_neighbors(PropertyGraph(g.vertices, supplier_edges))


# ---------------------------------------------------------------------------
# Skew stress: user --has--> event_type edges have only 5 distinct
# targets, so EVERY dst is a hot key (1,500 members each at sf0.1 — a
# d^2/key pair explosion). salt_threshold=100 forces the whole workload
# through the salted pair path (operators._skew); exact output.
# ---------------------------------------------------------------------------
@_q(
    "skew_common_neighbors_events",
    """
    WITH e AS (SELECT DISTINCT user_id, event_type FROM events),
    p AS (
        SELECT a.user_id AS a, b.user_id AS b, COUNT(*) AS common_count
        FROM e a JOIN e b ON a.event_type = b.event_type AND a.user_id < b.user_id
        GROUP BY 1, 2
    ),
    f AS (SELECT a, b, common_count FROM p WHERE common_count >= 4)
    SELECT a % 16 AS bucket,
           COUNT(*) AS n_pairs,
           SUM(common_count)::BIGINT AS sum_common,
           SUM(((a * 31 + b) % 1000003) * common_count)::BIGINT AS checksum
    FROM f GROUP BY a % 16
    """,
)
def skew_common_neighbors_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial skewed common-neighbors through the salted pair path
    — every dst is a hot key, so the workload is the d²-per-key pair
    explosion (operators/_skew.salted_self_pairs). The gate output is an
    AGGREGATE WITNESS over the full pair set (r15): per-bucket (a % 16)
    pair count, common-count sum, and an order-insensitive checksum
    folding EVERY pair's (a, b, common_count). The quadratic join still
    executes in full on both engines, but the collected result is 16
    rows — value-comparable at EVERY gate scale (at sf1 the raw pair
    output is ~10⁸ rows, which the r14 gate could only exclude)."""
    from dd_graphdb_spark.graph import read_events

    ev = (
        read_events(spark, sf_dir)
        .select(F.col("user_id").alias("src"), F.col("event_type").alias("dst"))
        .distinct()
        .withColumn("label", F.lit("has"))
    )
    g = PropertyGraph(ev.select(F.col("src").alias("id")).distinct(), ev)
    pairs = T.common_neighbors(g, min_common=4, salt_threshold=100, n_salts=16)
    # checksum stays in BIGINT: (a*31+b) % 1000003 < 1e6, common_count
    # is bounded by the distinct event-type count, so the sum is
    # ≤ ~2e13 per pair-set decade — far inside 2^63 at any plausible sf
    return pairs.groupBy((F.col("a") % 16).alias("bucket")).agg(
        F.count("*").alias("n_pairs"),
        F.sum("common_count").cast("long").alias("sum_common"),
        F.sum(((F.col("a") * 31 + F.col("b")) % 1000003) * F.col("common_count"))
        .cast("long")
        .alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Edge lookup (get_edge_by_label, graph/storage/src/lib.rs:524-528)
# ---------------------------------------------------------------------------
@_q(
    "edges_between_lookup",
    GRAPH_CTE
    + f"""
    SELECT src, dst, label FROM edges
    WHERE src = {CUST + 42} AND dst = {NATION + 17}
       OR (src = {CUST + 42} AND dst = {NATION + 2})
    """,
)
def edges_between_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = materialized_tpch_graph(spark, sf_dir)
    # probe two candidate (src,dst) pairs; only the real FK edge survives
    # (customer 42 is in nation 17 across all generated SFs — the old
    # probes hit nations 0/2, so the query always compared 0 == 0 rows)
    return T.edges_between(g, CUST + 42, NATION + 17).union(
        T.edges_between(g, CUST + 42, NATION + 2)
    )


# ---------------------------------------------------------------------------
# GQL result modifiers (beyond the reference's declared grammar — the
# standard Cypher surface): ORDER BY / SKIP / LIMIT with a total order,
# and count() with Cypher's implicit grouping.
# ---------------------------------------------------------------------------
@_q(
    "gql_order_skip_limit",
    GRAPH_CTE
    + """
    SELECT name AS v_name, acctbal AS v_acctbal
    FROM vertices WHERE label = 'Customer' AND acctbal > 9000.0
    ORDER BY acctbal DESC, name ASC
    OFFSET 5 LIMIT 10
    """,
)
def gql_order_skip_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (v:Customer) WHERE v.acctbal > 9000.0 "
        "RETURN v.name, v.acctbal ORDER BY v.acctbal DESC, v.name SKIP 5 LIMIT 10"
    )


@_q(
    "gql_count_per_nation",
    GRAPH_CTE
    + """
    SELECT n.name AS n_name, COUNT(c.name) AS count_c
    FROM edges e
    JOIN vertices c ON e.src = c.id AND c.label = 'Customer'
    JOIN vertices n ON e.dst = n.id AND n.label = 'Nation'
    WHERE e.label = 'located_in'
    GROUP BY n.name
    ORDER BY count_c DESC, n_name ASC
    LIMIT 5
    """,
)
def gql_count_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(c) with implicit grouping by the non-aggregated item
    (n.name), plus ORDER BY on both projected columns.

    ORDER BY count(...) is projected as count_c — the lowering resolves
    order names against output columns, so grouping keys and aggregates
    are both orderable; here the key n_name is the tie-break."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    out = eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) RETURN n.name, count(c)"
    )
    return out.orderBy(F.col("count_c").desc(), F.col("n_name").asc()).limit(5)


@_q(
    "gql_distinct_segments",
    GRAPH_CTE
    + """
    SELECT DISTINCT mktsegment AS v_mktsegment
    FROM vertices WHERE label = 'Customer'
    """,
)
def gql_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute("MATCH (v:Customer) RETURN DISTINCT v.mktsegment")


@_q(
    "gql_agg_per_nation",
    GRAPH_CTE
    + """
    SELECT n.name AS n_name,
           MIN(c.acctbal) AS min_c_acctbal,
           MAX(c.acctbal) AS max_c_acctbal,
           COUNT(c.name) AS count_c
    FROM edges e
    JOIN vertices c ON e.src = c.id AND c.label = 'Customer'
    JOIN vertices n ON e.dst = n.id AND n.label = 'Nation'
    WHERE e.label = 'located_in'
    GROUP BY n.name
    """,
)
def gql_agg_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/count aggregation with Cypher implicit grouping — min/max
    are order-exact, so no rounding is needed for engine parity."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "RETURN n.name, min(c.acctbal), max(c.acctbal), count(c)"
    )


# ---------------------------------------------------------------------------
# GQL: the classic Cypher anti-join idiom — OPTIONAL MATCH, pass the
# optional binding through WITH, keep rows where it IS NULL.
# ---------------------------------------------------------------------------
@_q(
    "gql_anti_join_null",
    GRAPH_CTE
    + """
    SELECT c.name AS name FROM vertices c
    WHERE c.label = 'Customer' AND NOT EXISTS (
        SELECT 1 FROM edges e JOIN vertices o ON e.src = o.id
        WHERE e.label = 'placed_by' AND e.dst = c.id
          AND o.label = 'Order' AND o.acctbal > 450000.0
    )
    """,
)
def gql_anti_join_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no BIG order: OPTIONAL MATCH (its WHERE applies
    within the optional pattern) + IS NULL — the Cypher equivalent of
    the relational anti-join (the reference can only express this
    imperatively). The acctbal filter keeps the result non-trivial at
    every SF (every customer has SOME order in this testdata)."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) "
        "OPTIONAL MATCH (o:Order)-[:placed_by]->(c) WHERE o.acctbal > 450000.0 "
        "WITH c.name AS name, o.id AS oid WHERE oid IS NULL RETURN name"
    )


# ---------------------------------------------------------------------------
# GQL: NOT predicate + count(DISTINCT ...) with implicit grouping.
# ---------------------------------------------------------------------------
@_q(
    "gql_count_distinct_segments",
    GRAPH_CTE
    + """
    SELECT n.name AS n_name, COUNT(DISTINCT c.mktsegment) AS segs
    FROM vertices c
    JOIN edges e ON c.id = e.src AND e.label = 'located_in'
    JOIN vertices n ON e.dst = n.id
    WHERE c.label = 'Customer' AND n.label = 'Nation'
      AND NOT c.mktsegment = 'MACHINERY'
    GROUP BY n.name
    """,
)
def gql_count_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WHERE NOT c.mktsegment = 'MACHINERY' "
        "RETURN n.name, count(DISTINCT c.mktsegment) AS segs"
    )


# ---------------------------------------------------------------------------
# GQL: ORDER BY on NON-projected properties (hidden sort columns —
# legal Cypher when RETURN is neither DISTINCT nor aggregating); the
# LIMIT makes the hidden ordering observable in the result set.
# ---------------------------------------------------------------------------
@_q(
    "gql_order_hidden_prop",
    GRAPH_CTE
    + """
    SELECT name AS c_name, id AS c_id FROM vertices
    WHERE label = 'Customer'
    ORDER BY acctbal DESC, id ASC LIMIT 10
    """,
)
def gql_order_hidden_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY a NON-returned property (acctbal stays hidden). The id
    also projects (r15): at replicated scales the top-10 names are 10
    copies of one customer, which tripped the gate's vacuity audit —
    distinct ids keep the rows distinguishable at every sf while the
    ordering key remains unprojected."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) RETURN c.name, c.id "
        "ORDER BY c.acctbal DESC, c.id ASC LIMIT 10"
    )


@_q(
    "gql_collect_nations",
    GRAPH_CTE
    + """
    SELECT r.name AS r_name,
           array_to_string(list_sort(list(n.name)), ',') AS nations
    FROM edges e
    JOIN vertices n ON e.src = n.id AND n.label = 'Nation'
    JOIN vertices r ON e.dst = r.id AND r.label = 'Region'
    WHERE e.label = 'in_region'
    GROUP BY r.name
    """,
)
def gql_collect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect() aggregate (the fifth aggregate kind the reference's
    incremental engine dispatches, incremental_engine.rs:931-946) with
    Cypher implicit grouping. The engine returns a SORTED array; the
    suite joins it to a comma string so the value-hash comparison sees
    one canonical rendering on both engines."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    out = eng.execute(
        "MATCH (n:Nation)-[:in_region]->(r:Region) "
        "RETURN r.name, collect(n.name) AS nations"
    )
    return out.select("r_name", F.array_join("nations", ",").alias("nations"))


# ---------------------------------------------------------------------------
# GQL: variable-length path `*2..3` (beyond the reference's declared
# grammar — its multi-hop matcher, executor.rs:219-277, only walks fixed
# chains). Walk semantics (no repeated-vertex check) on mixed edge
# labels: 2 hops from an Order reach its Nation, 3 hops its Region.
# ---------------------------------------------------------------------------
@_q(
    "gql_var_length",
    GRAPH_CTE
    + """
    , starts AS (
        SELECT id FROM vertices WHERE label = 'Order' AND acctbal > 450000.0
    ),
    h2 AS (
        SELECT e2.dst AS tid
        FROM starts s
        JOIN edges e1 ON s.id = e1.src
        JOIN edges e2 ON e1.dst = e2.src
    ),
    h3 AS (
        SELECT e3.dst AS tid
        FROM starts s
        JOIN edges e1 ON s.id = e1.src
        JOIN edges e2 ON e1.dst = e2.src
        JOIN edges e3 ON e2.dst = e3.src
    ),
    walks AS (
        SELECT tid, 2 AS p_hops FROM h2
        UNION ALL
        SELECT tid, 3 AS p_hops FROM h3
    )
    SELECT v.name AS t_name, w.p_hops AS p_hops, COUNT(*) AS "count"
    FROM walks w JOIN vertices v ON w.tid = v.id
    GROUP BY 1, 2
    """,
)
def gql_var_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (o:Order)-[p*2..3]->(t) WHERE o.acctbal > 450000.0 "
        "RETURN t.name, p.hops, count(*)"
    )


# ---------------------------------------------------------------------------
# GQL: OPTIONAL MATCH (beyond the reference's declared grammar) — the
# left-outer pattern extension: customers keep a row even with no
# qualifying order; the optional WHERE applies within the pattern.
# ---------------------------------------------------------------------------
@_q(
    "gql_optional_match",
    GRAPH_CTE
    + """
    SELECT c.name AS c_name, COUNT(o.id) AS count_o
    FROM vertices c
    LEFT JOIN (
        SELECT e.dst AS cid, v.id
        FROM edges e JOIN vertices v ON e.src = v.id
        WHERE e.label = 'placed_by' AND v.label = 'Order' AND v.acctbal > 450000.0
    ) o ON c.id = o.cid
    WHERE c.label = 'Customer' AND c.mktsegment = 'MACHINERY'
    GROUP BY c.name
    """,
)
def gql_optional_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(o) is Cypher's count-non-null: customers with no
    qualifying order keep a row with count 0 — the observable proof of
    the left-outer pattern extension."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer {mktsegment: 'MACHINERY'}) "
        "OPTIONAL MATCH (c)<-[:placed_by]-(o:Order) WHERE o.acctbal > 450000.0 "
        "RETURN c.name, count(o)"
    )


# ---------------------------------------------------------------------------
# GQL: string predicates CONTAINS / STARTS WITH / ENDS WITH / IN
# (FilterOperator::Contains intent, stream_transform.rs:196-315, lifted
# into the query language WHERE clause).
# ---------------------------------------------------------------------------
@_q(
    "gql_string_predicates",
    GRAPH_CTE
    + """
    SELECT id AS c_id, name AS c_name
    FROM vertices
    WHERE label = 'Customer'
      AND name LIKE '%7'
      AND mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def gql_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) WHERE c.name ENDS WITH '7' "
        "AND c.mktsegment IN ['BUILDING', 'MACHINERY'] RETURN c.id, c.name"
    )


# ---------------------------------------------------------------------------
# GQL: cross-variable property comparison — orders cheaper than their
# customer's account balance. The oracle MATERIALIZEs the equality-join
# result before the inequality filter: DuckDB's optimizer otherwise
# reorders the inequality into a PIECEWISE_MERGE_JOIN run FIRST
# (orders × customers, EC 2.25e12 at sf1 — 362 s and the gate's only
# DuckDB OOM hazard); the materialization pins the 1.5M-row equality
# join as the producer.
# ---------------------------------------------------------------------------
@_q(
    "gql_prop_compare",
    GRAPH_CTE
    + """
    , paired AS MATERIALIZED (
        SELECT o.id AS o_id, o.acctbal AS o_acctbal, c.acctbal AS c_acctbal
        FROM vertices o
        JOIN edges e ON o.id = e.src AND e.label = 'placed_by'
        JOIN vertices c ON e.dst = c.id
        WHERE o.label = 'Order' AND c.label = 'Customer'
    )
    SELECT o_id, o_acctbal, c_acctbal FROM paired
    WHERE o_acctbal < c_acctbal
    """,
)
def gql_prop_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (o:Order)-[:placed_by]->(c:Customer) WHERE o.acctbal < c.acctbal "
        "RETURN o.id, o.acctbal, c.acctbal"
    )


# ---------------------------------------------------------------------------
# GQL: WITH pipeline (HAVING idiom) — aggregate per nation, filter on
# the aggregate, project the aliases.
# ---------------------------------------------------------------------------
@_q(
    "gql_with_having",
    GRAPH_CTE
    + """
    SELECT n.name AS nation, COUNT(*) AS n_cust
    FROM vertices c
    JOIN edges e ON c.id = e.src AND e.label = 'located_in'
    JOIN vertices n ON e.dst = n.id
    WHERE c.label = 'Customer' AND n.label = 'Nation'
    GROUP BY n.name
    HAVING COUNT(*) > 25
    """,
)
def gql_with_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH n.name AS nation, count(*) AS n_cust "
        "WHERE n_cust > 25 RETURN nation, n_cust"
    )


# ---------------------------------------------------------------------------
# GQL: sum/avg aggregates through a WITH pipeline with a HAVING filter
# on the sum — the first query a Cypher user writes after count.
# Float determinism: the engine sums doubles; both sides round the sum
# to 2 and the average to 6 decimals AFTER aggregation (double-sum
# order drift is ~1e-9 absolute here, far inside the rounding grid —
# the same contract the relational suite uses for averages).
# ---------------------------------------------------------------------------
@_q(
    "gql_agg_sum_avg",
    GRAPH_CTE
    + """
    SELECT nation, ROUND(total, 2) AS total, ROUND(avg_bal, 6) AS avg_bal
    FROM (
        SELECT n.name AS nation,
               SUM(c.acctbal::DECIMAL(18,2))::DOUBLE AS total,
               SUM(c.acctbal::DECIMAL(18,2))::DOUBLE / COUNT(*) AS avg_bal
        FROM vertices c
        JOIN edges e ON c.id = e.src AND e.label = 'located_in'
        JOIN vertices n ON e.dst = n.id
        WHERE c.label = 'Customer' AND n.label = 'Nation'
        GROUP BY n.name
    ) WHERE total > 0.0
    """,
)
def gql_agg_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    out = eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH n.name AS nation, sum(c.acctbal) AS total, avg(c.acctbal) AS avg_bal "
        "WHERE total > 0.0 RETURN nation, total, avg_bal"
    )
    return out.select(
        "nation",
        F.round("total", 2).alias("total"),
        F.round("avg_bal", 6).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# GQL: consecutive MATCH clauses (conjunctive patterns) — customers with
# their nation AND their big orders; counts roll up per nation.
# ---------------------------------------------------------------------------
@_q(
    "gql_multi_match",
    GRAPH_CTE
    + """
    SELECT n.name AS n_name, COUNT(*) AS "count"
    FROM vertices c
    JOIN edges e1 ON c.id = e1.src AND e1.label = 'located_in'
    JOIN vertices n ON e1.dst = n.id
    JOIN edges e2 ON c.id = e2.dst AND e2.label = 'placed_by'
    JOIN vertices o ON e2.src = o.id
    WHERE c.label = 'Customer' AND n.label = 'Nation'
      AND o.label = 'Order' AND o.acctbal > 450000.0
    GROUP BY n.name
    """,
)
def gql_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "MATCH (c)<-[:placed_by]-(o:Order) WHERE o.acctbal > 450000.0 "
        "RETURN n.name, count(*)"
    )


# ---------------------------------------------------------------------------
# GQL: WITH passthrough + second MATCH — filter customers by nation in
# the pipeline stage, then extend the passed-through variable with a
# second pattern.
# ---------------------------------------------------------------------------
@_q(
    "gql_with_passthrough",
    GRAPH_CTE
    + """
    SELECT c.name AS c_name, COUNT(o.id) AS count_o
    FROM vertices c
    JOIN edges e1 ON c.id = e1.src AND e1.label = 'located_in'
    JOIN vertices n ON e1.dst = n.id
    JOIN edges e2 ON c.id = e2.dst AND e2.label = 'placed_by'
    JOIN vertices o ON e2.src = o.id
    WHERE c.label = 'Customer' AND n.label = 'Nation' AND n.name = 'NATION_2'
      AND o.label = 'Order'
    GROUP BY c.name
    """,
)
def gql_with_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation {name: 'NATION_2'}) "
        "WITH c MATCH (c)<-[:placed_by]-(o:Order) "
        "RETURN c.name, count(o)"
    )


# ---------------------------------------------------------------------------
# GQL UNWIND (beyond the reference's declared grammar — its AST carries
# list values, graph/query/src/lib.rs:24-30, but the grammar never
# compiled; standard Cypher UNWIND). The query collect()s each nation's
# customer segments, explodes them back to rows through the WITH
# pipeline, and re-aggregates — the roundtrip is exact, so the oracle is
# the direct relational group-by.
# ---------------------------------------------------------------------------
@_q(
    "gql_unwind",
    GRAPH_CTE
    + """
    SELECT n.name AS nation, c.mktsegment AS seg, count(*) AS n_cust
    FROM vertices c
    JOIN edges e ON c.id = e.src AND e.label = 'located_in'
    JOIN vertices n ON e.dst = n.id AND n.label = 'Nation'
    WHERE c.label = 'Customer'
    GROUP BY n.name, c.mktsegment
    ORDER BY nation, seg
    """,
)
def gql_unwind(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH n.name AS nation, collect(c.mktsegment) AS segs "
        "UNWIND segs AS seg "
        "RETURN nation, seg, count(*) AS n_cust ORDER BY nation, seg"
    )


# ---------------------------------------------------------------------------
# GQL in-query shortest path: MATCH p = shortestPath((a)-[*1..n]->(b)).
# Mirrors the reference's routed shortest-path view result shape
# (dist + path string, incremental_engine.rs:1214-1285) with Cypher
# hop semantics. Customer→Region is a unique 2-hop tree walk
# (located_in then in_region), so the DuckDB oracle reconstructs the
# identical hops/distance/path relationally — path string verified
# byte-for-byte.
# ---------------------------------------------------------------------------
@_q(
    "gql_shortest_path",
    GRAPH_CTE
    + """
    SELECT c.name AS cust, r.name AS region, 2::BIGINT AS hops,
           2.0::DOUBLE AS dist,
           c.id::VARCHAR || '->' || n.id::VARCHAR || '->' || r.id::VARCHAR AS path
    FROM vertices c
    JOIN edges e1 ON c.id = e1.src AND e1.label = 'located_in'
    JOIN vertices n ON e1.dst = n.id AND n.label = 'Nation'
    JOIN edges e2 ON n.id = e2.src AND e2.label = 'in_region'
    JOIN vertices r ON e2.dst = r.id
    WHERE c.label = 'Customer'
    ORDER BY cust
    """,
)
def gql_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH p = shortestPath((c:Customer)-[*1..3]->(r:Region)) "
        "RETURN c.name AS cust, r.name AS region, p.hops AS hops, "
        "p.distance AS dist, p.path AS path ORDER BY cust"
    )


# ---------------------------------------------------------------------------
# Entity functions id(v) / type(e) resolving to binding columns (labels()
# returns a list — covered by pytest; lists don't value-hash portably).
# ---------------------------------------------------------------------------
@_q(
    "gql_entity_funcs",
    GRAPH_CTE
    + """
    SELECT n.id AS nid, e.label AS etype, r.name AS rname
    FROM edges e
    JOIN vertices n ON e.src = n.id AND n.label = 'Nation'
    JOIN vertices r ON e.dst = r.id AND r.label = 'Region'
    WHERE e.label = 'in_region'
    ORDER BY nid
    """,
)
def gql_entity_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (n:Nation)-[e:in_region]->(r:Region) "
        "RETURN id(n) AS nid, type(e) AS etype, r.name AS rname ORDER BY nid"
    )


# ---------------------------------------------------------------------------
# Cypher regex predicate `=~` — FULL-string semantics (the lowering
# anchors Spark's substring-searching rlike; the oracle uses DuckDB's
# regexp_full_match). Pattern kept to the Java/RE2-common subset.
# ---------------------------------------------------------------------------
@_q(
    "gql_regex_match",
    GRAPH_CTE
    + """
    SELECT name AS nm FROM vertices
    WHERE label = 'Customer' AND regexp_full_match(name, 'Customer#0+1[0-9](1|7)')
    ORDER BY nm
    """,
)
def gql_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) WHERE c.name =~ 'Customer#0+1[0-9](1|7)' "
        "RETURN c.name AS nm ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# Path variable on a plain pattern: MATCH p = (..)->(..)->(..) binding
# p.path / length(p) (+ nodes()/relationships(), pytest-verified as
# arrays). Beyond the reference's declared grammar (its pest parser
# never compiled — SURVEY §0.1); semantics follow Cypher.
# ---------------------------------------------------------------------------
@_q(
    "gql_path_variable",
    GRAPH_CTE
    + """
    SELECT o.id AS oid,
           o.id::VARCHAR || '->' || c.id::VARCHAR || '->' || n.id::VARCHAR AS path,
           2::BIGINT AS len
    FROM vertices o
    JOIN edges e1 ON o.id = e1.src AND e1.label = 'placed_by'
    JOIN vertices c ON e1.dst = c.id
    JOIN edges e2 ON c.id = e2.src AND e2.label = 'located_in'
    JOIN vertices n ON e2.dst = n.id
    WHERE o.label = 'Order' AND c.label = 'Customer' AND n.label = 'Nation'
      AND o.acctbal > 400000.0
    ORDER BY oid
    """,
)
def gql_path_variable(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH p = (o:Order)-[:placed_by]->(c:Customer)-[:located_in]->(n:Nation) "
        "WHERE o.acctbal > 400000.0 "
        "RETURN o.id AS oid, p.path AS path, length(p) AS len ORDER BY oid"
    )


# ---------------------------------------------------------------------------
# Searched CASE in RETURN as an implicit-grouping key — identical
# CASE WHEN .. THEN .. ELSE .. END semantics in Spark and ANSI SQL.
# ---------------------------------------------------------------------------
@_q(
    "gql_case_expr",
    GRAPH_CTE
    + """
    SELECT CASE WHEN acctbal > 5000.0 THEN 'high'
                WHEN acctbal > 0.0 THEN 'mid'
                ELSE 'low' END AS band,
           count(*) AS n
    FROM vertices WHERE label = 'Customer'
    GROUP BY 1 ORDER BY band
    """,
)
def gql_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) "
        "RETURN CASE WHEN c.acctbal > 5000.0 THEN 'high' "
        "WHEN c.acctbal > 0.0 THEN 'mid' ELSE 'low' END AS band, "
        "count(*) AS n ORDER BY band"
    )


# ---------------------------------------------------------------------------
# Adversarial shortestPath over the supplier co-location CLIQUES (the
# hub-graph gate VERDICT r7 asked for): every supplier pair inside a
# clique of size d is connected, so *1..3 walk enumeration would
# materialize d^3 walks per source (~59M rows at sf0.1) while the
# frontier search's state stays one row per (start, end) pair (~41k).
# All intra-clique pairs are at hop 1; the a.id < b.id WHERE keeps the
# output to unordered pairs and drops the hop-2 self cycles.
# ---------------------------------------------------------------------------
@_q(
    "gql_shortest_path_clique",
    f"""
    SELECT a.s_suppkey::BIGINT + {SUPP} AS a_id,
           b.s_suppkey::BIGINT + {SUPP} AS b_id,
           1::BIGINT AS hops,
           (a.s_suppkey::BIGINT + {SUPP})::VARCHAR || '->' ||
           (b.s_suppkey::BIGINT + {SUPP})::VARCHAR AS path
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    ORDER BY a_id, b_id
    """,
)
def gql_shortest_path_clique(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.suites.algorithms import _supplier_colocation

    eng = GQLEngine(_supplier_colocation(spark, sf_dir))
    return eng.execute(
        "MATCH p = shortestPath((a)-[:colocated*1..3]-(b)) WHERE a.id < b.id "
        "RETURN a.id AS a_id, b.id AS b_id, p.hops AS hops, p.path AS path "
        "ORDER BY a_id, b_id"
    )


# ---------------------------------------------------------------------------
# GQL scalar expressions (beyond the reference's declared grammar):
# arithmetic + - * / with parentheses in WHERE and RETURN, scalar
# functions (toUpper/toLower/length/abs/round/coalesce), aggregates
# over expressions, Cypher implicit grouping on computed keys. Oracles
# restate the identical arithmetic in ANSI SQL — doubles multiply/add
# bit-identically on both engines.
# ---------------------------------------------------------------------------
@_q(
    "gql_expr_arith",
    GRAPH_CTE
    + """
    SELECT name AS nm, acctbal * 2.0 + 100.0 AS adj
    FROM vertices
    WHERE label = 'Customer' AND (acctbal - 1000.0) * 2.0 > 15000.0
    ORDER BY nm
    """,
)
def gql_expr_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) WHERE (c.acctbal - 1000.0) * 2.0 > 15000.0 "
        "RETURN c.name AS nm, c.acctbal * 2.0 + 100.0 AS adj ORDER BY nm"
    )


@_q(
    "gql_expr_functions",
    GRAPH_CTE
    + """
    SELECT upper(mktsegment) AS seg, length(mktsegment) AS seglen,
           count(*) AS n, max(abs(acctbal - 1000.0)) AS maxdev,
           sum(length(name) + 1)::BIGINT AS lensum
    FROM vertices WHERE label = 'Customer'
    GROUP BY upper(mktsegment), length(mktsegment)
    ORDER BY seg
    """,
)
def gql_expr_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar functions as implicit-grouping keys + aggregates over
    computed expressions. The double aggregate is max() (summation
    order changes sum-of-doubles in the last ulps between engines —
    the suite's determinism contract); the sum aggregates an integer
    expression, which is exact."""
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) "
        "RETURN toUpper(c.mktsegment) AS seg, length(c.mktsegment) AS seglen, "
        "count(*) AS n, max(abs(c.acctbal - 1000.0)) AS maxdev, "
        "sum(length(c.name) + 1) AS lensum ORDER BY seg"
    )


# ---------------------------------------------------------------------------
# GQL string/numeric/conversion function surface (r8): substring
# (Cypher 0-indexed, lowered to Spark's 1-indexed builtin), left,
# replace, split (literal delimiter, regex-escaped for Spark), size,
# toInteger (truncating cast), sign (Integer per Cypher), floor (Float
# per Cypher). TPC-H customer names are 'Customer#000000001', so
# toInteger(substring(name, 9)) recovers the customer number — an
# exact, type-checked round-trip through four of the new functions.
# ---------------------------------------------------------------------------
@_q(
    "gql_string_funcs",
    GRAPH_CTE
    + """
    SELECT CAST(substr(name, 10) AS BIGINT) AS custno,
           replace(left(name, 8), 'Customer', 'Cust') AS tag,
           CAST(sign(acctbal - 9500.0) AS BIGINT) AS s,
           CAST(floor(acctbal / 1000.0) AS DOUBLE) AS kbal,
           CAST(len(string_split(name, '0')) AS BIGINT) AS zparts
    FROM vertices
    WHERE label = 'Customer' AND acctbal > 9000.0
    ORDER BY custno
    """,
)
def gql_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) WHERE c.acctbal > 9000.0 "
        "RETURN toInteger(substring(c.name, 9)) AS custno, "
        "replace(left(c.name, 8), 'Customer', 'Cust') AS tag, "
        "sign(c.acctbal - 9500.0) AS s, "
        "floor(c.acctbal / 1000.0) AS kbal, "
        "toInteger(size(split(c.name, '0'))) AS zparts "
        "ORDER BY custno"
    )


# ---------------------------------------------------------------------------
# GQL statistical aggregates (r8): stDev/stDevP (single-pass moment
# aggregation, identical partial-merge shape to sum/avg — map-side
# combine applies), percentileCont (Spark percentile() ≡ DuckDB
# quantile_cont, (n-1)·p interpolation), percentileDisc (Neo4j
# nearest-rank ceil(p·n) ≡ DuckDB quantile_disc — verified; exact via
# per-group sorted collect, with approx_percentile the documented
# corpus-scale path). stdev/cont go through round(.., 2) because the
# two engines' partial-aggregation ORDER differs in the last ulps;
# percentileDisc is an exact element and compares byte-identical.
# ---------------------------------------------------------------------------
@_q(
    "gql_agg_stats",
    GRAPH_CTE
    + """
    SELECT mktsegment AS seg,
           round(stddev_samp(acctbal), 2) AS sd,
           round(stddev_pop(acctbal), 2) AS sdp,
           round(quantile_cont(acctbal, 0.5), 2) AS med,
           quantile_disc(acctbal, 0.9) AS p90
    FROM vertices WHERE label = 'Customer'
    GROUP BY mktsegment ORDER BY seg
    """,
)
def gql_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) "
        "WITH c.mktsegment AS seg, stDev(c.acctbal) AS sd0, "
        "stDevP(c.acctbal) AS sdp0, percentileCont(c.acctbal, 0.5) AS med0, "
        "percentileDisc(c.acctbal, 0.9) AS p90 "
        "RETURN seg, round(sd0, 2) AS sd, round(sdp0, 2) AS sdp, "
        "round(med0, 2) AS med, p90 ORDER BY seg"
    )


# ---------------------------------------------------------------------------
# GQL list surface (r8): UNWIND over a list expression (range() is the
# generator idiom — explode of sequence(), a value table that never
# shuffles), and head/last/tail over a deterministic (sorted) collect.
# ---------------------------------------------------------------------------
@_q(
    "gql_unwind_range",
    """
    SELECT x, x * x AS sq FROM generate_series(1, 200, 3) t(x) ORDER BY x
    """,
)
def gql_unwind_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "UNWIND range(1, 200, 3) AS x RETURN x, x * x AS sq ORDER BY x"
    )


@_q(
    "gql_list_funcs",
    GRAPH_CTE
    + """
    SELECT mktsegment AS seg, min(name) AS first_nm, max(name) AS last_nm,
           CAST(count(*) - 1 AS BIGINT) AS n_rest
    FROM vertices WHERE label = 'Customer'
    GROUP BY mktsegment ORDER BY seg
    """,
)
def gql_list_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect() sorts, so head = min and last = max — the oracle states
    the same facts without materializing per-group lists."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) WITH c.mktsegment AS seg, collect(c.name) AS names "
        "RETURN seg, head(names) AS first_nm, last(names) AS last_nm, "
        "toInteger(size(tail(names))) AS n_rest ORDER BY seg"
    )


# ---------------------------------------------------------------------------
# GQL list comprehensions (r8): [x IN list WHERE pred | expr] →
# filter + transform (higher-order, per-row in codegen). The projected
# values are scalars derived FROM the lists (size / head) because raw
# list columns don't value-hash portably across engines.
# ---------------------------------------------------------------------------
@_q(
    "gql_list_comprehension",
    GRAPH_CTE
    + """
    SELECT name AS nm,
           CAST(len(list_filter(string_split(name, '0'),
                                t -> len(t) > 0)) AS BIGINT) AS nz,
           (list_transform(list_filter(generate_series(1, 10),
                                       x -> x * 1000.0 > acctbal),
                           x -> x * 1000.0))[1] AS ceilk
    FROM vertices WHERE label = 'Customer' AND acctbal > 9900.0
    ORDER BY nm
    """,
)
def gql_list_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) WHERE c.acctbal > 9900.0 "
        "RETURN c.name AS nm, "
        "toInteger(size([t IN split(c.name, '0') WHERE length(t) > 0])) AS nz, "
        "head([x IN range(1, 10) WHERE x * 1000.0 > c.acctbal | x * 1000.0]) "
        "AS ceilk ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL keys() (r8): per-row non-null property names (label excluded —
# it is the entity's TYPE, surfaced by labels()/type()). The gate
# groups the whole graph by label × key-count; the oracle counts
# non-null property columns explicitly.
# ---------------------------------------------------------------------------
@_q(
    "gql_keys_props",
    GRAPH_CTE
    + """
    SELECT label AS lbl,
           CAST((CASE WHEN name IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN acctbal IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN mktsegment IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS nk,
           count(*) AS n
    FROM vertices GROUP BY 1, 2 ORDER BY lbl, nk
    """,
)
def gql_keys_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (v) RETURN v.label AS lbl, toInteger(size(keys(v))) AS nk, "
        "count(*) AS n ORDER BY lbl, nk"
    )


# ---------------------------------------------------------------------------
# GQL % and ^ operators + startNode/endNode (r8). ^ lowers to pow()
# (Float per Cypher; rounded to 4 decimals — libm pow may differ in
# the last ulp across runtimes); endpoint functions are id-valued in
# this data model (the node reference IS its id).
# ---------------------------------------------------------------------------
@_q(
    "gql_arith_entity",
    GRAPH_CTE
    + """
    SELECT e.src AS cid, e.dst AS nid,
           CAST(substr(v1.name, 10) AS BIGINT) % 7 AS m7,
           round(2.0 ** (v1.acctbal / 5000.0), 4) AS pw
    FROM vertices v1
    JOIN edges e ON v1.id = e.src AND e.label = 'located_in'
    WHERE v1.label = 'Customer' AND v1.acctbal > 9000.0
    ORDER BY cid
    """,
)
def gql_arith_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer)-[e:located_in]->(n:Nation) "
        "WHERE c.acctbal > 9000.0 "
        "RETURN startNode(e) AS cid, endNode(e) AS nid, "
        "toInteger(substring(c.name, 9)) % 7 AS m7, "
        "round(2.0 ^ (c.acctbal / 5000.0), 4) AS pw "
        "ORDER BY cid"
    )


# ---------------------------------------------------------------------------
# GQL IN over list expressions (r8): <expr> IN <list-expr> →
# array_contains (per-row, codegen); the literal-list form keeps its
# isin lowering (pushdown-friendly). Computed LHS exercises the
# non-PropRef branch.
# ---------------------------------------------------------------------------
@_q(
    "gql_in_list_expr",
    GRAPH_CTE
    + """
    SELECT name AS nm, acctbal AS bal
    FROM vertices
    WHERE label = 'Customer'
      AND CAST(floor(acctbal / 100.0) AS BIGINT) IN (95, 96, 97, 98, 99)
    ORDER BY nm
    """,
)
def gql_in_list_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) "
        "WHERE toInteger(floor(c.acctbal / 100.0)) IN range(95, 99) "
        "RETURN c.name AS nm, c.acctbal AS bal ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL reduce (r8): reduce(acc = init, x IN list | step) → Spark
# higher-order aggregate(), per-row in codegen. The fold sums the
# lengths of the non-'0' runs of the customer name, whose closed form
# is length(replace(name, '0', '')) — the oracle states that instead
# of re-folding, so the two sides derive the same number two ways.
# ---------------------------------------------------------------------------
@_q(
    "gql_reduce",
    GRAPH_CTE
    + """
    SELECT name AS nm,
           CAST(length(replace(name, '0', '')) AS BIGINT) AS nzchars
    FROM vertices WHERE label = 'Customer' AND acctbal > 9500.0
    ORDER BY nm
    """,
)
def gql_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) WHERE c.acctbal > 9500.0 "
        "RETURN c.name AS nm, "
        "toInteger(reduce(acc = 0, t IN split(c.name, '0') | acc + length(t))) "
        "AS nzchars ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL quantified list predicates (r8): any/all/none/single(x IN list
# WHERE pred) — lowered to Spark higher-order functions (exists /
# forall / filter), evaluated per row inside codegen: no explode, no
# shuffle, no correlated subquery. The oracle restates the quantifiers
# with DuckDB lambda builtins over the same list.
# ---------------------------------------------------------------------------
@_q(
    "gql_quantified_pred",
    GRAPH_CTE
    + """
    SELECT name AS nm, acctbal AS bal
    FROM vertices
    WHERE label = 'Customer'
      AND len(list_filter(generate_series(0, 9),
                          x -> floor(acctbal / 1000.0) = x)) > 0
      AND NOT len(list_filter(generate_series(0, 2),
                              x -> floor(acctbal / 1000.0) = x)) > 0
    ORDER BY nm
    """,
)
def gql_quantified_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) "
        "WHERE any(x IN range(0, 9) WHERE floor(c.acctbal / 1000.0) = x) "
        "AND none(x IN range(0, 2) WHERE floor(c.acctbal / 1000.0) = x) "
        "RETURN c.name AS nm, c.acctbal AS bal ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL ORDER BY expression (r8): computed sort keys — an arithmetic
# distance and a CASE bucket — scoped to the projected output (Cypher's
# sort-on-what-you-returned rule for computed keys; non-projected
# properties are a parse-time error with an alias hint). The LIMIT
# under the computed sort still plans TakeOrderedAndProject. Tie-break
# on name keeps the order total for value-hashing.
# ---------------------------------------------------------------------------
@_q(
    "gql_orderby_expr",
    GRAPH_CTE
    + """
    SELECT name AS nm, acctbal AS bal
    FROM vertices WHERE label = 'Customer'
    ORDER BY CASE WHEN mktsegment = 'BUILDING' THEN 0 ELSE 1 END,
             abs(acctbal - 5000.0), nm
    LIMIT 25
    """,
)
def gql_orderby_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) RETURN c.name AS nm, c.acctbal AS bal, "
        "c.mktsegment AS seg "
        "ORDER BY CASE WHEN seg = 'BUILDING' THEN 0 ELSE 1 END, "
        "abs(bal - 5000.0), nm LIMIT 25"
    ).select("nm", "bal")


# ---------------------------------------------------------------------------
# GQL pattern predicate: WHERE [NOT] EXISTS((v)-[:LBL]->(u)) — lowered
# as a LEFT SEMI / LEFT ANTI join on the shared variables' ids (the
# Spark-natural correlated-subquery rewrite). The gate query combines a
# NOT EXISTS with a residual column conjunct to exercise the top-level
# AND split.
# ---------------------------------------------------------------------------
@_q(
    "gql_exists_pattern",
    GRAPH_CTE
    + """
    SELECT c.name AS nm, c.acctbal AS bal
    FROM vertices c
    WHERE c.label = 'Customer' AND c.acctbal > 1000.0
      AND NOT EXISTS (
        SELECT 1 FROM edges e JOIN vertices o ON e.src = o.id
        WHERE e.dst = c.id AND e.label = 'placed_by' AND o.label = 'Order'
          AND o.name = 'F'
      )
    ORDER BY nm
    """,
)
def gql_exists_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) "
        "WHERE NOT EXISTS((c)<-[:placed_by]-(o:Order {name: 'F'})) AND c.acctbal > 1000.0 "
        "RETURN c.name AS nm, c.acctbal AS bal ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL pipeline top-k: WITH .. ORDER BY .. LIMIT before RETURN (the
# Cypher idiom for "aggregate, keep the top n, continue"). The LIMIT
# under the sort plans TakeOrderedAndProject — bounded per-partition
# heaps, no global sort materialization.
# ---------------------------------------------------------------------------
@_q(
    "gql_with_orderby_limit",
    GRAPH_CTE
    + """
    SELECT nation, n_cust FROM (
        SELECT n.name AS nation, count(*) AS n_cust
        FROM vertices c
        JOIN edges e ON c.id = e.src AND e.label = 'located_in'
        JOIN vertices n ON e.dst = n.id AND n.label = 'Nation'
        WHERE c.label = 'Customer'
        GROUP BY n.name
        ORDER BY n_cust DESC, nation
        LIMIT 3
    )
    ORDER BY nation
    """,
)
def gql_with_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH n.name AS nation, count(c) AS n_cust "
        "ORDER BY n_cust DESC, nation LIMIT 3 "
        "RETURN nation, n_cust ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL UNION (dedup) between full read queries — Cypher semantics (beyond
# the reference: its gql.pest never compiled, SURVEY §0.1). The two parts
# project OVERLAPPING segment sets, so the dedup is observable (plain
# concatenation would return ~2x the rows).
# ---------------------------------------------------------------------------
@_q(
    "gql_union",
    GRAPH_CTE
    + """
    SELECT mktsegment AS seg FROM vertices
    WHERE label = 'Customer' AND acctbal > 9000.0
    UNION
    SELECT mktsegment AS seg FROM vertices
    WHERE label = 'Customer' AND acctbal < 1000.0
    """,
)
def gql_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) WHERE c.acctbal > 9000.0 RETURN c.mktsegment AS seg "
        "UNION "
        "MATCH (c:Customer) WHERE c.acctbal < 1000.0 RETURN c.mktsegment AS seg"
    )


# ---------------------------------------------------------------------------
# GQL UNION ALL — keeps duplicates (bag concatenation, zero shuffle: a
# unionByName of the two branch plans).
# ---------------------------------------------------------------------------
@_q(
    "gql_union_all",
    GRAPH_CTE
    + """
    SELECT name AS nm FROM vertices WHERE label = 'Supplier'
    UNION ALL
    SELECT name AS nm FROM vertices
    WHERE label = 'Customer' AND acctbal > 8000.0
    """,
)
def gql_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (s:Supplier) RETURN s.name AS nm "
        "UNION ALL "
        "MATCH (c:Customer) WHERE c.acctbal > 8000.0 RETURN c.name AS nm"
    )


# ---------------------------------------------------------------------------
# GQL allShortestPaths on a diamond fixture with THREE tied 2-hop paths
# (1->2->5, 1->3->5, 1->4->5) plus a longer decoy route (1->6->7->5) and
# a noise edge (2->3): one row per tied-minimum path (Cypher), where
# shortestPath returns only the lexicographic winner. Oracle: recursive
# walk enumeration + min-hop filter.
# ---------------------------------------------------------------------------
_ASP_EDGES = [(1, 2), (1, 3), (1, 4), (2, 5), (3, 5), (4, 5), (1, 6), (6, 7), (7, 5), (2, 3)]


@_q(
    "gql_all_shortest_paths",
    f"""
    WITH RECURSIVE e(src, dst) AS (VALUES {", ".join(f"({s}, {d})" for s, d in _ASP_EDGES)}),
    walks(dst, hops, path) AS (
        SELECT dst, 1, '1->' || dst::VARCHAR FROM e WHERE src = 1
        UNION ALL
        SELECT x.dst, w.hops + 1, w.path || '->' || x.dst::VARCHAR
        FROM walks w JOIN e x ON w.dst = x.src WHERE w.hops < 4
    )
    SELECT hops::BIGINT AS hops, path FROM walks
    WHERE dst = 5 AND hops = (SELECT MIN(hops) FROM walks WHERE dst = 5)
    """,
)
def gql_all_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.suites.algorithms import fixture_graph

    g = fixture_graph(spark, range(1, 8), _ASP_EDGES)
    eng = GQLEngine(g)
    return eng.execute(
        "MATCH p = allShortestPaths((a {id: 1})-[:link*1..4]->(b {id: 5})) "
        "RETURN p.hops AS hops, p.path AS path"
    )


# ---------------------------------------------------------------------------
# GQL temporal surface over an events-derived graph (event vertices carry
# a real timestamp property): date()/datetime() conversion, duration()
# interval arithmetic in WHERE, and postfix component access
# (.week / .dayofweek — ISO 1=Monday on both engines) feeding an
# implicit-grouping aggregate.
# ---------------------------------------------------------------------------
@_q(
    "gql_temporal",
    """
    SELECT week(ts)::BIGINT AS wk, isodow(ts)::BIGINT AS dow,
           COUNT(*) AS n_events
    FROM events
    WHERE ts + INTERVAL 12 HOUR >= TIMESTAMP '2024-01-15 00:00:00'
      AND CAST(ts AS DATE) >= DATE '2024-01-10'
    GROUP BY wk, dow ORDER BY wk, dow
    """,
)
def gql_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.graph import read_events

    ev = read_events(spark, sf_dir)
    verts = ev.select(
        F.col("event_id").cast("long").alias("id"),
        F.lit("Event").alias("label"),
        F.col("ts"),
    )
    edges = ev.select(
        F.col("event_id").cast("long").alias("src"),
        F.col("user_id").cast("long").alias("dst"),
        F.lit("by").alias("label"),
    )
    eng = GQLEngine(PropertyGraph(verts, edges))
    return eng.execute(
        "MATCH (e:Event) "
        "WHERE e.ts + duration('PT12H') >= datetime('2024-01-15T00:00:00') "
        "AND date(e.ts) >= date('2024-01-10') "
        "RETURN e.ts.week AS wk, e.ts.dayofweek AS dow, count(e) AS n_events "
        "ORDER BY wk, dow"
    )


# ---------------------------------------------------------------------------
# GQL COUNT { } counting subquery (Cypher 5; r9): per-customer order
# counts — one in the WHERE (threshold) and one with an inner WHERE in
# the RETURN. Lowered as grouped counts LEFT-joined on the shared
# variable's id (partial-agg shuffle on the inner side, no correlated
# execution); the oracle restates it as a grouped LEFT JOIN.
# ---------------------------------------------------------------------------
@_q(
    "gql_count_subquery",
    GRAPH_CTE
    + """
    , cnt AS (
        SELECT e.dst AS c_id,
               count(*) AS n_all,
               count(*) FILTER (WHERE v.acctbal > 200000.0) AS n_big
        FROM edges e
        JOIN vertices v ON v.id = e.src AND v.label = 'Order'
        WHERE e.label = 'placed_by'
        GROUP BY e.dst
    )
    SELECT c.name AS nm, COALESCE(cnt.n_big, 0) AS big_orders
    FROM vertices c
    LEFT JOIN cnt ON cnt.c_id = c.id
    WHERE c.label = 'Customer' AND COALESCE(cnt.n_all, 0) >= 15
    ORDER BY nm
    """,
)
def gql_count_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) "
        "WHERE COUNT { (o:Order)-[:placed_by]->(c) } >= 15 "
        "RETURN c.name AS nm, "
        "COUNT { (o:Order)-[:placed_by]->(c) WHERE o.acctbal > 200000.0 } "
        "AS big_orders ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL EXISTS { } block subquery (Cypher 5; r9): the block form carries
# an inner WHERE applied to the subquery's own matches — suppliers
# located in a nation that has at least one high-balance customer.
# Same LEFT SEMI join lowering as EXISTS(pattern), with the inner
# predicate folded into the subquery frame.
# ---------------------------------------------------------------------------
@_q(
    "gql_exists_block",
    GRAPH_CTE
    + """
    SELECT s.name AS nm
    FROM vertices s
    JOIN edges e ON e.src = s.id AND e.label = 'located_in'
    JOIN vertices n ON n.id = e.dst AND n.label = 'Nation'
    WHERE s.label = 'Supplier' AND EXISTS (
        SELECT 1 FROM edges e2
        JOIN vertices c ON c.id = e2.src AND c.label = 'Customer'
        WHERE e2.label = 'located_in' AND e2.dst = n.id
          AND c.acctbal > 9900.0
    )
    ORDER BY nm
    """,
)
def gql_exists_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (s:Supplier)-[:located_in]->(n:Nation) "
        "WHERE EXISTS { MATCH (c:Customer)-[:located_in]->(n) "
        "WHERE c.acctbal > 9900.0 } "
        "RETURN s.name AS nm ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL pattern comprehension (Cypher; r9): per-nation sorted list of its
# high-balance suppliers' names — a list-valued correlated subquery in
# the RETURN, lowered as a grouped collect_list LEFT-joined on the
# shared variable's id (the engine sorts the list for determinism).
# Arrays join to comma strings for one canonical value-hash rendering
# on both engines (same convention as gql_collect_nations).
# ---------------------------------------------------------------------------
@_q(
    "gql_pattern_comprehension",
    GRAPH_CTE
    + """
    , agg AS (
        SELECT e.dst AS n_id,
               array_to_string(list_sort(list(s.name)), ',') AS rich
        FROM edges e
        JOIN vertices s ON s.id = e.src AND s.label = 'Supplier'
        WHERE e.label = 'located_in' AND s.acctbal > 9000.0
        GROUP BY e.dst
    )
    SELECT n.name AS nm, COALESCE(agg.rich, '') AS rich_suppliers
    FROM vertices n
    LEFT JOIN agg ON agg.n_id = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm
    """,
)
def gql_pattern_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) RETURN n.name AS nm, "
        "[(s:Supplier)-[:located_in]->(n) WHERE s.acctbal > 9000.0 | s.name] "
        "AS rich_suppliers ORDER BY nm"
    )
    return out.select(
        "nm", F.array_join("rich_suppliers", ",").alias("rich_suppliers")
    )


# ---------------------------------------------------------------------------
# GQL CALL { } subquery (Cypher; r9): the canonical post-UNION-
# processing idiom — a UNION ALL of customer and supplier balances per
# nation inside the braces, aggregated by the outer RETURN. The body
# lowers to its own optimized plan (a derived table); the outer
# aggregation is the only added shuffle.
# ---------------------------------------------------------------------------
@_q(
    "gql_call_subquery",
    GRAPH_CTE
    + """
    SELECT nm, count(bal) AS n_accounts,
           max(bal) AS max_bal
    FROM (
        SELECT n.name AS nm, c.acctbal AS bal
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'located_in'
        JOIN vertices n ON n.id = e.dst AND n.label = 'Nation'
        WHERE c.label = 'Customer'
        UNION ALL
        SELECT n.name, s.acctbal
        FROM vertices s
        JOIN edges e ON e.src = s.id AND e.label = 'located_in'
        JOIN vertices n ON n.id = e.dst AND n.label = 'Nation'
        WHERE s.label = 'Supplier'
    ) GROUP BY nm ORDER BY nm
    """,
)
def gql_call_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "CALL { "
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "RETURN n.name AS nm, c.acctbal AS bal "
        "UNION ALL "
        "MATCH (s:Supplier)-[:located_in]->(n:Nation) "
        "RETURN n.name AS nm, s.acctbal AS bal "
        "} RETURN nm, count(bal) AS n_accounts, max(bal) AS max_bal "
        "ORDER BY nm"
    )
    # max over DOUBLE is exact (no summation drift) — both engines
    # return the same float bit pattern, no decimal canonicalization
    return out


# ---------------------------------------------------------------------------
# GQL WITH DISTINCT + XOR (r9): dedup the projected (nation, segment)
# pairs, then keep exactly-one-of-two conditions. XOR lowers to boolean
# inequality (three-valued semantics free); precedence OR < XOR < AND.
# ---------------------------------------------------------------------------
@_q(
    "gql_with_distinct_xor",
    GRAPH_CTE
    + """
    SELECT nm, seg FROM (
        SELECT DISTINCT n.name AS nm, c.mktsegment AS seg
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'located_in'
        JOIN vertices n ON n.id = e.dst AND n.label = 'Nation'
        WHERE c.label = 'Customer'
    ) WHERE (nm LIKE '%1%') <> (seg = 'BUILDING')
    ORDER BY nm, seg
    """,
)
def gql_with_distinct_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH DISTINCT n.name AS nm, c.mktsegment AS seg "
        "WHERE nm CONTAINS '1' XOR seg = 'BUILDING' "
        "RETURN nm, seg ORDER BY nm, seg"
    )


# ---------------------------------------------------------------------------
# GQL map projection (r9): v {.p1, .p2} — JSON rendering of the
# selected properties in source order (same convention as
# properties(v)). The oracle rebuilds the exact JSON text by concat —
# the projected values are JSON-safe TPC-H strings.
# ---------------------------------------------------------------------------
@_q(
    "gql_map_projection",
    GRAPH_CTE
    + """
    SELECT name AS nm,
           '{"name":"' || name || '","mktsegment":"' || mktsegment || '"}' AS m
    FROM vertices
    WHERE label = 'Customer' AND acctbal > 9900.0
    ORDER BY nm
    """,
)
def gql_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) WHERE c.acctbal > 9900.0 "
        "RETURN c.name AS nm, c {.name, .mktsegment} AS m ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# COUNT { } in WITH..WHERE AND in a post-WITH RETURN (r10 — previously
# rejected positions, VERDICT r9 #4): the subqueries attach to the WITH
# intermediate and correlate on the passthrough variable's surviving
# binding columns — still grouped joins, no correlated execution.
# ---------------------------------------------------------------------------
@_q(
    "gql_count_with_where",
    GRAPH_CTE
    + """
    , cnt AS (
        SELECT e.dst AS c_id, count(*) AS n
        FROM edges e
        JOIN vertices o ON o.id = e.src AND o.label = 'Order'
        WHERE e.label = 'placed_by'
        GROUP BY e.dst
    )
    SELECT c.mktsegment AS seg, c.name AS nm, cnt.n AS n_orders
    FROM vertices c
    JOIN cnt ON cnt.c_id = c.id
    WHERE c.label = 'Customer' AND cnt.n >= 20
    ORDER BY nm
    """,
)
def gql_count_with_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer) WITH c, c.mktsegment AS seg "
        "WHERE COUNT { (o:Order)-[:placed_by]->(c) } >= 20 "
        "RETURN seg, c.name AS nm, "
        "COUNT { (o:Order)-[:placed_by]->(c) } AS n_orders ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# Pattern comprehension in a post-WITH RETURN, after WITH DISTINCT
# (r10): the comprehension attaches AFTER the dedup (so DISTINCT sees
# only projected columns) and projects per passthrough nation.
# ---------------------------------------------------------------------------
@_q(
    "gql_collect_post_with",
    GRAPH_CTE
    + """
    , hassup AS (
        SELECT DISTINCT e.dst AS n_id
        FROM edges e
        JOIN vertices s ON s.id = e.src AND s.label = 'Supplier'
        WHERE e.label = 'located_in'
    ),
    agg AS (
        SELECT e.dst AS n_id,
               array_to_string(list_sort(list(s.name)), ',') AS rich
        FROM edges e
        JOIN vertices s ON s.id = e.src AND s.label = 'Supplier'
        WHERE e.label = 'located_in' AND s.acctbal > 9000.0
        GROUP BY e.dst
    )
    SELECT n.name AS nm, COALESCE(agg.rich, '') AS rich_suppliers
    FROM vertices n
    JOIN hassup ON hassup.n_id = n.id
    LEFT JOIN agg ON agg.n_id = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm
    """,
)
def gql_collect_post_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (s:Supplier)-[:located_in]->(n:Nation) WITH DISTINCT n "
        "RETURN n.name AS nm, "
        "[(c:Supplier)-[:located_in]->(n) WHERE c.acctbal > 9000.0 | c.name] "
        "AS rich_suppliers ORDER BY nm"
    )
    return out.select(
        "nm", F.array_join("rich_suppliers", ",").alias("rich_suppliers")
    )


# ---------------------------------------------------------------------------
# Correlated CALL { WITH n .. } with an AGGREGATING body (r10 — VERDICT
# r9 #3): lowered as ONE grouped join on the imported variable's id
# witness (extra_keys in _project), LEFT-joined so every nation appears
# with count 0 / empty list when it has no suppliers — no per-row
# re-execution.
# ---------------------------------------------------------------------------
@_q(
    "gql_call_correlated",
    GRAPH_CTE
    + """
    , agg AS (
        SELECT e.dst AS n_id, count(*) AS n_sup,
               array_to_string(list_sort(list(s.name)), ',') AS sups
        FROM edges e
        JOIN vertices s ON s.id = e.src AND s.label = 'Supplier'
        WHERE e.label = 'located_in'
        GROUP BY e.dst
    )
    SELECT n.name AS nm, COALESCE(agg.n_sup, 0) AS n_sup,
           COALESCE(agg.sups, '') AS sups
    FROM vertices n
    LEFT JOIN agg ON agg.n_id = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm
    """,
)
def gql_call_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) CALL { WITH n "
        "MATCH (s:Supplier)-[:located_in]->(n) "
        "RETURN count(s) AS n_sup, collect(s.name) AS sups } "
        "RETURN n.name AS nm, n_sup, sups ORDER BY nm"
    )
    return out.select("nm", "n_sup", F.array_join("sups", ",").alias("sups"))


# ---------------------------------------------------------------------------
# Correlated CALL with a STREAMING (non-aggregating) body: INNER-join
# semantics — outer rows whose subquery produced nothing drop (Cypher).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_correlated_rows",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, c.name AS cn
    FROM vertices c
    JOIN edges e ON e.src = c.id AND e.label = 'located_in'
    JOIN vertices n ON n.id = e.dst AND n.label = 'Nation'
    WHERE c.label = 'Customer' AND c.acctbal > 9900.0
    ORDER BY nm, cn
    """,
)
def gql_call_correlated_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) CALL { WITH n "
        "MATCH (c:Customer)-[:located_in]->(n) WHERE c.acctbal > 9900.0 "
        "RETURN c.name AS cn } "
        "RETURN n.name AS nm, cn ORDER BY nm, cn"
    )


# ---------------------------------------------------------------------------
# Correlated CALL with per-outer-row ORDER BY/LIMIT (top-k per binding):
# lowered as ONE row_number window over the imported-id keys of the
# derived body table — never per-row body re-execution (round 11).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_topk",
    GRAPH_CTE
    + """
    , ranked AS (
        SELECT n.name AS nm, s.name AS sn, s.acctbal AS bal,
               row_number() OVER (
                   PARTITION BY n.id ORDER BY s.acctbal DESC, s.name ASC
               ) AS rn
        FROM vertices n
        JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
        JOIN vertices s ON s.id = e.src AND s.label = 'Supplier'
        WHERE n.label = 'Nation'
    )
    SELECT nm, sn, bal FROM ranked WHERE rn <= 2 ORDER BY nm, sn
    """,
)
def gql_call_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 suppliers by account balance per nation, computed INSIDE a
    correlated CALL body (ORDER BY .. LIMIT per outer row)."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) CALL { WITH n "
        "MATCH (s:Supplier)-[:located_in]->(n) "
        "RETURN s.name AS sn, s.acctbal AS bal "
        "ORDER BY bal DESC, sn ASC LIMIT 2 } "
        "RETURN n.name AS nm, sn, bal ORDER BY nm, sn"
    )


# ---------------------------------------------------------------------------
# Correlated CALL body with a WITH pipeline (round 11, second session):
# the body's grouped aggregate + WHERE (the HAVING idiom) evaluates PER
# IMPORTED BINDING — implicit grouping keyed by (nation witness,
# segment), one derived table, no per-row re-execution. Mixed grouped
# aggregation over empty input yields zero groups, so nations whose
# every segment fails the threshold drop (INNER join-back).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_with_pipeline",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, c.mktsegment AS seg, count(*) AS k
    FROM vertices n
    JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
    JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
    WHERE n.label = 'Nation'
    GROUP BY n.name, c.mktsegment
    HAVING count(*) >= 12
    ORDER BY nm, seg
    """,
)
def gql_call_with_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation market segments holding >= 12 customers — grouped
    aggregate + HAVING computed INSIDE a correlated CALL body's WITH
    pipeline."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) CALL { WITH n "
        "MATCH (c:Customer)-[:located_in]->(n) "
        "WITH c.mktsegment AS seg, count(c) AS k WHERE k >= 12 "
        "RETURN seg, k } "
        "RETURN n.name AS nm, seg, k ORDER BY nm, seg"
    )


# ---------------------------------------------------------------------------
# Correlated CALL body: WITH ORDER BY/LIMIT (per-witness row_number
# window) feeding a pure-aggregate collect() — nations with NO
# qualifying customer keep an empty list (outer-witness seed + LEFT
# join, Cypher's one-row-per-outer-row aggregate contract).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_with_topk_collect",
    GRAPH_CTE
    + """
    , ranked AS (
        SELECT n.id AS nid, c.name AS cn,
               row_number() OVER (
                   PARTITION BY n.id ORDER BY c.name ASC
               ) AS rn
        FROM vertices n
        JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
        JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
        WHERE n.label = 'Nation' AND c.acctbal > 9000.0
    ), agg AS (
        SELECT nid, array_to_string(list_sort(list(cn)), ',') AS top2
        FROM ranked WHERE rn <= 2 GROUP BY nid
    )
    SELECT n.name AS nm, COALESCE(agg.top2, '') AS top2
    FROM vertices n
    LEFT JOIN agg ON agg.nid = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm
    """,
)
def gql_call_with_topk_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-2 (by name) rich customers per nation, collected inside
    the body: WITH ORDER BY/LIMIT top-k then collect() — empty nations
    keep []."""
    out = GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) CALL { WITH n "
        "MATCH (c:Customer)-[:located_in]->(n) WHERE c.acctbal > 9000.0 "
        "WITH c.name AS cn ORDER BY cn ASC LIMIT 2 "
        "RETURN collect(cn) AS top2 } "
        "RETURN n.name AS nm, top2 ORDER BY nm"
    )
    return out.select("nm", F.array_join("top2", ",").alias("top2"))


# ---------------------------------------------------------------------------
# Label / edge-type alternation (Cypher (n:A|B), -[:X|Y]->): lowered as
# isin over literals — same pushdown-friendly scan shape as the
# single-label equality, no union of per-label plans.
# ---------------------------------------------------------------------------
@_q(
    "gql_label_alternation",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, x.label AS kind, count(*) AS k
    FROM vertices n
    JOIN edges e ON e.dst = n.id AND e.label IN ('located_in', 'placed_by')
    JOIN vertices x ON x.id = e.src AND x.label IN ('Customer', 'Supplier')
    WHERE n.label = 'Nation'
    GROUP BY n.name, x.label
    ORDER BY nm, kind
    """,
)
def gql_label_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers AND suppliers per nation through one alternated
    pattern — (x:Customer|Supplier)-[:located_in|placed_by]->(n)."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (x:Customer|Supplier)-[:located_in|placed_by]->(n:Nation) "
        "RETURN n.name AS nm, head(labels(x)) AS kind, count(x) AS k "
        "ORDER BY nm, kind"
    )


# ---------------------------------------------------------------------------
# Query parameters ($name, Cypher convention): token-level literal
# substitution before parsing — the lowered plan is IDENTICAL to the
# literal spelling (pushdown included), and values are legal exactly
# where literals are (props, WHERE operands, IN lists, LIMIT counts).
# ---------------------------------------------------------------------------
@_q(
    "gql_parameters",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, count(*) AS k
    FROM vertices n
    JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
    JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
    WHERE n.label = 'Nation' AND c.acctbal > 8000.0
      AND c.mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY n.name
    ORDER BY nm LIMIT 10
    """,
)
def gql_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same plan as its literal spelling, driven entirely by $min /
    $segs / $top bindings."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WHERE c.acctbal > $min AND c.mktsegment IN $segs "
        "RETURN n.name AS nm, count(c) AS k ORDER BY nm LIMIT $top",
        params={"min": 8000.0, "segs": ["BUILDING", "MACHINERY"], "top": 10},
    )


# ---------------------------------------------------------------------------
# Inline pattern predicates (Cypher 5 (n WHERE p)): parse-time desugar
# into the clause WHERE — one condition tree reaches the lowerer, so
# pushdown/pruning see exactly the same plan as the spelled-out form.
# ---------------------------------------------------------------------------
@_q(
    "gql_inline_where",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, count(*) AS k
    FROM vertices n
    JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
    JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
    WHERE n.label = 'Nation' AND c.acctbal > 9000.0
      AND n.name LIKE 'NATION_1%'
    GROUP BY n.name
    ORDER BY nm
    """,
)
def gql_inline_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich customers per NATION_1*-nation, both filters inline in the
    pattern ((c WHERE ..)-[:located_in]->(n WHERE ..))."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (c:Customer WHERE c.acctbal > 9000.0)-[:located_in]->"
        "(n:Nation WHERE n.name STARTS WITH 'NATION_1') "
        "RETURN n.name AS nm, count(c) AS k ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# OPTIONAL CALL (Cypher 25): outer rows whose body produced nothing are
# KEPT with NULL body outputs — the streaming join-back flips to LEFT
# (same single derived table; no coalesce, NULL is the contract).
# ---------------------------------------------------------------------------
@_q(
    "gql_optional_call",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, rich.cn AS cn
    FROM vertices n
    LEFT JOIN (
        SELECT e.dst AS nid, c.name AS cn
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'located_in'
        WHERE c.label = 'Customer' AND c.acctbal > 9900.0
    ) rich ON rich.nid = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm, cn
    """,
)
def gql_optional_call(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every nation with its >9900-balance customers; nations holding
    none stay in the result with a NULL name (OPTIONAL CALL keeps
    empty-body outer rows)."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) OPTIONAL CALL { WITH n "
        "MATCH (c:Customer)-[:located_in]->(n) WHERE c.acctbal > 9900.0 "
        "RETURN c.name AS cn } "
        "RETURN n.name AS nm, cn ORDER BY nm, cn"
    )


# ---------------------------------------------------------------------------
# Nested correlated CALL (round 11, second session): CALL inside a CALL
# body — the grouped-join lowering recurses, so every nesting level is
# one more derived-table join, never per-row re-execution at any depth.
# ---------------------------------------------------------------------------
@_q(
    "gql_nested_call",
    GRAPH_CTE
    + """
    SELECT n.name AS nm, COALESCE(cnt.total, 0) AS n_orders
    FROM vertices n
    LEFT JOIN (
        SELECT e.dst AS nid, COUNT(o.id) AS total
        FROM vertices c
        JOIN edges e ON e.src = c.id AND e.label = 'located_in'
        LEFT JOIN edges po ON po.label = 'placed_by' AND po.dst = c.id
        LEFT JOIN vertices o ON o.id = po.src AND o.label = 'Order'
        WHERE c.label = 'Customer'
        GROUP BY e.dst
    ) cnt ON cnt.nid = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm
    """,
)
def gql_nested_call(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders held by each nation's customers, computed as a nested
    correlated CALL: the inner body counts per customer (coalescing
    order-less customers to 0), the outer body sums per nation."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) CALL { WITH n "
        "MATCH (c:Customer)-[:located_in]->(n) "
        "CALL { WITH c MATCH (o:Order)-[:placed_by]->(c) "
        "RETURN count(o) AS k } "
        "RETURN sum(k) AS n_orders } "
        "RETURN n.name AS nm, n_orders ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# Nested subqueries (round 11): COUNT{} inside an EXISTS body's WHERE.
# Every nesting level stays a derived-table join (grouped count joined
# onto the EXISTS frame, then a semi-join against the outer bindings) —
# no correlated re-execution at any depth.
# ---------------------------------------------------------------------------
@_q(
    "gql_nested_exists",
    GRAPH_CTE
    + """
    SELECT DISTINCT n.name AS nm
    FROM vertices n
    JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
    JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
    WHERE n.label = 'Nation'
      AND (SELECT count(*) FROM edges o
           WHERE o.label = 'placed_by' AND o.dst = c.id) >= 18
    ORDER BY nm
    """,
)
def gql_nested_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with at least one customer holding >= 18 orders — the
    order count is a COUNT{} nested inside the EXISTS body's WHERE."""
    return GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) WHERE EXISTS { (c:Customer)-[:located_in]->(n) "
        "WHERE COUNT { (o:Order)-[:placed_by]->(c) } >= 18 } "
        "RETURN n.name AS nm ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# Pattern comprehension yielding MAP PROJECTIONS (round 11):
# [(s)-[:located_in]->(n) | s {.name}] — the comprehension's grouped
# collect_list over JSON-rendered map elements, sorted for determinism.
# ---------------------------------------------------------------------------
@_q(
    "gql_map_comprehension",
    GRAPH_CTE
    + """
    , agg AS (
        SELECT e.dst AS n_id,
               array_to_string(
                   list_sort(list('{"name":"' || s.name || '"}')), '|'
               ) AS ms
        FROM edges e
        JOIN vertices s ON s.id = e.src AND s.label = 'Supplier'
        WHERE e.label = 'located_in'
        GROUP BY e.dst
    )
    SELECT n.name AS nm, COALESCE(agg.ms, '') AS ms
    FROM vertices n LEFT JOIN agg ON agg.n_id = n.id
    WHERE n.label = 'Nation'
    ORDER BY nm
    """,
)
def gql_map_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = GQLEngine(materialized_tpch_graph(spark, sf_dir)).execute(
        "MATCH (n:Nation) RETURN n.name AS nm, "
        "[(s:Supplier)-[:located_in]->(n) | s {.name}] AS ms ORDER BY nm"
    )
    return out.select("nm", F.array_join("ms", "|").alias("ms"))


# ---------------------------------------------------------------------------
# GQL: native multi-WITH pipeline chain (round 12) — three stages: an
# aggregating WITH, a filtering WITH over the aggregate aliases, a
# computing WITH; the RETURN projects the final stage's aliases. Spark
# shape: ONE shuffle (the stage-1 aggregation); stages 2-3 are pure
# projections fused by Catalyst into the same whole-stage-codegen span.
# Beyond the reference (its grammar has no WITH at all —
# graph/query/src/gql.pest:28-42); Cypher multi-WITH semantics are the
# bar.
# ---------------------------------------------------------------------------
@_q(
    "gql_multi_with",
    GRAPH_CTE
    + """
    SELECT nation, n_cust * 2 AS score
    FROM (
        SELECT n.name AS nation, COUNT(*) AS n_cust
        FROM vertices c
        JOIN edges e ON c.id = e.src AND e.label = 'located_in'
        JOIN vertices n ON e.dst = n.id
        WHERE c.label = 'Customer' AND n.label = 'Nation'
        GROUP BY n.name
    ) WHERE n_cust > 25
    ORDER BY nation
    """,
)
def gql_multi_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH n.name AS nation, count(*) AS n_cust "
        "WITH nation, n_cust WHERE n_cust > 25 "
        "WITH nation, n_cust * 2 AS score "
        "RETURN nation, score ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL: WITH * pass-everything stage (round 12) — filter the whole
# in-scope frame without re-projecting (everyday Cypher), then
# aggregate in a second stage. Spark shape: the * stage is a pure
# column-pruned projection + filter, fused into the scan.
# ---------------------------------------------------------------------------
@_q(
    "gql_with_star",
    GRAPH_CTE
    + """
    SELECT n.name AS nation, COUNT(*) AS rich
    FROM vertices c
    JOIN edges e ON c.id = e.src AND e.label = 'located_in'
    JOIN vertices n ON e.dst = n.id
    WHERE c.label = 'Customer' AND n.label = 'Nation'
      AND c.acctbal > 9000.0
    GROUP BY n.name
    ORDER BY nation
    """,
)
def gql_with_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH * WHERE c.acctbal > 9000.0 "
        "WITH n.name AS nation, count(*) AS rich "
        "RETURN nation, rich ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL: EXISTS pattern predicate inside WITH..WHERE (round 12) — the
# semi-join rewrite applied to the WITH intermediate, correlating on
# the passthrough variable's id witness; composes with a residual
# bare-alias condition in the same WHERE.
# ---------------------------------------------------------------------------
@_q(
    "gql_with_where_exists",
    GRAPH_CTE
    + """
    SELECT c.name AS nm
    FROM vertices c
    WHERE c.label = 'Customer' AND c.acctbal > 8000.0
      AND EXISTS (
        SELECT 1 FROM edges e
        WHERE e.dst = c.id AND e.label = 'placed_by'
      )
    ORDER BY nm
    """,
)
def gql_with_where_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer) WITH c, c.acctbal AS bal "
        "WHERE EXISTS((o:Order)-[:placed_by]->(c)) AND bal > 8000.0 "
        "RETURN c.name AS nm ORDER BY nm"
    )


# ---------------------------------------------------------------------------
# GQL: leading UNWIND inside a correlated CALL body (round 12) — the
# body explodes a literal list per binding BEFORE its MATCH, so the
# pure-aggregate outputs scale by the list: c2 = 2 × matches,
# st = (1+2) × matches; nations with no qualifying customers keep one
# row (LEFT join-back, count→0 / sum→0 identities).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_unwind",
    GRAPH_CTE
    + """
    SELECT n.name AS nation,
           2 * COALESCE(s.cnt, 0) AS c2,
           3 * COALESCE(s.cnt, 0) AS st
    FROM vertices n
    LEFT JOIN (
        SELECT e.dst AS nid, COUNT(*) AS cnt
        FROM vertices c
        JOIN edges e ON c.id = e.src AND e.label = 'located_in'
        WHERE c.label = 'Customer' AND c.acctbal > 5000.0
        GROUP BY e.dst
    ) s ON s.nid = n.id
    WHERE n.label = 'Nation'
    ORDER BY nation
    """,
)
def gql_call_unwind(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (n:Nation) "
        "CALL { WITH n UNWIND [1, 2] AS t "
        "MATCH (c:Customer)-[:located_in]->(n) WHERE c.acctbal > 5000.0 "
        "RETURN count(*) AS c2, sum(t) AS st } "
        "RETURN n.name AS nation, c2, st ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL: multi-WITH chain INSIDE a correlated CALL body (round 12) —
# stage 1 projects+filters per outer binding, stage 2 is a pure
# aggregate that re-seeds one row per outer nation (count→0, sum→0
# over empty input — Cypher's per-row contract). Float determinism:
# both sides round the DECIMAL-cast sum to 2 decimals after
# aggregation (the gql_agg_sum_avg contract).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_with_chain",
    GRAPH_CTE
    + """
    SELECT n.name AS nation, COALESCE(s.nc, 0) AS nc,
           ROUND(COALESCE(s.total, 0), 2) AS total
    FROM vertices n
    LEFT JOIN (
        SELECT e.dst AS nid, COUNT(*) AS nc,
               SUM(c.acctbal::DECIMAL(18,2))::DOUBLE AS total
        FROM vertices c
        JOIN edges e ON c.id = e.src AND e.label = 'located_in'
        WHERE c.label = 'Customer' AND c.acctbal > 5000.0
        GROUP BY e.dst
    ) s ON s.nid = n.id
    WHERE n.label = 'Nation'
    ORDER BY nation
    """,
)
def gql_call_with_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (n:Nation) "
        "CALL { WITH n MATCH (c:Customer)-[:located_in]->(n) "
        "WITH c.acctbal AS bal WHERE bal > 5000.0 "
        "WITH count(*) AS nc, sum(bal) AS total "
        "RETURN nc, total } "
        "RETURN n.name AS nation, nc, round(total, 2) AS total "
        "ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL: WITH * and RETURN * inside a correlated CALL body (round 13) —
# the star stage keeps the whole body frame per outer binding (its
# WHERE filters on a passthrough variable's property), a scalar WITH
# then reduces the scope to named columns, and RETURN * star-exports
# them with a per-outer-row top-k (ORDER BY/LIMIT rank per nation).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_with_star",
    GRAPH_CTE
    + """
    SELECT nation, cname, bal FROM (
        SELECT n.name AS nation, c.name AS cname,
               ROUND(c.acctbal, 2) AS bal,
               ROW_NUMBER() OVER (
                   PARTITION BY n.id ORDER BY c.acctbal DESC, c.name ASC
               ) AS rn
        FROM vertices n
        JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
        JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
        WHERE n.label = 'Nation' AND c.acctbal > 5000.0
    ) WHERE rn <= 2
    ORDER BY nation, bal DESC, cname
    """,
)
def gql_call_with_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (n:Nation) "
        "CALL { WITH n MATCH (c:Customer)-[:located_in]->(n) "
        "WITH * WHERE c.acctbal > 5000.0 "
        "WITH c.name AS cname, c.acctbal AS bal "
        "RETURN * ORDER BY bal DESC, cname ASC LIMIT 2 } "
        "RETURN n.name AS nation, cname, round(bal, 2) AS bal "
        "ORDER BY nation, bal DESC, cname"
    )


# ---------------------------------------------------------------------------
# GQL: DISTINCT over whole entities + string concatenation (round 13) —
# WITH DISTINCT n dedups on the entity's non-map binding columns (maps
# are id-determined; Spark cannot set-operate on map columns), and
# Cypher's overloaded + concatenates when a string literal rides in
# the chain (numbers render into the string).
# ---------------------------------------------------------------------------
@_q(
    "gql_distinct_entity_concat",
    GRAPH_CTE
    + """
    SELECT DISTINCT 'N:' || n.name || '#' || n.id AS tag
    FROM vertices n
    JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
    WHERE n.label = 'Nation'
    ORDER BY tag
    """,
)
def gql_distinct_entity_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH DISTINCT n "
        "RETURN 'N:' + n.name + '#' + n.id AS tag ORDER BY tag"
    )


# ---------------------------------------------------------------------------
# GQL: implicit grouping BY AN ENTITY in a WITH stage (round 13) —
# `WITH n, count(*)` groups on the variable's binding columns, keeps n
# in scope, and a post-WITH MATCH joins from the grouped entity
# (Cypher's canonical aggregate-then-expand shape).
# ---------------------------------------------------------------------------
@_q(
    "gql_with_entity_group",
    GRAPH_CTE
    + """
    SELECT n.name AS nation, r.name AS region, g.customers
    FROM (
        SELECT e.dst AS nid, COUNT(*) AS customers
        FROM vertices c
        JOIN edges e ON c.id = e.src AND e.label = 'located_in'
        WHERE c.label = 'Customer'
        GROUP BY e.dst
    ) g
    JOIN vertices n ON n.id = g.nid AND n.label = 'Nation'
    JOIN edges er ON er.src = n.id AND er.label = 'in_region'
    JOIN vertices r ON r.id = er.dst
    WHERE g.customers > 10
    ORDER BY nation
    """,
)
def gql_with_entity_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (c:Customer)-[:located_in]->(n:Nation) "
        "WITH n, count(*) AS customers WHERE customers > 10 "
        "MATCH (n)-[:in_region]->(r:Region) "
        "RETURN n.name AS nation, r.name AS region, customers "
        "ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL: WITH *, <aggregate> (round 14) — Neo4j's implicit grouping by the
# WHOLE star scope: the surviving entity's binding columns and the bare
# alias both become grouping keys; the aggregate computes per group and
# the entity STAYS dereferenceable after the stage. (The r13 engine
# rejected this shape; the remaining rejection is only * re-exporting
# CALL imports, pinned as final.)
# ---------------------------------------------------------------------------
@_q(
    "gql_with_star_agg",
    GRAPH_CTE
    + """
    SELECT c.name AS cname, o.name AS status, COUNT(*) AS n_orders
    FROM vertices o
    JOIN edges e ON o.id = e.src AND e.label = 'placed_by'
    JOIN vertices c ON c.id = e.dst AND c.label = 'Customer'
    WHERE o.label = 'Order'
    GROUP BY c.id, c.name, o.name
    HAVING COUNT(*) >= 8
    ORDER BY cname, status
    """,
)
def gql_with_star_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    # o.name is the Order vertex's status slot (o_orderstatus)
    return eng.execute(
        "MATCH (o:Order)-[:placed_by]->(c:Customer) "
        "WITH c, o.name AS status "
        "WITH *, count(*) AS n_orders WHERE n_orders >= 8 "
        "RETURN c.name AS cname, status, n_orders ORDER BY cname, status"
    )


# ---------------------------------------------------------------------------
# GQL: ENTITY export from a correlated CALL body (round 13) — RETURN y
# makes the body variable a live outer binding (Neo4j semantics): the
# outer RETURN dereferences its properties, and the body's per-outer-
# row top-k orders by the exported entity's property.
# ---------------------------------------------------------------------------
@_q(
    "gql_call_entity_export",
    GRAPH_CTE
    + """
    SELECT nation, cname, bal FROM (
        SELECT n.name AS nation, c.name AS cname,
               ROUND(c.acctbal, 2) AS bal,
               ROW_NUMBER() OVER (
                   PARTITION BY n.id ORDER BY c.acctbal DESC, c.name ASC
               ) AS rn
        FROM vertices n
        JOIN edges e ON e.dst = n.id AND e.label = 'located_in'
        JOIN vertices c ON c.id = e.src AND c.label = 'Customer'
        WHERE n.label = 'Nation'
    ) WHERE rn = 1
    ORDER BY nation
    """,
)
def gql_call_entity_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (n:Nation) "
        "CALL { WITH n MATCH (c:Customer)-[:located_in]->(n) "
        "RETURN c ORDER BY c.acctbal DESC, c.name ASC LIMIT 1 } "
        "RETURN n.name AS nation, c.name AS cname, "
        "round(c.acctbal, 2) AS bal ORDER BY nation"
    )


# ---------------------------------------------------------------------------
# GQL: nested CALL composed with a WITH pipeline in ONE body (round 12)
# — the nested per-nation customer count enters the body pipeline as a
# bare name; the pipeline filters on it and the body's ORDER BY/LIMIT
# rank per REGION group (one row_number window — per-outer-row top-k).
# ---------------------------------------------------------------------------
@_q(
    "gql_call_nested_with",
    GRAPH_CTE
    + """
    SELECT region, nation, nc FROM (
        SELECT r.name AS region, n.name AS nation, cnt.nc AS nc,
               ROW_NUMBER() OVER (PARTITION BY r.id ORDER BY n.name) AS rn
        FROM vertices r
        JOIN edges e ON e.dst = r.id AND e.label = 'in_region'
        JOIN vertices n ON n.id = e.src AND n.label = 'Nation'
        JOIN (
            SELECT e2.dst AS nid, COUNT(*) AS nc
            FROM vertices c
            JOIN edges e2 ON c.id = e2.src AND e2.label = 'located_in'
            WHERE c.label = 'Customer'
            GROUP BY e2.dst
        ) cnt ON cnt.nid = n.id
        WHERE r.label = 'Region' AND cnt.nc > 20
    ) WHERE rn <= 3
    ORDER BY region, nation
    """,
)
def gql_call_nested_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = GQLEngine(materialized_tpch_graph(spark, sf_dir))
    return eng.execute(
        "MATCH (r:Region) "
        "CALL { WITH r MATCH (n:Nation)-[:in_region]->(r) "
        "CALL { WITH n MATCH (c:Customer)-[:located_in]->(n) "
        "RETURN count(*) AS nc } "
        "WITH n.name AS nation, nc WHERE nc > 20 "
        "RETURN nation, nc ORDER BY nation LIMIT 3 } "
        "RETURN r.name AS region, nation, nc ORDER BY region, nation"
    )


# Uniform events-precision handling (no-op for ts-free oracles; see
# graph.rewrite_events_oracles).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
