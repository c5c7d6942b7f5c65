"""Engine-API suite: mutations/transactions, view catalog, query router —
the SURVEY §2.10 surfaces, oracle-checked end-to-end.

Each query builds its own isolated store/catalog under a temp dir (the
gate may call a query more than once; state never leaks between calls).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dd_graphdb_spark.localrel import local_df

from dd_graphdb_spark.graph import GRAPH_CTE

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


# ---------------------------------------------------------------------------
# Mutation batch: adds → overwrite → update-merge → cascading delete.
# The final state is fully determined, so the oracle is a VALUES literal.
# (apply_operation semantics, graph/storage/src/lib.rs:269-323)
# ---------------------------------------------------------------------------
@_q(
    "mutation_apply_batch",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'Alicia', 31::BIGINT),
        (3::BIGINT, 'Carol', 27::BIGINT)
    ) t(id, name, age)
    """,
)
def mutation_apply_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.storage import (
        GraphStore,
        add_edge,
        add_vertex,
        remove_vertex,
        update_vertex_props,
    )
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))
    store.apply_batch(
        [
            add_vertex(1, "Person", {"name": "Alice", "age": 30}),
            add_vertex(2, "Person", {"name": "Bob", "age": 25}),
            add_vertex(3, "Person", {"name": "Carol", "age": 27}),
            add_edge(1, 2, "friend"),
            add_edge(2, 3, "friend"),
            add_vertex(1, "Person", {"name": "Alicia", "age": 30}),  # overwrite
            # replace-map semantics (vertices.insert, lib.rs:310-312):
            # the new map must carry every key that should survive
            update_vertex_props(1, {"type": "Person", "name": "Alicia", "age": 31}),
            remove_vertex(2),  # cascades both edges
        ]
    )
    assert store.stats()["edge_count"] == 0  # cascade check
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "age", "long").alias("age"),
    )


# ---------------------------------------------------------------------------
# Time travel: every batch commits a new snapshot version; reading an
# older version replays the state as of that commit (WAL replay /
# Snapshot::load semantics, graph/storage/src/lib.rs:133-160,213-261 —
# mapped to versioned parquet snapshots per SURVEY §1.3). The final
# contents of both snapshots are fully determined, so the oracle is a
# VALUES literal.
# ---------------------------------------------------------------------------
@_q(
    "mutation_time_travel",
    """
    SELECT * FROM (VALUES
        ('v1', 1::BIGINT, 'Alice', 1::BIGINT),
        ('v2', 1::BIGINT, 'Alice', 2::BIGINT),
        ('v2', 2::BIGINT, 'Bob', 2::BIGINT)
    ) t(snap, id, name, version)
    """,
)
def mutation_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.storage import GraphStore, add_vertex, remove_vertex
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))
    store.apply_batch(
        [add_vertex(1, "Person", {"name": "Alice"}), add_vertex(9, "Person", {"name": "Zed"}),
         remove_vertex(9)]
    )
    v1 = store.version
    store.apply_batch([add_vertex(2, "Person", {"name": "Bob"})])
    v2 = store.version

    def snap(tag: str, version: int) -> DataFrame:
        return store.vertices(version=version).select(
            F.lit(tag).alias("snap"),
            "id",
            prop_typed("properties", "name").alias("name"),
            F.lit(version).cast("long").alias("version"),
        )

    assert v2 == v1 + 1
    return snap("v1", v1).unionByName(snap("v2", v2))


# ---------------------------------------------------------------------------
# CDC change feed between two versions (ConnectionConfig::CDC intent,
# stream_connectors.rs:119-166 — declared-but-dead in the reference;
# real here over the store's versioned snapshots, Delta-CDF-shaped).
# Batch 2: adds vertex 3, deletes vertex 2, renames vertex 1 — the diff
# is fully determined, so the oracle is a VALUES literal.
# ---------------------------------------------------------------------------
@_q(
    "mutation_cdc_changes",
    """
    SELECT * FROM (VALUES
        ('insert',           3::BIGINT, 'Carol'),
        ('delete',           2::BIGINT, 'Bob'),
        ('update_preimage',  1::BIGINT, 'Alice'),
        ('update_postimage', 1::BIGINT, 'Alicia')
    ) t(change, id, name)
    """,
)
def mutation_cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.storage import (
        GraphStore,
        add_vertex,
        remove_vertex,
        update_vertex_props,
    )
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))
    store.apply_batch(
        [
            add_vertex(1, "Person", {"name": "Alice"}),
            add_vertex(2, "Person", {"name": "Bob"}),
        ]
    )
    v1 = store.version
    store.apply_batch(
        [
            add_vertex(3, "Person", {"name": "Carol"}),
            remove_vertex(2),
            update_vertex_props(1, {"type": "Person", "name": "Alicia"}),
        ]
    )
    return store.changes("vertices", v1).select(
        F.col("_change_type").alias("change"),
        "id",
        prop_typed("properties", "name").alias("name"),
    )


# ---------------------------------------------------------------------------
# Flagship dataflow with REAL change capture (SURVEY §3.3: write →
# changeset → incremental view maintenance): mutations commit versions;
# each adjacent version pair's CDC diff feeds the incremental agg state
# as ± deltas via cdc_to_deltas. Exact for count/sum (updates retract
# the preimage), conservative min/max. Fully determined → VALUES oracle:
# adds 30+25, then +40, 30→31, −25 ⇒ n=2, total=71, avg=35.5.
# ---------------------------------------------------------------------------
@_q(
    "view_incremental_cdc",
    """
    SELECT * FROM (VALUES
        ('Person', 2::BIGINT, 71.0::DOUBLE, 35.5::DOUBLE)
    ) t(label, n, total, avg_v)
    """,
)
def view_incremental_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.storage import (
        GraphStore,
        add_vertex,
        remove_vertex,
        update_vertex_props,
    )
    from dd_graphdb_spark.storage.store import cdc_to_deltas, prop_typed
    from dd_graphdb_spark.views import IncrementalAggState

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))
    state = IncrementalAggState(
        spark, tempfile.mkdtemp(prefix="iagg_"), ["label"], "age"
    )
    v0 = store.version
    store.apply_batch(
        [
            add_vertex(1, "Person", {"name": "Alice", "age": 30}),
            add_vertex(2, "Person", {"name": "Bob", "age": 25}),
        ]
    )
    v1 = store.version
    store.apply_batch(
        [
            add_vertex(3, "Person", {"name": "Carol", "age": 40}),
            update_vertex_props(1, {"type": "Person", "name": "Alice", "age": 31}),
            remove_vertex(2),
        ]
    )
    v2 = store.version
    for a, b in ((v0, v1), (v1, v2)):
        deltas = cdc_to_deltas(store.changes("vertices", a, b)).select(
            "label", prop_typed("properties", "age", "long").alias("age"), "_sign"
        )
        state.apply_deltas(deltas)
    return state.result().select("label", "n", "total", "avg_v")


# ---------------------------------------------------------------------------
# Retention vacuum: snapshots older than keep_last are dropped, the rest
# stay readable and current state is untouched (checkpoint truncation,
# graph/storage/src/lib.rs:600-611). Fully determined -> VALUES oracle.
# ---------------------------------------------------------------------------
@_q(
    "mutation_vacuum_retention",
    """
    SELECT * FROM (VALUES
        (0::BIGINT, false),
        (1::BIGINT, false),
        (2::BIGINT, true),
        (3::BIGINT, true)
    ) t(version, readable)
    """,
)
def mutation_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from dd_graphdb_spark.storage import GraphStore, add_vertex

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))
    for i in (1, 2, 3):
        store.apply_batch([add_vertex(i, "Person", {"name": f"p{i}"})])
    store.vacuum(keep_last=2)  # v3 current -> v2, v3 survive
    rows = [
        (v, os.path.isdir(os.path.join(store.path, f"v{v}")))
        for v in range(store.version + 1)
    ]
    assert store.vertices().count() == 3  # current state untouched
    return local_df(spark, rows, "version long, readable boolean")


# ---------------------------------------------------------------------------
# File-level CoW delta chains (r14): commits persist only changed rows
# as delta layers (upserts + tombstones), merge-on-read resolves chains
# latest-wins, over-long chains compact, vacuum relocates still-
# referenced layers out of dead version dirs. Every intermediate state
# is fully determined -> VALUES oracle over two time-travel snapshots
# (the one read AFTER vacuum relocation proves the patched manifests
# still resolve).
# ---------------------------------------------------------------------------
@_q(
    "mutation_delta_compaction",
    """
    SELECT * FROM (VALUES
        ('v2', 1::BIGINT, '1'),
        ('v2', 5::BIGINT, '50'),
        ('v4', 5::BIGINT, '51'),
        ('v4', 9::BIGINT, '9')
    ) t(snap, id, n)
    """,
)
def mutation_delta_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.storage import (
        GraphStore,
        add_vertex,
        remove_vertex,
        update_vertex_props,
    )
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(
        spark, tempfile.mkdtemp(prefix="store_"),
        n_buckets=4, cow_min_bytes=0, cow_max_layers=2,
    )
    # v1: base layers; bucket 1 holds ids {1, 5}
    store.apply_batch(
        [add_vertex(i, "P", {"n": str(i)}) for i in range(1, 9)]
    )
    # v2: 1-row update -> one DELTA layer in bucket 1 (not a rewrite)
    store.apply_batch([update_vertex_props(5, {"type": "P", "n": "50"})])
    chain2 = store._chains(store._load_manifest(2), "vertices")["1"]
    assert [l["k"] for l in chain2] == ["b", "d"], chain2
    # v3: second update would exceed cow_max_layers=2 -> bucket COMPACTS
    store.apply_batch([update_vertex_props(5, {"type": "P", "n": "51"})])
    chain3 = store._chains(store._load_manifest(3), "vertices")["1"]
    assert [l["k"] for l in chain3] == ["b"] and chain3[0]["s"] == 3, chain3
    # v4: tombstone (delete id 1) + insert into a fresh id
    store.apply_batch([remove_vertex(1), add_vertex(9, "P", {"n": "9"})])
    # vacuum drops v1; v2's chain references v1's base -> relocation
    store.vacuum(keep_last=3)

    def snap(tag: str, version: int) -> DataFrame:
        return (
            store.vertices(version=version)
            .filter(F.pmod(F.col("id"), F.lit(4)) == 1)
            .select(
                F.lit(tag).alias("snap"),
                "id",
                prop_typed("properties", "n").alias("n"),
            )
        )

    return snap("v2", 2).unionByName(snap("v4", 4))


# ---------------------------------------------------------------------------
# OCC: conflicting transaction must fail; surviving state is the first
# committer's write (begin/commit_transaction, lib.rs:429-494).
# ---------------------------------------------------------------------------
@_q(
    "mutation_occ_conflict",
    "SELECT 1::BIGINT AS committed_id, true AS conflict_raised",
)
def mutation_occ_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.storage import ConflictError, GraphStore, add_vertex

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))
    t1 = store.begin_transaction().add(add_vertex(1, "Person", {"name": "X"}))
    t2 = store.begin_transaction().add(add_vertex(2, "Person", {"name": "Y"}))
    store.commit(t1)
    try:
        store.commit(t2)
        raised = False
    except ConflictError:
        raised = True
    return store.vertices().select(
        F.col("id").alias("committed_id"), F.lit(raised).alias("conflict_raised")
    )


# ---------------------------------------------------------------------------
# GQL mutations end-to-end: CREATE chain then MATCH..DELETE
# (execute_create / execute_match_delete, graph/query/src/executor.rs:521-615).
# ---------------------------------------------------------------------------
@_q(
    "gql_create_delete",
    "SELECT * FROM (VALUES (2::BIGINT, 'Ben', 20::BIGINT)) t(id, name, age)",
)
def gql_create_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string", "age": "long"}), store=store
        )

    engine().execute(
        "CREATE (a:Person {name: 'Ann', age: 40})-[:knows]->(b:Person {name: 'Ben', age: 20})"
    )
    engine().execute("MATCH (v:Person) WHERE v.age > 25 DELETE v")
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "age", "long").alias("age"),
    )


# ---------------------------------------------------------------------------
# GQL REMOVE + DETACH DELETE (Cypher surface over the store's cascade
# delete, graph/storage/src/lib.rs:274-293, and map-key property
# removal): REMOVE drops the age key from over-30s (clearing 'type'
# would clear the label too); DETACH DELETE cascades Cal's incident
# edge away with the vertex.
# ---------------------------------------------------------------------------
@_q(
    "gql_remove_detach_delete",
    # age as VARCHAR: a BIGINT column with a NULL row round-trips
    # through pandas as float NaN and the hash compare diverges
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'Ann', NULL::VARCHAR),
        (2::BIGINT, 'Ben', '20')
    ) t(id, name, age)
    """,
)
def gql_remove_detach_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string", "age": "long"}), store=store
        )

    engine().execute(
        "CREATE (a:Person {name: 'Ann', age: 40})-[:knows]->"
        "(b:Person {name: 'Ben', age: 20})-[:knows]->"
        "(c:Person {name: 'Cal', age: 50})"
    )
    engine().execute("MATCH (v:Person) WHERE v.age > 30 REMOVE v.age")
    # Cal keeps name but lost age — match by name, cascade the edge
    engine().execute("MATCH (v:Person {name: 'Cal'}) DETACH DELETE v")
    assert store.edges().count() == 1  # Ann->Ben survives; Ben->Cal gone
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "age", "string").alias("age"),
    )


# ---------------------------------------------------------------------------
# View catalog: register SQL view over orders, refresh, read — result must
# equal running the SQL directly (ViewRegistry round-trip,
# graph/views/src/view_registry.rs:181-316).
# ---------------------------------------------------------------------------
@_q(
    "view_catalog_roundtrip",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def view_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import ViewCatalog, ViewDefinition

    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    catalog = ViewCatalog(spark, tempfile.mkdtemp(prefix="views_"))
    catalog.register(
        ViewDefinition(
            name="orders_by_status",
            view_type="aggregation",
            sql=(
                "SELECT o_orderstatus, COUNT(*) AS n, "
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
                "FROM orders GROUP BY o_orderstatus"
            ),
        )
    )
    catalog.refresh_all()
    return catalog.read("orders_by_status")


# ---------------------------------------------------------------------------
# Dependent views refresh in topo order; the downstream total must match.
# (DependencyGraph topo sort, differential_dataflow.rs:366-428)
# ---------------------------------------------------------------------------
@_q(
    "view_dependency_topo",
    "SELECT (SELECT COUNT(*) FROM orders)::BIGINT AS total",
)
def view_dependency_topo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import ViewCatalog, ViewDefinition

    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    catalog = ViewCatalog(spark, tempfile.mkdtemp(prefix="views_"))
    catalog.register(
        ViewDefinition(
            name="base",
            view_type="aggregation",
            sql="SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
        )
    )
    catalog.register(
        ViewDefinition(
            name="total",
            view_type="aggregation",
            # dependency on `base` is auto-derived from the mv_base
            # reference (extract_tables, sql_parser.rs:142-168)
            sql="SELECT SUM(n)::BIGINT AS total FROM mv_base",
        )
    )
    assert catalog.defs["total"].dependencies == ["base"]
    order = catalog.topo_order(["total"])
    assert order == ["base", "total"], order
    catalog.refresh_all()
    return catalog.read("total")


# ---------------------------------------------------------------------------
# TTL-expired OnDemand refresh driven through the ROUTER read path
# (RefreshPolicy::OnDemand{ttl}.needs_refresh, view_types.rs:159-190;
# execute_query_with_cache, query_router.rs:326-375): a routed read
# inside the TTL serves the stale materialization even though the
# source moved (the catalog was never told — that is exactly the case
# TTL exists for); once the TTL lapses the next routed read recomputes.
# ---------------------------------------------------------------------------
@_q(
    "view_ttl_refresh",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def view_ttl_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time as _time

    from dd_graphdb_spark.views import (
        QueryPattern,
        QueryRouter,
        RefreshPolicy,
        ViewCatalog,
        ViewDefinition,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # v1 of the source: half the orders
    orders.filter("o_orderkey % 2 = 0").createOrReplaceTempView("ttl_src_orders")
    catalog = ViewCatalog(spark, tempfile.mkdtemp(prefix="views_"))
    catalog.register(
        ViewDefinition(
            name="ttl_orders_by_status",
            view_type="aggregation",
            sql=(
                "SELECT o_orderstatus, COUNT(*) AS n, "
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
                "FROM ttl_src_orders GROUP BY o_orderstatus"
            ),
            refresh_policy=RefreshPolicy(kind="on_demand", ttl_s=1.0),
        )
    )
    catalog.refresh_all()  # materialize v1; view is now clean
    stale_n = sum(r["n"] for r in catalog.read("ttl_orders_by_status").collect())
    # the source moves underneath — the catalog is NOT told (no
    # mark_dirty): only the TTL can surface the change
    orders.createOrReplaceTempView("ttl_src_orders")
    router = QueryRouter(catalog)
    within_ttl = router.execute(QueryPattern("aggregation"))
    assert sum(r["n"] for r in within_ttl.collect()) == stale_n, (
        "a routed read inside the TTL must serve the stale materialization"
    )
    _time.sleep(1.05)  # let the TTL lapse
    fresh = router.execute(QueryPattern("aggregation"))
    assert catalog.state["ttl_orders_by_status"]["last_refresh"] is not None
    return fresh


# ---------------------------------------------------------------------------
# Router scoring table parity (calculate_match_score,
# graph/views/src/query_router.rs:192-260).
# ---------------------------------------------------------------------------
@_q(
    "router_scoring_table",
    """
    SELECT * FROM (VALUES
        ('vertex_lookup', 'lkp', 100::BIGINT),
        ('aggregation', 'agg', 95::BIGINT),
        ('analytics', 'ana', 90::BIGINT),
        ('edge_traversal', 'lkp', 75::BIGINT),
        ('hybrid', 'sqlv', 50::BIGINT)
    ) t(pattern, view, score)
    """,
)
def router_scoring_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import QueryPattern, QueryRouter, ViewCatalog, ViewDefinition

    catalog = ViewCatalog(spark, tempfile.mkdtemp(prefix="views_"))
    for name, vt in (("lkp", "lookup"), ("agg", "aggregation"), ("ana", "analytics"), ("sqlv", "sql")):
        catalog.register(ViewDefinition(name=name, view_type=vt, sql="SELECT 1 AS x"))
    router = QueryRouter(catalog)
    cases = [
        ("vertex_lookup", "lkp"),
        ("aggregation", "agg"),
        ("analytics", "ana"),
        ("edge_traversal", "lkp"),
        ("hybrid", "sqlv"),
    ]
    rows = [(p, v, router.score(QueryPattern(p), v)) for p, v in cases]
    return local_df(spark, rows, "pattern string, view string, score long")


# ---------------------------------------------------------------------------
# GQL MATCH..SET (beyond the reference's declared grammar; Cypher SET
# semantics — listed keys overwrite, other keys kept, unlike
# UpdateVertexProperties' whole-map replace, lib.rs:310-312).
# ---------------------------------------------------------------------------
@_q(
    "gql_match_set",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'Ann', 41::BIGINT, 'north'),
        (2::BIGINT, 'Ben', 20::BIGINT, NULL)
    ) t(id, name, age, region)
    """,
)
def gql_match_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string", "age": "long", "region": "string"}),
            store=store,
        )

    engine().execute(
        "CREATE (a:Person {name: 'Ann', age: 40})-[:knows]->(b:Person {name: 'Ben', age: 20})"
    )
    # bump Ann's age and tag a region; Ben (age <= 25) is untouched
    engine().execute(
        "MATCH (v:Person) WHERE v.age > 25 SET v.age = 41, v.region = 'north'"
    )
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "age", "long").alias("age"),
        prop_typed("properties", "region").alias("region"),
    )


# ---------------------------------------------------------------------------
# GQL MERGE (Cypher get-or-create subset: single node, exact label +
# inline-props match — beyond the reference's declared grammar).
# ---------------------------------------------------------------------------
@_q(
    "gql_merge",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'Ann'),
        (2::BIGINT, 'Ben')
    ) t(id, name)
    """,
)
def gql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string"}), store=store
        )

    engine().execute("MERGE (a:Person {name: 'Ann'})")   # creates id 1
    engine().execute("MERGE (a:Person {name: 'Ann'})")   # matches, no-op
    engine().execute("MERGE (b:Person {name: 'Ben'})")   # creates id 2
    engine().execute("MERGE (b:Person {name: 'Ben'})")   # matches, no-op
    return store.vertices().select(
        "id", prop_typed("properties", "name").alias("name")
    )


# ---------------------------------------------------------------------------
# GQL MERGE ON CREATE SET / ON MATCH SET (Cypher conditional actions —
# beyond the reference's declared grammar): the same statement run twice
# exercises both branches; a second node only ever creates.
# ---------------------------------------------------------------------------
@_q(
    "gql_merge_on_actions",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'Ann', 2::BIGINT, 'seen'),
        (2::BIGINT, 'Ben', 1::BIGINT, 'new')
    ) t(id, name, visits, src)
    """,
)
def gql_merge_on_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph(
                {"name": "string", "visits": "long", "src": "string"}
            ),
            store=store,
        )

    merge_ann = (
        "MERGE (a:Person {name: 'Ann'}) "
        "ON CREATE SET a.visits = 1, a.src = 'new' "
        "ON MATCH SET a.visits = 2, a.src = 'seen'"
    )
    engine().execute(merge_ann)  # creates → visits=1, src='new'
    engine().execute(merge_ann)  # matches → visits=2, src='seen'
    engine().execute(
        "MERGE (b:Person {name: 'Ben'}) "
        "ON CREATE SET b.visits = 1, b.src = 'new' "
        "ON MATCH SET b.visits = 2, b.src = 'seen'"
    )  # creates only
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "visits", "long").alias("visits"),
        prop_typed("properties", "src").alias("src"),
    )


# ---------------------------------------------------------------------------
# GQL relationship MERGE (whole-pattern Cypher semantics: a matching
# pattern binds; otherwise the ENTIRE pattern — nodes and edge — is
# created as one unit, even when an endpoint exists on its own).
# ---------------------------------------------------------------------------
@_q(
    "gql_merge_edge",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 2::BIGINT, 'works_at', 2::BIGINT),
        (3::BIGINT, 4::BIGINT, 'works_at', 2::BIGINT)
    ) t(src, dst, label, n_vertices_div2)
    """,
)
def gql_merge_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(store.as_property_graph({"name": "string"}), store=store)

    # whole pattern absent → creates Ann(1), Acme(2), edge 1→2
    engine().execute("MERGE (a:Person {name: 'Ann'})-[:works_at]->(c:Org {name: 'Acme'})")
    # pattern now matches → no new writes (idempotent)
    engine().execute("MERGE (a:Person {name: 'Ann'})-[:works_at]->(c:Org {name: 'Acme'})")
    # endpoint Acme EXISTS but the full pattern doesn't → single-clause
    # Cypher creates the whole pattern: Bob(4), a NEW Org(5), edge 4→5
    engine().execute("MERGE (b:Person {name: 'Bob'})-[:works_at]->(c:Org {name: 'Acme'})")
    n = store.vertices().count()
    return store.edges().select(
        "src", "dst", "label", (F.lit(n) / 2).cast("long").alias("n_vertices_div2")
    )


# ---------------------------------------------------------------------------
# GQL-backed materialized view: the definition persists as GQL text and
# survives a catalog reload; refresh materializes through the engine.
# ---------------------------------------------------------------------------
@_q(
    "view_gql_materialized",
    GRAPH_CTE
    + """
    SELECT v1.name AS c_name, v2.name AS n_name
    FROM vertices v1
    JOIN edges e ON v1.id = e.src AND e.label = 'located_in'
    JOIN vertices v2 ON e.dst = v2.id
    WHERE v1.label = 'Customer' AND v2.label = 'Nation' AND v1.acctbal > 9500.0
    """,
)
def view_gql_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.graph import materialized_tpch_graph
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.views import RefreshPolicy, ViewCatalog, ViewDefinition

    path = tempfile.mkdtemp(prefix="views_")
    catalog = ViewCatalog(spark, path)
    catalog.register(
        ViewDefinition(
            name="rich_customers",
            view_type="gql",
            gql=(
                "MATCH (c:Customer)-[e:located_in]->(n:Nation) "
                "WHERE c.acctbal > 9500.0 RETURN c.name, n.name"
            ),
            refresh_policy=RefreshPolicy(kind="on_demand"),
        )
    )
    # reload from disk: the definition round-trips as JSON text
    catalog2 = ViewCatalog(spark, path)
    catalog2.attach_gql_engine(GQLEngine(materialized_tpch_graph(spark, sf_dir)))
    catalog2.refresh("rich_customers", force=True)
    return catalog2.read("rich_customers")


# ---------------------------------------------------------------------------
# GQL MATCH..SET on an edge variable: per-key edge property update,
# vertex rows untouched.
# ---------------------------------------------------------------------------
@_q(
    "gql_set_edge",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 2::BIGINT, 'knows', 5::BIGINT),
        (2::BIGINT, 3::BIGINT, 'knows', -1::BIGINT)
    ) t(src, dst, label, weight)
    """,
)
def gql_set_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string", "age": "long"}), store=store
        )

    engine().execute(
        "CREATE (a:Person {name: 'Ann', age: 40})-[:knows]->"
        "(b:Person {name: 'Ben', age: 20})-[:knows]->(c:Person {name: 'Cy', age: 30})"
    )
    # only the edge into the younger endpoint gets a weight
    engine().execute(
        "MATCH (x)-[e:knows]->(y) WHERE y.age < 25 SET e.weight = 5"
    )
    # unset weight maps to a -1 sentinel (pandas NaN-coerces nullable ints)
    return store.edges().select(
        "src",
        "dst",
        "label",
        F.coalesce(prop_typed("properties", "weight", "long"), F.lit(-1)).alias(
            "weight"
        ),
    )

# ---------------------------------------------------------------------------
# GQL SET with EXPRESSION values + `+=` map merge (r10; Cypher SET
# expressiveness over the UpdateVertexProperties contract,
# graph/storage/src/lib.rs:310-318): values are computed per matched
# row with the read side's expression lowering, rendered to the store's
# JSON encoding, and applied in ONE snapshot version; a computed NULL
# removes the key. The final state is fully determined → VALUES oracle.
# ---------------------------------------------------------------------------
@_q(
    "gql_set_expr",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'ANN', '41', '61.5', 'senior'),
        (2::BIGINT, 'BEN', NULL::VARCHAR, NULL::VARCHAR, 'visited')
    ) t(id, name, age, bonus, tag)
    """,
)
def gql_set_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph(
                {"name": "string", "age": "long", "bonus": "double", "tag": "string"}
            ),
            store=store,
        )

    engine().execute(
        "CREATE (a:Person {name: 'ann', age: 40})-[:knows]->"
        "(b:Person {name: 'ben', age: 20})"
    )
    # expression values: arithmetic over the row's own property + a
    # string function — one snapshot version for both assignments
    engine().execute(
        "MATCH (v:Person) SET v.age = v.age + 1, v.name = toUpper(v.name)"
    )
    # += map merge (listed keys overwrite, others kept) with a computed
    # value: bonus = 41 * 1.5 = 61.5 on the age-guarded row only
    engine().execute(
        "MATCH (v:Person) WHERE v.age > 30 "
        "SET v += {bonus: v.age * 1.5, tag: 'senior'}"
    )
    # SET to NULL removes the key (Cypher) — BEN loses age entirely
    engine().execute("MATCH (v:Person {name: 'BEN'}) SET v.age = null")
    # FOREACH body reusing the expression grammar: the computed value
    # (toLower of the OUTER binding's property) flows per exploded id
    engine().execute(
        "MATCH p = (a:Person {name: 'BEN'})-[:x]->(b) "
        "FOREACH (n IN nodes(p) | SET n.tag = toLower(a.name))"
    )  # no :x edges — no-op guard: FOREACH over an empty match
    engine().execute(
        "MATCH (b:Person {name: 'BEN'}) "
        "FOREACH (n IN [id(b)] | SET n.tag = toLower('VISITED'))"
    )
    # age/bonus as VARCHAR: nullable numeric columns NaN-coerce through
    # pandas and the hash compare diverges (see gql_foreach)
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "age").alias("age"),
        prop_typed("properties", "bonus").alias("bonus"),
        prop_typed("properties", "tag").alias("tag"),
    )


# ---------------------------------------------------------------------------
# GQL SET on an edge variable with an EXPRESSION value computed from a
# DIFFERENT bound variable's property (cross-variable, per matched row).
# ---------------------------------------------------------------------------
@_q(
    "gql_set_edge_expr",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 2::BIGINT, 'knows', 26::BIGINT),
        (2::BIGINT, 3::BIGINT, 'knows', 36::BIGINT)
    ) t(src, dst, label, weight)
    """,
)
def gql_set_edge_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph(
                {"name": "string", "age": "long"}, {"weight": "long"}
            ),
            store=store,
        )

    engine().execute(
        "CREATE (a:Person {name: 'Ann', age: 40})-[:knows {weight: 3}]->"
        "(b:Person {name: 'Ben', age: 20})-[:knows {weight: 3}]->"
        "(c:Person {name: 'Cy', age: 30})"
    )
    # weight = 2*old + target age: 2*3+20=26 and 2*3+30=36
    engine().execute(
        "MATCH (x)-[e:knows]->(y) SET e.weight = e.weight * 2 + y.age"
    )
    return store.edges().select(
        "src",
        "dst",
        "label",
        prop_typed("properties", "weight", "long").alias("weight"),
    )


# ---------------------------------------------------------------------------
# GQL FOREACH: mark every node of a matched path (the Cypher-canonical
# use — FOREACH (n IN nodes(p) | SET n.marked = true)); one snapshot
# version for the whole statement. The unmatched vertex keeps a NULL
# marked property.
# ---------------------------------------------------------------------------
@_q(
    "gql_foreach",
    """
    SELECT * FROM (VALUES
        (1::BIGINT, 'Ann', '1'),
        (2::BIGINT, 'Ben', '1'),
        (3::BIGINT, 'Cal', NULL::VARCHAR)
    ) t(id, name, marked)
    """,
)
def gql_foreach(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string", "marked": "long"}),
            store=store,
        )

    engine().execute(
        "CREATE (a:Person {name: 'Ann'})-[:knows]->(b:Person {name: 'Ben'})"
    )
    engine().execute("CREATE (c:Person {name: 'Cal'})")
    engine().execute(
        "MATCH p = (a:Person {name: 'Ann'})-[:knows]->(b:Person) "
        "FOREACH (n IN nodes(p) | SET n.marked = 1)"
    )
    # marked as VARCHAR: a BIGINT column with a NULL row round-trips
    # through pandas as float NaN and the hash compare diverges
    return store.vertices().select(
        "id",
        prop_typed("properties", "name").alias("name"),
        prop_typed("properties", "marked").alias("marked"),
    )


# ---------------------------------------------------------------------------
# GQL FOREACH with a CREATE body (r10 — the Cypher bulk-create idiom,
# VERDICT r9 #5): one node per list element (duplicates kept), loop
# variable substituted into the inline props, ONE snapshot version;
# elements sort before id assignment so created ids are deterministic.
# A follow-up MERGE body adds only the genuinely new element.
# ---------------------------------------------------------------------------
@_q(
    "gql_foreach_create",
    """
    SELECT * FROM (VALUES
        (2::BIGINT, 'Tag', 'blue'),
        (3::BIGINT, 'Tag', 'green'),
        (4::BIGINT, 'Tag', 'green'),
        (5::BIGINT, 'Tag', 'red'),
        (6::BIGINT, 'Tag', 'amber')
    ) t(id, label, v)
    """,
)
def gql_foreach_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.plans.lower import GQLEngine
    from dd_graphdb_spark.storage import GraphStore
    from dd_graphdb_spark.storage.store import prop_typed

    store = GraphStore(spark, tempfile.mkdtemp(prefix="store_"))

    def engine():
        return GQLEngine(
            store.as_property_graph({"name": "string", "v": "string"}),
            store=store,
        )

    engine().execute("CREATE (s:Seed {name: 'seed'})")  # id 1
    before = store.version
    engine().execute(
        "MATCH (s:Seed) "
        "FOREACH (x IN ['green', 'red', 'blue', 'green'] | CREATE (:Tag {v: x}))"
    )
    assert store.version == before + 1  # one version for all four nodes
    # MERGE body: 'red' exists (skipped), 'amber' created once (id 6)
    engine().execute(
        "MATCH (s:Seed) "
        "FOREACH (x IN ['red', 'amber', 'amber'] | MERGE (:Tag {v: x}))"
    )
    return store.vertices().filter(F.col("label") == "Tag").select(
        "id", "label", prop_typed("properties", "v").alias("v")
    )


# Uniform events-precision handling (no-op for ts-free oracles; see
# graph.rewrite_events_oracles).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
