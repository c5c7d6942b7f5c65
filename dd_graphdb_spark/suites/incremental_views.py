"""Incremental view maintenance suite — delta application vs full
recompute, oracle-checked.

The reference's flagship capability (incremental_engine.rs:875-946:
±count/±sum on add/remove; :1139-1211: warm-started bounded-iteration
PageRank over maintained adjacency state). Each query drives
dd_graphdb_spark.views.incremental through MULTIPLE change batches and
the oracle restates the NET result from scratch — proving that the
incremental path hash-matches a full recompute.

Determinism: sums are DECIMAL(18,6) inside the state (exact,
order-independent), PageRank oracles unroll the identical IEEE-double
expression per power step (same style as suites/algorithms.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dd_graphdb_spark.localrel import local_df

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.graph import read_events

    return read_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# Aggregation view maintained by ±deltas across two batches, including
# removals. Batch 1 adds rows with event_id % 10 in 0..4; batch 2 adds
# % 10 in 5..9 AND removes % 10 == 0 (remove = -1 sign, the reference's
# apply_aggregation_remove). Net = event_id % 10 in 1..9 — which is what
# the oracle computes from scratch. count/sum/avg are delta-exact
# (min/max are conservative under delete per the reference, :885-892,
# and are covered by pytest, not this oracle).
# ---------------------------------------------------------------------------
@_q(
    "view_incremental_delta",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_v
    FROM events
    WHERE event_id % 10 <> 0
    GROUP BY event_type
    """,
)
def view_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalAggState

    state = IncrementalAggState(
        spark, tempfile.mkdtemp(prefix="iagg_"), ["event_type"], "value"
    )
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    batch1 = ev.filter(F.col("event_id") % 10 < 5).drop("event_id")
    state.apply_deltas(batch1)  # no _sign column = all adds

    adds = ev.filter(F.col("event_id") % 10 >= 5).withColumn("_sign", F.lit(1))
    removes = ev.filter(F.col("event_id") % 10 == 0).withColumn("_sign", F.lit(-1))
    state.apply_deltas(adds.unionByName(removes).drop("event_id"))

    return state.result().select("event_type", "n", "total", "avg_v")


# ---------------------------------------------------------------------------
# Analytics view (PageRank) maintained incrementally: phase 1 builds the
# triangle and runs 2 warm-start power steps from the cold 1/3 vector;
# phase 2 rewires the graph into a 4-cycle via edge deltas (+2 edges,
# -1 edge, +1 new vertex) and runs 2 MORE steps warm-started from the
# phase-1 vector. The oracle unrolls all 4 steps with the identical
# double-precision expression — the new vertex contributes nothing in
# its first step but receives rank (scores.get miss semantics,
# incremental_engine.rs:1183-1190).
# ---------------------------------------------------------------------------
_P1_EDGES = [(1, 2), (2, 3), (1, 3)]
_P2_ADDS = [(3, 4), (4, 1)]
_P2_REMOVES = [(1, 3)]
_DAMPING = 0.85


def _pr_step(cur: str, prev: str, verts: str, edges: str, outdeg: str, n: int) -> str:
    d = _DAMPING
    return f"""{cur} AS (
    SELECT v.id,
           (1.0::DOUBLE - {d}::DOUBLE)/{n}.0::DOUBLE
             + {d}::DOUBLE * COALESCE(m.s, 0.0::DOUBLE) AS rank
    FROM {verts} v LEFT JOIN (
        SELECT e.dst AS id, SUM(p.rank / o.d) AS s
        FROM {prev} p JOIN {edges} e ON p.id = e.src
        JOIN {outdeg} o ON o.src = e.src
        GROUP BY e.dst
    ) m ON v.id = m.id
)"""


def _incr_pagerank_oracle() -> str:
    def vals(rows):
        return ", ".join(f"({a}, {b})" for a, b in rows)

    e2 = sorted((set(_P1_EDGES) | set(_P2_ADDS)) - set(_P2_REMOVES))
    return (
        f"""
    WITH verts1(id) AS (VALUES (1), (2), (3)),
    edges1(src, dst) AS (VALUES {vals(_P1_EDGES)}),
    outdeg1 AS (SELECT src, COUNT(*)::DOUBLE AS d FROM edges1 GROUP BY src),
    pr0 AS (SELECT id, 1.0::DOUBLE/3.0::DOUBLE AS rank FROM verts1),
    """
        + _pr_step("pr1", "pr0", "verts1", "edges1", "outdeg1", 3)
        + ",\n"
        + _pr_step("pr2", "pr1", "verts1", "edges1", "outdeg1", 3)
        + f""",
    verts2(id) AS (VALUES (1), (2), (3), (4)),
    edges2(src, dst) AS (VALUES {vals(e2)}),
    outdeg2 AS (SELECT src, COUNT(*)::DOUBLE AS d FROM edges2 GROUP BY src),
    """
        + _pr_step("pr3", "pr2", "verts2", "edges2", "outdeg2", 4)
        + ",\n"
        + _pr_step("pr4", "pr3", "verts2", "edges2", "outdeg2", 4)
        + "\nSELECT id::BIGINT AS id, ROUND(rank, 9) AS rank FROM pr4"
    )


@_q("view_incremental_pagerank", _incr_pagerank_oracle())
def view_incremental_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalPageRank

    state = IncrementalPageRank(
        spark, tempfile.mkdtemp(prefix="ipr_"), damping=_DAMPING, iterations=2
    )
    state.apply_edge_deltas(
        local_df(spark, _P1_EDGES, "src long, dst long")
    )
    state.refresh()  # cold start: 1/3 init + 2 power steps

    deltas = local_df(spark, 
        [(s, d, 1) for s, d in _P2_ADDS] + [(s, d, -1) for s, d in _P2_REMOVES],
        "src long, dst long, _sign int",
    )
    state.apply_edge_deltas(deltas)
    ranks = state.refresh()  # warm start from the phase-1 vector

    return ranks.select("id", F.round("rank", 9).alias("rank"))


# ---------------------------------------------------------------------------
# Connectivity view maintained incrementally (compute_connectivity,
# incremental_engine.rs:1082-1136): batch 1 builds {1-2-3}, {4-5} plus
# isolated vertex 6 (3 components); batch 2 removes (1,2) and adds
# (3,4), (5,6) — net components {1}, {2,3,4,5,6} = 2. The oracle
# recomputes components from scratch on the NET edge set via a
# recursive min-label closure; the view goes through the real
# ViewCatalog.register_incremental / apply_deltas path.
# ---------------------------------------------------------------------------
_CONN_VERTS = [1, 2, 3, 4, 5, 6]
_CONN_B1 = [(1, 2), (2, 3), (4, 5)]
_CONN_B2_ADDS = [(3, 4), (5, 6)]
_CONN_B2_REMOVES = [(1, 2)]


def _conn_oracle() -> str:
    net = sorted((set(_CONN_B1) | set(_CONN_B2_ADDS)) - set(_CONN_B2_REMOVES))
    vvals = ", ".join(f"({v})" for v in _CONN_VERTS)
    evals = ", ".join(f"({s}, {d})" for s, d in net)
    return f"""
    WITH RECURSIVE
    verts(id) AS (VALUES {vvals}),
    edges(src, dst) AS (VALUES {evals}),
    sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(id, r) AS (
        SELECT id, id FROM verts
        UNION
        SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT COUNT(DISTINCT component)::BIGINT AS component_count,
           COUNT(*)::BIGINT AS vertex_count
    FROM comp
    """


@_q("view_incremental_connectivity", _conn_oracle())
def view_incremental_connectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import (
        IncrementalConnectivity,
        ViewCatalog,
        ViewDefinition,
    )

    catalog = ViewCatalog(spark, tempfile.mkdtemp(prefix="views_"))
    state = IncrementalConnectivity(spark, tempfile.mkdtemp(prefix="iconn_"))
    catalog.register_incremental(
        ViewDefinition(name="connectivity", view_type="analytics"), state
    )
    catalog.apply_deltas(
        "connectivity", local_df(spark, _CONN_VERTS, "long").toDF("id")
    )
    catalog.apply_deltas(
        "connectivity", local_df(spark, _CONN_B1, "src long, dst long")
    )
    deltas = local_df(spark, 
        [(s, d, 1) for s, d in _CONN_B2_ADDS]
        + [(s, d, -1) for s, d in _CONN_B2_REMOVES],
        "src long, dst long, _sign int",
    )
    catalog.apply_deltas("connectivity", deltas)
    return catalog.read("connectivity")


# ---------------------------------------------------------------------------
# Shortest-path view maintained incrementally (compute_shortest_path,
# incremental_engine.rs:1214-1285): batch 1 gives 1→3 dist 3.0 via
# 1->2->3; batch 2 removes (2,3), re-weights (1,3) to 2.0 (UpdateEdge =
# insert-overwrite, :1072-1077) and adds 2→4→3 — net best is
# 1->2->4->3 at 2.5. Oracle enumerates all paths of the net DAG and
# keeps the min-distance row for the target, with the reference's
# "a->b->c" path string + path_length.
# ---------------------------------------------------------------------------
_SSSP_B1 = [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 5.0)]
_SSSP_B2 = [
    (2, 3, None, -1),  # RemoveEdge
    (1, 3, 2.0, 1),  # UpdateEdge: overwrite weight
    (2, 4, 1.0, 1),
    (4, 3, 0.5, 1),
]


def _sssp_net_edges():
    state = {(s, d): w for s, d, w in _SSSP_B1}
    for s, d, w, sign in _SSSP_B2:
        if sign < 0:
            state.pop((s, d), None)
        else:
            state[(s, d)] = w
    return sorted((s, d, w) for (s, d), w in state.items())


def _incr_sssp_oracle() -> str:
    evals = ", ".join(f"({s}, {d}, {w})" for s, d, w in _sssp_net_edges())
    return f"""
    WITH RECURSIVE
    edges_raw(src, dst, w) AS (VALUES {evals}),
    edges AS (SELECT src, dst, w::DOUBLE AS w FROM edges_raw),
    paths(id, distance, path, hops) AS (
        SELECT 1, 0.0::DOUBLE, '1', 1
        UNION ALL
        SELECT e.dst, p.distance + e.w, p.path || '->' || e.dst::VARCHAR,
               p.hops + 1
        FROM paths p JOIN edges e ON p.id = e.src
        WHERE p.hops < 10
    )
    SELECT distance, path, hops::INT AS path_length FROM paths
    WHERE id = 3
    QUALIFY ROW_NUMBER() OVER (ORDER BY distance, path) = 1
    """


@_q("view_incremental_sssp", _incr_sssp_oracle())
def view_incremental_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalSSSP

    state = IncrementalSSSP(
        spark, tempfile.mkdtemp(prefix="isssp_"), source=1, target=3
    )
    state.apply_deltas(
        local_df(spark, _SSSP_B1, "src long, dst long, weight double")
    )
    state.apply_deltas(
        local_df(spark, _SSSP_B2, "src long, dst long, weight double, _sign int")
    )
    return state.result()


# ---------------------------------------------------------------------------
# Degree-centrality view maintained incrementally
# (compute_degree_centrality, incremental_engine.rs:1288-1326): net
# graph = connectivity fixture's path 2-3-4-5-6 plus isolated vertex 1;
# degree = |out-set|+|in-set|, centrality = max_degree / (2·(n−1)),
# smallest id wins ties (deterministic stand-in for the reference's
# HashMap iteration order). Oracle recomputes from the net edge set.
# ---------------------------------------------------------------------------
def _degree_oracle() -> str:
    net = sorted((set(_CONN_B1) | set(_CONN_B2_ADDS)) - set(_CONN_B2_REMOVES))
    vvals = ", ".join(f"({v})" for v in _CONN_VERTS)
    evals = ", ".join(f"({s}, {d})" for s, d in net)
    return f"""
    WITH verts(id) AS (VALUES {vvals}),
    edges(src, dst) AS (VALUES {evals}),
    deg AS (
        SELECT v.id, COUNT(e.id) AS degree
        FROM verts v LEFT JOIN (
            SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
        ) e ON v.id = e.id
        GROUP BY v.id
    ),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM deg)
    SELECT d.id::BIGINT AS max_vertex,
           d.degree::BIGINT AS max_degree,
           ROUND(d.degree / (2.0 * (n.n - 1.0)), 9) AS centrality,
           n.n::BIGINT AS vertex_count
    FROM deg d CROSS JOIN n
    ORDER BY d.degree DESC, d.id
    LIMIT 1
    """


@_q("view_incremental_degree", _degree_oracle())
def view_incremental_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalDegreeCentrality

    state = IncrementalDegreeCentrality(spark, tempfile.mkdtemp(prefix="ideg_"))
    state.apply_vertex_deltas(local_df(spark, _CONN_VERTS, "long").toDF("id"))
    state.apply_edge_deltas(local_df(spark, _CONN_B1, "src long, dst long"))
    state.apply_edge_deltas(
        local_df(spark, 
            [(s, d, 1) for s, d in _CONN_B2_ADDS]
            + [(s, d, -1) for s, d in _CONN_B2_REMOVES],
            "src long, dst long, _sign int",
        )
    )
    return state.result()


# ---------------------------------------------------------------------------
# End-to-end: the streaming pipeline feeds micro-batches into a
# catalog-registered incremental aggregation view; the final view must
# equal the all-data aggregate (full-recompute parity through the real
# foreachBatch path). The file stream delivers the events table, one
# file per micro-batch.
# ---------------------------------------------------------------------------
@_q(
    "view_incremental_stream",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type
    """,
)
def view_incremental_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming.pipeline import events_stream, incremental_view_pipeline
    from dd_graphdb_spark.views import IncrementalAggState, ViewCatalog, ViewDefinition

    catalog = ViewCatalog(spark, tempfile.mkdtemp(prefix="views_"))
    state = IncrementalAggState(
        spark, tempfile.mkdtemp(prefix="iagg_"), ["event_type"], "value"
    )
    catalog.register_incremental(
        ViewDefinition(name="events_by_type", view_type="aggregation"), state
    )
    stream = events_stream(spark, sf_dir)
    incremental_view_pipeline(
        stream,
        catalog,
        delta_map={"events_by_type": lambda b: b.select("event_type", "value")},
    )
    return catalog.read("events_by_type").select("event_type", "n", "total")


# ---------------------------------------------------------------------------
# Triangle-count view maintained incrementally (beyond the reference's
# four maintained analytics; same contract). Batch 1 builds K4 on
# {1,2,3,4} (4 triangles); batch 2 removes (1,2) and adds (4,5),(5,1)
# — net: 2 triangles from the K4 remnant plus {1,4,5}. The oracle
# enumerates a<b<c wedge-closures over the net undirected edge set.
# ---------------------------------------------------------------------------
_TRI_B1 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
_TRI_B2_ADDS = [(4, 5), (5, 1)]
_TRI_B2_REMOVES = [(1, 2)]


def _tri_oracle() -> str:
    net = sorted((set(_TRI_B1) | set(_TRI_B2_ADDS)) - set(_TRI_B2_REMOVES))
    evals = ", ".join(f"({s}, {d})" for s, d in net)
    return f"""
    WITH e(src, dst) AS (VALUES {evals}),
    und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst
    ),
    tri AS (
        SELECT COUNT(*)::BIGINT AS triangle_count
        FROM und xy JOIN und yz ON xy.b = yz.a
        JOIN und xz ON xz.a = xy.a AND xz.b = yz.b
    )
    SELECT triangle_count, (SELECT COUNT(*)::BIGINT FROM und) AS edge_count
    FROM tri
    """


@_q("view_incremental_triangles", _tri_oracle())
def view_incremental_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalTriangles

    state = IncrementalTriangles(spark, tempfile.mkdtemp(prefix="itri_"))
    state.apply_edge_deltas(local_df(spark, _TRI_B1, "src long, dst long"))
    state.apply_edge_deltas(
        local_df(spark, 
            [(s, d, 1) for s, d in _TRI_B2_ADDS]
            + [(s, d, -1) for s, d in _TRI_B2_REMOVES],
            "src long, dst long, _sign int",
        )
    )
    return state.result()


# ---------------------------------------------------------------------------
# K-core membership view maintained incrementally (k_core itself:
# graph/algorithms/src/lib.rs:46-82). Batch 1 = K4 on {1,2,3,4} plus a
# degree-1 tail (4,5); batch 2 removes (1,2) and attaches 5 to {1,2} —
# net: every vertex reaches degree >= 3, so the 3-core grows from the
# K4 to all 5 vertices. The oracle value comes from an independent
# in-suite peeling model over the net edge set (k-core peeling is
# iterated deletion — not expressible as a recursive CTE with
# aggregation), evaluated at definition time.
# ---------------------------------------------------------------------------
_KCORE_K = 3
_KCORE_B1 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
_KCORE_B2_ADDS = [(5, 1), (5, 2)]
_KCORE_B2_REMOVES = [(1, 2)]


def _kcore_model() -> tuple[int, int]:
    und = {
        tuple(sorted(e))
        for e in (set(_KCORE_B1) | set(_KCORE_B2_ADDS)) - set(_KCORE_B2_REMOVES)
    }
    verts = {v for e in und for v in e}
    while True:
        deg = {v: 0 for v in verts}
        for a, b in und:
            if a in verts and b in verts:
                deg[a] += 1
                deg[b] += 1
        drop = {v for v, d in deg.items() if d < _KCORE_K}
        if not drop:
            return len(verts), len(und)
        verts -= drop
        und = {e for e in und if e[0] in verts and e[1] in verts}


_KCORE_SIZE, _KCORE_EDGES = _kcore_model()
# edge_count in the view result is the MAINTAINED undirected edge set
# (pre-peel), matching IncrementalTriangles' metadata semantics
_KCORE_NET_EDGES = len(
    {tuple(sorted(e)) for e in (set(_KCORE_B1) | set(_KCORE_B2_ADDS)) - set(_KCORE_B2_REMOVES)}
)


@_q(
    "view_incremental_kcore",
    f"SELECT {_KCORE_SIZE}::BIGINT AS core_size, {_KCORE_NET_EDGES}::BIGINT AS edge_count",
)
def view_incremental_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalKCore

    state = IncrementalKCore(spark, tempfile.mkdtemp(prefix="ikcore_"), k=_KCORE_K)
    state.apply_edge_deltas(local_df(spark, _KCORE_B1, "src long, dst long"))
    state.apply_edge_deltas(
        local_df(spark, 
            [(s, d, 1) for s, d in _KCORE_B2_ADDS]
            + [(s, d, -1) for s, d in _KCORE_B2_REMOVES],
            "src long, dst long, _sign int",
        )
    )
    return state.result()


# ---------------------------------------------------------------------------
# Community (LPA) view maintained incrementally — beyond the reference's
# four maintained analytics, same contract. Batch 1 builds two triangles
# joined by a bridge; batch 2 cuts the bridge and hangs a pendant. The
# oracle value comes from an in-suite model replaying the SAME
# deterministic synchronized rounds on the net edge set.
# ---------------------------------------------------------------------------
_LPA_B1 = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
_LPA_B2_ADDS = [(6, 7)]
_LPA_B2_REMOVES = [(3, 4)]
_LPA_VIEW_ROUNDS = 4


def _lpa_model() -> tuple[int, int]:
    edges = (set(_LPA_B1) | set(_LPA_B2_ADDS)) - set(_LPA_B2_REMOVES)
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        if a != b:
            nbrs.setdefault(a, []).append(b)
            nbrs.setdefault(b, []).append(a)
    verts = sorted(nbrs)
    lbl = {v: v for v in verts}
    for _ in range(_LPA_VIEW_ROUNDS):
        nxt = {}
        for v in verts:
            counts: dict[int, int] = {}
            for u in set(nbrs[v]):
                counts[lbl[u]] = counts.get(lbl[u], 0) + 1
            nxt[v] = min(
                (l for l in counts if counts[l] == max(counts.values()))
            ) if counts else lbl[v]
        lbl = nxt
    return len(set(lbl.values())), len(verts)


_LPA_COMMUNITIES, _LPA_NVERTS = _lpa_model()


@_q(
    "view_incremental_lpa",
    f"SELECT {_LPA_COMMUNITIES}::BIGINT AS community_count, "
    f"{_LPA_NVERTS}::BIGINT AS vertex_count",
)
def view_incremental_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views import IncrementalLPA

    state = IncrementalLPA(
        spark, tempfile.mkdtemp(prefix="ilpa_"), rounds=_LPA_VIEW_ROUNDS
    )
    state.apply_edge_deltas(local_df(spark, _LPA_B1, "src long, dst long"))
    state.apply_edge_deltas(
        local_df(spark, 
            [(s, d, 1) for s, d in _LPA_B2_ADDS]
            + [(s, d, -1) for s, d in _LPA_B2_REMOVES],
            "src long, dst long, _sign int",
        )
    )
    return state.result()


# ---------------------------------------------------------------------------
# Maintained per-group centroids (LLM-ops counterpart of the agg state):
# add the whole embeddings table, then retract every 5th vector — the
# state must equal a direct recompute over the survivors.
# ---------------------------------------------------------------------------
@_q(
    "view_incremental_centroids",
    """
    WITH e AS (
        SELECT label, unnest(list_transform(generate_series(1, len(embedding)),
                     i -> {'dim': i,
                           'x': CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,6))})) AS u
        FROM embeddings WHERE vec_id % 5 <> 0
    )
    SELECT label::VARCHAR AS label, u.dim AS dim,
           ROUND(CAST(SUM(u.x) AS DOUBLE) / COUNT(*), 6) AS centroid
    FROM e GROUP BY 1, 2
    """,
)
def view_incremental_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views.incremental import IncrementalCentroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    state = IncrementalCentroids(spark, tempfile.mkdtemp(prefix="icent_"), "label")
    state.apply_deltas(emb.select("label", "embedding"))
    state.apply_deltas(
        emb.filter(F.col("vec_id") % 5 == 0)
        .select("label", "embedding")
        .withColumn("_sign", F.lit(-1))
    )
    return state.result()


# ---------------------------------------------------------------------------
# Maintained MinHash signatures: add the corpus, retract every 7th doc,
# update every 11th surviving doc (retract preimage + add postimage with
# appended tokens) — the state must equal signatures computed directly
# over the resulting corpus. Ingest cost is O(batch), never a rescan.
# ---------------------------------------------------------------------------
def _inc_minhash_oracle() -> str:
    from dd_graphdb_spark.suites.llm_ops import SQL_SHINGLE_HASHES, _sql_minhash_sig

    body = (SQL_SHINGLE_HASHES[1:] + ", " + _sql_minhash_sig()[1:]).replace(
        "FROM documents", "FROM docs2"
    )
    return (
        """
    WITH docs2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN text || ' zz zz zz'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0
    ),
    """
        + body
        + "SELECT id, h0, h1, h2, h3, h4, h5, h6, h7 FROM sig"
    )


@_q("view_incremental_minhash", _inc_minhash_oracle())
def view_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.views.incremental import IncrementalMinHash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    st = IncrementalMinHash(spark, tempfile.mkdtemp(prefix="imh_"))
    st.apply_deltas(docs)
    st.apply_deltas(
        docs.filter(F.col("doc_id") % 7 == 0).withColumn("_sign", F.lit(-1))
    )
    upd = docs.filter((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0))
    st.apply_deltas(
        upd.withColumn("_sign", F.lit(-1)).unionByName(
            upd.withColumn("text", F.concat(F.col("text"), F.lit(" zz zz zz")))
            .withColumn("_sign", F.lit(1))
        )
    )
    return st.result()


# Uniform events-precision handling (no-op for ts-free oracles; see
# graph.rewrite_events_oracles).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
