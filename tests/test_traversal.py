"""Traversal operators, incl. skew-safe common_neighbors
(reference get_*_neighbors / traverse_* — graph/storage/src/lib.rs:738-830;
common_neighbors pattern src/social_network_platform.rs:527-554)."""

import pytest
from pyspark.sql import functions as F

import dd_graphdb_spark.operators.traversal as T
from dd_graphdb_spark.graph import PropertyGraph


@pytest.fixture()
def skewed_graph(spark):
    # dst=100 is a hot key (40 sources); dst=200 and 201 are cold (3 and 2)
    edges = (
        [(i, 100, "link") for i in range(1, 41)]
        + [(1, 200, "link"), (2, 200, "link"), (3, 200, "link")]
        + [(2, 201, "link"), (3, 201, "link")]
    )
    v = spark.createDataFrame([(i,) for i in range(1, 41)] + [(100,), (200,), (201,)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long, label string")
    return PropertyGraph(v, e)


def _as_dict(df):
    return {(r["a"], r["b"]): r["common_count"] for r in df.collect()}


def test_common_neighbors_salted_matches_unsalted(skewed_graph):
    # force the salted path for dst=100 (degree 40 > threshold 10) and
    # check it produces exactly the all-pairs result
    salted = _as_dict(T.common_neighbors(skewed_graph, salt_threshold=10, n_salts=4))
    plain = _as_dict(T.common_neighbors(skewed_graph, salt_threshold=10**9))
    assert salted == plain
    # spot checks: (1,2) share dst 100 and 200; (2,3) share 100, 200, 201
    assert salted[(1, 2)] == 2
    assert salted[(2, 3)] == 3
    # hot-key pair count: every pair of the 40 sources shares dst 100
    assert sum(1 for k in salted if salted[k] >= 1) == 40 * 39 // 2 + 0  # all pairs involve dst100 sources


def test_common_neighbors_min_common(skewed_graph):
    out = _as_dict(T.common_neighbors(skewed_graph, min_common=3, salt_threshold=10))
    assert out == {(2, 3): 3}


def test_common_neighbors_max_degree_cap(skewed_graph):
    # cap hot dst=100 to its 5 lowest-id sources → only those pairs remain
    # from the hot key; cold keys unaffected
    out = _as_dict(T.common_neighbors(skewed_graph, salt_threshold=10, max_degree=5))
    assert out[(1, 2)] == 2  # dst100 (both in cap) + dst200
    assert (6, 7) not in out  # outside the cap, only shared dst100
    assert out[(2, 3)] == 3


def test_neighbors_and_hops(spark, people_graph):
    # people_graph: 1→2→3
    assert {r["neighbor_id"] for r in T.out_neighbors(people_graph, 1).collect()} == {2}
    assert {r["neighbor_id"] for r in T.in_neighbors(people_graph, 3).collect()} == {2}
    two = T.traverse_2hop(people_graph, 1)
    assert {r["neighbor_id"] for r in two.collect()} == {3}


def test_common_neighbors_multigraph_counts_distinct(spark):
    """Parallel edges (multigraph) must not inflate common-neighbor
    counts by the product of edge multiplicities."""
    from dd_graphdb_spark.graph import PropertyGraph
    from dd_graphdb_spark.operators.traversal import common_neighbors

    v = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    e = spark.createDataFrame(
        [(1, 3, "follows"), (1, 3, "likes"), (2, 3, "follows")],
        "src long, dst long, label string",
    )
    out = common_neighbors(PropertyGraph(v, e), min_common=1)
    assert [(r["a"], r["b"], r["common_count"]) for r in out.collect()] == [(1, 2, 1)]
