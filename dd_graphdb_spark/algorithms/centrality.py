"""Eigenvector & closeness centrality.

The reference DECLARES these as analytics-view algorithm variants but
never implements them (AnalyticsType Betweenness/Closeness/Eigenvector,
graph/views/src/view_types.rs:194-201) — degree centrality is the only
one with a body (incremental_engine.rs:1288-1326, in structure.py). The
semantics here are therefore standard definitions, documented precisely
so the oracles can restate them:

- eigenvector_centrality (directed): power iteration
      x'(v) = Σ_{u→v} x(u),  then  x' ← x' / max(x')
  from x0 = 1, a fixed number of iterations. Max-normalization (not L2)
  keeps every step's reduction order-independent, so results are
  engine-portable. Vertices with no in-path decay to 0.
- closeness_centrality (directed, unweighted hops):
      C(v) = (r(v) − 1) / Σ_{u reachable from v} d(v, u)
  with r(v) = number of vertices reachable from v including itself;
  C(v) = 0 when nothing else is reachable.

Scale notes: eigenvector is one join + agg per iteration (same shape and
cost as PageRank). Closeness runs a multi-source BFS — state is
O(Σ reachable sets); exact all-sources closeness is inherently quadratic
on dense graphs, so at scale pass ``sources`` (landmark sampling) and
keep exactness per landmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dd_graphdb_spark.graph import PropertyGraph
from dd_graphdb_spark.algorithms._iter import materialize as _materialize
from dd_graphdb_spark.algorithms._iter import run_loop


def _eigenvector_loop(
    g: PropertyGraph, max_iterations: int = 10, round_to: int | None = None
) -> DataFrame:
    verts = g.vertices.select("id").distinct().localCheckpoint(eager=True)
    edges = g.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    x = _materialize(verts.withColumn("score", F.lit(1.0)))
    for _ in range(max_iterations):
        contrib = (
            x.join(edges, x.id == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("score").alias("s"))
        )
        y = verts.join(contrib, "id", "left").select(
            "id", F.coalesce("s", F.lit(0.0)).alias("score")
        )
        mx = y.agg(F.max("score")).collect()[0][0]
        if not mx:  # all-zero vector (no edges): stay at zero
            x = _materialize(y)
            break
        x = _materialize(y.select("id", (F.col("score") / F.lit(float(mx))).alias("score")))
    if round_to is not None:
        x = x.select("id", F.round("score", round_to).alias("score"))
    return x


def eigenvector_centrality(
    g: PropertyGraph, max_iterations: int = 10, round_to: int | None = None
) -> DataFrame:
    """Public entry; releases loop-intermediate checkpoint blocks."""
    return run_loop(_eigenvector_loop, g, max_iterations, round_to)


def _closeness_loop(
    g: PropertyGraph,
    sources: list[int] | None = None,
    max_depth: int = 30,
) -> DataFrame:
    """(id, closeness) for every source (all vertices by default;
    landmark subset via ``sources`` at scale). Multi-source BFS: the
    frontier is keyed by (source, vertex), each round one join."""
    edges = g.edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    verts = g.vertices.select("id").distinct()
    seeds = verts if sources is None else verts.filter(F.col("id").isin(sources))
    visited = _materialize(
        seeds.select(F.col("id").alias("source"), F.col("id"), F.lit(0).alias("hops"))
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier.id == edges.src)
            .select("source", F.col("dst").alias("id"), F.lit(depth).alias("hops"))
            .distinct()
        )
        new = _materialize(nxt.join(visited, ["source", "id"], "left_anti"))
        if new.isEmpty():
            break
        visited = _materialize(visited.union(new))
        frontier = new
    per_src = visited.groupBy("source").agg(
        F.count("*").alias("r"), F.sum("hops").alias("total_d")
    )
    return per_src.select(
        F.col("source").alias("id"),
        F.when(F.col("total_d") > 0, (F.col("r") - 1) / F.col("total_d"))
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )


def closeness_centrality(
    g: PropertyGraph, sources: list[int] | None = None, max_depth: int = 30
) -> DataFrame:
    """Public entry; releases loop-intermediate checkpoint blocks."""
    return run_loop(_closeness_loop, g, sources, max_depth)
