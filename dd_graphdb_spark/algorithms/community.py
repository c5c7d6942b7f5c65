"""Label-propagation community detection (synchronized, deterministic).

Beyond the reference's algorithm set (its analytics enum stops at
PageRank/CC/shortest-path/degree + declared-only centralities,
graph/views/src/view_types.rs:194-201); LPA is the standard next
community primitive for a property-graph engine.

Semantics (deterministic by construction, hence oracle-unrollable):
synchronized rounds; each round EVERY vertex adopts the most frequent
label among its undirected neighbors, ties broken by the smallest
label; vertices with no neighbors keep their label. Fixed
``max_iterations`` (classic LPA stops at stability; fixed rounds keep
the result a pure function of the input so the DuckDB oracle can
restate it round by round).

Spark shape: per round one join (edges ⋈ labels on the neighbor end),
one groupBy count, one per-vertex argmax window, one left join back to
the vertex universe — all shuffles on vertex id. Lineage is cut on a
checkpoint cadence (see algorithms/pagerank.py for the measurement).
At 100 TB: same posture as PageRank — co-partition edges and labels by
id; AQE absorbs hub skew in the count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dd_graphdb_spark.graph import PropertyGraph
from dd_graphdb_spark.algorithms._iter import RoundPins, copartitioned, run_loop


def _lpa_loop(
    g: PropertyGraph, max_iterations: int = 5, ckpt_every: int = 4
) -> DataFrame:
    verts = g.vertices.select("id").localCheckpoint(eager=True)
    e = g.edges.select("src", "dst")
    # partitioned on dst — the per-round join key (sym.dst == labels.nbr)
    sym = copartitioned(
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        "dst",
    )
    pins = RoundPins(g.vertices.sparkSession)
    labels = verts.withColumn("lbl", F.col("id"))
    w = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("lbl").asc())
    for i in range(max_iterations):
        freq = (
            sym.join(labels.withColumnRenamed("id", "nbr"), sym.dst == F.col("nbr"))
            .select(F.col("src").alias("id"), "lbl")
            .groupBy("id", "lbl")
            .agg(F.count("*").alias("c"))
        )
        pick = (
            freq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("lbl").alias("new_lbl"))
        )
        labels = (
            labels.join(pick, "id", "left")
            .select("id", F.coalesce("new_lbl", "lbl").alias("lbl"))
        )
        if (i + 1) % ckpt_every == 0 or i == max_iterations - 1:
            labels = pins.materialize(labels)
            pins.release_except(labels)
    return labels.select("id", F.col("lbl").alias("community"))


def label_propagation(
    g: PropertyGraph, max_iterations: int = 5, ckpt_every: int = 4
) -> DataFrame:
    """(id, community) after ``max_iterations`` synchronized LPA rounds."""
    return run_loop(_lpa_loop, g, max_iterations, ckpt_every)
