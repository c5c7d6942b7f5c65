"""Connected components & SCC as label-propagation fixpoints.

Reference semantics:
- CC batch: union-find over undirected edges (find_connected_components,
  graph/algorithms/src/basic.rs:157-206) — component id = min vertex id.
- CC differential: min-label propagation to fixpoint
  (graph/algorithms/src/lib.rs:143-186).
- Component *count* (compute_connectivity,
  graph/views/src/incremental_engine.rs:1082-1136).
- SCC: forward ∩ reverse reachability, min-vertex representative
  (graph/algorithms/src/lib.rs:252-289).

Spark shape: iterate comp(v) ← min(comp(v), min over neighbors comp(u))
until no label changes. Each round is one join + one aggregation; rounds
≈ graph diameter. For 100 TB graphs with large diameter, switch to the
large-star/small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond") — the propagation loop here is the simple,
deterministic baseline and converges fast on short-diameter graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dd_graphdb_spark.graph import PropertyGraph

CHECKPOINT_EVERY = 5


def connected_components(g: PropertyGraph, max_iterations: int = 50) -> DataFrame:
    """Returns (id, component) with component = min vertex id reachable
    via undirected edges."""
    verts = g.vertices.select("id").distinct()
    # undirected: propagate labels both ways
    e = g.edges.select("src", "dst")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct().persist()

    comp = verts.withColumn("component", F.col("id"))
    for i in range(max_iterations):
        nbr_min = (
            comp.join(sym, comp.id == sym.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_comp = (
            comp.join(nbr_min, "id", "left")
            .select("id", F.least(F.col("component"), F.coalesce("nbr_component", "component")).alias("component"))
        )
        if (i + 1) % CHECKPOINT_EVERY == 0:
            new_comp = new_comp.localCheckpoint()
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    sym.unpersist()
    return comp


def component_count(g: PropertyGraph, max_iterations: int = 50) -> DataFrame:
    """Number of connected components (compute_connectivity parity)."""
    return connected_components(g, max_iterations).agg(
        F.count_distinct("component").alias("component_count")
    )


def strongly_connected_components(g: PropertyGraph, max_rounds: int = 25, max_iterations: int = 50) -> DataFrame:
    """SCC via forward-backward coloring (the MapReduce FW-BW algorithm;
    same result semantics as the reference's forward ∩ reverse
    reachability with min-vertex representative,
    graph/algorithms/src/lib.rs:252-289).

    Per round: (1) propagate color(v) = min id that reaches v (forward
    min-label fixpoint) over the remaining subgraph; (2) vertices that can
    reach their color root through same-colored vertices form the SCC of
    that root (backward mark fixpoint); (3) remove found SCCs, repeat.
    A DAG fully resolves in one round; each round peels ≥1 SCC per color.

    Returns (id, scc) where scc = min vertex id of the component.
    """
    remaining_v = g.vertices.select("id").distinct().persist()
    remaining_e = g.edges.select("src", "dst").distinct().persist()
    results: list[DataFrame] = []

    for _ in range(max_rounds):
        if remaining_v.limit(1).count() == 0:
            break
        # (1) forward min-label coloring over remaining subgraph
        color = remaining_v.withColumn("color", F.col("id"))
        for i in range(max_iterations):
            nbr = (
                color.join(remaining_e, color.id == remaining_e.src)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("nbr_color"))
            )
            new = color.join(nbr, "id", "left").select(
                "id", F.least(F.col("color"), F.coalesce("nbr_color", "color")).alias("color")
            )
            if (i + 1) % CHECKPOINT_EVERY == 0:
                new = new.localCheckpoint()
            changed = (
                new.alias("n").join(color.alias("o"), "id").filter(F.col("n.color") != F.col("o.color")).limit(1).count()
            )
            color = new
            if changed == 0:
                break
        color = color.persist()
        # (2) backward mark: can v reach its color root via same-color path?
        colored_e = (
            remaining_e.join(color.withColumnRenamed("id", "src").withColumnRenamed("color", "c_src"), "src")
            .join(color.withColumnRenamed("id", "dst").withColumnRenamed("color", "c_dst"), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
        ).persist()
        marked = color.filter(F.col("id") == F.col("color")).select("id", "color")
        frontier = marked
        for i in range(max_iterations):
            # colored_e already restricts to same-color endpoints, so the
            # predecessor inherits the frontier vertex's root color.
            preds = (
                frontier.join(colored_e, frontier.id == colored_e.dst)
                .select(F.col("src").alias("id"), "color")
                .distinct()
            )
            new_frontier = preds.join(marked, "id", "left_anti").localCheckpoint()
            if new_frontier.limit(1).count() == 0:
                break
            marked = marked.union(new_frontier).localCheckpoint()
            frontier = new_frontier
        results.append(marked.select("id", F.col("color").alias("scc")))
        remaining_v = remaining_v.join(marked.select("id"), "id", "left_anti").localCheckpoint()
        remaining_e = (
            remaining_e.join(marked.select(F.col("id").alias("src")), "src", "left_anti")
            .join(marked.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint()
        )
        colored_e.unpersist()
        color.unpersist()

    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out
