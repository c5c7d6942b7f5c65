"""10x-replica scale curves (README "Measured scale curves").

Replicates sf0.1 inputs with DISJOINT id/user/token spaces per replica
so per-key neighborhoods stay constant and the correct output grows
exactly 10x — naive replication would share hot keys across replicas
and grow the correct output quadratically, measuring the workload
definition instead of the engine. Inputs are materialized to parquet
first so the timed region is the operator, not the replica union.

Usage: python tools/scale_curve.py [sf_dir] [op ...]
Ops: asof_hotkey | dedup_clusters | range_join_bands | chunk_docs |
     tfidf_topk | cc_derived | sssp_colocation
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

U_OFF = 10_000_000
E_OFF = 100_000_000
D_OFF = 10_000_000


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def events_input(spark, sf_dir, n_replicas, path):
    from dd_graphdb_spark.graph import read_events

    ev = read_events(spark, sf_dir)
    parts = [
        ev.select(
            (F.col("event_id") + i * E_OFF).alias("event_id"),
            (F.col("user_id") + i * U_OFF).alias("user_id"),
            "event_type",
            "ts",
            "value",
        )
        for i in range(n_replicas)
    ]
    _union(parts).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def docs_input(spark, sf_dir, n_replicas, path):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # token space disjoint per replica: prefix every whitespace token
    parts = [
        d.select(
            (F.col("doc_id") + i * D_OFF).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"r{i}$1").alias("text"),
        )
        for i in range(n_replicas)
    ]
    _union(parts).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def asof_hotkey(ev):
    from dd_graphdb_spark.operators.timeseries import asof_join

    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_id", "click_value"],
        tiebreak="click_id",
        hot_key_bucket_seconds=6 * 3600.0,  # two-level (key, bucket) mode
    )


def dedup_clusters(docs):
    from dd_graphdb_spark.operators.dedup import near_dup_clusters

    return near_dup_clusters(docs, 0.18)


def range_join_bands(ev):
    from dd_graphdb_spark.operators.rangejoin import range_join

    bands = ev.sparkSession.createDataFrame(
        [(i, i * 40.0 - 10.0, i * 40.0 + 50.0) for i in range(13)],
        "band_id int, lo double, hi double",
    )
    joined = range_join(
        ev.select("event_id", "value"), bands, "value", "lo", "hi", band_width=60.0
    )
    return joined.groupBy("band_id").agg(F.count("*").alias("n"))


def chunk_docs(docs):
    from dd_graphdb_spark.operators.curation import chunk_documents

    return chunk_documents(docs, chunk_tokens=64, overlap=16)


def tfidf_topk(docs):
    from dd_graphdb_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(docs, k=3)


V_OFF = 100_000_000


def _write_graph(spark, g, n_replicas, path):
    """Replicate a PropertyGraph with disjoint vertex-id spaces per
    replica and materialize to parquet so the timed region is the
    algorithm, not the replica union."""
    from dd_graphdb_spark.graph import PropertyGraph

    vparts = [
        g.vertices.select(
            (F.col("id") + i * V_OFF).alias("id"),
            *[c for c in g.vertices.columns if c != "id"],
        )
        for i in range(n_replicas)
    ]
    eparts = [
        g.edges.select(
            (F.col("src") + i * V_OFF).alias("src"),
            (F.col("dst") + i * V_OFF).alias("dst"),
            *[c for c in g.edges.columns if c not in ("src", "dst")],
        )
        for i in range(n_replicas)
    ]
    _union(vparts).write.mode("overwrite").parquet(f"{path}/vertices")
    _union(eparts).write.mode("overwrite").parquet(f"{path}/edges")
    return PropertyGraph(
        spark.read.parquet(f"{path}/vertices"), spark.read.parquet(f"{path}/edges")
    )


def fk_graph_input(spark, sf_dir, n_replicas, path):
    from dd_graphdb_spark.graph import materialized_tpch_graph

    return _write_graph(spark, materialized_tpch_graph(spark, sf_dir), n_replicas, path)


def colocation_graph_input(spark, sf_dir, n_replicas, path):
    """The weighted symmetric supplier co-location graph the
    algo_sssp_colocation query runs on (disjoint cliques per nation) —
    the SAME builder the gate query uses, so the curve measures the
    gate query's exact workload."""
    from dd_graphdb_spark.suites.algorithms import _colocation_weighted_graph

    return _write_graph(
        spark, _colocation_weighted_graph(spark, sf_dir), n_replicas, path
    )


def cc_derived(g):
    from dd_graphdb_spark import algorithms as A

    return A.connected_components(g)


def sssp_colocation(g):
    from dd_graphdb_spark import algorithms as A
    from dd_graphdb_spark.suites.algorithms import SUPP

    # replica 0's source; 10x replicas grow the EDGE side of every
    # Bellman-Ford round 10x while the reachable set stays constant —
    # the per-round join/agg cost is what the curve measures
    return A.sssp(
        g, source=SUPP, weight_property="w", max_iterations=10,
        on_exhaustion="truncate",
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])

    from dd_graphdb_spark import get_spark

    spark = get_spark("scale-curve")
    work = tempfile.mkdtemp(prefix="scale_")

    def timed(tag, fn, frame):
        t0 = time.time()
        rows = fn(frame).count()
        dt = time.time() - t0
        print(f"{tag}: {rows} rows in {dt:.2f}s", flush=True)
        return dt

    ops = {
        "asof_hotkey": (events_input, asof_hotkey),
        "dedup_clusters": (docs_input, dedup_clusters),
        "range_join_bands": (events_input, range_join_bands),
        "chunk_docs": (docs_input, chunk_docs),
        "tfidf_topk": (docs_input, tfidf_topk),
        "cc_derived": (fk_graph_input, cc_derived),
        "sssp_colocation": (colocation_graph_input, sssp_colocation),
    }
    unknown = only - ops.keys()
    if unknown:
        print(f"ERROR: unknown op(s): {sorted(unknown)} (have: {sorted(ops)})")
        sys.exit(2)
    for name, (builder, op) in ops.items():
        if only and name not in only:
            continue
        one = builder(spark, sf_dir, 1, f"{work}/{name}_1x")
        ten = builder(spark, sf_dir, 10, f"{work}/{name}_10x")
        op(one).count()  # warm codegen/plans so the 1x leg isn't charged for it
        t1 = timed(f"{name} 1x", op, one)
        t10 = timed(f"{name} 10x", op, ten)
        print(f"{name}: wall ratio {t10 / t1:.2f}x for 10x data", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
