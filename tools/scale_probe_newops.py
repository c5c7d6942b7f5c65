"""Decade probe for the round-11 LLM-pipeline operators.

Measures the two NEW operators across three measured decades
(sf0.1 → .scale/sf1 → .scale/sf10, the same composed replicas the
headline curves use):

- ``semantic_dedup`` (SemDeDup) with CORPUS-SCALED cells — the
  documented 100 TB posture: n_centroids grows with the corpus so the
  within-cell quadratic work stays bounded (~625 vectors/cell here:
  8 → 32 → 128 cells as embeddings grow ×4/decade). At fixed cells the
  pair count would be N²/C (quadratic per decade); with scaled cells
  it is N·cell_size/2 (linear) plus the N·C quantizer scoring pass.
- ``duplicate_spans`` (exact-substring) — one explode row per token,
  two partial-agg groupBys: expected token-linear.

Execution is forced with the same NOOP sink as bench.py (count() would
let Catalyst prune projection-only bodies); the bench CPU probe is
re-measured per point so ratios can be read against host state.

Usage: python tools/scale_probe_newops.py  (writes one JSON line)
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dd_graphdb_spark import get_spark
from dd_graphdb_spark.operators import dedup as D
from dd_graphdb_spark.operators import similarity as S

# corpus-scaled coarse quantizer: ~625 vectors per cell at every decade
CELLS = {"0.1": 8, "1": 32, "10": 128}
DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1": "/root/repo/.scale/sf1",
    "10": "/root/repo/.scale/sf10",
}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _hygiene(spark) -> None:
    gc.collect()
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    spark = get_spark("scale-probe-newops")
    out = {}
    for sf in ("0.1", "1", "10"):
        emb = spark.read.parquet(f"{DIRS[sf]}/embeddings.parquet")
        docs = spark.read.parquet(f"{DIRS[sf]}/documents.parquet")
        nv, nd = emb.count(), docs.count()

        _hygiene(spark)
        t = time.time()
        spark.range(200_000_000).selectExpr("sum(id * 2)").collect()
        cal = round(time.time() - t, 3)

        _hygiene(spark)
        t = time.time()
        _noop(S.semantic_dedup(emb, n_centroids=CELLS[sf], threshold=0.4))
        sem = round(time.time() - t, 3)
        print(f"# sf{sf}: semantic_dedup {sem}s (cells={CELLS[sf]})", file=sys.stderr)

        # r12 multi-probe variant: candidate volume ≤ n_probe² per
        # cell, still cell-local — the recall/cost knob measured
        _hygiene(spark)
        t = time.time()
        _noop(
            S.semantic_dedup(
                emb, n_centroids=CELLS[sf], threshold=0.4, n_probe=2
            )
        )
        sem2 = round(time.time() - t, 3)
        print(f"# sf{sf}: semantic_dedup n_probe=2 {sem2}s", file=sys.stderr)

        _hygiene(spark)
        t = time.time()
        _noop(D.duplicate_spans(docs, window=8))
        spans = round(time.time() - t, 3)
        print(f"# sf{sf}: exact_substring {spans}s", file=sys.stderr)

        out[sf] = {
            "n_vectors": nv,
            "n_docs": nd,
            "cells": CELLS[sf],
            "semantic_dedup_sec": sem,
            "semantic_dedup_p2_sec": sem2,
            "exact_substring_sec": spans,
            "calibration_range_sum_2e8_sec": cal,
        }
    print(json.dumps({"metric": "newops_scale_probe", "sf_points": out}))


if __name__ == "__main__":
    main()
