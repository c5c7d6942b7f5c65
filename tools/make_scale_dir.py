"""Materialize an sf1-shaped testdata directory by replicating sf0.1.

Follows the driver generator's measured scaling law (sf0.01 → sf0.1):
facts scale x10 per decade with FIXED dimensions (5 regions, 25
nations, 5 event types, 5 market segments), per-entity neighborhoods
constant (orders-per-customer, events-per-user), embeddings x4.

Replication rules (one replica = one disjoint key universe):
- customer/supplier/part/orders/lineitem: primary keys offset per
  replica; FKs point into the SAME replica (per-entity fan-outs stay
  exactly the generator's). Nation/region/segment/status columns are
  shared dimensions, so per-dimension-value row counts grow x10 — the
  honest hot-key axis a real sf1 would have.
- events: event_id and user_id offset per replica (max user_id grows
  x10 per decade in the generator), event_type/ts/value/props kept —
  per-type densities grow x10.
- documents: doc_id offset; every whitespace token gets a per-replica
  prefix, keeping the duplicate/near-duplicate RATE constant (the
  generator draws new documents, not copies; see README scale-curve
  methodology). n_chars updated to the prefixed length.
- embeddings: x4 (the generator's measured rate); replica r>0 vectors
  are deterministically perturbed (+0.003*r per component before
  re-normalization is skipped — operators normalize internally) so no
  cross-replica zero-distance twins exist.

Usage: python tools/make_scale_dir.py [out_dir] [n_replicas] [src_dir] [off_mult]
       (defaults: /root/repo/.scale/sf1, 10, /root/testdata/sf0.1, 1)

The second decade composes: build sf10 from a built sf1 with the key
offsets scaled by the source's own decade —

    python tools/make_scale_dir.py .scale/sf10 10 .scale/sf1 10

(sf1's key space is 10x sf0.1's, so replica offsets scale by 10; the
dimension tables and scaling law are unchanged — facts x10, embeddings
x4, constant per-entity fan-outs, per-dimension densities x10.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key offsets = 10x the sf0.1 key-space size (room for 10 replicas)
OFF = {
    "c_custkey": 15_000,
    "s_suppkey": 1_000,
    "p_partkey": 20_000,
    "o_orderkey": 150_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# FK columns that share a parent key space
_FK = {
    "o_custkey": "c_custkey",
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
}


def _shift(df, i, _offsets=None):
    cols = []
    for c in df.columns:
        key = _FK.get(c, c)
        if key in OFF:
            cols.append((F.col(c) + i * OFF[key]).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(cols)


def main():
    global SRC
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    SRC = sys.argv[3] if len(sys.argv) > 3 else SRC
    off_mult = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    for k in OFF:
        OFF[k] *= off_mult

    from dd_graphdb_spark import get_spark
    from dd_graphdb_spark.graph import read_events

    spark = get_spark("make-scale-dir")
    os.makedirs(out, exist_ok=True)
    t_all = time.time()

    # shared dimensions: straight copies
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    # keyed facts: replicate with per-replica key offsets
    for t in ("customer", "supplier", "part", "orders", "lineitem"):
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        _union([_shift(df, i, OFF) for i in range(n)]).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: done", flush=True)

    # events: normalized read (ns→µs handled), then offset ids/users
    ev = read_events(spark, SRC)
    _union([_shift(ev, i, OFF) for i in range(n)]).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    print("events: done", flush=True)

    # documents: disjoint token space per replica, constant dup-rate
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = [
        d.select(
            (F.col("doc_id") + i * OFF["doc_id"]).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"r{i}$1").alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text"))
        for i in range(n)
    ]
    _union(parts).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("documents: done", flush=True)

    # embeddings: x4 per decade (the generator's measured rate)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eparts = [
        emb.select(
            (F.col("vec_id") + i * OFF["vec_id"]).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x + F.lit(0.003 * i)).cast("float")
            ).alias("embedding"),
            "label",
        )
        for i in range(4)
    ]
    _union(eparts).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print("embeddings: done", flush=True)

    print(f"built {out} ({n} replicas) in {time.time() - t_all:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
