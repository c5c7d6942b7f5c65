"""Skew-safe self-join pair generation, shared by common-neighbors and
MinHash-LSH candidate generation.

A self-join on a grouping key emits d² pairs for a key with d members,
and an unsalted join computes each hot key's d² in ONE task. This helper
splits hot keys (group size > ``salt_threshold``) onto a salted path:
the left side is bucketed into ``n_salts`` salts by member id and the
right side is replicated per salt, spreading each hot key's pair
generation across n_salts tasks. Exact output, parallel work — the same
technique AQE's skew-join mitigation applies to shuffled joins, done
explicitly so it also covers the pair-explosion stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_self_pairs(
    df: DataFrame,
    id_col: str,
    key_cols: list[str],
    salt_threshold: int = 1000,
    n_salts: int = 16,
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All ordered pairs (a < b) of ``id_col`` values sharing identical
    ``key_cols`` values — one output row per matching key instance
    (callers count or distinct as needed). Hot keys are salted.

    ``payload_cols``: extra columns carried through the pair join and
    emitted per side as ``<col>_a`` / ``<col>_b`` — for verification
    steps that need per-member data (vectors, norms) on BOTH sides of
    each candidate. Carrying the payload through the one key-partitioned
    join replaces two post-hoc re-attach joins (candidates ⋈ members on
    a, then on b — two extra shuffles of the full member table, guide
    §2.4); the payload never crosses an extra exchange because the pair
    join's output feeds the verify filter pipeline-locally. The size
    aggregation projects the payload away, so it still shuffles one
    narrow row per member."""
    base = df.select(F.col(id_col).alias("_m"), *key_cols, *payload_cols)
    sizes = base.groupBy(*key_cols).agg(F.count("*").alias("_sz"))
    hot = sizes.filter(F.col("_sz") > salt_threshold).select(*key_cols)

    pay_a = [F.col(c).alias(f"{c}_a") for c in payload_cols]
    pay_b = [F.col(c).alias(f"{c}_b") for c in payload_cols]
    out_cols = ["a", "b", *[f"{c}_a" for c in payload_cols], *[f"{c}_b" for c in payload_cols]]
    a = base.select(F.col("_m").alias("a"), *key_cols, *pay_a)
    b = base.select(F.col("_m").alias("b"), *key_cols, *pay_b)

    # Explosive-join parallelism guard: the pair join's INPUTS are tiny
    # (one row per member) while its OUTPUT is d² per key, so AQE —
    # which sizes post-shuffle partitions by INPUT bytes — coalesces the
    # probe side to ~1 partition and the whole explosion runs in one
    # task (observed at sf1: 5 hot keys × 15k members = 1.1B join rows
    # on a single core). An explicit repartition with a user-specified
    # partition count is exempt from AQE coalescing, so the probe side
    # keeps one slot per (key, salt) cell; per-task output is bounded
    # by cell size (hot: d·d/n_salts; cold: ≤ salt_threshold² per key).
    n_parts = max(n_salts * 16, base.sparkSession.sparkContext.defaultParallelism * 4)

    a_cold = a.join(F.broadcast(hot), key_cols, "left_anti").repartition(
        n_parts, *key_cols
    )
    b_cold = b.join(F.broadcast(hot), key_cols, "left_anti")
    pairs_cold = a_cold.join(b_cold, key_cols).select(*out_cols)

    a_hot = (
        a.join(F.broadcast(hot), key_cols)
        .withColumn("_salt", F.pmod(F.hash("a"), F.lit(n_salts)).cast("int"))
        .repartition(n_parts, *key_cols, "_salt")
    )
    b_hot = b.join(F.broadcast(hot), key_cols).select(
        *key_cols,
        "b",
        *[F.col(f"{c}_b") for c in payload_cols],
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt"),
    )
    pairs_hot = a_hot.join(b_hot, [*key_cols, "_salt"]).select(*out_cols)

    return pairs_cold.union(pairs_hot).filter(F.col("a") < F.col("b"))
