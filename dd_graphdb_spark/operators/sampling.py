"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled *by content identity*, not by RNG state:
``rand()``-based sampling is irreproducible across retries, partitions
and engines, which breaks dataset versioning (the same doc must land in
the same split on every rerun and on every engine that audits the
split). The standard fix is hash-bucket sampling: bucket =
hash(stable_key) mod D, keep the row iff bucket < rate·D. Reproducible,
engine-portable, and prunable (the predicate pushes down to the scan).

The bucket hash here is the first 8 hex digits of md5(key) — chosen
because every engine agrees on md5 of a decimal string rendering
(Spark: conv(substring(md5(x),1,8),16,10); DuckDB/ANSI:
('0x'||substring(md5(x),1,8))::BIGINT), so the *same rows* are selected
by any engine that re-derives the split.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket modulus — 16^8, the value space of 8 hex digits
BUCKETS = 1 << 32


def hash_bucket(key: Column) -> Column:
    """Deterministic uniform bucket in [0, 2^32) from a stable key."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")


def deterministic_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, selected by content hash of ``key``."""
    return df.filter(hash_bucket(F.col(key)) < int(rate * BUCKETS))


def stratified_sample(
    df: DataFrame, strata_col: str, key: str, rates: Mapping[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum hash sampling: each stratum keeps its own rate (e.g.
    downsample dominant languages, keep all of rare ones). One scan, no
    shuffle — the predicate is a pure row-local expression.
    """
    rate = F.lit(float(default_rate))
    for value, r in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    threshold = (rate * F.lit(float(BUCKETS))).cast("bigint")
    return df.filter(hash_bucket(F.col(key)) < threshold)
