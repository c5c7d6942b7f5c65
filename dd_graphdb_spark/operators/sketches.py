"""Sketch operators for streaming/approximate analytics.

The reference has no sketch machinery (its windowed distinct is an exact
HashSet count, graph/views/src/windowed_operations.rs:464-474); these
are the operators a 100 TB pipeline uses where exact state is
unaffordable, per the north-star brief ("a novel sketch" as a
first-class custom operator):

- Count-Min sketch: frequency estimation in sub-linear space. Fixed
  (a, b) hash family => fully deterministic, so the DuckDB oracle can
  restate the identical arithmetic and the estimate is engine-portable.
  Build is one explode + groupBy (one shuffle of d rows per item);
  estimates are a broadcast lookup + min over the d rows.
- HyperLogLog / quantile wrappers: Spark's built-in sketch aggregates
  (approx_count_distinct, percentile_approx) under the operator-surface
  names; bounds are pytest-checked (their internals are not
  engine-portable, so no value-hash oracle).

Scale notes: the CMS table is d x width counters regardless of input
size; building it map-side combines before the shuffle, estimating
broadcasts the (tiny) sketch. This is the classic turnstile-stream
design (Cormode & Muthukrishnan) expressed as two DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
# (a, b) rows of the CMS hash family h_j(x) = ((a*x + b) mod P) mod width
CMS_PARAMS = [(3, 1), (5, 7), (7, 13), (11, 19)]


def _cms_bucket(x: Column, a: int, b: int, width: int) -> Column:
    return ((F.lit(a) * x + F.lit(b)) % MOD) % width


def cms_build(df: DataFrame, key_col: str, width: int = 64) -> DataFrame:
    """Build a Count-Min sketch over an integer key column.

    Returns the sketch as a DataFrame (j, bucket, cnt) with one row per
    non-empty counter — at most d x width rows total, independent of
    |df|. One explode (d rows per input row) + one groupBy; partial
    aggregation combines map-side so the shuffle carries counters, not
    items.
    """
    x = F.col(key_col).cast("long")
    levels = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_bucket(x, a, b, width).alias("bucket"))
            for j, (a, b) in enumerate(CMS_PARAMS)
        ]
    )
    return (
        df.select(F.explode(levels).alias("l"))
        .groupBy(F.col("l.j").alias("j"), F.col("l.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, keys_df: DataFrame, key_col: str, width: int = 64) -> DataFrame:
    """Point frequency estimates: est(k) = min_j sketch[j][h_j(k)].
    Always >= the true count (collisions only inflate). ``keys_df``
    carries the keys to estimate; the sketch side is broadcast."""
    x = F.col(key_col).cast("long")
    probes = keys_df.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_bucket(x, a, b, width).alias("bucket")
                    )
                    for j, (a, b) in enumerate(CMS_PARAMS)
                ]
            )
        ).alias("l"),
    ).select(key_col, F.col("l.j").alias("j"), F.col("l.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def hll_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct-count sketch (Spark built-in aggregate).
    Relative standard deviation ``rsd`` trades space for accuracy."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def quantile_sketch(df: DataFrame, col: str, probs: list[float], accuracy: int = 10000) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna style built-in).
    ``accuracy`` is the inverse of the rank error bound 1/accuracy."""
    return df.agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles")
    )
