"""Embedding-matrix operators: exact covariance and PCA projection.

The 100 TB shape for second-order statistics over an embedding column is
a single scan producing CONSTANT-SIZE partials (d and d×d accumulators)
reduced on the driver — never a shuffle of the vectors themselves. Two
paths:

- ``covariance_pairs``: fully declarative (decimal-exact sums of element
  products, engine-portable — the DuckDB oracle restates the identical
  arithmetic) for a dim subset; the gate query uses this.
- ``gram_matrix`` / ``pca_project``: the full-width path — Arrow
  ``mapInPandas`` partials (numpy X^T X per batch, one d×d array per
  partition) + driver eigendecomposition, then a broadcast-literal
  projection. d is model-dimension (64-4096): the driver reduce is
  d²·n_partitions floats, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dec(vec: Column, i: int) -> Column:
    """Element i (1-based) as DECIMAL(18,6) via double — the repo's
    proven engine-portable float→decimal route."""
    return F.element_at(vec, i).cast("double").cast("decimal(18,6)")


def covariance_pairs(
    df: DataFrame, vec_col: str, dims: list[int]
) -> DataFrame:
    """Population covariance cov(i, j) for every i <= j in ``dims``
    (1-based element indexes), decimal-exact until the final fixed
    double expression: cov = (Σxy − ΣxΣy/n)/n. One scan, one aggregate
    row, then a constant unpivot — no per-pair passes."""
    v = F.col(vec_col)
    aggs = [F.count("*").alias("n")]
    for i in dims:
        aggs.append(F.sum(_dec(v, i)).alias(f"s{i}"))
    for a, i in enumerate(dims):
        for j in dims[a:]:
            aggs.append(F.sum(_dec(v, i) * _dec(v, j)).alias(f"p{i}_{j}"))
    s = df.agg(*aggs)
    pair_rows = []
    for a, i in enumerate(dims):
        for j in dims[a:]:
            cov = (
                F.col(f"p{i}_{j}").cast("double")
                - F.col(f"s{i}").cast("double")
                * F.col(f"s{j}").cast("double")
                / F.col("n")
            ) / F.col("n")
            pair_rows.append(
                F.struct(
                    F.lit(i).alias("i"), F.lit(j).alias("j"),
                    F.round(cov, 6).alias("cov"),
                )
            )
    return s.select(F.explode(F.array(*pair_rows)).alias("r")).select(
        "r.i", "r.j", "r.cov"
    )


def gram_matrix(df: DataFrame, vec_col: str, d: int):
    """(n, sums[d], gram[d][d]) via Arrow partials: each batch
    contributes one numpy X^T X — constant-size regardless of rows."""
    import numpy as np
    import pandas as pd

    schema = "n long, sums binary, gram binary"

    def partials(batches):
        n = 0
        sums = np.zeros(d)
        gram = np.zeros((d, d))
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            sums += X.sum(axis=0)
            gram += X.T @ X
        yield pd.DataFrame(
            {"n": [n], "sums": [sums.tobytes()], "gram": [gram.tobytes()]}
        )

    rows = df.select(vec_col).mapInPandas(partials, schema).collect()
    n = sum(r["n"] for r in rows)
    sums = np.sum([np.frombuffer(r["sums"]) for r in rows], axis=0)
    gram = np.sum(
        [np.frombuffer(r["gram"]).reshape(d, d) for r in rows], axis=0
    )
    return n, sums, gram


def pca_components(df: DataFrame, vec_col: str, d: int, k: int):
    """Top-k principal axes of the mean-centered embedding matrix.
    Driver math is d×d (eigh of the covariance assembled from the
    distributed gram partials). Sign convention: each component's
    largest-|coordinate| entry is positive (deterministic)."""
    import numpy as np

    n, sums, gram = gram_matrix(df, vec_col, d)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k × d
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    return mean, comps, vals[order]


def pca_project(df: DataFrame, vec_col: str, d: int, k: int) -> DataFrame:
    """Project each embedding onto the top-k principal axes. The mean
    and component matrix ship as ONE literal each (constant-size plan,
    same pattern as similarity._matrix_lit); the projection is a pure
    JVM fold per component."""
    mean, comps, _ = pca_components(df, vec_col, d, k)
    v = F.col(vec_col)
    # ONE array literal per vector (F.lit(list)), not d per-element
    # F.lit() nodes: per-element literals make the plan O(d*(k+1)) and
    # similarity._matrix_lit measured that form at ~3s plan build + ~6s
    # codegen at just 64 dims
    cent = F.zip_with(
        v.cast("array<double>"),
        F.lit([float(m) for m in mean]),
        lambda x, m: x - m,
    )
    out_cols = []
    for ci, comp in enumerate(comps):
        axis = F.lit([float(c) for c in comp])
        out_cols.append(
            F.aggregate(
                F.zip_with(cent, axis, lambda x, c: x * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"pc{ci}")
        )
    return df.select("*", *out_cols)


def group_centroids(df: DataFrame, vec_col: str, group_col: str) -> DataFrame:
    """Per-group centroid vectors, emitted as (group, dim, centroid)
    rows (dim is 1-based): decimal-exact per-dimension sums, then one
    fixed double division. posexplode → partial-agg groupBy on
    (group, dim) — one shuffle whose width is n_groups × d, independent
    of corpus size. The k-means/IVF training-stats primitive."""
    e = df.select(
        F.col(group_col).alias("_grp"),
        F.posexplode(F.col(vec_col)).alias("_pos", "_x"),
    )
    dec = F.col("_x").cast("double").cast("decimal(18,6)")
    return (
        e.groupBy("_grp", "_pos")
        .agg(F.count("*").alias("_n"), F.sum(dec).alias("_s"))
        .select(
            F.col("_grp").alias(group_col),
            (F.col("_pos") + 1).cast("long").alias("dim"),
            # floor(x*1e6 + 0.5)/1e6, NOT round(x, 6): the mean of a
            # decimal sum over a power-of-two count lands on exact
            # binary halves (… .0000005), where Spark rounds half-even
            # and DuckDB half-away — the explicit idiom is the same
            # arithmetic on both engines (sf0.1 gate regression, r13)
            (
                F.floor(
                    F.col("_s").cast("double") / F.col("_n") * 1e6 + 0.5
                ) / 1e6
            ).alias("centroid"),
        )
    )
