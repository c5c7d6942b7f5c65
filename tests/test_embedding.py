"""Embedding gram/PCA path (operators/embedding.py) — the parts the SQL
oracle can't express (eigendecomposition); covariance_pairs itself is
DuckDB-oracle-checked via the embedding_covariance gate query."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dd_graphdb_spark.operators.embedding import (
    covariance_pairs,
    gram_matrix,
    pca_components,
    pca_project,
)

D = 6
N = 300


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated on a known axis
    base = rng.randn(N, D) * 0.1
    base[:, 2] += rng.randn(N) * 3.0  # dominant direction = dim 2
    base[:, 0] += 1.5  # non-zero mean
    rows = [(i, [float(x) for x in base[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, base.astype(np.float32).astype(np.float64)


def test_gram_matches_numpy(spark, emb):
    df, X = emb
    n, sums, gram = gram_matrix(df, "embedding", D)
    assert n == N
    np.testing.assert_allclose(sums, X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(gram, X.T @ X, rtol=1e-9)


def test_pca_finds_dominant_axis_and_is_deterministic(spark, emb):
    df, X = emb
    mean, comps, vals = pca_components(df, "embedding", D, k=2)
    # top component is the planted dominant dimension
    assert np.argmax(np.abs(comps[0])) == 2
    assert vals[0] > 5 * vals[1]
    # deterministic sign convention: largest-|coord| entry positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    mean2, comps2, vals2 = pca_components(df, "embedding", D, k=2)
    np.testing.assert_array_equal(comps, comps2)


def test_projection_matches_numpy_model(spark, emb):
    df, X = emb
    mean, comps, _ = pca_components(df, "embedding", D, k=2)
    got = (
        pca_project(df, "embedding", D, k=2)
        .select("vec_id", "pc0", "pc1")
        .toPandas()
        .sort_values("vec_id")
    )
    expect = (X - X.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(got["pc0"].to_numpy(), expect[:, 0], atol=1e-6)
    np.testing.assert_allclose(got["pc1"].to_numpy(), expect[:, 1], atol=1e-6)


def test_covariance_pairs_matches_numpy(spark, emb):
    df, X = emb
    rows = covariance_pairs(df, "embedding", [1, 3]).collect()
    got = {(r["i"], r["j"]): r["cov"] for r in rows}
    # decimal(18,6)-quantized inputs: compare against the same quantization
    Q = np.round(X[:, [0, 2]], 6)
    C = np.cov(Q.T, bias=True)
    assert got[(1, 1)] == pytest.approx(C[0, 0], abs=2e-6)
    assert got[(1, 3)] == pytest.approx(C[0, 1], abs=2e-6)
    assert got[(3, 3)] == pytest.approx(C[1, 1], abs=2e-6)
