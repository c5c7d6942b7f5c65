"""Curation operators: contamination, packing, repetition — edge
semantics on fixtures (oracle parity is covered by the gate queries)."""

import pytest
from pyspark.sql import functions as F

from dd_graphdb_spark.operators.curation import (
    ngram_contamination,
    pack_sequences,
    repetition_scores,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat today"),
            (2, "the cat sat on the mat yesterday"),  # near-copy of 1
            (3, "spam spam spam spam spam spam"),  # pure repetition
            (4, "unique words only here"),
            (5, "tiny"),  # < n tokens
        ],
        "doc_id long, text string",
    )


def test_contamination_hits_near_copy_only(spark, docs):
    probes = docs.filter(F.col("doc_id") == 1)
    out = {
        (r["doc_id"], r["probe_id"]): r["n_shared"]
        for r in ngram_contamination(docs, probes, n=3, min_overlap=3).collect()
    }
    # doc 1 matches itself fully (5 shingles of 7 tokens), doc 2 shares
    # the 4 shingles not touching the last word; others are clean
    assert out[(1, 1)] == 5 and out[(2, 1)] == 4
    assert set(out) == {(1, 1), (2, 1)}


def test_repetition_scores(spark, docs):
    out = {r["doc_id"]: r for r in repetition_scores(docs, n=3).collect()}
    assert out[3]["n_shingles"] == 4 and out[3]["n_distinct"] == 1
    assert out[3]["dup_ratio"] == 0.75
    assert out[4]["dup_ratio"] == 0.0
    assert out[5]["n_shingles"] == 1  # short doc folds to one shingle


def test_pack_sequences_chunks_are_contiguous(spark, docs):
    rows = pack_sequences(docs, window_tokens=10, n_buckets=2).collect()
    assert len(rows) == 5
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["offset"] == cum  # exclusive prefix sum in id order
            assert r["chunk"] == cum // 10  # assigned where the doc starts
            cum += r["n_tokens"]


def test_contamination_broadcasts_probe_side(spark, docs):
    p = (
        ngram_contamination(docs, docs.limit(1), n=3, min_overlap=1)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_repetition_has_no_shuffle(spark, docs):
    p = (
        repetition_scores(docs)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Exchange" not in p


def test_bpe_token_count_segments(spark):
    from dd_graphdb_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [
            (1, "it's fine, really!"),   # it|'s| fine|,| really|! = 6
            (2, "abc123 x"),             # abc|123| x = 3
            (3, "  "),                   # one whitespace run
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(df).collect()}
    assert out == {1: 6, 2: 3, 3: 1}
