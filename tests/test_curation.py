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


def test_chunk_documents_sliding_windows(spark):
    from dd_graphdb_spark.operators.curation import chunk_documents

    d = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    out = chunk_documents(d, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_token, r.n_tokens, r.chunk_text)
        )
        by_doc[r.doc_id].sort()
    # doc 1: 10 tokens, stride 2 → starts 0,2,4,6 (start 8 would add no
    # new tokens beyond overlap reach: last start <= n - overlap - 1 = 7)
    assert by_doc[1] == [
        (0, 0, 4, "a b c d"),
        (1, 2, 4, "c d e f"),
        (2, 4, 4, "e f g h"),
        (3, 6, 4, "g h i j"),
    ]
    # short docs yield exactly one (possibly short) chunk
    assert by_doc[2] == [(0, 0, 2, "x y")]
    assert by_doc[3] == [(0, 0, 1, "solo")]
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, chunk_tokens=4, overlap=4)


def test_mixture_sample_rates_and_determinism(spark):
    from dd_graphdb_spark.operators.curation import mixture_sample

    rows = [(i, "s0" if i % 2 == 0 else "s1", "t " * 10) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mixture_sample(d, weights={"s0": 0.5, "s1": 2.0}, token_budget=1100)
    got = out.collect()
    # s1 is over-weighted past its size → rate caps at 1.0, all 100 kept
    s1 = [r for r in got if r.source == "s1"]
    assert len(s1) == 100 and all(r.rate == 1.0 for r in s1)
    # s0 rate = 1100*0.5/1100 = 0.5 → roughly half kept, deterministically
    s0 = [r for r in got if r.source == "s0"]
    assert 0 < len(s0) < 100
    again = {r.doc_id for r in mixture_sample(
        d, weights={"s0": 0.5, "s1": 2.0}, token_budget=1100).collect()}
    assert {r.doc_id for r in got} == again
    # unknown sources are dropped
    d2 = d.withColumn("source", F.lit("other"))
    assert mixture_sample(d2, weights={"s0": 1.0}, token_budget=1000).count() == 0


def test_redact_pii_patterns(spark):
    from dd_graphdb_spark.operators.text import redact_pii

    d = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-a.co.uk and 10.0.255.1"),
            (2, "phone 555-123-4567 ssn 123-45-6789"),
            (3, "clean text with no pii at all"),
            # left-boundary guard: a phone match must not start
            # mid-digit-run, so 4-3-4 shapes and long dashed IDs
            # stay whole instead of leaking a prefix
            (4, "call 5551-123-4567 id 12345-678-9012"),
            (5, "intl +1-555-123-4567 paren (555) 123-4567"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(d, "text", "doc_id").collect()}
    assert out[1].redacted == "mail <EMAIL> and <IP>"
    assert (out[1].n_email, out[1].n_ipv4) == (1, 1)
    assert out[2].redacted == "phone <PHONE> ssn <SSN>"
    assert (out[2].n_phone, out[2].n_ssn) == (1, 1)
    assert out[3].redacted == out[3].asDict()["redacted"] == "clean text with no pii at all"
    assert out[3].n_email == out[3].n_phone == out[3].n_ssn == out[3].n_ipv4 == 0
    assert out[4].redacted == "call 5551-123-4567 id 12345-678-9012"
    assert out[4].n_phone == 0
    assert out[5].redacted == "intl <PHONE> paren <PHONE>"
    assert out[5].n_phone == 2
