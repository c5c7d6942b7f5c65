"""Training-data curation operators: contamination, packing, repetition.

The north-star brief's pipeline family beyond dedup/similarity — the
three checks every large-scale pretraining data pipeline runs between
raw corpus and training shards:

- ``ngram_contamination``: which corpus docs share ≥ k distinct n-gram
  hashes with a benchmark/eval set (train-test leakage detection);
- ``pack_sequences``: deterministic concat-and-chunk of docs into
  fixed-token windows (sequence packing for training);
- ``repetition_scores``: intra-document repetition ratios (a standard
  quality signal — boilerplate/spam detection).

All three reuse the token-hash-fold shingle arithmetic from
operators.dedup (engine-portable; the DuckDB oracles restate it) and
stay JVM-side — no Python in any hot path.

Scale notes (100 TB):
- contamination: the probe (benchmark) side is tiny by construction —
  its exploded shingle set broadcasts; the corpus side streams through
  one scan + one broadcast-hash join + one partial-agg groupBy. No
  corpus self-join anywhere.
- packing: a global running token count is the single-task trap; docs
  are hash-bucketed first (deterministic md5 bucket, same trick as
  operators.sampling) and each bucket packs independently — one
  shuffle, per-task rows bounded by bucket population. Packing quality
  is unaffected: chunks never span buckets by design, exactly like
  parallel shard writers.
- repetition: pure per-row projection (whole-stage codegen, zero
  shuffles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dd_graphdb_spark.operators.dedup import _fold, token_hashes
from dd_graphdb_spark.operators.text import tokens


def _all_shingle_hashes(th: Column, n: int) -> Column:
    """Hashed n-shingles WITHOUT the distinct (repetition needs
    multiplicity; contamination applies distinct itself). ``th`` must be
    a bound column — see dedup._shingles_from_token_hashes."""
    return F.when(
        F.size(th) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - n),
            lambda i: _fold(F.slice(th, i + 1, n)),
        ),
    ).otherwise(F.array(_fold(th)))


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    min_overlap: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, probe_id, n_shared): corpus docs sharing at least
    ``min_overlap`` DISTINCT n-gram hashes with a probe document —
    the train/eval contamination check. The probe side (benchmark) is
    assumed small and is broadcast after shingling."""
    # reuse dedup's shingle_hash_table: one definition of the distinct
    # hashed-shingle explode (including its explode_outer pushdown
    # guard — plain explode re-evaluates the shingle expression per row,
    # measured 6x; see shingle_hash_table's docstring)
    from dd_graphdb_spark.operators.dedup import shingle_hash_table

    def shingled(df, out_id):
        return shingle_hash_table(df, text_col, id_col, n).withColumnRenamed(
            "id", out_id
        )

    d = shingled(docs, "doc_id_")
    p = shingled(probes, "probe_id")
    return (
        d.join(F.broadcast(p), "x")
        .groupBy(F.col("doc_id_").alias(id_col), "probe_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def pack_sequences(
    docs: DataFrame,
    window_tokens: int,
    n_buckets: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic concat-and-chunk sequence packing: docs are
    md5-hash-bucketed, ordered by id within their bucket, and assigned
    to the chunk where their running token offset starts:

        chunk = floor(exclusive_prefix_token_sum / window_tokens)

    Returns (doc_id, bucket, chunk, n_tokens, offset) — offset is the
    doc's token start position within its bucket stream. Engine-portable
    (md5 bucket + window cumsum restate identically in SQL)."""
    toks = F.size(tokens(F.col(text_col)))
    from dd_graphdb_spark.operators.sampling import hash_bucket

    b = F.pmod(hash_bucket(F.col(id_col)), F.lit(n_buckets))
    d = docs.select(
        F.col(id_col), toks.alias("n_tokens"), b.cast("int").alias("bucket")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.select(
        id_col,
        "bucket",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("offset"),
    ).withColumn(
        "chunk", F.floor(F.col("offset") / F.lit(window_tokens)).cast("long")
    )


def repetition_scores(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shingles, n_distinct, dup_ratio): intra-document
    repetition — dup_ratio = 1 − distinct/total n-gram hashes. 0 for a
    repetition-free doc, → 1 for pure boilerplate. One projection, no
    shuffle."""
    t = docs.select(
        F.col(id_col), token_hashes(F.col(text_col)).alias("_th")
    )
    sh = t.select(id_col, _all_shingle_hashes(F.col("_th"), n).alias("_sh"))
    total = F.size("_sh")
    distinct = F.size(F.array_distinct("_sh"))
    return sh.select(
        id_col,
        total.alias("n_shingles"),
        distinct.alias("n_distinct"),
        F.round(F.lit(1.0) - distinct.cast("double") / total, 6).alias("dup_ratio"),
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture sampling: pick per-source hash-sample
    rates so each source contributes ≈ ``token_budget * weights[source]``
    tokens (rate capped at 1 when a source is too small). The training-
    data "data mixing" step — e.g. 60% web / 30% code / 10% books out
    of a skewed raw corpus.

    Unlike operators.sampling.stratified_sample (caller-fixed rates),
    the rates here are DERIVED from corpus statistics, yet selection
    stays content-hash deterministic: same corpus + budget ⇒ same rows,
    on any engine. Returns (doc_id, source, n_tokens, rate).

    Scale: one partial-agg groupBy for per-source token totals (a
    handful of rows), broadcast back; acceptance is a row-local
    predicate. Sources absent from ``weights`` get weight 0 (dropped).
    """
    from dd_graphdb_spark.operators.sampling import BUCKETS, hash_bucket

    toks = F.size(tokens(F.col(text_col)))
    d = docs.select(F.col(id_col), F.col(source_col), toks.alias("n_tokens"))
    totals = d.groupBy(source_col).agg(F.sum("n_tokens").alias("_tot"))
    wmap = F.create_map(
        *[F.lit(x) for k, v in weights.items() for x in (k, float(v))]
    )
    rates = totals.select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(token_budget))
            * F.coalesce(wmap[F.col(source_col)], F.lit(0.0))
            / F.col("_tot").cast("double"),
        ).alias("_rate"),
    )
    return (
        d.join(F.broadcast(rates), source_col)
        .filter(
            hash_bucket(F.col(id_col))
            < F.floor(F.col("_rate") * F.lit(float(BUCKETS))).cast("bigint")
        )
        .select(id_col, source_col, "n_tokens", F.round("_rate", 6).alias("rate"))
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding token-window chunking (context-window preparation):
    chunk ``i`` covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the final chunk may be short, and
    a doc shorter than one window yields exactly one chunk. Returns
    (doc_id, chunk_id, start_token, n_tokens, chunk_text).

    Pure per-row explode — no shuffle; the token array binds to a real
    column before slicing so it is materialized once per doc, not once
    per chunk (same trap as dedup's shingle transform).
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    d = docs.select(F.col(id_col), toks.alias("_t")).withColumn("_n", F.size("_t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - overlap - 1, F.lit(0)), F.lit(stride)
    )
    e = d.select(id_col, "_t", "_n", F.posexplode(starts).alias("chunk_id", "start_token"))
    return e.select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.col("start_token").cast("long"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("start_token"))
        .cast("long")
        .alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_t"), F.col("start_token") + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
    )
