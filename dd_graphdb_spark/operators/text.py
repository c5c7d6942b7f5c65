"""Text-analysis operators for training-data pipelines.

All pure built-in column expressions (whole-stage-codegen friendly, no
Python in the hot path): token counting, quality scoring, heuristic
language ID, content fingerprinting. Each has a DuckDB-restatable
definition so the correctness gate covers it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("a", "the", "and", "of", "to", "in", "is")


def tokens(text: Column) -> Column:
    r"""Whitespace tokens: split on \s+ runs (a single-space split
    counted empty tokens on double spaces and never split tabs or
    newlines — corrupting every downstream ratio on real multi-line
    text); empty/blank text yields an EMPTY array, not [''] — so
    ratios divide by the true token count (null on empty via n=0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count (the BPE-ish regex variant belongs in a
    tokenizer UDF; this is the deterministic fast path)."""
    return df.select(F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_tokens"))


# GPT-2-style pre-tokenizer pattern, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookarounds, leftmost-first alternation. Contractions, space-prefixed
# letter/digit/punctuation runs, residual whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-ish token count: non-overlapping matches of the GPT-2-style
    pre-tokenizer regex (the merge-table lookup of a real BPE belongs in
    a pandas-UDF tokenizer; the pre-token count is the deterministic
    JVM-side path and the standard budget estimator). ``regexp_count``
    stays inside whole-stage codegen."""
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality heuristics: mean token length, stopword ratio, and a
    composite score. Mirrors the shape of C4/Gopher-style quality rules
    (length + stopword density), all in exact rational arithmetic until
    the final rounded division."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    # case-insensitive stopword match: C4/Gopher-style rules lowercase
    # before matching ('The' is a stopword too)
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        # try_divide: an EMPTY doc has n=0 (ratios NULL, pass 0) — a
        # plain divide raises under Spark 4's default ANSI mode
        F.round(F.try_divide(total_chars, n), 6).alias("mean_token_len"),
        F.round(F.try_divide(stop, n), 6).alias("stopword_ratio"),
        # composite: long-enough docs with natural stopword density
        ((n >= 20) & (F.try_divide(stop, n) >= 0.02)).cast("int").alias("quality_pass"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: English stopword density threshold.
    (A real n-gram model plugs in here; the heuristic is the
    deterministic, oracle-checkable baseline.)"""
    toks = tokens(F.col(text_col))
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    ratio = F.try_divide(stop, F.size(toks))  # NULL (→ unknown) on empty docs
    return df.select(
        F.col(id_col),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonicalized content fingerprint: md5 of lower(trim(text)).
    Used as the exact-dedup key and as a stable doc identity across
    pipeline stages."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
    )


# PII patterns restricted to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): ASCII classes, \b word
# boundaries, bounded repetition — no lookarounds. Applied in list
# order; replacement tags are single tokens so later patterns never
# match inside an earlier redaction.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # real phone shapes: optional +country, 3-3-4 with -, ., or space
    # separators, optional parenthesized area code. The left guard is a
    # `\b`-anchored alternation (not a lookbehind — RE2 has none): a
    # digit-led match must start at a word boundary, so the pattern
    # cannot start mid-digit-run ('5551-123-4567' and 14-digit IDs like
    # '12345-678-9012' stay untouched instead of leaking a prefix).
    ("phone", r"(?:\+\d{1,2}[-. ]\(?|\(|\b)\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Regex PII redaction (emails, dashed phone/SSN shapes, IPv4) —
    the scrubbing pass a pretraining pipeline runs before tokenization.
    Returns (id, redacted, n_email, n_phone, n_ssn, n_ipv4); counts are
    non-overlapping matches against the ORIGINAL text.

    Pure regexp_replace/regexp_count projection: whole-stage codegen,
    zero shuffles, linear scan at any scale.
    """
    out = F.col(text_col)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return df.select(F.col(id_col), out.alias("redacted"), *counts)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: score = tf · ln(N / df) with
    raw counts (tf = term occurrences in the doc, df = docs containing
    the term, N = corpus size). Ties break on the term string, so the
    top-k is a total order. Returns (id, term, tf, df, score, rank).

    Shape: explode → two partial-agg groupBys (term-in-doc, then doc
    frequency) → broadcast-size N → per-doc top-k window. The df table
    is corpus-vocabulary-sized; the join to it shuffles on term, which
    at 100 TB is the standard term-partitioned inverted-index build.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("_n").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def bigram_lm_scores(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    r"""Language-model quality scoring (the CCNet/RefinedWeb-style
    perplexity-proxy filter): train an add-k-smoothed bigram LM on the
    corpus itself, then score each document by its mean bigram
    log-probability. Returns (id, n_bigrams, lm_score) — lm_score is
    NULL for documents with fewer than two tokens; higher = more
    corpus-typical text (boilerplate scores high, noise scores low).

        P(w2 | w1) = (c(w1, w2) + k) / (c(w1·) + k·V)

    with V the corpus vocabulary size and c(w1·) the count of w1 as a
    bigram LEFT context (so unseen contexts reduce to ln(1/V)).

    Determinism contract: each bigram's ln(P) is rounded to 9 decimals
    BEFORE the per-doc sum (log() may differ between engines in the
    last ulp — ~1e-16 relative, far below 1e-9), and the sum runs over
    DECIMAL(28,9) so it is exact and order-independent; the mean is
    rounded to 6.

    Shape: one explode to the per-doc bigram table, two partial-agg
    groupBys for the model (bigram counts; left-context counts derived
    from them), a broadcast 1-row vocab size, and ONE shuffle joining
    doc-bigrams to the model on (w1, w2) — the standard term-partitioned
    LM-training/scoring layout; the model table is corpus-bigram-sized
    and never collects to the driver.

    100 TB skew posture: the (w1, w2) model join's key distribution IS
    the corpus bigram distribution — stop-word bigrams ("of the") are
    Zipf-hot, so at corpus scale a handful of keys carry percent-level
    shares of the shuffle. The join stays a plain shuffled equi-join on
    purpose: the model side is exactly one row per key, so AQE's
    skew-join split (spark.sql.adaptive.skewJoin, on by default here)
    subdivides an oversized probe partition and replicates the matching
    1-row build slice — no salting needed because nothing explodes
    (output rows == probe rows). Salting would only be required if the
    model side ever became multi-row per key (it cannot: groupBy(w1, w2)
    precedes it).
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    big = toks.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.expr("slice(t, 2, greatest(size(t) - 1, 0))"),
            )
        ).alias("bg"),
    ).select("id", F.col("bg")["0"].alias("w1"), F.col("bg")["1"].alias("w2"))
    c12 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    model = c12.join(c1, "w1").crossJoin(F.broadcast(vocab))
    scored = big.join(model, ["w1", "w2"]).select(
        "id",
        F.round(
            F.log((F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k) * F.col("v"))),
            9,
        )
        .cast("decimal(28,9)")
        .alias("logp"),
    )
    per_doc = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        # two portability rules (sf0.1 gate regression, r13): cast the
        # exact DECIMAL sum to DOUBLE BEFORE dividing (decimal division
        # picks engine-specific quotient scales; double division is the
        # same IEEE op on both), and floor(x*1e6+0.5)/1e6 instead of
        # round(x,6) (exact binary halves round half-even on Spark,
        # half-away on DuckDB)
        (
            F.floor(
                F.sum("logp").cast("double") / F.count("*") * 1e6 + 0.5
            ) / 1e6
        ).alias("lm_score"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "lm_score",
        )
    )
