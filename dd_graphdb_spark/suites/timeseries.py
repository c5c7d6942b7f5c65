"""Time-series + sampling suite: as-of join, hypertable rollup,
approx-distinct scale path, deterministic stratified sampling.

These extend the reference surface with the event-pipeline operations a
training-data platform needs (SURVEY §2.3 note: the reference has only
vertex-id equi-joins; no time-series joins or sampling exist anywhere in
it). Oracles restate exact arithmetic per the determinism contract in
suites/__init__.py — the sampling oracle re-derives the identical
md5-bucket split in SQL, proving the split is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dd_graphdb_spark.localrel import local_df

from dd_graphdb_spark.operators.sampling import BUCKETS, stratified_sample
from dd_graphdb_spark.operators.timeseries import asof_join, time_rollup

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.graph import read_events

    return read_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# As-of join: attribute each purchase to the user's latest click at or
# before it (pandas merge_asof(direction='backward') semantics; ties on
# timestamp resolved to the greatest click_id). Implemented as ONE
# shuffle on user_id + an in-partition sort — no inequality join, no
# per-key quadratic blowup (operators/timeseries.py docstring).
# ---------------------------------------------------------------------------
@_q(
    "asof_purchase_attribution",
    """
    WITH p AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts, event_id AS click_id, value AS click_value
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.click_id, c.click_value,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.cts DESC, c.click_id DESC
               ) AS rn
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id AND c.cts <= p.ts
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           value,
           COALESCE(click_id, -1) AS click_id,
           COALESCE(click_value, -1.0) AS click_value
    FROM j WHERE rn = 1
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_id", "click_value"],
        tiebreak="click_id",
    )
    # sentinel-fill unmatched rows (nullable int columns round-trip as
    # floats through the comparators' pandas path) and render ts as a
    # string (no recorded-green gate query emits a raw TIMESTAMP column;
    # same convention as the streaming suite) — asof_join itself keeps
    # nulls and timestamps, see tests
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "value",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce("click_value", F.lit(-1.0)).alias("click_value"),
    )


# ---------------------------------------------------------------------------
# Hypertable-style time rollup: (day), (day, hour) and grand-total
# aggregates in ONE scan via ROLLUP (map-side partial agg covers all
# grains simultaneously). gid: 0 = (day,hour), 1 = (day), 3 = total —
# restated in SQL as a CASE over the null pattern so it is engine-
# portable (ts is never null, so null day/hour only arise from rollup).
# ---------------------------------------------------------------------------
@_q(
    "events_time_rollup",
    """
    SELECT COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
           COALESCE(CAST(EXTRACT(hour FROM ts) AS INT), -1) AS hr,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           CASE WHEN CAST(ts AS DATE) IS NULL
                     AND CAST(EXTRACT(hour FROM ts) AS INT) IS NULL THEN 3
                WHEN CAST(EXTRACT(hour FROM ts) AS INT) IS NULL THEN 1
                ELSE 0 END AS gid
    FROM events
    GROUP BY ROLLUP (CAST(ts AS DATE), CAST(EXTRACT(hour FROM ts) AS INT))
    """,
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return time_rollup(
        ev,
        "ts",
        aggs=[
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        ],
        grains=("day", "hour"),
    ).select(
        # string/sentinel renderings: rollup nulls on day/hr would
        # float-ify through the comparators' pandas path
        F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
        F.coalesce(F.col("hour").cast("int"), F.lit(-1)).alias("hr"),
        "n",
        "total",
        "gid",
    )


# ---------------------------------------------------------------------------
# Approx-distinct scale path: exact COUNT(DISTINCT) per group next to
# approx_count_distinct (HLL++, rsd 2%) with a 5% acceptance bound. The
# oracle asserts the exact counts AND that the approx path landed inside
# the bound (approx_ok = 1) — the windowed-distinct scale route SURVEY
# §2.4 prescribes for 100 TB (exact distinct shuffles every value;
# HLL++ ships constant-size sketches).
# ---------------------------------------------------------------------------
@_q(
    "distinct_exact_vs_approx",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           1 AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def distinct_exact_vs_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
        )
        .select(
            "event_type",
            "n_users",
            F.when(
                F.abs(F.col("_approx") - F.col("n_users"))
                / F.col("n_users")
                <= 0.05,
                1,
            )
            .otherwise(0)
            .alias("approx_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: downsample dominant languages, keep
# more of rare ones, selected by md5-bucket of doc_id (NOT rand() — the
# split must be reproducible across reruns, partitions and engines for
# dataset versioning). The oracle re-derives the exact same split in
# SQL: same md5 prefix, same bucket arithmetic, same per-stratum
# thresholds — row-identical selection proven by the value hash over
# per-language counts + char sums.
# ---------------------------------------------------------------------------
_RATES = {"en": 0.5, "zh": 0.2}
_DEFAULT_RATE = 0.05


def _sample_oracle() -> str:
    return f"""
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM documents
    WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT <
          CAST(FLOOR(CASE lang WHEN 'en' THEN 0.5
                               WHEN 'zh' THEN 0.2
                               ELSE {_DEFAULT_RATE} END * {float(BUCKETS)}) AS BIGINT)
    GROUP BY lang
    """


@_q("sample_stratified_docs", _sample_oracle())
def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_sample(
        docs, "lang", "doc_id", _RATES, default_rate=_DEFAULT_RATE
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"), F.sum("n_chars").alias("chars_kept")
    )


# ---------------------------------------------------------------------------
# Quantile sketch acceptance: exact continuous percentiles next to the
# Greenwald-Khanna percentile_approx with an acceptance bound — the
# sketch route for percentile monitoring at 100 TB (exact percentile
# sorts every value; GK ships bounded-size summaries). Oracle asserts
# the exact values AND that the sketch landed inside the bound.
# ---------------------------------------------------------------------------
@_q(
    "sketch_quantile_bounds",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           1 AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def sketch_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("_e50"),
        F.percentile("value", 0.9).alias("_e90"),
        F.percentile_approx("value", 0.5, 10000).alias("_a50"),
        F.percentile_approx("value", 0.9, 10000).alias("_a90"),
    )
    ok = (F.abs(F.col("_a50") - F.col("_e50")) <= 0.02 * F.abs(F.col("_e50")) + 0.5) & (
        F.abs(F.col("_a90") - F.col("_e90")) <= 0.02 * F.abs(F.col("_e90")) + 0.5
    )
    return agg.select(
        "event_type",
        F.round("_e50", 6).alias("p50"),
        F.round("_e90", 6).alias("p90"),
        F.when(ok, 1).otherwise(0).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-stratum top-k sample: the k docs with the smallest
# content-hash buckets per language — a fixed-size, reproducible,
# engine-portable split (the "take k examples per language" eval-set
# pattern). One shuffle on the stratum, k rows out per stratum.
# ---------------------------------------------------------------------------
_TOPK_PER_STRATUM = 3


@_q(
    "sample_topk_per_stratum",
    f"""
    SELECT lang, doc_id
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT, doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= {_TOPK_PER_STRATUM}
    """,
)
def sample_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dd_graphdb_spark.operators.sampling import hash_bucket

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("lang").orderBy(hash_bucket(F.col("doc_id")), "doc_id")
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _TOPK_PER_STRATUM)
        .select("lang", "doc_id")
    )


# ---------------------------------------------------------------------------
# Batch sessionization: gap > 30 min starts a new session per user
# (lag + conditional cumulative sum — the standard two-window plan, one
# shuffle on user_id). Returns per-session aggregates. The streaming
# equivalent is session_window_agg (streaming/windows.py); this is the
# backfill/batch path over the same events.
# ---------------------------------------------------------------------------
@_q(
    "events_sessionize",
    """
    WITH o AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts, value,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM o
    )
    SELECT user_id, session_no, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_no
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # running sum ordered by (ts, event_id) — ts alone leaves the tie
    # order (duplicate timestamps at a session boundary) nondeterministic
    # between engines and across runs
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    brk = F.when(gap > 1800.0, 1).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    s = ev.withColumn("brk", brk).withColumn("session_no", F.sum("brk").over(wrun))
    return s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Running total per user over event time (cumulative frame — one
# shuffle + in-partition scan; §2.5 window-function depth beyond the
# reference's sort+take top-k).
# ---------------------------------------------------------------------------
@_q(
    "window_running_total",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM events
    WHERE user_id < 10
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Banded range join (operators/rangejoin.py — the brief's named custom
# operator family next to as-of and rollup): events.value against
# OVERLAPPING value bands. The banding recovers a hash join on the band
# key (a raw inequality join plans BroadcastNestedLoopJoin — plan-
# guarded); the oracle is the plain inequality join.
# ---------------------------------------------------------------------------
RJ_BANDS = [(i, i * 40.0 - 10.0, i * 40.0 + 50.0) for i in range(13)]


@_q(
    "range_join_value_bands",
    """
    WITH bands(band_id, lo, hi) AS (VALUES """
    + ", ".join(f"({i}, {lo}, {hi})" for i, lo, hi in RJ_BANDS)
    + """)
    SELECT b.band_id, COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.operators.rangejoin import range_join

    bands = local_df(spark, RJ_BANDS, "band_id int, lo double, hi double")
    ev = _events(spark, sf_dir).select("event_id", "value")
    joined = range_join(ev, bands, "value", "lo", "hi", band_width=60.0)
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
    )


# Match read_events()'s ns→µs truncation on the DuckDB side — this
# module had NO rewrite (latent false-FAIL under a NANOS-generation
# testdata dir: asof ordering, sessionize gaps and rollup buckets would
# compare ns-precision DuckDB values against µs-truncated Spark ones).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
