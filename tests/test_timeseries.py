"""As-of join, time rollup, deterministic sampling — unit semantics.

(The sf-scale versions are DuckDB-oracle-checked in suites/timeseries.py;
these tests pin the edge semantics on hand-built fixtures.)
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dd_graphdb_spark.operators.sampling import (
    BUCKETS,
    deterministic_sample,
    hash_bucket,
    stratified_sample,
)
from dd_graphdb_spark.operators.timeseries import asof_join, time_rollup


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0, 11),
            (1, _ts("2024-01-01T10:00:05"), 101.0, 12),
            (1, _ts("2024-01-01T10:00:05"), 102.0, 13),  # same-ts tie
            (2, _ts("2024-01-01T10:00:02"), 200.0, 21),
        ],
        "key long, qts timestamp, price double, qid long",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:59:59"), 1),  # before any quote
            (1, _ts("2024-01-01T10:00:03"), 2),  # after first quote
            (1, _ts("2024-01-01T10:00:05"), 3),  # ties with two quotes
            (2, _ts("2024-01-01T10:30:00"), 4),  # stale quote (28 min)
            (3, _ts("2024-01-01T10:00:00"), 5),  # key with no quotes
        ],
        "key long, tts timestamp, tid long",
    )


def test_asof_backward_inclusive_ties_and_misses(spark, trades, quotes):
    out = asof_join(
        trades,
        quotes,
        on=["key"],
        left_ts="tts",
        right_ts="qts",
        payload_cols=["price", "qid"],
        tiebreak="qid",
    )
    got = {r["tid"]: (r["price"], r["qid"]) for r in out.collect()}
    assert got[1] == (None, None)  # no quote yet
    assert got[2] == (100.0, 11)  # latest at-or-before
    assert got[3] == (102.0, 13)  # inclusive tie → greatest qid wins
    assert got[4] == (200.0, 21)
    assert got[5] == (None, None)  # key never quoted
    assert out.count() == trades.count()  # every left row survives


def test_asof_tolerance_nulls_stale_matches(spark, trades, quotes):
    out = asof_join(
        trades,
        quotes,
        on=["key"],
        left_ts="tts",
        right_ts="qts",
        payload_cols=["price", "qid"],
        tiebreak="qid",
        tolerance_seconds=60.0,
    )
    got = {r["tid"]: r["price"] for r in out.collect()}
    assert got[2] == 100.0  # 3s old — kept
    assert got[4] is None  # 28min old — nulled by tolerance
    assert out.count() == trades.count()


def test_asof_forward_and_nearest(spark, trades, quotes):
    fwd = asof_join(
        trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
        payload_cols=["price", "qid"], tiebreak="qid", direction="forward",
    )
    got = {r["tid"]: r["qid"] for r in fwd.collect()}
    assert got[1] == 11  # earliest at-or-after
    assert got[2] == 12  # strictly-forward tie -> least qid
    assert got[3] == 13  # inclusive equal-ts (via distance-0 backward)
    assert got[4] is None  # nothing after 10:30
    assert got[5] is None

    near = asof_join(
        trades, quotes, on=["key"], left_ts="tts", right_ts="qts",
        payload_cols=["price", "qid"], tiebreak="qid", direction="nearest",
    )
    got = {r["tid"]: r["qid"] for r in near.collect()}
    assert got[1] == 11  # only forward exists (1s away)
    assert got[2] == 12  # forward 2s beats backward 3s
    assert got[3] == 13  # distance 0
    assert got[4] == 21  # only backward exists
    assert got[5] is None


def test_asof_bucketed_equals_single_level(spark, trades, quotes):
    """The two-level hot-key plan returns exactly the single-level
    result in every direction (2-second buckets force cross-bucket
    carries on this fixture)."""
    for direction in ("backward", "forward", "nearest"):
        kw = dict(
            on=["key"], left_ts="tts", right_ts="qts",
            payload_cols=["price", "qid"], tiebreak="qid", direction=direction,
        )
        single = asof_join(trades, quotes, **kw)
        bucketed = asof_join(trades, quotes, hot_key_bucket_seconds=2.0, **kw)
        norm = lambda df: sorted(
            (r["tid"], r["price"], r["qid"]) for r in df.collect()
        )
        assert norm(bucketed) == norm(single), direction


def test_asof_rejects_payload_collision(spark, trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades,
            quotes.withColumnRenamed("price", "tid"),
            on=["key"],
            left_ts="tts",
            right_ts="qts",
            payload_cols=["tid"],
        )


def test_asof_rejects_reserved_internal_columns(spark, trades, quotes):
    with pytest.raises(ValueError, match="internals"):
        asof_join(
            trades.withColumn("_payload", trades.tid),
            quotes,
            on=["key"],
            left_ts="tts",
            right_ts="qts",
            payload_cols=["price"],
        )
    with pytest.raises(ValueError, match="internals"):
        asof_join(
            trades,
            quotes.withColumnRenamed("price", "_matched_ts"),
            on=["key"],
            left_ts="tts",
            right_ts="qts",
            payload_cols=["_matched_ts"],
        )


def test_time_rollup_grains_and_gid(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01T10:15:00"), 1.0),
            (_ts("2024-01-01T10:45:00"), 2.0),
            (_ts("2024-01-01T11:00:00"), 4.0),
            (_ts("2024-01-02T10:00:00"), 8.0),
        ],
        "ts timestamp, v double",
    )
    out = time_rollup(
        df, "ts", aggs=[F.sum("v").alias("s")], grains=("day", "hour")
    ).collect()
    rows = {(str(r["day"]) if r["day"] else None, r["hour"], r["gid"]): r["s"] for r in out}
    assert rows[("2024-01-01", 10, 0)] == 3.0
    assert rows[("2024-01-01", 11, 0)] == 4.0
    assert rows[("2024-01-01", None, 1)] == 7.0  # day grain
    assert rows[("2024-01-02", None, 1)] == 8.0
    assert rows[(None, None, 3)] == 15.0  # grand total


def test_hash_bucket_range_and_determinism(spark):
    df = spark.range(500).select(hash_bucket(F.col("id")).alias("b"))
    stats = df.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] < BUCKETS
    # rerun selects the identical rows (content-hash, not RNG)
    a = sorted(r["id"] for r in deterministic_sample(spark.range(500), "id", 0.3).collect())
    b = sorted(r["id"] for r in deterministic_sample(spark.range(500), "id", 0.3).collect())
    assert a == b and 0 < len(a) < 500
    # rate monotonicity: a 0.3 sample contains the 0.1 sample (nested splits)
    c = sorted(r["id"] for r in deterministic_sample(spark.range(500), "id", 0.1).collect())
    assert set(c) <= set(a)


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, lang string")
    kept = stratified_sample(df, "lang", "id", {"en": 0.5}, default_rate=0.02)
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 150 < by_lang.get("en", 0) < 350  # ~250 of 500
    assert by_lang.get("rare", 0) < 60  # ~10 of 500
