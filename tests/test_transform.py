"""Stream transform pipeline, filter rules, changesets, alert rules
(stream_transform.rs / stream_processing.rs:670-711 /
realtime_analytics.rs declared surface)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dd_graphdb_spark.streaming import (
    AlertEngine,
    AlertRule,
    FilterRule,
    TransformPipeline,
    apply_filter_rules,
    changeset_summary,
)


@pytest.fixture()
def events_df(spark):
    rows = [
        (1, "click", "web", 10.0, datetime(2026, 1, 1, 0, 0, 0)),
        (2, "view", "web", 95.0, datetime(2026, 1, 1, 0, 10, 0)),
        (3, "view", "app", 99.9, datetime(2026, 1, 1, 0, 20, 0)),
        (4, "buy", "app", 99.8, datetime(2026, 1, 1, 1, 30, 0)),
        (5, "buy", "web", 20.0, datetime(2026, 1, 1, 2, 0, 0)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, source string, value double, ts timestamp"
    )


def test_filter_rules_drop_modify_keep(events_df):
    out = apply_filter_rules(
        events_df,
        [
            FilterRule("k", "event_type", "exists", action="keep"),
            FilterRule("d", "event_type", "equals", "click", action="drop"),
            FilterRule("m", "value", "contains", "99", action="modify", modifications={"flag": "hot"}),
        ],
    )
    rows = {r["event_id"]: r["flag"] for r in out.collect()}
    assert 1 not in rows  # dropped
    assert rows[3] == "hot" and rows[4] == "hot" and rows[2] is None


def test_pipeline_dead_letter_and_stats(events_df):
    pipe = TransformPipeline().add_filter_stage(
        "gate", [FilterRule("d", "event_type", "equals", "click", action="drop")]
    ).add_stage("enrich", lambda df: df.withColumn("v2", F.col("value") * 2))
    kept, dead = pipe.apply_with_dead_letter(events_df, ["event_id"])
    assert kept.count() == 4 and "v2" in kept.columns
    assert [r["event_id"] for r in dead.collect()] == [1]
    stats = pipe.stats(events_df, ["event_id"])
    assert stats == {"events_processed": 5, "events_transformed": 4, "events_filtered": 1}


def test_changeset_summary_per_source(events_df):
    rows = {
        r["changeset_id"]: r["n_changes"]
        for r in changeset_summary(events_df, "source", batch_id=7).collect()
    }
    assert rows == {"stream_7_web": 3, "stream_7_app": 2}


def test_alert_threshold_cooldown_greedy(events_df):
    # candidates at 00:10 (95), 00:20 (99.9), 01:30 (99.8): with a 1 h
    # cooldown the 00:20 fire is suppressed, 01:30 fires (≥ 1 h later)
    eng = AlertEngine([AlertRule("hot", "threshold", "value", "gt", 90.0, cooldown_s=3600)])
    fires = sorted(r["ts"] for r in eng.evaluate(events_df).collect())
    assert fires == [datetime(2026, 1, 1, 0, 10, 0), datetime(2026, 1, 1, 1, 30, 0)]


def test_alert_threshold_no_cooldown(events_df):
    eng = AlertEngine([AlertRule("hot", "threshold", "value", "gt", 90.0)])
    assert eng.evaluate(events_df).count() == 3


def test_cooldown_chain_distributed_matches_sequential(spark):
    """The bucketed successor walk (forced via small_threshold=0) must
    reproduce the sequential greedy chain exactly on a dense, adversarial
    candidate stream — including same-ts ties, exact t+cooldown
    boundaries, and multi-bucket gaps."""
    import random

    from dd_graphdb_spark.streaming.transform import greedy_cooldown_fires

    rng = random.Random(7)
    cd = 10  # seconds
    base = 1_700_000_000_000_000  # µs epoch
    ts_us = sorted(
        rng.randrange(0, 400_000_000, 500_000) for _ in range(900)
    )  # dense: ~22 candidates per cooldown window, incl. exact-boundary multiples
    rows = [(i, base + t, float(i)) for i, t in enumerate(ts_us)]
    cand = spark.createDataFrame(rows, "i long, t long, metric_value double").select(
        F.timestamp_micros(F.col("t")).alias("ts"),
        F.col("i").alias("_ord"),
        "metric_value",
    )

    got = sorted(r["ts"] for r in greedy_cooldown_fires(cand, cd, small_threshold=0).collect())

    # sequential reference (per distinct ts the lowest _ord wins)
    last, want = None, []
    for t in sorted(set(ts_us)):
        if last is None or t - last >= cd * 1_000_000:
            want.append(t)
            last = t
    assert [int(x.timestamp() * 1e6) - base for x in got] == want
    assert len(want) > 30  # the chain is long enough to exercise doubling


def test_cooldown_ceilings_partition_by_bucket(spark):
    """Scale guard: the per-candidate ceiling stage must hash-partition
    by the cooldown bucket (one window task per bucket) — never a
    single-partition window over the full candidate set."""
    from dd_graphdb_spark.streaming.transform import _bucket_ceilings

    c = spark.createDataFrame(
        [(i * 1_000_000, i // 10) for i in range(100)], "t long, _bucket long"
    )
    df = _bucket_ceilings(c, 10_000_000)
    explained = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "hashpartitioning(_bucket" in explained
    assert "SinglePartition" not in explained


def test_alert_rate_rule(events_df):
    eng = AlertEngine([AlertRule("spike", "rate", "value", "ge", 3.0, window="1 hour")])
    rows = eng.evaluate(events_df).collect()
    assert len(rows) == 1 and rows[0]["metric_value"] == 3.0  # hour 00 has 3 events


def test_pipeline_per_source_changesets(spark, sf_dir, tmp_path):
    """End-to-end: foreachBatch converts the batch into per-source
    changesets applied in one partitioned pass; the incremental view
    accumulates identically to a batch recompute — and the batch loop
    never collects to the driver (the changeset split used to fetch the
    distinct source list per micro-batch)."""
    from pyspark.sql import DataFrame

    from dd_graphdb_spark.graph import read_events
    from dd_graphdb_spark.streaming import events_stream, incremental_view_pipeline
    from dd_graphdb_spark.views import IncrementalAggState, ViewCatalog, ViewDefinition

    catalog = ViewCatalog(spark, str(tmp_path / "cat"))
    state = IncrementalAggState(spark, str(tmp_path / "st"), ["event_type"], "value")
    catalog.register_incremental(
        ViewDefinition(name="by_type", view_type="aggregation"), state
    )
    collects = []
    orig_collect = DataFrame.collect
    DataFrame.collect = lambda self: (collects.append(1), orig_collect(self))[1]
    try:
        incremental_view_pipeline(
            events_stream(spark, sf_dir),
            catalog,
            delta_map={"by_type": lambda b: b.select("event_type", "value")},
            group_by_source="event_type",
        )
    finally:
        DataFrame.collect = orig_collect
    assert not collects, "driver collect inside the micro-batch loop"
    got = {r["event_type"]: r["n"] for r in catalog.read("by_type").collect()}
    want = {
        r["event_type"]: r["n"]
        for r in read_events(spark, sf_dir).groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_duration_parser_accepts_spark_abbreviations():
    """Any window string F.window() accepted must parse here too —
    including abbreviated units (min/mins/sec/secs/hr/hrs/ms/us)."""
    from dd_graphdb_spark.streaming.transform import _duration_us

    assert _duration_us("5 mins") == _duration_us("5 minutes") == 300_000_000
    assert _duration_us("1 min") == 60_000_000
    assert _duration_us("30 secs") == _duration_us("30 sec") == 30_000_000
    assert _duration_us("2 hrs") == _duration_us("2 hr") == 7_200_000_000
    assert _duration_us("250 ms") == 250_000
    assert _duration_us("10 us") == 10
    with pytest.raises(ValueError, match="bad duration unit"):
        _duration_us("5 fortnights")


def test_modify_rule_atomic_on_own_match_field(spark):
    """A modify rule that rewrites its OWN match field must apply every
    modification to the originally-matched rows (not re-evaluate the
    match against already-modified columns, dict-order dependent)."""
    from dd_graphdb_spark.streaming import FilterRule, apply_filter_rules

    df = spark.createDataFrame(
        [(1, "bad"), (2, "good")], "event_id long, status string"
    )
    out = apply_filter_rules(
        df,
        [
            FilterRule(
                "r1", "status", "equals", "bad",
                action="modify",
                modifications={"status": "ok", "flag": 1},
            )
        ],
    )
    rows = {r["event_id"]: (r["status"], r["flag"]) for r in out.collect()}
    assert rows == {1: ("ok", 1), 2: ("good", None)}


def test_threshold_rule_without_cooldown_needs_no_order_column(spark):
    from datetime import datetime

    from dd_graphdb_spark.streaming import AlertEngine, AlertRule

    df = spark.createDataFrame(
        [(datetime(2026, 1, 1), 0.95), (datetime(2026, 1, 2), 0.5)],
        "ts timestamp, cpu double",
    )
    out = AlertEngine([AlertRule("r1", "threshold", "cpu", "gt", 0.9)]).evaluate(df)
    assert out.count() == 1


def test_cooldown_buckets_floor_for_pre_epoch_timestamps(spark):
    """DIV truncates toward zero: bucket 0 would span (-cd, +cd) and the
    successor walk (bucket k / k+1 only) would drop fires for pre-1970
    timestamps; floor-division bucketing keeps the invariant."""
    from datetime import datetime, timezone

    from dd_graphdb_spark.streaming.transform import greedy_cooldown_fires

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    cd = 10.0
    # candidates at -9s and +3s: 12s apart (> cooldown), BOTH must fire
    cand = spark.createDataFrame(
        [(ts(-9), 1, 1.0), (ts(3), 2, 2.0)],
        "ts timestamp, _ord long, metric_value double",
    )
    fires = greedy_cooldown_fires(cand, cd, small_threshold=0)
    assert fires.count() == 2
    # and at 5s apart (< cooldown) only the first fires
    cand2 = spark.createDataFrame(
        [(ts(-2), 1, 1.0), (ts(3), 2, 2.0)],
        "ts timestamp, _ord long, metric_value double",
    )
    assert greedy_cooldown_fires(cand2, cd, small_threshold=0).count() == 1


def test_anomaly_prev_window_crosses_super_buckets(spark, monkeypatch):
    """Three-level lag: with the fold shrunk to 2, baseline windows span
    many buckets AND super-buckets, exercising every borrow path
    (first-in-bucket -> previous bucket's last; first-in-super-bucket ->
    previous super-bucket's last). Values must equal a brute-force
    previous-non-empty-window z-score."""
    import dd_graphdb_spark.streaming.transform as T

    monkeypatch.setattr(T, "_ANOMALY_FOLD", 2)
    base = datetime(2026, 1, 1)
    rows = []
    # 13 occupied minutes spread over 40 (empty gaps force non-adjacent
    # lookups at both levels); window = 1 minute
    occupied = [0, 1, 2, 5, 6, 9, 14, 15, 22, 23, 30, 37, 38]
    vals = {}
    rid = 0
    for m in occupied:
        for v in (10.0, 12.0, 30.0 if m % 3 == 0 else 11.0):
            rows.append((rid, "e", "s", v, datetime(2026, 1, 1, 0, m, rid % 60)))
            vals.setdefault(m, []).append(v)
            rid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, source string, value double, ts timestamp"
    )
    eng = T.AlertEngine([T.AlertRule("z", "anomaly", "value", "gt", 1.0, window="1 minute")])
    got = {(r["ts"], round(r["metric_value"], 6)) for r in eng.evaluate(df).collect()}

    # brute force: z against the previous OCCUPIED minute's stats
    want = set()
    prev = None
    for m in occupied:
        if prev is not None:
            import math

            xs = vals[prev]
            n, s = len(xs), sum(xs)
            ss = sum(x * x for x in xs)
            mean, var = s / n, (ss - s * s / n) / n
            if n >= 2 and var > 0:
                for r in rows:
                    if r[4].minute == m:
                        z = (r[3] - mean) / math.sqrt(var)
                        if abs(z) > 1.0:
                            want.add((r[4], round(z, 6)))
        prev = m
    assert got == want and len(want) > 5


def test_cooldown_fallback_crosses_super_buckets(spark, monkeypatch):
    """Two-level lead: fold=2 makes every cooldown bucket its own
    super-bucket neighborhood, forcing the tail-borrow paths (last /
    second-last row of a super-bucket, 1-row super-buckets). The
    distributed walk must still match the sequential greedy chain."""
    import dd_graphdb_spark.streaming.transform as T

    monkeypatch.setattr(T, "_ANOMALY_FOLD", 2)
    cd = 10
    base = 1_700_000_000_000_000
    # sparse-and-dense mix: singleton buckets, adjacent buckets, gaps
    ts_us = sorted(
        t * 1_000_000
        for t in [0, 1, 2, 9, 10, 11, 29, 55, 56, 57, 58, 120, 121, 200, 305, 306, 400]
    )
    rows = [(i, base + t, float(i)) for i, t in enumerate(ts_us)]
    cand = spark.createDataFrame(rows, "i long, t long, metric_value double").select(
        F.timestamp_micros(F.col("t")).alias("ts"),
        F.col("i").alias("_ord"),
        "metric_value",
    )
    got = sorted(
        int(r["ts"].timestamp() * 1e6) - base
        for r in T.greedy_cooldown_fires(cand, cd, small_threshold=0).collect()
    )
    last, want = None, []
    for t in ts_us:
        if last is None or t - last >= cd * 1_000_000:
            want.append(t)
            last = t
    assert got == want


def test_pattern_rule_same_instant_anchor_multiplicity(spark):
    """Regression (sf1, r14): N anchor events at the SAME instant fire
    N alerts — per-event evaluation (realtime_analytics.rs evaluates
    rules per event), not per distinct timestamp. Later-stage
    duplicates must NOT multiply matches (one greedy earliest-successor
    path per anchor instant)."""
    import datetime as dt

    from dd_graphdb_spark.streaming import AlertEngine, AlertRule

    base = dt.datetime(2024, 1, 1)
    rows = [(k, base, "signup", 1.0) for k in range(7)]  # 7 same-instant anchors
    rows += [
        (100, base + dt.timedelta(minutes=1), "purchase", 1.0),
        (101, base + dt.timedelta(minutes=1), "purchase", 1.0),  # stage-2 dup
        (102, base + dt.timedelta(minutes=2), "error", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    eng = AlertEngine(
        [
            AlertRule(
                "funnel", "pattern", "value", "gt", 0.0,
                sequence=["signup", "purchase", "error"], within_s=3600,
            )
        ]
    )
    out = eng.evaluate(df).collect()
    assert len(out) == 7  # anchor multiplicity preserved, stage dups don't multiply
    assert {r["metric_value"] for r in out} == {120.0 * 1e6}
