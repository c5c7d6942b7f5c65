"""Window/stream operator suite, verified in batch mode over `events`.

The reference's stream operators (SURVEY.md §2.9) — tumbling / sliding /
session / count windows, watermark tracking, dedup — have exact batch
equivalents, which is what the oracle gate can check. The live
Structured-Streaming versions of the same operators live in
dd_graphdb_spark.streaming and are covered by tests/test_streaming.py
(same expressions, readStream + watermark instead of read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


FMT = "yyyy-MM-dd HH:mm:ss"
FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
SQL_FMT = "%Y-%m-%d %H:%M:%S"
SQL_FMT_US = "%Y-%m-%d %H:%M:%S.%f"


def _dec6(c):
    return F.col(c).cast("decimal(18,6)")


# ---------------------------------------------------------------------------
# Tumbling window (windowed_operations.rs:274-281 → window(ts, '1 hour'))
# ---------------------------------------------------------------------------
@_q(
    "stream_tumbling_window",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{SQL_FMT}') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(_dec6("value")).cast("double").alias("total"))
        .select(F.date_format(F.col("w.start"), FMT).alias("window_start"), "event_type", "n", "total")
    )


# ---------------------------------------------------------------------------
# Sliding window — real slide, unlike the reference where slide_interval is
# declared but unused (windowed_operations.rs:283-291)
# ---------------------------------------------------------------------------
@_q(
    "stream_sliding_window",
    f"""
    WITH b AS (
        SELECT (FLOOR(epoch(ts))::BIGINT // 1800) * 1800 AS b0, *
        FROM events
    ),
    w AS (
        SELECT strftime(make_timestamp(b0 * 1000000), '{SQL_FMT}') AS window_start, event_id FROM b
        UNION ALL
        SELECT strftime(make_timestamp((b0 - 1800) * 1000000), '{SQL_FMT}'), event_id FROM b
    )
    SELECT window_start, COUNT(*) AS n FROM w GROUP BY window_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format(F.col("w.start"), FMT).alias("window_start"), "n")
    )


# ---------------------------------------------------------------------------
# Session window, 10-minute gap (reference hardcodes a 30 s gap,
# windowed_operations.rs:292-300; gap is a parameter here)
# ---------------------------------------------------------------------------
@_q(
    "stream_session_window",
    f"""
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id, strftime(MIN(ts), '{SQL_FMT_US}') AS session_start, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), FMT_US).alias("session_start"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Count window: fixed-size chunks per key (windowed_operations.rs:301-304)
# ---------------------------------------------------------------------------
@_q(
    "stream_count_window",
    """
    WITH r AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, (rn - 1) // 5 AS chunk, COUNT(*) AS n,
           MIN(event_id) AS first_event, MAX(event_id) AS last_event
    FROM r GROUP BY user_id, (rn - 1) // 5
    """,
)
def stream_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("chunk", ((F.col("rn") - 1) / 5).cast("long"))
        .groupBy("user_id", "chunk")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
    )


# ---------------------------------------------------------------------------
# Stream dedup by key, keep-first (the reference declares
# enable_deduplication but never implements it — stream_processing.rs:428,441)
# ---------------------------------------------------------------------------
@_q(
    "stream_dedup_first",
    """
    SELECT user_id, event_type, event_id AS first_event_id FROM (
        SELECT user_id, event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


# ---------------------------------------------------------------------------
# Custom aggregation closure over a window — the reference's
# Arc<dyn Fn(&[StreamEvent]) -> PropertyValue> surface
# (windowed_operations.rs:97,376-379) as an Arrow grouped-agg pandas UDF.
# The closure computes a linearly-interpolated p90 (numpy percentile,
# same formula as DuckDB quantile_cont).
# ---------------------------------------------------------------------------
@_q(
    "stream_custom_agg_p90",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{SQL_FMT}') AS window_start,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.9), 6) AS p90
    FROM events
    GROUP BY 1
    """,
)
def stream_custom_agg_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from dd_graphdb_spark.streaming.windows import custom_agg

    # both aggregates are custom closures (one Aggregate can't mix pandas
    # grouped-agg UDFs with JVM aggregate functions)
    p90 = custom_agg(lambda s: float(round(np.percentile(s, 90), 6)), "double")
    cnt = custom_agg(lambda s: int(len(s)), "long")
    e = _events(spark, sf_dir)
    # Explicit (AQE-coalesce-exempt) repartition on the group key: the
    # grouped-agg exchange's INPUT is small, so AQE coalesced it to 1-2
    # partitions and the whole Python aggregation ran near-serially —
    # the same input-bytes-vs-expensive-downstream mismatch the salted
    # pair path guards against (guide §2.5). Width comes from the
    # session's shuffle conf (scale-parameterized), and groupBy on the
    # same key reuses the partitioning — still exactly one exchange.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        e.withColumn("w", F.window("ts", "1 hour"))
        .repartition(n_parts, "w")
        .groupBy("w")
        .agg(cnt("value").alias("n"), p90("value").alias("p90"))
        .select(F.date_format(F.col("w.start"), FMT).alias("window_start"), "n", "p90")
    )


# ---------------------------------------------------------------------------
# Watermark semantics in batch: events arriving (by event_id order) with
# event time more than 5 min behind the running max are "late"
# (stream_processing.rs:315-342: monotonic max watermark + late counting)
# ---------------------------------------------------------------------------
@_q(
    "stream_late_events",
    """
    SELECT COUNT(*) AS n_late FROM (
        SELECT ts,
               MAX(ts) OVER (ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        FROM events
    ) WHERE wm IS NOT NULL AND ts < wm - INTERVAL 5 MINUTE
    """,
)
def stream_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale-safe global running max: an unpartitioned Window.orderBy would
    # move the whole table into ONE task. Instead (1) bucket events by
    # arrival order (bucket = event_id div B is monotone in event_id), so
    # the running max within each bucket parallelizes across tasks;
    # (2) merge bucket boundaries with a prefix max over the tiny
    # one-row-per-bucket table (N/B rows — at extreme scale recurse or
    # widen B); (3) watermark = max(previous-bucket prefix, within-bucket
    # running max). Same result as the single global window, no
    # data-sized single-partition exchange.
    bucket_width = 4096
    e = _events(spark, sf_dir).withColumn(
        "bucket", (F.col("event_id") / bucket_width).cast("long")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = e.withColumn("local_wm", F.max("ts").over(w_local))
    # boundaries deliberately re-scan the parquet instead of consuming
    # the window output: the scan is pruned to (event_id, ts) and the
    # groupBy is a map-side partial max — only one row per bucket is
    # shuffled. Feeding the agg from the window branch would force a
    # second FULL-width shuffle by bucket (measured: strictly worse).
    w_prefix = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    boundaries = (
        e.groupBy("bucket")
        .agg(F.max("ts").alias("bucket_max"))
        .withColumn("prev_wm", F.max("bucket_max").over(w_prefix))
        .select("bucket", "prev_wm")
    )
    flagged = (
        local.join(F.broadcast(boundaries), "bucket")
        .withColumn("wm", F.greatest("local_wm", "prev_wm"))  # greatest skips nulls
        .filter(
            F.col("wm").isNotNull() & (F.col("ts") < F.col("wm") - F.expr("INTERVAL 5 MINUTES"))
        )
    )
    return flagged.agg(F.count("*").alias("n_late"))


# ---------------------------------------------------------------------------
# Stream filter rules: drop by equality, tag by threshold via Modify
# (FilterRule Keep/Drop/Modify, stream_transform.rs:196-315 — declared
# intent; lowered to when()/filter() codegen expressions here).
# ---------------------------------------------------------------------------
@_q(
    "stream_filter_rules",
    """
    SELECT event_id, event_type,
           CASE WHEN value > 90 THEN 'hot' ELSE NULL END AS heat
    FROM events
    WHERE event_type <> 'click'
    """,
)
def stream_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming import FilterRule, TransformPipeline

    pipe = TransformPipeline().add_filter_stage(
        "gate",
        [
            FilterRule("drop_clicks", "event_type", "equals", "click", action="drop"),
            FilterRule("tag_hot", "_hot", "equals", True, action="modify", modifications={"heat": "hot"}),
        ],
    )
    e = _events(spark, sf_dir).withColumn("_hot", F.col("value") > 90)
    return pipe.apply(e).select("event_id", "event_type", "heat")


# ---------------------------------------------------------------------------
# Event→changeset conversion: one changeset per source per batch
# (convert_to_changesets, stream_processing.rs:670-711). event_type
# stands in as the source key of the batch.
# ---------------------------------------------------------------------------
@_q(
    "stream_changeset_summary",
    """
    SELECT 'stream_0_' || event_type AS changeset_id,
           event_type AS source,
           COUNT(*) AS n_changes
    FROM events
    GROUP BY event_type
    """,
)
def stream_changeset_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming import changeset_summary

    return changeset_summary(_events(spark, sf_dir), source_col="event_type", batch_id=0)


# ---------------------------------------------------------------------------
# Alert rules (realtime_analytics.rs:73-160): a threshold rule with a
# greedy cooldown chain (fire, suppress until cooldown elapses —
# is_in_cooldown :524-533) and a rate rule (events/window ≥ threshold).
# The oracle re-derives the greedy chain with a recursive CTE.
# ---------------------------------------------------------------------------
@_q(
    "alert_threshold_cooldown",
    """
    WITH RECURSIVE cand AS (
        SELECT ts, value FROM events WHERE value > 99.5
    ),
    fires(ts) AS (
        SELECT MIN(ts) FROM cand
        UNION ALL
        SELECT (SELECT MIN(c.ts) FROM cand c WHERE c.ts >= f.ts + INTERVAL 1 HOUR)
        FROM fires f
        WHERE EXISTS (SELECT 1 FROM cand c WHERE c.ts >= f.ts + INTERVAL 1 HOUR)
    )
    SELECT 'hot_value' AS rule_id, strftime(f.ts, '%Y-%m-%d %H:%M:%S.%f') AS fired_at
    FROM fires f WHERE f.ts IS NOT NULL
    """,
)
def alert_threshold_cooldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming import AlertEngine, AlertRule

    engine = AlertEngine(
        [AlertRule("hot_value", "threshold", "value", "gt", 99.5, cooldown_s=3600)]
    )
    alerts = engine.evaluate(_events(spark, sf_dir))
    return alerts.select(
        "rule_id", F.date_format("ts", FMT_US).alias("fired_at")
    )


@_q(
    "alert_rate_rule",
    """
    SELECT 'spike' AS rule_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*)::DOUBLE AS metric_value
    FROM events
    GROUP BY date_trunc('hour', ts)
    HAVING COUNT(*) >= 20
    """,
)
def alert_rate_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming import AlertEngine, AlertRule

    engine = AlertEngine([AlertRule("spike", "rate", "value", "ge", 20.0, window="1 hour")])
    return engine.evaluate(_events(spark, sf_dir)).select(
        "rule_id", F.date_format("ts", FMT).alias("window_start"), "metric_value"
    )


# ---------------------------------------------------------------------------
# Pattern rule (AlertRuleType::Pattern, realtime_analytics.rs:103-104 —
# declared, evaluation stubbed at :511-515; this implements the declared
# intent): signup → purchase → error funnel over high-value events, each
# stage advancing to the EARLIEST later event of the next stage, the
# whole sequence within 6 hours of the anchor. The oracle re-derives the
# greedy earliest-successor chain with correlated MIN subqueries;
# metric_value = anchor→completion duration in µs (exact integer).
# ---------------------------------------------------------------------------
@_q(
    "alert_pattern_rule",
    """
    WITH s1 AS (SELECT ts FROM events WHERE event_type = 'signup' AND value > 200),
    s2 AS (SELECT ts FROM events WHERE event_type = 'purchase' AND value > 200),
    s3 AS (SELECT ts FROM events WHERE event_type = 'error' AND value > 200),
    m2 AS (
        SELECT t1.ts AS ts1,
               (SELECT MIN(s2.ts) FROM s2
                WHERE s2.ts > t1.ts AND s2.ts <= t1.ts + INTERVAL 6 HOUR) AS ts2
        FROM s1 t1
    ),
    m3 AS (
        SELECT ts1,
               (SELECT MIN(s3.ts) FROM s3
                WHERE s3.ts > m2.ts2 AND s3.ts <= m2.ts1 + INTERVAL 6 HOUR) AS ts3
        FROM m2 WHERE ts2 IS NOT NULL
    )
    SELECT 'funnel' AS rule_id,
           strftime(ts3, '%Y-%m-%d %H:%M:%S.%f') AS fired_at,
           (epoch_us(ts3) - epoch_us(ts1))::DOUBLE AS metric_value
    FROM m3 WHERE ts3 IS NOT NULL
    """,
)
def alert_pattern_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming import AlertEngine, AlertRule

    engine = AlertEngine(
        [
            AlertRule(
                "funnel",
                "pattern",
                "value",
                "gt",
                0.0,
                sequence=["signup", "purchase", "error"],
                within_s=6 * 3600,
            )
        ]
    )
    alerts = engine.evaluate(_events(spark, sf_dir).filter(F.col("value") > 200))
    return alerts.select(
        "rule_id", F.date_format("ts", FMT_US).alias("fired_at"), "metric_value"
    )


# ---------------------------------------------------------------------------
# Anomaly rule (AlertRuleType::Anomaly, realtime_analytics.rs:105-106 —
# declared, evaluation stubbed at :517-521): z-score each event's value
# against the previous non-empty hour's mean/stddev (population), fire
# on |z| > 2. Baseline sums are exact decimals; the z expression tree is
# identical on both engines, so boundary decisions agree bit-for-bit.
# ---------------------------------------------------------------------------
@_q(
    "alert_anomaly_rule",
    """
    WITH wstats AS (
        SELECT date_trunc('hour', ts) AS wstart, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS s,
               SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS ss
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT wstart,
               LAG(n) OVER (ORDER BY wstart) AS pn,
               LAG(s) OVER (ORDER BY wstart) AS ps,
               LAG(ss) OVER (ORDER BY wstart) AS pss
        FROM wstats
    )
    SELECT 'zspike' AS rule_id,
           strftime(events.ts, '%Y-%m-%d %H:%M:%S.%f') AS fired_at,
           ROUND((events.value - CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
                 / sqrt((CAST(pss AS DOUBLE)
                         - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
                        / CAST(pn AS DOUBLE)), 6) AS metric_value
    FROM events JOIN base ON date_trunc('hour', events.ts) = base.wstart
    WHERE pn >= 2
      AND (CAST(pss AS DOUBLE)
           - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
          / CAST(pn AS DOUBLE) > 0
      AND ABS((events.value - CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
              / sqrt((CAST(pss AS DOUBLE)
                      - CAST(ps AS DOUBLE) * CAST(ps AS DOUBLE) / CAST(pn AS DOUBLE))
                     / CAST(pn AS DOUBLE))) > 2.0
    """,
)
def alert_anomaly_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.streaming import AlertEngine, AlertRule

    engine = AlertEngine(
        [AlertRule("zspike", "anomaly", "value", "gt", 2.0, window="1 hour")]
    )
    return engine.evaluate(_events(spark, sf_dir)).select(
        "rule_id", F.date_format("ts", FMT_US).alias("fired_at"), "metric_value"
    )


# Match read_events()'s ns→µs truncation on the DuckDB side (module END
# so every oracle is covered; see graph.rewrite_events_oracles).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
