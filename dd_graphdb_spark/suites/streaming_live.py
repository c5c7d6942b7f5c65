"""LIVE Structured Streaming suite — real readStream → sink runs,
verified against the same DuckDB oracles as the batch expressions.

Unlike streaming_batch.py (batch frames, exact equivalents), these
queries run an actual streaming query (file source, availableNow
trigger, memory sink) per invocation: the correctness gate therefore
exercises watermark wiring, sink modes, and the stateful operator path
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dd_graphdb_spark.streaming import events_stream, run_to_memory

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


FMT = "yyyy-MM-dd HH:mm:ss"
SQL_FMT = "%Y-%m-%d %H:%M:%S"
from dd_graphdb_spark.graph import EVENTS_US as _EVENTS_US_SUB

# interpolated inline in this module's oracles (alias `events`)
EVENTS_US = _EVENTS_US_SUB + " events"


@_q(
    "stream_live_tumbling",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{SQL_FMT}') AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM {EVENTS_US}
    GROUP BY 1, 2
    """,
)
def stream_live_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        )
        .select(F.date_format(F.col("w.start"), FMT).alias("window_start"), "event_type", "n", "total")
    )
    return run_to_memory(agg, output_mode="complete")


@_q(
    "stream_live_session",
    f"""
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM {EVENTS_US}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM o
    )
    SELECT user_id, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def stream_live_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        s.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    return run_to_memory(agg, output_mode="complete")


@_q(
    "stream_live_dedup_keys",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def stream_live_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark keeps the first *arrival* (order
    within a micro-batch is not event-time order), so the oracle checks
    the surviving key set — the semantics the reference's declared dedup
    flag promises (stream_processing.rs:428,441)."""
    from dd_graphdb_spark.streaming import stream_dedup

    s = stream_dedup(events_stream(spark, sf_dir), key_cols=("user_id", "event_type"))
    out = run_to_memory(s.select("user_id", "event_type"), output_mode="append")
    return out.distinct()


@_q(
    "stream_live_global",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_v,
           CAST(MIN(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vmin,
           CAST(MAX(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vmax
    FROM events GROUP BY event_type
    """,
)
def stream_live_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global window (never closes, windowed_operations.rs:305-308) as a
    real complete-mode streaming aggregation. Exact columns only —
    n_distinct is approximate on streams by design and is checked by
    pytest instead; per-row decimal casts keep the sums engine-identical."""
    from dd_graphdb_spark.streaming.windows import global_agg

    s = events_stream(spark, sf_dir).withColumn("v", F.col("value").cast("decimal(18,6)"))
    agg = global_agg(s, value_col="v", key_cols=("event_type",))
    out = run_to_memory(agg, output_mode="complete")
    total_d = F.col("total").cast("double")
    return out.select(
        "event_type",
        "n",
        total_d.alias("total"),
        F.round(total_d / F.col("n"), 6).alias("mean_v"),
        F.col("vmin").cast("double").alias("vmin"),
        F.col("vmax").cast("double").alias("vmax"),
    )


@_q(
    "stream_live_count_window",
    """
    WITH r AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    c AS (
        SELECT user_id, (rn - 1) // 5 AS chunk, COUNT(*) AS n,
               MIN(event_id) AS first_event, MAX(event_id) AS last_event
        FROM r GROUP BY user_id, (rn - 1) // 5
    )
    SELECT user_id, chunk, n, first_event, last_event FROM c WHERE n = 5
    """,
)
def stream_live_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): count windows
    of 5 per user. Append mode emits complete chunks only, so the oracle
    keeps chunks with n = 5 (the trailing partial stays in state — the
    reference's count window has the same 'closes at max_events'
    semantics, windowed_operations.rs:301-304)."""
    from dd_graphdb_spark.streaming import count_window_agg

    s = count_window_agg(events_stream(spark, sf_dir), size=5)
    return run_to_memory(s, output_mode="append")


@_q(
    "stream_live_interval_join",
    f"""
    WITH p AS (
        SELECT user_id, ts AS pts, event_id AS pid
        FROM {EVENTS_US} WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts, event_id AS cid
        FROM {EVENTS_US} WHERE event_type = 'click'
    )
    SELECT p.user_id, p.pid, c.cid
    FROM p JOIN c
      ON c.user_id = p.user_id
     AND c.cts <= p.pts
     AND c.cts >= p.pts - INTERVAL 1 DAY
    """,
)
def stream_live_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (two live readStream sources): each
    purchase joins every click by the same user within the preceding
    day. Watermarks on BOTH sides + the two-sided time constraint are
    what lets Spark expire join state — the unbounded-state hazard of
    stream-stream joins at 100 TB. Append mode emits matches once."""
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
        .withWatermark("pts", "10 minutes")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
            F.col("event_id").alias("cid"),
        )
        .withWatermark("cts", "10 minutes")
    )
    j = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 DAY")),
        "inner",
    ).select("user_id", "pid", "cid")
    return run_to_memory(j, output_mode="append")


@_q(
    "stream_live_left_outer_join",
    f"""
    WITH p AS (
        SELECT user_id, ts AS pts, event_id AS pid
        FROM {EVENTS_US} WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts, event_id AS cid
        FROM {EVENTS_US} WHERE event_type = 'click'
    ),
    wm AS (
        SELECT least((SELECT max(pts) FROM p), (SELECT max(cts) FROM c))
               - INTERVAL 10 MINUTE AS w
    ),
    matches AS (
        SELECT p.user_id, p.pid, c.cid
        FROM p JOIN c
          ON c.user_id = p.user_id
         AND c.cts <= p.pts
         AND c.cts >= p.pts - INTERVAL 1 DAY
    )
    SELECT user_id, pid, cid FROM matches
    UNION ALL
    SELECT p.user_id, p.pid, -1::BIGINT AS cid
    FROM p
    LEFT JOIN (SELECT DISTINCT pid FROM matches) m ON p.pid = m.pid
    JOIN wm ON p.pts < wm.w
    WHERE m.pid IS NULL
    """,
)
def stream_live_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: matched purchases emit
    like the inner join; unmatched ones emit a null-side row only once
    the global watermark — min over BOTH inputs' (max event time −
    delay) — passes their timestamp, because eviction of left state is
    what produces the null row. The oracle restates exactly that rule:
    the latest unmatched purchases (pts ≥ watermark) are STILL IN STATE
    when the stream ends and correctly never emit. Null cid maps to -1
    on both sides (pandas NaN-coerces nullable ints in the compare)."""
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
        .withWatermark("pts", "10 minutes")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
            F.col("event_id").alias("cid"),
        )
        .withWatermark("cts", "10 minutes")
    )
    j = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 DAY")),
        "leftOuter",
    ).select("user_id", "pid", F.coalesce("cid", F.lit(-1)).alias("cid"))
    return run_to_memory(j, output_mode="append")


@_q(
    "stream_live_full_outer_join",
    f"""
    WITH p AS (
        SELECT user_id, ts AS pts, event_id AS pid
        FROM {EVENTS_US} WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts, event_id AS cid
        FROM {EVENTS_US} WHERE event_type = 'click'
    ),
    wm AS (
        SELECT least((SELECT max(pts) FROM p), (SELECT max(cts) FROM c))
               - INTERVAL 10 MINUTE AS w
    ),
    matches AS (
        SELECT p.user_id, p.pid, c.cid
        FROM p JOIN c
          ON c.user_id = p.user_id
         AND c.cts <= p.pts
         AND c.cts >= p.pts - INTERVAL 1 DAY
    )
    SELECT user_id, pid, cid FROM matches
    UNION ALL
    SELECT p.user_id, p.pid, -1::BIGINT AS cid
    FROM p
    LEFT JOIN (SELECT DISTINCT pid FROM matches) m ON p.pid = m.pid
    JOIN wm ON p.pts < wm.w
    WHERE m.pid IS NULL
    UNION ALL
    SELECT c.user_id, -1::BIGINT AS pid, c.cid
    FROM c
    LEFT JOIN (SELECT DISTINCT cid FROM matches) m ON c.cid = m.cid
    JOIN wm ON c.cts < wm.w - INTERVAL 1 DAY
    WHERE m.cid IS NULL
    """,
)
def stream_live_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: both sides emit null
    rows on state eviction. The left (purchase) side evicts when the
    global watermark passes its timestamp (same as the left-outer
    variant); the right (click) side's state-value watermark is shifted
    by the range condition's span — a click can match future purchases
    with pts ∈ [cts, cts + 1 day], so it evicts (and emits its null
    row) only once w > cts + 1 day. The oracle restates both eviction
    rules; the latest rows on each side are STILL IN STATE when the
    stream ends and correctly never emit. Null ids map to -1 on both
    sides (pandas NaN-coerces nullable ints in the compare)."""
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
        .withWatermark("pts", "10 minutes")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
            F.col("event_id").alias("cid"),
        )
        .withWatermark("cts", "10 minutes")
    )
    j = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 DAY")),
        "fullOuter",
    ).select(
        F.coalesce("user_id", "c_user").alias("user_id"),
        F.coalesce("pid", F.lit(-1)).alias("pid"),
        F.coalesce("cid", F.lit(-1)).alias("cid"),
    )
    return run_to_memory(j, output_mode="append")


@_q(
    "stream_live_static_enrich",
    f"""
    SELECT events.event_id, events.user_id, c.c_mktsegment AS segment, events.value
    FROM {EVENTS_US}
    JOIN customer c ON events.user_id = c.c_custkey
    WHERE events.event_type = 'purchase'
    """,
)
def stream_live_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the live purchase stream joins a
    broadcast customer dimension per micro-batch (no state store, no
    watermark needed — the static side is re-resolved each batch, which
    is exactly the production dim-table refresh story)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    ev = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    j = ev.join(F.broadcast(cust), ev.user_id == cust.cust_id).select(
        "event_id", "user_id", F.col("c_mktsegment").alias("segment"), "value"
    )
    return run_to_memory(j, output_mode="append")


# Safety net for oracles written with a raw `FROM events` (the
# EVENTS_US-interpolated ones are skipped — see rewrite_events_oracles).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
