"""Time-series operators: as-of join and multi-granularity time rollup.

The reference has no time-series joins (SURVEY §2.3: equi-joins on
vertex ids only); these are the operations a large-scale event/training
pipeline needs on top of the reference surface (attribution, hypertable
style rollups). Both are pure DataFrame compositions — no UDFs.

As-of join implementation (the scale-critical part): the naive
formulation is an inequality join (left.ts >= right.ts) + per-left-row
argmax, which Spark plans as a broadcast-nested-loop or a sort-merge
with a range-exploding filter — quadratic per key. Instead we union the
two sides, sort each key's partition once by (ts, side, tiebreak), and
carry the last-seen right payload forward with
``last(..., ignorenulls=True)`` over an unbounded-preceding row window.
One shuffle on the key, one in-partition sort, linear scan — the same
plan shape at 100 TB, with per-key data never concentrated beyond what
a groupBy on the key would already do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    hot_key_bucket_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the matching right row
    sharing the ``on`` keys (pandas ``merge_asof`` semantics,
    model-checked against it in tests/test_properties.py):

    - ``backward`` (default): latest right row with right_ts <= left_ts
    - ``forward``: earliest right row with right_ts >= left_ts
    - ``nearest``: whichever of the two is closer in time (exact
      equidistant ties prefer the backward match)

    All directions are inclusive on equal timestamps. ``tiebreak``:
    right-side column deciding among right rows with equal timestamps —
    deterministic in every direction: the backward match (and any
    equal-ts match) takes the greatest value, a strictly-forward match
    takes the least (both sides share one partition sort; the backward
    frame ends at it, the forward frame starts at it).
    ``tolerance_seconds``: matches farther than the tolerance are nulled
    out (the payload, not the left row).

    ``hot_key_bucket_seconds``: optional two-level mode for skewed keys.
    The default windows partition by key alone, so ONE task sorts a hot
    key's entire history. With a bucket width set, windows partition by
    (key, time-bucket) — per-task rows bounded by bucket population —
    and cross-bucket matches come from an output-bounded carry table
    (one row per non-empty (key, bucket): the bucket's last/first right
    payload, running-carried across buckets per key, joined back). The
    same two-level shape as the late-event watermark fix; results are
    identical to the single-level plan (covered by the pandas
    model-check and the fixture equivalence test).

    Returns the left rows (original columns) plus the payload columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    on = list(on)
    payload_cols = list(payload_cols)
    overlap = [c for c in payload_cols if c in left.columns]
    if overlap:
        raise ValueError(f"payload columns collide with left side: {overlap}")
    # internal working columns live flat on the union frame — a left
    # column with one of these names would silently shadow them
    reserved = {"_t", "_side", "_payload", "_tb", "_bkt", "_prev", "_next",
                "_m", "_last_r", "_first_r"}
    bad = sorted(reserved.intersection(left.columns))
    if bad:
        raise ValueError(
            f"left columns collide with asof_join internals: {bad}; rename them first"
        )
    bad = sorted(reserved.union({"_matched_ts"}).intersection(payload_cols))
    if bad:
        raise ValueError(
            f"payload columns collide with asof_join internals: {bad}; rename them first"
        )

    # side marker: right rows sort BEFORE left rows at the same ts so
    # equal timestamps land in the backward frame; the forward frame
    # recovers the equal-ts case through the distance-0 backward match
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("_matched_ts"), *[F.col(c) for c in payload_cols]
        ).alias("_payload"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    part: list = list(on)
    if hot_key_bucket_seconds is not None:
        width = float(hot_key_bucket_seconds)
        u = u.withColumn("_bkt", F.floor(F.col("_t").cast("double") / width))
        part = [*on, "_bkt"]
        # carry table: per non-empty (key, bucket), the bucket's
        # last/first RIGHT payload (max_by/min_by skip the left rows'
        # null ordering), then running-carry across buckets per key —
        # the per-key window here holds #buckets rows, not data rows
        is_right = F.col("_side") == 0
        summ = u.groupBy(*on, "_bkt").agg(
            F.max_by("_payload", F.when(is_right, F.struct("_t", "_tb"))).alias("_last_r"),
            F.min_by("_payload", F.when(is_right, F.struct("_t", "_tb"))).alias("_first_r"),
        )
        wprev = (
            Window.partitionBy(*on)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wnext = (
            Window.partitionBy(*on)
            .orderBy("_bkt")
            .rowsBetween(1, Window.unboundedFollowing)
        )
        carry = summ.select(
            *on,
            "_bkt",
            F.last("_last_r", ignorenulls=True).over(wprev).alias("_prev"),
            F.first("_first_r", ignorenulls=True).over(wnext).alias("_next"),
        )
        u = u.join(carry, [*on, "_bkt"], "left")

    # both frames share one partition sort — Spark plans a single
    # shuffle + sort for the two window columns
    order = [F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc()]
    wb = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t = F.col("_t").cast("double")

    def _within(m, dist):
        if tolerance_seconds is None:
            return m
        return F.when(dist(m) <= F.lit(float(tolerance_seconds)), m)

    bwd = F.last("_payload", ignorenulls=True).over(wb)
    if hot_key_bucket_seconds is not None:
        bwd = F.coalesce(bwd, F.col("_prev"))
    b_dist = lambda m: t - m["_matched_ts"].cast("double")
    if direction == "backward":
        matched = _within(bwd, b_dist)
    else:
        fwd_raw = F.first("_payload", ignorenulls=True).over(wf)
        if hot_key_bucket_seconds is not None:
            fwd_raw = F.coalesce(fwd_raw, F.col("_next"))
        # equal-ts right rows sort before the left row, so the forward
        # frame misses them — the distance-0 backward match stands in
        fwd = F.when(b_dist(bwd) == 0, bwd).otherwise(fwd_raw)
        f_dist = lambda m: m["_matched_ts"].cast("double") - t
        if direction == "forward":
            matched = _within(fwd, f_dist)
        else:
            bq = _within(bwd, b_dist)
            fq = _within(fwd, f_dist)
            matched = (
                F.when(bq.isNull(), fq)
                .when(fq.isNull(), bq)
                .when(f_dist(fq) < b_dist(bq), fq)
                .otherwise(bq)
            )

    out = (
        u.withColumn("_m", matched)
        .filter(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col("_m")[c].alias(c) for c in payload_cols],
        )
    )
    return out


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: Sequence,
    grains: Sequence[str] = ("day", "hour"),
) -> DataFrame:
    """Hypertable-style hierarchical rollup: aggregates at every prefix
    granularity (e.g. (day), (day, hour), plus the grand total) in ONE
    pass — Spark's ROLLUP runs partial aggregation map-side for all
    grains simultaneously, so the scan count stays 1 regardless of how
    many granularities are materialized.

    ``grains`` are coarse→fine from {year, month, day, hour, minute};
    output carries one column per grain plus ``gid`` (grouping id: 0 =
    finest grain, larger = coarser).
    """
    extract = {
        "year": F.year,
        "month": F.month,
        "day": F.dayofmonth,
        "hour": F.hour,
        "minute": F.minute,
    }
    cols = []
    for g in grains:
        if g == "day":
            cols.append(F.to_date(ts_col).alias("day"))
        else:
            cols.append(extract[g](F.col(ts_col)).alias(g))
    return (
        df.rollup(*cols)
        .agg(*aggs, F.grouping_id().alias("gid"))
    )
