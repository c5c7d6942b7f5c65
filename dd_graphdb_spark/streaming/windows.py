"""Streaming window operators (batch- and stream-applicable).

Reference parity (graph/views/src/windowed_operations.rs; SURVEY.md §2.9):
- tumbling  (:274-281) → window(ts, dur)
- sliding   (:283-291; reference declares slide but never uses it — we
  implement real sliding) → window(ts, dur, slide)
- session   (:292-300; 30 s gap hardcoded there, parameter here)
  → session_window(ts, gap)
- count     (:301-304) → applyInPandasWithState on streams / row_number
  chunking in batch
- global    (:305-308) → plain agg (complete mode on streams)
- aggregations Count/Sum/Avg/Min/Max (:347-383) + exact Distinct
  (:464-474; approx_count_distinct is the 100 TB path)
- dedup: declared-but-unimplemented in the reference
  (stream_processing.rs:428,441) → dropDuplicates + watermark
- watermark tracking (stream_processing.rs:315-342) → withWatermark

Every function takes a DataFrame that may be a batch frame OR a
streaming frame (spark.readStream) — the expressions are identical;
that's the point of Structured Streaming. ``watermark`` is applied only
when the input is streaming (batch frames reject withWatermark).

Scale notes: streaming state is keyed by (window, key) — watermarks
bound it; at 100 TB/day the shuffle partitions must match key
cardinality, and sliding windows multiply state by dur/slide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGGS = ("count", "sum", "avg", "min", "max", "distinct")


def custom_agg(fn, return_type: str = "double"):
    """Custom window-aggregation closure — the reference's
    ``Arc<dyn Fn(&[StreamEvent]) -> PropertyValue>`` surface
    (windowed_operations.rs:97, dispatched at :376-379).

    ``fn`` receives a pandas.Series holding the group/window's values and
    returns one scalar. It runs as an Arrow-batched GROUPED_AGG pandas
    UDF: the JVM ships each group's column as one Arrow batch, so the
    closure is vectorized, not per-row. Use with any groupBy/window agg
    on batch frames and with ``Window.partitionBy`` frames; Spark does
    not support pandas grouped-agg UDFs inside *streaming* aggregations —
    the streaming custom path is applyInPandasWithState (count_window_agg
    shows the pattern).

        p90 = custom_agg(lambda s: float(np.percentile(s, 90)))
        df.groupBy(window("ts", "1 hour")).agg(p90("value"))
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _wrapped(v):
        return fn(v)

    # Series -> scalar hints select the GROUPED_AGG eval type; set real
    # objects (module-level `from __future__ import annotations` would
    # leave stringized hints pyspark can't resolve)
    _wrapped.__annotations__ = {"v": pd.Series, "return": float}
    return pandas_udf(_wrapped, return_type)


def _wm(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if df.isStreaming and watermark:
        return df.withWatermark(ts_col, watermark)
    return df


def _agg_exprs(value_col: str, aggs: tuple[str, ...] = AGGS, streaming: bool = False) -> list:
    """compute_aggregation dispatch (windowed_operations.rs:347-383).

    Distinct: exact in batch (extract_distinct_count,
    windowed_operations.rs:464-474); Spark forbids exact distinct aggs on
    streams, so streaming uses approx_count_distinct — also the right
    call at 100 TB cardinalities."""
    distinct = (
        F.approx_count_distinct(value_col) if streaming else F.count_distinct(value_col)
    ).alias("n_distinct")
    m = {
        "count": F.count("*").alias("n"),
        "sum": F.sum(value_col).alias("total"),
        "avg": F.avg(value_col).alias("mean"),
        "min": F.min(value_col).alias("vmin"),
        "max": F.max(value_col).alias("vmax"),
        "distinct": distinct,
    }
    return [m[a] for a in aggs]


def tumbling_window_agg(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: tuple[str, ...] = (),
    watermark: str | None = "10 minutes",
    extra_aggs: dict[str, object] | None = None,
) -> DataFrame:
    """``extra_aggs``: {name: aggregate Column} appended to the builtin
    set — the hook for ``custom_agg`` closures (batch frames). Spark
    forbids mixing pandas grouped-agg UDFs with JVM aggregates in one
    Aggregate, so extras run as a second aggregation joined back on the
    group keys (both sides share the one shuffle partitioning)."""
    d = _wm(df, ts_col, watermark)
    gb = [F.window(ts_col, duration).alias("w"), *key_cols]
    base = d.groupBy(*gb).agg(*_agg_exprs(value_col, streaming=df.isStreaming))
    extras = {n: c.alias(n) for n, c in (extra_aggs or {}).items()}
    if extras:
        ex = d.groupBy(*gb).agg(*extras.values())
        # null-safe join keys: groupBy keeps NULL-keyed groups, a plain
        # equality join would silently drop them when extras are present
        import functools
        import operator

        cond = functools.reduce(
            operator.and_,
            [base["w"].eqNullSafe(ex["w"])]
            + [base[k].eqNullSafe(ex[k]) for k in key_cols],
        )
        joined = base.join(ex, cond)
        for c in [ex["w"], *[ex[k] for k in key_cols]]:
            joined = joined.drop(c)
        base = joined
    return base.select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *key_cols,
        "n", "total", "mean", "vmin", "vmax", "n_distinct", *extras.keys()
    )


def sliding_window_agg(
    df: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: tuple[str, ...] = (),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    d = _wm(df, ts_col, watermark)
    return (
        d.groupBy(F.window(ts_col, duration, slide).alias("w"), *key_cols)
        .agg(*_agg_exprs(value_col, streaming=df.isStreaming))
        .select(F.col("w.start").alias("window_start"), *key_cols, "n", "total", "mean", "vmin", "vmax", "n_distinct")
    )


def session_window_agg(
    df: DataFrame,
    gap: str = "10 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: tuple[str, ...] = ("user_id",),
    watermark: str | None = "10 minutes",
) -> DataFrame:
    d = _wm(df, ts_col, watermark)
    return (
        d.groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
        .agg(*_agg_exprs(value_col, streaming=df.isStreaming))
        .select(F.col("w.start").alias("session_start"), *key_cols, "n", "total", "mean", "vmin", "vmax", "n_distinct")
    )


def global_agg(df: DataFrame, value_col: str = "value", key_cols: tuple[str, ...] = ()) -> DataFrame:
    """Global window: never closes (windowed_operations.rs:305-308);
    on a stream, run in complete output mode."""
    return df.groupBy(*key_cols).agg(*_agg_exprs(value_col, streaming=df.isStreaming))


def stream_dedup(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
    order_col: str | None = None,
) -> DataFrame:
    """Keep-first dedup by key. The reference declares
    enable_deduplication but never implements it
    (stream_processing.rs:428,441). On streams the watermark bounds the
    dedup state (dropDuplicatesWithinWatermark) and "first" means first
    ARRIVED. On a batch frame arrival order is undefined and
    dropDuplicates keeps an ARBITRARY row — here "first" is the
    earliest ``ts_col`` (tie-broken by ``order_col`` when given), so
    repeated runs keep the same survivor."""
    d = _wm(df, ts_col, watermark)
    if d.isStreaming:
        if watermark:
            return d.dropDuplicatesWithinWatermark(list(key_cols))
        return d.dropDuplicates(list(key_cols))
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()]
    if order_col is not None:
        order.append(F.col(order_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def count_window_agg(
    df: DataFrame,
    size: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Count windows: fixed-size chunks per key
    (windowed_operations.rs:301-304).

    Batch: row_number chunking — the COMPLETE dataset, so the trailing
    partial chunk is emitted. Stream: applyInPandasWithState keyed by
    ``key_col``, state = rows buffered since the last emitted chunk;
    only FULL chunks are emitted (the trailing partial stays buffered —
    on an unbounded stream it may still fill; compare the two paths on
    full chunks only, e.g. WHERE n = size, as the gate oracle does).
    """
    if not df.isStreaming:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(order_col).asc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("chunk", ((F.col("rn") - 1) / size).cast("long"))
            .groupBy(key_col, "chunk")
            .agg(
                F.count("*").alias("n"),
                F.min(order_col).alias("first_event"),
                F.max(order_col).alias("last_event"),
            )
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    import pandas as pd

    # key AND order columns keep THEIR dtypes (the batch path handles
    # any type; hardcoding long broke string keys/ids at Arrow
    # serialization)
    dtypes = dict(df.dtypes)
    key_type, ord_type = dtypes[key_col], dtypes[order_col]
    out_schema = (
        f"{key_col} {key_type}, chunk long, n long, "
        f"first_event {ord_type}, last_event {ord_type}"
    )
    state_schema = f"chunk long, buf_n long, buf_first {ord_type}, buf_last {ord_type}"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            chunk, buf_n, buf_first, buf_last = state.get
        else:
            chunk, buf_n, buf_first, buf_last = 0, 0, None, None
        rows = []
        # concatenate BEFORE sorting: a group larger than the Arrow
        # record-batch size arrives as several chunks in arbitrary
        # order — sorting each chunk independently would buffer events
        # out of (ts, order) order and diverge from the batch path's
        # global row_number ordering
        chunks = [pdf for pdf in pdfs]
        if len(chunks) > 1:
            pdf = pd.concat(chunks, ignore_index=True)
        elif chunks:
            pdf = chunks[0]
        else:  # timeout-style invocation with no data
            pdf = pd.DataFrame({ts_col: [], order_col: []})
        pdf = pdf.sort_values([ts_col, order_col])
        for ev in pdf[order_col]:
            # normalize numpy scalars to python for the state tuple
            ev = ev.item() if hasattr(ev, "item") else ev
            buf_n += 1
            buf_first = ev if buf_first is None else buf_first
            buf_last = ev
            if buf_n == size:
                rows.append((key[0], chunk, buf_n, buf_first, buf_last))
                chunk += 1
                buf_n, buf_first, buf_last = 0, None, None
        state.update((chunk, buf_n, buf_first, buf_last))
        yield pd.DataFrame(rows, columns=[key_col, "chunk", "n", "first_event", "last_event"])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
