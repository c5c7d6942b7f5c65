from dd_graphdb_spark.streaming.windows import (
    count_window_agg,
    global_agg,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)
from dd_graphdb_spark.streaming.pipeline import (
    events_stream,
    run_to_memory,
    incremental_view_pipeline,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "count_window_agg",
    "global_agg",
    "stream_dedup",
    "events_stream",
    "run_to_memory",
    "incremental_view_pipeline",
]
