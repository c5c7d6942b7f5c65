from dd_graphdb_spark.streaming.windows import (
    count_window_agg,
    custom_agg,
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
from dd_graphdb_spark.streaming.transform import (
    AlertEngine,
    AlertRule,
    FilterRule,
    TransformPipeline,
    apply_filter_rules,
    changeset_summary,
    convert_to_changesets,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "count_window_agg",
    "custom_agg",
    "global_agg",
    "stream_dedup",
    "events_stream",
    "run_to_memory",
    "incremental_view_pipeline",
    "FilterRule",
    "apply_filter_rules",
    "TransformPipeline",
    "convert_to_changesets",
    "changeset_summary",
    "AlertRule",
    "AlertEngine",
]
