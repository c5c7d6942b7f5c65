from dd_graphdb_spark.functions.scalar import (
    as_bool,
    as_float64,
    as_int64,
    as_string,
    geo_dim,
    geo_enrich,
    render_props,
    with_processing_time,
)

__all__ = [
    "as_int64",
    "as_float64",
    "as_bool",
    "as_string",
    "render_props",
    "with_processing_time",
    "geo_dim",
    "geo_enrich",
]
