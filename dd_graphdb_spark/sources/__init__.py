from dd_graphdb_spark.sources.connectors import (
    events_stream,
    file_stream,
    kafka_stream,
    rate_stream,
    socket_stream,
)
from dd_graphdb_spark.sources.formats import ExtractionRule, apply_extraction

__all__ = [
    "ExtractionRule",
    "apply_extraction",
    "events_stream",
    "file_stream",
    "kafka_stream",
    "rate_stream",
    "socket_stream",
]
