from dd_graphdb_spark.sources.connectors import (
    MqttSource,
    WebhookSource,
    events_stream,
    file_stream,
    kafka_stream,
    rate_stream,
    socket_stream,
)
from dd_graphdb_spark.sources.formats import ExtractionRule, apply_extraction

__all__ = [
    "MqttSource",
    "WebhookSource",
    "ExtractionRule",
    "apply_extraction",
    "events_stream",
    "file_stream",
    "kafka_stream",
    "rate_stream",
    "socket_stream",
]
