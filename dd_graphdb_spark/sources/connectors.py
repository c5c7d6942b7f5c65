"""Stream source connectors.

Reference intent (StreamSourceType / ConnectionConfig — Kafka, Redis,
HTTP, FileSystem-watch, CDC, MQTT, Socket; stream_connectors.rs:40-166,
declared-but-dead per SURVEY.md §0.1). Spark's source ecosystem replaces
each one:

| reference source | here |
|---|---|
| Kafka (brokers/group/offsets/SASL-TLS) | ``kafka_stream`` (format "kafka") |
| FileSystem watch (patterns)            | ``file_stream`` (directory source) |
| Socket TCP                             | ``socket_stream`` |
| synthetic/testing                      | ``rate_stream`` (rows/second) |
| Redis/MQTT/CDC/HTTP webhook            | external connectors (Delta CDF /
|                                        | kafka-connect); out of local scope |

Each returns an unbounded streaming DataFrame; pair with
``sources.formats.apply_extraction`` for payload parsing and
``streaming.windows`` / ``streaming.pipeline`` for processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# canonical implementations live in streaming.pipeline (kept importable
# from either module)
from dd_graphdb_spark.streaming.pipeline import events_stream, kafka_stream  # noqa: F401


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic benchmark/test source: (timestamp, value) rows at a
    fixed rate — the harness the reference's demo streams hand-roll."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Directory-watch source (ConnectionConfig::FileSystem intent,
    stream_connectors.rs:92-97): every new file is a micro-batch;
    ``maxFilesPerTrigger`` is the backpressure bound
    (stream_processing.rs:247-268 maps to source rate limits)."""
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    return getattr(reader, fmt)(path)


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP socket source (ConnectionConfig::Socket intent,
    stream_connectors.rs:108-113). Lines arrive as a single ``value``
    string column — parse with sources.formats.apply_extraction."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
