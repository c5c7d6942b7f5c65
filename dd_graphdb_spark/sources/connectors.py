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
| HTTP webhook (push endpoint)           | ``WebhookSource`` (HTTP spool →
|                                        | file-source micro-batches) |
| MQTT (broker/topics/QoS)               | ``MqttSource`` (paho-gated client →
|                                        | spool → file-source micro-batches) |
| Redis/CDC                              | external connectors (Delta CDF /
|                                        | kafka-connect); out of local scope —
|                                        | CDC over the local store: see
|                                        | ``storage.store.GraphStore.changes`` |

Each returns an unbounded streaming DataFrame; pair with
``sources.formats.apply_extraction`` for payload parsing and
``streaming.windows`` / ``streaming.pipeline`` for processing.

Deploying the real Kafka source: the jar is not bundled with pyspark —
start the session with

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 ...
    # or: SparkSession.builder.config("spark.jars.packages",
    #         "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2")

``kafka_available`` probes the classpath at runtime;
``mock_kafka_stream`` is a file-backed source with the IDENTICAL output
schema, so pipelines built on it run unchanged against the real source
(integration-tested by tests/test_sources_connectors.py::
test_stream_kafka_roundtrip, which switches to a real broker when one
is configured).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# canonical implementations live in streaming.pipeline (kept importable
# from either module)
from dd_graphdb_spark.streaming.pipeline import events_stream, kafka_stream  # noqa: F401

# --packages coordinate for the real source (scala 2.13 build matching
# the pyspark 4.x line)
KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"

# the kafka source's fixed output schema (Spark's kafka relation): the
# mock below reproduces it exactly so downstream code is source-agnostic
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka jar is on the session classpath
    (builder construction succeeds); False on the standard
    DATA_SOURCE_NOT_FOUND error. No broker contact happens — source
    construction is lazy."""
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:1")
            .option("subscribe", "probe")
            .load()
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def mock_kafka_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-backed Kafka stand-in: a directory of parquet files in
    ``KAFKA_SOURCE_SCHEMA``. Every downstream step (key/value
    deserialization, extraction rules, windowing) sees exactly what the
    real source would emit — swap this for ``kafka_stream`` at deploy
    time and nothing else changes."""
    return file_stream(
        spark, path, KAFKA_SOURCE_SCHEMA, "parquet", max_files_per_trigger
    )


def to_kafka_records(
    df: DataFrame,
    topic: str,
    value_cols: list[str],
    key_col: str | None = None,
) -> DataFrame:
    """Encode rows as Kafka wire records: ``value`` = JSON bytes of the
    selected columns, ``key`` = the key column's bytes (or null). The
    output matches what ``df.write.format("kafka")`` expects, and —
    with the metadata columns a broker would add — what the source
    re-emits; used for the mock roundtrip and as the sink-side encoder."""
    from pyspark.sql import functions as F

    key = (
        F.col(key_col).cast("string").cast("binary")
        if key_col
        else F.lit(None).cast("binary")
    )
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*value_cols)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


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


def _spool_atomic(spool_dir: str, prefix: str, seq: int, body: bytes) -> None:
    """One file per message, dot-tmp write + atomic rename so the Spark
    file source never reads a half-written file — the exactly-once
    contract both spool-bridge sources (webhook, MQTT) rely on."""
    import uuid

    name = f"{prefix}_{seq:08d}_{uuid.uuid4().hex[:8]}.jsonl"
    tmp = os.path.join(spool_dir, f".{name}.tmp")
    with open(tmp, "wb") as f:
        f.write(body.rstrip(b"\n") + b"\n")
    os.rename(tmp, os.path.join(spool_dir, name))


class WebhookSource:
    """HTTP push-endpoint source (HttpWebhookSource intent,
    stream_connectors.rs:382-391 — declared-but-dead in the reference;
    real here). A stdlib HTTP server accepts POSTed payloads and spools
    each request body as a JSON-lines file; ``stream()`` is a file
    source over the spool directory, so every accepted request becomes
    (part of) a micro-batch with exactly-once file-source semantics.

    Scale posture: the spool directory is the durability boundary — at
    production scale it is an object-store prefix written by any number
    of stateless HTTP receivers (the same lands-in-a-bucket shape as
    managed ingest), and the Spark side is unchanged. Payload parsing
    stays declarative via sources.formats.apply_extraction.
    """

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        import http.server
        import threading

        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        source = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length) if length else b""
                if not body.strip():
                    self.send_response(400)
                    self.end_headers()
                    return
                source._spool(body)
                self.send_response(202)
                self.end_headers()

        self._httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._seq = 0
        self._lock = threading.Lock()

    def _spool(self, body: bytes) -> None:
        with self._lock:
            self._seq += 1
            seq = self._seq
        _spool_atomic(self.spool_dir, "req", seq, body)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        return f"http://{self._httpd.server_address[0]}:{self.port}/"

    def start(self) -> "WebhookSource":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)

    def stream(
        self, spark: SparkSession, max_files_per_trigger: int = 10
    ) -> DataFrame:
        """The spooled requests as a streaming frame: one ``raw`` string
        column per posted JSON line — parse with apply_extraction."""
        return (
            spark.readStream.schema("raw string")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .text(self.spool_dir)
            .withColumnRenamed("value", "raw")
        )


#: fixed output schema of MqttSource.stream() — mirrors the fields an
#: MQTT broker delivers per message (stream_connectors.rs:119-166
#: declares broker/client/topics/QoS config; the message surface is
#: topic + payload + qos + retained + arrival time)
MQTT_SOURCE_SCHEMA = (
    "topic string, payload binary, qos int, retained boolean, timestamp timestamp"
)


class MqttSource:
    """MQTT subscriber source (ConnectionConfig::MQTT intent,
    stream_connectors.rs:119-166 — declared-but-dead in the reference).

    Same spool-bridge shape as ``WebhookSource``: received messages are
    spooled one-file-per-message (tmp-write + atomic rename) as JSON
    lines, and ``stream()`` is a file source over the spool, so every
    message becomes part of a micro-batch with exactly-once file-source
    semantics. The broker client is the OPTIONAL part: ``connect()``
    needs the ``paho-mqtt`` package (import-gated like Avro) and wires
    the client's on_message callback to ``inject()``; ``inject()``
    itself is dependency-free, which is also what tests drive.

    Scale posture: identical to the webhook source — the spool is the
    durability boundary (an object-store prefix at production scale,
    written by any number of subscriber processes), and the Spark side
    is a plain file source either way.
    """

    def __init__(
        self,
        spool_dir: str,
        broker_url: str = "mqtt://127.0.0.1:1883",
        client_id: str = "dd-graphdb-spark",
        topics: tuple[str, ...] = ("#",),
        qos: int = 1,
        username: str | None = None,
        password: str | None = None,
    ):
        import threading

        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.broker_url = broker_url
        self.client_id = client_id
        self.topics = tuple(topics)
        self.qos = qos
        self.username = username
        self.password = password
        self._client = None
        self._seq = 0
        self._lock = threading.Lock()

    # -- broker side (optional dependency) ------------------------------
    def connect(self) -> "MqttSource":
        """Subscribe to ``topics`` on the configured broker. Requires
        ``paho-mqtt``; everything else in this class works without it."""
        try:
            import paho.mqtt.client as mqtt  # type: ignore[import-not-found]
        except ImportError as ex:  # pragma: no cover - package absent in CI
            raise ImportError(
                "MqttSource.connect() needs the optional paho-mqtt package "
                "(pip install paho-mqtt); spooling via inject() and "
                "stream() work without it"
            ) from ex
        import urllib.parse

        u = urllib.parse.urlparse(self.broker_url)
        host, port = u.hostname or "127.0.0.1", u.port or 1883
        # paho-mqtt >= 2.0 requires an explicit callback API version as
        # the first Client argument (the 1.x constructor raises there)
        if hasattr(mqtt, "CallbackAPIVersion"):
            client = mqtt.Client(
                mqtt.CallbackAPIVersion.VERSION1, client_id=self.client_id
            )
        else:
            client = mqtt.Client(client_id=self.client_id)
        if self.username is not None:
            client.username_pw_set(self.username, self.password)
        client.on_message = lambda _c, _u, msg: self.inject(
            msg.topic, msg.payload, qos=msg.qos, retained=bool(msg.retain)
        )

        # subscribe in on_connect, not inline: paho's auto-reconnect
        # restores the CONNECTION after a broker drop, but with
        # clean-session defaults the new session has NO subscriptions —
        # re-issuing them on every (re)connect keeps the spool fed
        def _on_connect(c, _u, _flags, _rc, *_props):
            for t in self.topics:
                c.subscribe(t, qos=self.qos)

        client.on_connect = _on_connect
        client.connect(host, port)
        client.loop_start()
        self._client = client
        return self

    def stop(self) -> None:
        if self._client is not None:
            self._client.loop_stop()
            self._client.disconnect()
            self._client = None

    # -- spool side (dependency-free) -----------------------------------
    def inject(
        self,
        topic: str,
        payload: bytes,
        qos: int = 0,
        retained: bool = False,
        timestamp=None,
    ) -> None:
        """Spool one message (the on_message callback target; callable
        directly in tests and by any other subscriber implementation)."""
        import base64
        import datetime
        import json

        ts = timestamp or datetime.datetime.now(datetime.timezone.utc)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        rec = json.dumps(
            {
                "topic": topic,
                "payload_b64": base64.b64encode(payload).decode("ascii"),
                "qos": qos,
                "retained": retained,
                # epoch microseconds, NOT a wall-clock string: a naive
                # timestamp string would be re-parsed in the Spark
                # SESSION timezone, shifting every instant on non-UTC
                # sessions
                "ts_us": int(ts.timestamp() * 1_000_000),
            }
        )
        with self._lock:
            self._seq += 1
            seq = self._seq
        _spool_atomic(self.spool_dir, "msg", seq, rec.encode("ascii"))

    def stream(
        self, spark: SparkSession, max_files_per_trigger: int = 10
    ) -> DataFrame:
        """The spooled messages as a streaming frame in
        ``MQTT_SOURCE_SCHEMA``; payload bytes round-trip through base64
        in the spool files."""
        from pyspark.sql import functions as F

        raw = (
            spark.readStream.schema("raw string")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .text(self.spool_dir)
            .withColumnRenamed("value", "raw")
        )
        parsed = raw.select(
            F.from_json(
                "raw",
                "topic string, payload_b64 string, qos int, "
                "retained boolean, ts_us long",
            ).alias("m")
        )
        return parsed.select(
            F.col("m.topic").alias("topic"),
            F.unbase64("m.payload_b64").alias("payload"),
            F.col("m.qos").alias("qos"),
            F.col("m.retained").alias("retained"),
            F.timestamp_micros(F.col("m.ts_us")).alias("timestamp"),
        )


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
