"""Connector/format shape checks that run with OR without the optional
packages (kafka, spark-avro), plus the versioned-state torn-write
guarantee.

The reference declares Kafka and Avro ingestion (stream_connectors.rs:
68-118, 167-208 — dead code there); here the builder configs must be
well-formed either way: with the package present they produce a real
source/parse, without it they fail LOUDLY with the standard
data-source-missing error, never silently.
"""

import json
import os

import pytest
from pyspark.sql import functions as F


def _kafka_missing_err(spark):
    """None if the kafka source loads; the error string if missing."""
    try:
        (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", "localhost:9092")
            .option("subscribe", "probe")
            .load()
        )
        return None
    except Exception as e:  # noqa: BLE001
        return str(e)


def test_kafka_builder_shape(spark):
    """kafka_stream wires brokers/topic/offsets into a well-formed
    reader. Package present: the unbounded frame has the kafka schema.
    Package absent: the standard DATA_SOURCE_NOT_FOUND error surfaces —
    a config typo can never pass silently."""
    from dd_graphdb_spark.sources.connectors import kafka_stream

    err = _kafka_missing_err(spark)
    if err is None:
        df = kafka_stream(spark, "localhost:9092", "events", "earliest")
        assert df.isStreaming
        assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)
    else:
        assert "kafka" in err.lower()
        with pytest.raises(Exception, match="(?i)kafka"):
            kafka_stream(spark, "localhost:9092", "events", "earliest")


AVRO_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "kind", "type": "string"},
        ],
    }
)


def _avro_available(spark):
    try:
        from pyspark.sql.avro.functions import to_avro

        df = spark.range(1).select(to_avro(F.struct("id")).alias("b"))
        df.collect()
        return True
    except Exception:  # noqa: BLE001
        return False


def test_avro_extraction_rule_shape(spark):
    """The avro ExtractionRule composes from_avro + field mapping.
    Package present: a to_avro→from_avro round-trip recovers the fields.
    Package absent: evaluation fails mentioning avro — loud, not
    silent."""
    from dd_graphdb_spark.sources.formats import ExtractionRule, apply_extraction

    rule = ExtractionRule(
        "r1",
        "avro",
        {"event_id": "event_id", "kind": "kind"},
        types={"event_id": "long"},
        avro_schema=AVRO_SCHEMA,
    )
    if _avro_available(spark):
        from pyspark.sql.avro.functions import to_avro

        src = spark.createDataFrame([(7, "click")], "event_id long, kind string")
        payload = src.select(
            to_avro(F.struct("event_id", "kind"), AVRO_SCHEMA).alias("raw")
        )
        out = apply_extraction(payload, "raw", rule).select("event_id", "kind")
        assert out.collect()[0].asDict() == {"event_id": 7, "kind": "click"}
    else:
        payload = spark.createDataFrame([(bytearray(b"x"),)], "raw binary")
        with pytest.raises(Exception, match="(?i)avro"):
            apply_extraction(payload, "raw", rule).collect()


def test_avro_rule_requires_schema(spark):
    from dd_graphdb_spark.sources.formats import ExtractionRule, apply_extraction

    rule = ExtractionRule("r1", "avro", {"x": "x"})
    payload = spark.createDataFrame([(bytearray(b"x"),)], "raw binary")
    with pytest.raises(ValueError, match="avro_schema"):
        apply_extraction(payload, "raw", rule)


def test_stream_kafka_roundtrip(spark, sf_dir, tmp_path):
    """End-to-end source contract: events → Kafka wire records (JSON
    value bytes + key + topic/partition/offset/timestamp metadata) →
    streaming source → JSON extraction recovers the typed rows.

    Runs against a REAL broker when the spark-sql-kafka jar is on the
    classpath (see connectors.KAFKA_PACKAGE for the --packages
    coordinate) and $SPARK_KAFKA_TEST_BROKER points at one; otherwise
    through the file-backed mock emitting the IDENTICAL source schema —
    every downstream step (deserialize, extract, cast) is the same code
    path either way, so a green mock run certifies the pipeline and the
    broker leg only re-certifies transport."""
    from dd_graphdb_spark.graph import read_events
    from dd_graphdb_spark.sources.connectors import (
        kafka_available,
        kafka_stream,
        mock_kafka_stream,
        to_kafka_records,
    )
    from dd_graphdb_spark.sources.formats import ExtractionRule, apply_extraction
    from dd_graphdb_spark.streaming.pipeline import run_to_memory

    ev = (
        read_events(spark, sf_dir)
        .filter(F.col("event_id") < 200)
        .select("event_id", "event_type", "value")
    )
    records = to_kafka_records(
        ev, "events_rt", ["event_id", "event_type", "value"], key_col="event_id"
    )
    broker = os.environ.get("SPARK_KAFKA_TEST_BROKER")
    if kafka_available(spark) and broker:
        records.write.format("kafka").option(
            "kafka.bootstrap.servers", broker
        ).save()
        stream = kafka_stream(spark, broker, "events_rt", "earliest")
    else:
        src = str(tmp_path / "kafka_mock")
        (
            records.withColumn(
                "partition", F.pmod(F.crc32(F.col("key")), F.lit(4)).cast("int")
            )
            .withColumn("offset", F.monotonically_increasing_id())
            .withColumn("timestamp", F.current_timestamp())
            .withColumn("timestampType", F.lit(0))
            .write.parquet(src)
        )
        stream = mock_kafka_stream(spark, src)
    assert stream.isStreaming
    rule = ExtractionRule(
        "kafka_json",
        "json",
        {
            "event_id": "$.event_id",
            "event_type": "$.event_type",
            "v": "$.value",
        },
        types={"event_id": "long", "v": "double"},
    )
    parsed = apply_extraction(
        stream.select(F.col("value").cast("string").alias("raw")), "raw", rule
    ).select("event_id", "event_type", "v")
    got = run_to_memory(parsed, output_mode="append")
    want = {(r["event_id"], r["event_type"], r["value"]) for r in ev.collect()}
    assert {(r["event_id"], r["event_type"], r["v"]) for r in got.collect()} == want


def test_webhook_source_roundtrip(spark, tmp_path):
    """HTTP push endpoint → spool → file-source micro-batches → JSON
    extraction (HttpWebhookSource intent, stream_connectors.rs:382-391 —
    dead in the reference, real here)."""
    import urllib.request

    from dd_graphdb_spark.sources.connectors import WebhookSource
    from dd_graphdb_spark.sources.formats import ExtractionRule, apply_extraction
    from dd_graphdb_spark.streaming.pipeline import run_to_memory

    src = WebhookSource(str(tmp_path / "spool")).start()
    try:
        for i in range(5):
            req = urllib.request.Request(
                src.url,
                data=json.dumps({"event_id": i, "kind": "click"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                assert resp.status == 202
        # empty body is rejected, never spooled
        try:
            urllib.request.urlopen(
                urllib.request.Request(src.url, data=b"", method="POST")
            )
            raised = False
        except Exception:  # noqa: BLE001
            raised = True
        assert raised

        stream = src.stream(spark)
        assert stream.isStreaming
        parsed = apply_extraction(
            stream,
            "raw",
            ExtractionRule(
                "wh", "json", {"event_id": "$.event_id", "kind": "$.kind"},
                types={"event_id": "long"},
            ),
        ).select("event_id", "kind")
        got = run_to_memory(parsed, output_mode="append")
        assert {(r["event_id"], r["kind"]) for r in got.collect()} == {
            (i, "click") for i in range(5)
        }
    finally:
        src.stop()


def test_versioned_table_torn_write_invisible(spark, tmp_path):
    """Commit protocol: a writer that dies after writing data files but
    BEFORE the meta.json pointer swap leaves readers on the previous
    version — the half-written directory is invisible."""
    from dd_graphdb_spark.views.incremental import _VersionedTable

    t = _VersionedTable(spark, str(tmp_path / "cell"), "k string, v long")
    t.write(spark.createDataFrame([("a", 1)], "k string, v long"))
    committed = t.version

    # simulate the torn write: next version dir exists, pointer not moved
    torn = os.path.join(str(tmp_path / "cell"), f"v{committed + 1}")
    spark.createDataFrame([("garbage", 999)], "k string, v long").write.mode(
        "overwrite"
    ).parquet(torn)

    assert t.version == committed
    assert [r.asDict() for r in t.read().collect()] == [{"k": "a", "v": 1}]

    # the next committed write supersedes the orphan
    t.write(spark.createDataFrame([("b", 2)], "k string, v long"))
    assert [r.asDict() for r in t.read().collect()] == [{"k": "b", "v": 2}]


def test_mqtt_spool_roundtrip(spark, tmp_path):
    """MQTT spool-bridge source (ConnectionConfig::MQTT intent,
    stream_connectors.rs:119-166 — dead in the reference): inject()
    (the on_message callback target) spools messages; stream() delivers
    them in MQTT_SOURCE_SCHEMA with payload bytes intact."""
    from datetime import datetime, timezone

    from dd_graphdb_spark.sources.connectors import MQTT_SOURCE_SCHEMA, MqttSource
    from dd_graphdb_spark.streaming.pipeline import run_to_memory

    src = MqttSource(str(tmp_path / "mqtt_spool"), topics=("sensors/#",))
    ts = datetime(2026, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    src.inject("sensors/a", b'{"v": 1}', qos=1, timestamp=ts)
    src.inject("sensors/b", b"\x00\xffbinary", qos=0, retained=True, timestamp=ts)

    stream = src.stream(spark)
    assert stream.isStreaming
    # schema is the fixed MQTT source schema
    want = spark.createDataFrame([], MQTT_SOURCE_SCHEMA).schema
    assert stream.schema == want

    rows = run_to_memory(stream, output_mode="append").collect()
    got = {
        (r["topic"], bytes(r["payload"]), r["qos"], r["retained"]) for r in rows
    }
    assert got == {
        ("sensors/a", b'{"v": 1}', 1, False),
        ("sensors/b", b"\x00\xffbinary", 0, True),
    }
    # the spool stores epoch micros, so the instant survives regardless
    # of the Spark session timezone (UTC session → naive UTC datetime)
    assert {r["timestamp"] for r in rows} == {datetime(2026, 1, 1, 12, 0, 0)}


def test_mqtt_connect_requires_paho(tmp_path):
    import pytest as _pt

    from dd_graphdb_spark.sources.connectors import MqttSource

    src = MqttSource(str(tmp_path / "spool"))
    # the container has no paho-mqtt: connect() must fail with guidance,
    # while the spool/stream surface stays fully usable
    with _pt.raises(ImportError, match="paho-mqtt"):
        src.connect()
