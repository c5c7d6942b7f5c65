"""Source-format extraction rules + scalar enrichers, oracle-checked.

Covers the reference's declared-but-dead ingest surface
(stream_connectors.rs:167-208 extraction rules; stream_transform.rs
enrichers) re-expressed as JVM column expressions — see
dd_graphdb_spark.sources.formats and dd_graphdb_spark.functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.graph import read_events

    return read_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# JSON extraction rule: events.props is a JSON payload; pull $.k as a
# typed column and filter on it (ExtractionRule::JSON + FilterCondition,
# stream_connectors.rs:167-208).
# ---------------------------------------------------------------------------
@_q(
    "source_json_extraction",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def source_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.sources import ExtractionRule, apply_extraction

    rule = ExtractionRule(
        rule_id="props_k",
        format="json",
        field_mappings={"k": "$.k"},
        types={"k": "long"},
        filters=["k >= 50"],
    )
    return apply_extraction(_events(spark, sf_dir), "props", rule).select("event_id", "k")


# ---------------------------------------------------------------------------
# Regex extraction rule over the same payload (ExtractionRule::Regex).
# ---------------------------------------------------------------------------
@_q(
    "source_regex_extraction",
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
    FROM events
    WHERE event_id < 100
    """,
)
def source_regex_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.sources import ExtractionRule, apply_extraction

    rule = ExtractionRule(
        rule_id="props_k_re",
        format="regex",
        field_mappings={"k": r'"k": (\d+)'},
        types={"k": "long"},
    )
    out = apply_extraction(
        _events(spark, sf_dir).filter(F.col("event_id") < 100), "props", rule
    )
    return out.select("event_id", "k")


# ---------------------------------------------------------------------------
# CSV extraction rule: parse a delimited payload back into typed fields
# (ExtractionRule::CSV via from_csv — codegen, no Python).
# ---------------------------------------------------------------------------
@_q(
    "source_csv_extraction",
    """
    SELECT event_id AS id_field, event_type AS type_field
    FROM events
    WHERE event_type <> 'click'
    """,
)
def source_csv_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.sources import ExtractionRule, apply_extraction

    payload = _events(spark, sf_dir).select(
        F.concat_ws(",", "event_id", "event_type").alias("line")
    )
    rule = ExtractionRule(
        rule_id="csv_line",
        format="csv",
        field_mappings={"id_field": "a", "type_field": "b"},
        csv_schema="a BIGINT, b STRING",
        filters=["type_field <> 'click'"],
    )
    return apply_extraction(payload, "line", rule).select("id_field", "type_field")


# ---------------------------------------------------------------------------
# Geolocation enricher: broadcast dim join (stream_transform.rs:505-600).
# ---------------------------------------------------------------------------
@_q(
    "fn_geo_enrich",
    """
    WITH geo(bucket, region_code) AS (
        VALUES (0, 'NA'), (1, 'EU'), (2, 'APAC'), (3, 'SA'), (4, 'AF')
    )
    SELECT region_code, COUNT(*) AS n
    FROM events JOIN geo ON CAST(user_id % 5 AS INT) = bucket
    GROUP BY region_code
    """,
)
def fn_geo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.functions import geo_enrich

    return (
        geo_enrich(_events(spark, sf_dir), "user_id")
        .groupBy("region_code")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# JSON property extraction (PropertyValue <-> JSON conversion,
# stream_transform.rs:335-377): parse the events.props JSON payload with
# a typed schema (from_json stays inside codegen - no Python), extract
# the numeric property, aggregate per decile.
# ---------------------------------------------------------------------------
@_q(
    "fn_json_props",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_decile,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    """,
)
def fn_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = _events(spark, sf_dir).select(
        F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.select((F.col("p.k") % 10).alias("k_decile"), F.col("p.k").alias("k"))
        .groupBy("k_decile")
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


# Uniform events-precision handling (no-op for ts-free oracles; see
# graph.rewrite_events_oracles).
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
