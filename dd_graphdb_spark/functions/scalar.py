"""Scalar function surface (SURVEY.md §2.7).

The reference has no scalar function library; its only scalar machinery
is typed property access, display/JSON rendering, and two
declared-but-dead stream enrichers. This module re-expresses that
surface as JVM column expressions (everything else a user needs comes
from pyspark.sql.functions for free — the §2.7 verdict):

- typed accessors: ``as_int64`` / ``as_float64`` / ``as_bool`` /
  ``as_string`` over the JSON-rendered property map, with the
  reference's int→float widening (graph/core/src/lib.rs:166-222)
- ``render_props`` — display/JSON rendering of a property map
  (graph/core/src/lib.rs:225-243; executor.rs:80-154)
- ``with_processing_time`` — processing-timestamp + event→processing
  latency enricher (stream_transform.rs:467-502, ⚫ dead in ref)
- ``geo_enrich`` — broadcast dim-table geolocation enricher
  (stream_transform.rs:505-600, ⚫ dead in ref): the production shape is
  a broadcast join against a geo dimension; a deterministic builtin dim
  keyed by id-bucket stands in (the real GeoIP db is environment data)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dd_graphdb_spark.localrel import local_df

from dd_graphdb_spark.storage.store import prop_typed


def as_int64(props: str | Column, key: str) -> Column:
    """PropertyValue::as_int64 (graph/core/src/lib.rs:166-180)."""
    return prop_typed(props, key, "long")


def as_float64(props: str | Column, key: str) -> Column:
    """as_float64 with int→float widening (lib.rs:183-189)."""
    return prop_typed(props, key, "double")


def as_bool(props: str | Column, key: str) -> Column:
    return prop_typed(props, key, "boolean")


def as_string(props: str | Column, key: str) -> Column:
    return prop_typed(props, key, "string")


def render_props(props: str | Column) -> Column:
    """JSON rendering of the property map (values are stored
    JSON-rendered, so this is a to_json over the map)."""
    c = F.col(props) if isinstance(props, str) else props
    return F.to_json(c)


def with_processing_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Timestamp/latency enricher (stream_transform.rs:467-502): adds
    ``processing_ts`` and ``latency_ms`` (processing − event time)."""
    return df.withColumn("processing_ts", F.current_timestamp()).withColumn(
        "latency_ms",
        (F.unix_millis(F.col("processing_ts")) - F.unix_millis(F.col(ts_col))).cast("long"),
    )


DEFAULT_GEO_DIM = [
    (0, "NA", "North America"),
    (1, "EU", "Europe"),
    (2, "APAC", "Asia Pacific"),
    (3, "SA", "South America"),
    (4, "AF", "Africa"),
]


def geo_dim(spark: SparkSession) -> DataFrame:
    return local_df(spark, DEFAULT_GEO_DIM, "bucket int, region_code string, region string")


def geo_enrich(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Geolocation enricher (stream_transform.rs:505-600): broadcast the
    small dimension to every task — no shuffle of the fact side, the
    only sane shape at 100 TB. Buckets by ``key_col % 5`` standing in
    for the IP-prefix lookup."""
    dim = geo_dim(df.sparkSession)
    # pmod (signed % keeps the dividend's sign, so a negative key would
    # bucket outside 0..4) + LEFT join (an enricher must never DROP fact
    # rows — NULL keys keep their row with null region columns)
    return df.withColumn("bucket", F.pmod(F.col(key_col), F.lit(5)).cast("int")).join(
        F.broadcast(dim), "bucket", "left"
    )
