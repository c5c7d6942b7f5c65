"""Stream-source data formats & extraction rules.

Reference intent (declared-but-dead code — stream_connectors.rs:167-208,
not compiled per SURVEY.md §0.1): ``DataFormat`` (JSON/Avro/CSV/...) and
``ExtractionRule {rule_id, rule_type, field_mappings, filters,
transformations}`` turning raw payloads into typed event fields.

Spark mapping: every format lowers to a built-in JVM expression —
``get_json_object`` / ``from_json`` (JSON), ``regexp_extract`` (Regex),
``from_csv`` (CSV), ``from_avro`` (Avro, gated: the avro package may not
be deployed). Extraction therefore runs inside whole-stage codegen on
batch AND streaming frames alike — no Python in the hot path, which is
the 100 TB requirement for an ingest layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ExtractionRule:
    """Declarative payload→fields extraction (ExtractionRule parity,
    stream_connectors.rs:185-208).

    - ``format``: json | regex | csv
    - ``field_mappings``: output column → format-specific selector
        json:  JsonPath ("$.k")
        regex: a pattern with ONE capture group
        csv:   source field name within ``csv_schema``
    - ``types``: output column → cast type (default string)
    - ``filters``: SQL boolean expressions applied after extraction
      (FilterCondition parity)
    """

    rule_id: str
    format: str
    field_mappings: dict[str, str]
    types: dict[str, str] = field(default_factory=dict)
    filters: list[str] = field(default_factory=list)
    csv_schema: str | None = None  # e.g. "a LONG, b STRING" (csv format)
    # avro format: the writer's Avro schema JSON; requires the
    # spark-avro package on the cluster (fails with a clear
    # FAILED_TO_LOAD_DATA_SOURCE/AVRO error otherwise — shape-checked by
    # tests/test_sources_connectors.py either way)
    avro_schema: str | None = None


def _extract_col(rule: ExtractionRule, raw: Column, out_col: str, parsed: Column | None) -> Column:
    sel = rule.field_mappings[out_col]
    if rule.format == "json":
        c = F.get_json_object(raw, sel)
    elif rule.format == "regex":
        c = F.regexp_extract(raw, sel, 1)
    elif rule.format in ("csv", "avro"):
        c = parsed.getField(sel)
    else:
        raise ValueError(f"unsupported format {rule.format}")
    dtype = rule.types.get(out_col)
    return c.cast(dtype) if dtype else c


def apply_extraction(df: DataFrame, raw_col: str, rule: ExtractionRule) -> DataFrame:
    """Apply an extraction rule to ``df[raw_col]``: adds one column per
    field mapping, then applies the rule's filters."""
    raw = F.col(raw_col)
    parsed = None
    if rule.format == "csv":
        if rule.csv_schema is None:
            raise ValueError("csv extraction needs csv_schema")
        parsed = F.from_csv(raw, F.lit(rule.csv_schema))
    elif rule.format == "avro":
        if rule.avro_schema is None:
            raise ValueError("avro extraction needs avro_schema")
        from pyspark.sql.avro.functions import from_avro

        parsed = from_avro(raw, rule.avro_schema)
    out = df
    for out_col in rule.field_mappings:
        out = out.withColumn(out_col, _extract_col(rule, raw, out_col, parsed))
    for cond in rule.filters:
        out = out.filter(F.expr(cond))
    return out
