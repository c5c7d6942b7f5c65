"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query smoke check on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 (+ the
  LLM-pipeline extensions), as (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: DuckDB-equivalent SQL per query for the correctness
  gate. As of round 5 EVERY query has an oracle (non-SQL-expressible
  numerics are pinned by SQL invariants instead — see
  suites/llm_ops.py `_pca_invariant_oracle`).

Query implementations live in dd_graphdb_spark/suites/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dd_graphdb_spark.suites.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dd_graphdb_spark.suites import all_queries

    q, _ = all_queries()
    return q


def oracle_sql() -> dict[str, str]:
    from dd_graphdb_spark.suites import all_queries

    _, o = all_queries()
    return o
