"""Query suites: each module exposes

    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]   # DuckDB-runnable ANSI SQL per query (optional per key)

The driver (``__spark_entry__.py``) merges all suites. Oracle-less keys get a
rows-only check (reserved for genuinely non-SQL-expressible operators).

Determinism contract for oracle parity (driver hashes values):
- float aggregates go through DECIMAL(18,2) element casts so sums are exact
  and engine-order-independent; averages are computed as
  round(sum_double / count, 6);
- every top-k / limit has a total order (explicit tie-break columns);
- all computed columns are aliased identically in Spark and SQL.
"""

from dd_graphdb_spark.suites import relational, graph_queries, algorithms, llm_ops, streaming_batch


def all_queries():
    q = {}
    o = {}
    for mod in (relational, graph_queries, algorithms, llm_ops, streaming_batch):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
