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

from dd_graphdb_spark.suites import (
    relational,
    graph_queries,
    algorithms,
    llm_ops,
    streaming_batch,
    streaming_live,
    engine_api,
    incremental_views,
    sources_fn,
)


def _hygiene(spark) -> None:
    """Free session garbage left by *previous* queries.

    Iterative operators pin localCheckpoint blocks and shuffle state;
    once the caller drops its result DataFrames these are garbage, but
    the JVM only releases them after both Python and JVM GCs run —
    which can lag minutes, degrading later queries in the same session
    (measured 12s → 400s). Running the two GCs at query START is safe:
    anything the caller still references survives.
    """
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # Spark Connect: no JVM gateway; ContextCleaner self-manages


def _with_hygiene(fn):
    def wrapped(spark, sf_dir):
        _hygiene(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def all_queries():
    q = {}
    o = {}
    for mod in (
        relational,
        graph_queries,
        algorithms,
        llm_ops,
        streaming_batch,
        streaming_live,
        engine_api,
        incremental_views,
        sources_fn,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    q = {name: _with_hygiene(fn) for name, fn in q.items()}
    return q, o
