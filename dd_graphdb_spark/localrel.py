"""Small driver-side relations as LocalTableScan, not Python RDDs.

``SparkSession.createDataFrame(list, schema)`` parallelizes the list
into ``defaultParallelism`` slices backed by a PYTHON RDD: every
downstream evaluation of the frame launches one Python-worker
round-trip per slice (measured at local[32]: ~0.5 s per evaluation for
a THREE-row frame; a mutation statement that references its op frame a
handful of times pays that each time — guide §4's JVM↔Python boundary,
in a place that never needed Python at all). Routing the same rows
through a pandas DataFrame + Arrow produces a ``LocalTableScan``: a
JVM-local relation with zero Python workers at evaluation time, which
Catalyst can also constant-fold and broadcast directly (~0.1 s for the
same loop, and no per-evaluation cost inside bigger plans).

``local_df`` is for DRIVER-SIZED row sets (op batches, id lists, probe
keys, query-vector tables — anything already materialized as a Python
list). It is not a data-loading path.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(spark: SparkSession, rows: Iterable, schema: str | StructType) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that plans as a
    LocalTableScan (Arrow-converted pandas) instead of a sliced Python
    RDD. Rows are tuples/lists positionally matching ``schema``; the
    explicit schema (never pandas dtype inference — object cells keep
    exact ints/None/dicts/nested lists) fixes the Spark-side types."""
    import pandas as pd

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not isinstance(schema, StructType):
        # bare-type form ("long"): one column named value, rows are
        # scalars — exactly createDataFrame's behavior for it
        from pyspark.sql.types import StructField

        schema = StructType([StructField("value", schema, True)])
    data = [r if isinstance(r, (tuple, list)) else (r,) for r in rows]
    data = [tuple(r) for r in data]
    names = schema.fieldNames()
    if not data:
        # Arrow cannot convert an EMPTY object series to map/nested
        # types, so the pandas route would silently fall back to a
        # Python-RDD scan (defaultParallelism empty slices, one Python
        # worker round-trip per slice per evaluation). Build the empty
        # relation JVM-side instead: Range(0) + typed null casts folds
        # to an empty LocalRelation — zero Python at evaluation time.
        from pyspark.sql import functions as F

        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    pdf = pd.DataFrame(data, columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema=schema)
