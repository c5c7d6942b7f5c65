"""Shared iteration utilities for driver-loop fixpoint algorithms.

Fixpoint loops eagerly ``localCheckpoint`` their evolving state each
round (lineage truncation — without it every job re-executes the whole
chained-join history). Checkpointed RDD blocks stay pinned in the block
manager until explicitly unpersisted; left alone, a few fixpoint runs
accumulate pinned block sets and *later* queries in the same session
degrade badly (measured 12s → 400s for an unrelated query in the same
session). GC-based cleanup is unreliable — the loop frame's py4j
references defeat it and JVM GC is asynchronous — so ``run_loop``
brackets the loop with explicit bookkeeping:

1. snapshot the persistent-RDD ids before the loop,
2. run the loop,
3. copy the result into one fresh localCheckpoint (its blocks are the
   only thing the caller needs),
4. unpersist every other RDD the loop pinned.

A localCheckpoint'ed RDD cannot be recomputed after unpersist (its
lineage is truncated), which is why the result must be re-checkpointed
*before* the loop's blocks are freed.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame

#: serializes the snapshot→loop→unpersist bracket: the diff-based
#: bookkeeping sees SESSION-global pinned-RDD state, so a second loop
#: (e.g. another thread of an embedding HTTP server) pinning checkpoints
#: between this loop's snapshots would have its blocks unpersisted —
#: and a localCheckpoint cannot be recomputed after unpersist
_PIN_LOCK = threading.RLock()


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly truncate lineage; later jobs read the stored blocks."""
    return df.localCheckpoint(eager=True)


def _persistent_ids(spark) -> set[int]:
    sc = spark.sparkContext._jsc.sc()
    out: set[int] = set()
    it = sc.getPersistentRDDs().iterator()
    while it.hasNext():
        out.add(it.next()._1())
    return out


def _unpersist(spark, ids: set[int]) -> None:
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().iterator()
    while it.hasNext():
        e = it.next()
        if e._1() in ids:
            e._2().unpersist(False)


def run_loop(impl: Callable[..., DataFrame], g, *args, **kwargs) -> DataFrame:
    """Run a fixpoint loop and free every block it pinned except the
    result's. ``g`` is the PropertyGraph (first arg of every impl)."""
    spark = g.vertices.sparkSession
    with _PIN_LOCK:
        try:
            before = _persistent_ids(spark)
        except Exception:  # non-classic gateway (Spark Connect) — just run
            return impl(g, *args, **kwargs)
        final_ids: set[int] = set()
        try:
            result = impl(g, *args, **kwargs)
            mid = _persistent_ids(spark)
            final = result.localCheckpoint(eager=True)
            final_ids = _persistent_ids(spark) - mid
            return final
        finally:
            # also on a raising loop (e.g. a non-convergence guard):
            # everything the aborted loop pinned is garbage — leaving it
            # pinned is the 12s→400s same-session degradation this
            # bracket exists to prevent
            _unpersist(spark, (_persistent_ids(spark) - before) - final_ids)
