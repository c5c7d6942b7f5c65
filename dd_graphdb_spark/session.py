"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the configuration is chosen so the same
logical plans scale to a multi-executor cluster: AQE on (runtime shuffle
coalescing + skew-join handling), explicit shuffle partitioning, Arrow
for any Python exchange, UTC session timezone for deterministic
event-time windows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dd-graphdb-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE can COALESCE shuffle partitions but never SPLIT them, so
        # the initial count must be the LARGE-scale one: with the
        # default (= shuffle.partitions = 32) the sf10 colocation LPA's
        # edge-sized label-frequency aggregate packed ~13 M groups per
        # reduce partition and spilled (~2.3x over edge-linear wall,
        # README "sf10 subset re-run"). 256 initial partitions keep
        # per-task agg hash tables in memory at sf10 while AQE's
        # advisory-size coalescing collapses small-scale shuffles back
        # down — same final plans at sf0.01/sf0.1. Joins against
        # bucketed/copartitioned 32-partition layouts are unaffected:
        # EnsureRequirements shuffles the probe side to MATCH the
        # laid-out side's partitioning, not the initial count.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "256"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # local mode: executor == driver, so a heartbeat "loss" can only
        # be a long driver GC pause (observed: a 127 s full-GC during a
        # 409 M-row bucketed write got the executor removed and killed
        # the context). A generous timeout is strictly safe same-process.
        .config("spark.network.timeout", "600s")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
