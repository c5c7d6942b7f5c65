"""Banded range join: semantics on fixtures + the no-nested-loop plan
guard (oracle parity at data scale is the gate query)."""

import pytest
from pyspark.sql import functions as F

from dd_graphdb_spark.operators.rangejoin import range_join


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 999.0)], "pid long, v double"
    )


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [
            (10, 0.0, 10.0),     # catches v=5
            (11, 4.0, 26.0),     # overlaps: catches 5, 15, 25
            (12, 20.0, 20.0),    # empty interval — never matches
            (13, 30.0, 10.0),    # inverted — never matches
        ],
        "iid long, lo double, hi double",
    )


def test_inner_matches_inequality_semantics(spark, points, intervals):
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "v", "lo", "hi", 8.0).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 11), (3, 11)}


def test_left_keeps_unmatched(spark, points, intervals):
    out = range_join(points, intervals, "v", "lo", "hi", 8.0, how="left")
    rows = [(r["pid"], r["iid"]) for r in out.collect()]
    assert (4, None) in rows  # v=999 matches nothing but survives
    assert len([p for p, i in rows if p == 1]) == 2  # both overlapping hits


def test_band_width_invariance(spark, points, intervals):
    for w in (1.0, 5.0, 50.0, 1000.0):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "v", "lo", "hi", w).collect()
        }
        assert got == {(1, 10), (1, 11), (2, 11), (3, 11)}, w


def test_equi_key_restricts(spark):
    l = spark.createDataFrame([(1, "a", 5.0), (2, "b", 5.0)], "pid long, k string, v double")
    r = spark.createDataFrame([(9, "a", 0.0, 10.0)], "iid long, k string, lo double, hi double")
    got = {(x["pid"], x["iid"]) for x in range_join(l, r, "v", "lo", "hi", 4.0, on=["k"]).collect()}
    assert got == {(1, 9)}


def test_rejects_ambiguous_and_reserved(spark, points, intervals):
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(points, intervals.withColumnRenamed("iid", "pid"), "v", "lo", "hi", 8.0)
    with pytest.raises(ValueError, match="internals"):
        range_join(points.withColumn("_band", F.lit(1)), intervals, "v", "lo", "hi", 8.0)
    with pytest.raises(ValueError, match="how"):
        range_join(points, intervals, "v", "lo", "hi", 8.0, how="full")


def test_plans_hash_join_not_nested_loop(spark, points, intervals):
    p = (
        range_join(points, intervals, "v", "lo", "hi", 8.0)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # band key is an equi-condition: any equi-join strategy qualifies
    assert "HashJoin" in p or "SortMergeJoin" in p
