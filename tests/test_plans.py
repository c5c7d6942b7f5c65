"""Physical-plan regression guards for the headline queries.

The scale contract (SURVEY.md §7.3, README "Scale posture") is encoded
as assertions over `explain("formatted")` output: filters reach the
parquet scans, projections prune columns, dimension joins broadcast,
and nothing silently degrades to a cartesian product. A refactor that
breaks one of these still returns correct rows at test scale — these
tests are what catches it before a 100 TB run would.
"""

import pytest

SF = "/root/testdata/sf0.001"


def plan(spark, name):
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


BATCH_QUERIES = [
    "q1_pricing_summary",
    "point_lookup_customer",
    "predicate_scan_customers",
    "join_revenue_per_region",
    "window_topk_per_segment",
    "gql_match_filter",
    "gql_multi_hop",
    "traverse_2hop",
    "dedup_exact",
    "text_quality",
]


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in plan(spark, name), name


def test_q1_pushdown_and_pruning(spark):
    p = plan(spark, "q1_pricing_summary")
    # the shipdate filter must reach the parquet scan ...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # ... and the scan must NOT read all 16 lineitem columns
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert read.count(":") <= 8, read  # 7 fields needed by q1
    # map-side combine: partial then final aggregate
    assert "partial_sum" in p


def test_point_lookup_pushes_key(spark):
    p = plan(spark, "point_lookup_customer")
    assert "EqualTo(c_custkey" in p  # key filter inside PushedFilters


def test_dim_joins_broadcast(spark):
    # region/nation are small dims: the join picks broadcast, not a
    # data-sized shuffle
    p = plan(spark, "join_revenue_per_region")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_brute_force_topk_broadcasts_query_side(spark):
    # the q_id != nid theta-join is intentionally a broadcast nested
    # loop over the 3-row query side — never a cartesian of the corpus
    p = plan(spark, "sim_cosine_topk")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
