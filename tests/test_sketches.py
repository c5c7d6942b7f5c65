"""Sketch operators: CMS upper-bound property, HLL/quantile error bounds."""

from pyspark.sql import functions as F

from dd_graphdb_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hll_distinct,
    quantile_sketch,
)


def test_cms_estimates_upper_bound_true_counts(spark):
    # skewed frequencies: key k appears k*10 times
    rows = [(k,) for k in range(1, 21) for _ in range(k * 10)]
    df = spark.createDataFrame(rows, "user_id long")
    true = {r["user_id"]: r["cnt"] for r in
            df.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    sk = cms_build(df, "user_id", width=16)  # narrow -> collisions certain
    keys = spark.createDataFrame([(k,) for k in range(1, 21)], "user_id long")
    est = {r["user_id"]: r["est"] for r in
           cms_estimate(sk, keys, "user_id", width=16).collect()}
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # CMS never underestimates
    # a wide sketch removes collisions entirely at this cardinality
    sk_wide = cms_build(df, "user_id", width=4096)
    est_w = {r["user_id"]: r["est"] for r in
             cms_estimate(sk_wide, keys, "user_id", width=4096).collect()}
    assert est_w == true


def test_cms_absent_key_estimates_zero_or_collision(spark):
    df = spark.createDataFrame([(1,), (2,)], "user_id long")
    sk = cms_build(df, "user_id", width=4096)
    keys = spark.createDataFrame([(999,)], "user_id long")
    est = cms_estimate(sk, keys, "user_id", width=4096).collect()[0]["est"]
    assert est == 0


def test_hll_within_rsd(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("v"))
    got = hll_distinct(df, "v", rsd=0.05).collect()[0]["approx_distinct"]
    assert abs(got - 10_000) / 10_000 < 0.15  # 3 sigma of rsd=5%


def test_quantile_sketch_rank_bounds(spark):
    df = spark.range(1, 10_001).select(F.col("id").cast("double").alias("v"))
    qs = quantile_sketch(df, "v", [0.1, 0.5, 0.9], accuracy=10000).collect()[0]["quantiles"]
    for got, want in zip(qs, [1000, 5000, 9000]):
        assert abs(got - want) <= 10  # rank error <= n/accuracy = 1
