"""Relational operator suite: scans, filters, projections, aggregations,
joins, sorts/top-k, set ops, SQL window functions, grouping sets.

The reference's relational surface is thin (SURVEY.md §2.2, §2.4-2.6):
point lookups + predicate scans (graph/storage/src/lib.rs:504-568), WHERE
trees with =,!=,<,>,<=,>= and AND/OR (graph/query/src/executor.rs:382-448),
count/sum/avg/min/max aggregation (graph/views/src/incremental_engine.rs:931-946),
top-n as sort+take (graph/algorithms/src/basic.rs:25-31) — and it explicitly
rejects DISTINCT/LIMIT (graph/views/src/sql_parser.rs:96-129). Everything here
is the Spark-native superset, verified against DuckDB.

Scale notes (100 TB posture): every query is a declarative DataFrame plan —
filters and projections push to the parquet scan, small dimension joins are
broadcast by Catalyst/AQE, aggregates are partial (map-side combine) before
the shuffle. No collect() in any operator path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return reg


def read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec(c, scale: int = 2):
    """Cast to decimal for engine-order-independent exact sums."""
    return F.col(c).cast(f"decimal(18,{scale})") if isinstance(c, str) else c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregation: the flagship pricing-summary query (count/sum/avg/min/max
# dispatch parity with incremental_engine.rs:931-946, plus group-by which the
# reference declares but ignores — incremental_engine.rs:801-805).
# ---------------------------------------------------------------------------
@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            # per-row cast at scale 6: the exact product has 4 decimal places
            # (price 2dp × (1-discount) 2dp), so scale-6 rounding is
            # tie-free and engine-independent, unlike scale-2
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")).cast("double"), 2
            ).alias("sum_disc_price"),
            F.round(F.sum(dec("l_quantity")).cast("double") / F.count("*"), 6).alias("avg_qty"),
            F.round(F.sum(dec("l_discount", 4)).cast("double") / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Point lookup (graph/storage/src/lib.rs:504-507): equality filter; at scale
# this is a pushed-down predicate on a (sorted/partitioned) key column.
# ---------------------------------------------------------------------------
@_q(
    "point_lookup_customer",
    "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey = 42",
)
def point_lookup_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


# ---------------------------------------------------------------------------
# Predicate scan with closure → declarative filter
# (graph/storage/src/lib.rs:543-554 find_vertices_by_property).
# ---------------------------------------------------------------------------
@_q(
    "predicate_scan_customers",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 1000.0 AND c_mktsegment = 'BUILDING'
    """,
)
def predicate_scan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer")
    return c.filter((F.col("c_acctbal") > 1000.0) & (F.col("c_mktsegment") == "BUILDING")).select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# WHERE tree with AND/OR + comparison set (graph/query/src/executor.rs:382-448).
# ---------------------------------------------------------------------------
@_q(
    "where_and_or",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 50000.0)
       OR (o_orderpriority != '1-URGENT' AND o_totalprice <= 1000.0)
    """,
)
def where_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000.0))
        | ((F.col("o_orderpriority") != "1-URGENT") & (F.col("o_totalprice") <= 1000.0))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# ---------------------------------------------------------------------------
# Top-N = sort + take with total order (PageRankResult::top_n,
# graph/algorithms/src/basic.rs:25-31; LIMIT rejected by reference SQL views,
# sql_parser.rs:96-100 — supported natively here).
# ---------------------------------------------------------------------------
@_q(
    "top_n_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def top_n_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# DISTINCT (rejected by reference sql_parser.rs:125-129 — native here).
# ---------------------------------------------------------------------------
@_q("distinct_segments", "SELECT DISTINCT c_mktsegment FROM customer")
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Group-by with the full aggregate dispatch set + HAVING.
# ---------------------------------------------------------------------------
@_q(
    "group_by_agg_having",
    """
    SELECT o_orderpriority,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
    FROM orders
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 5
    """,
)
def group_by_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("order_count"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_revenue"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
            F.round(F.sum(dec("o_totalprice")).cast("double") / F.count("*"), 6).alias("avg_price"),
        )
        .filter(F.col("order_count") > 5)
    )


# ---------------------------------------------------------------------------
# Multi-way join + aggregation (revenue per region). The reference has no
# relational join at all (SURVEY.md §2.3); Catalyst broadcasts the small
# dims (region/nation) automatically — the exact plan a 100 TB run needs.
# ---------------------------------------------------------------------------
@_q(
    "join_revenue_per_region",
    """
    SELECT r.r_name AS region_name,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_revenue_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    c = read(spark, sf_dir, "customer")
    n = read(spark, sf_dir, "nation")
    r = read(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("order_count"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (absent in reference; needed for EXISTS-style routing).
# ---------------------------------------------------------------------------
@_q(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@_q(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join against the finished ('F') order subset: the generated
    data gives EVERY customer at least one order, so the unrestricted
    anti-join was a vacuous 0 == 0 comparison — restricting the right
    side keeps the left-anti plan identical and matches 71 real rows at
    sf0.01."""
    c = read(spark, sf_dir, "customer")
    o = read(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Set operations (union+distinct is the reference's vertex-universe op,
# graph/algorithms/src/lib.rs:21-25; intersect/except are absent there).
# ---------------------------------------------------------------------------
@_q(
    "set_union_distinct_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@_q(
    "set_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@_q(
    "set_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_suppkey <= 10
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the right side is restricted to the first 10 suppliers: every
    # nation has both customers and suppliers in this testdata, so an
    # unrestricted EXCEPT is empty by construction and would verify
    # nothing (0 == 0 rows at every SF); restricted, the difference is
    # non-empty at sf0.001/0.01/0.1 (15/14/17 nations)
    c = read(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        read(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 10)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


# ---------------------------------------------------------------------------
# SQL window functions (absent in reference, SURVEY.md §2.5): per-group
# top-k via row_number with total order.
# ---------------------------------------------------------------------------
@_q(
    "window_topk_per_segment",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        FROM customer
    ) WHERE rk <= 3
    """,
)
def window_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rk")
    )


@_q(
    "window_lag_delta",
    """
    SELECT user_id, event_id, value,
           ROUND(value - COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0), 6) AS delta
    FROM events
    WHERE user_id < 20
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    from dd_graphdb_spark.graph import read_events

    e = read_events(spark, sf_dir).filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 6).alias("delta"),
    )


# ---------------------------------------------------------------------------
# Rollup / grouping sets (absent in reference, SURVEY.md §2.4).
# ---------------------------------------------------------------------------
@_q(
    "rollup_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# CUBE — all four grouping sets of (status, priority) in one scan, with
# grouping_id distinguishing the subtotal level (completes the §2.4
# "grouping sets / cube / rollup" row beyond ROLLUP; absent in ref).
# ---------------------------------------------------------------------------
@_q(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (CASE WHEN — reference has when/otherwise only as
# dead stream-transform code, stream_transform.rs:196-315).
# ---------------------------------------------------------------------------
@_q(
    "conditional_agg",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent,
           CAST(SUM(CASE WHEN o_totalprice > 100000.0
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS big_revenue
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
        F.sum(
            F.when(F.col("o_totalprice") > 100000.0, dec("o_totalprice")).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("big_revenue"),
    )


# ---------------------------------------------------------------------------
# DB stats (get_stats, graph/storage/src/lib.rs:571-579).
# ---------------------------------------------------------------------------
@_q(
    "db_stats",
    """
    SELECT (SELECT COUNT(*) FROM region) + (SELECT COUNT(*) FROM nation)
         + (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM supplier)
         + (SELECT COUNT(*) FROM orders) AS vertex_count,
           (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM customer)
         + (SELECT COUNT(*) FROM supplier) + (SELECT COUNT(*) FROM orders) AS edge_count
    """,
)
def db_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_graphdb_spark.graph import materialized_tpch_graph

    g = materialized_tpch_graph(spark, sf_dir)
    return g.vertices.agg(F.count("*").alias("vertex_count")).crossJoin(
        g.edges.agg(F.count("*").alias("edge_count"))
    )




# --------------------------------------------------------------------------
# ntile / lead window functions (§2.5 — absent from the reference, free
# on Spark): acctbal quartiles within segment plus each customer's
# next-lower balance, on one window sort.
# --------------------------------------------------------------------------
@_q(
    "window_ntile_lead",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           NTILE(4) OVER w AS quartile,
           COALESCE(LEAD(c_acctbal) OVER w, -999999.0) AS next_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def window_ntile_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        # sentinel instead of NULL: pandas turns a nullable double
        # column into NaN, which would sham-mismatch the hash compare
        F.coalesce(F.lead("c_acctbal").over(w), F.lit(-999999.0)).alias("next_bal"),
    )


# Match read_events()'s nanosecond→microsecond truncation on the DuckDB
# side — at module END so every registered oracle is covered.
from dd_graphdb_spark.graph import rewrite_events_oracles as _rw  # noqa: E402

_rw(ORACLES)
