"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline — cross join restricted to the
  query set, JVM-side dot products via zip_with/aggregate (no Python).
- LSH-bucketed ANN: random-hyperplane signatures partition the corpus;
  top-k runs within buckets only. Hyperplanes are data-derived
  (deterministic) so results are oracle-checkable.

Scale notes (100 TB): brute force is O(|Q|·|C|·d) — fine for small query
sets because the corpus side stays partitioned and the query side is
broadcast. The LSH path is the scale answer: bucket key is computed in a
single projection, the per-bucket join is a shuffle hash join on the
bucket key, and k·d floats per row stream through whole-stage codegen.
An IVF variant (k-means centroids as bucket keys) drops in by replacing
the signature expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same evaluation order as the
    DuckDB oracle's list_reduce, so doubles match bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (neighbors exclude
    the query itself). Output: (q_id, neighbor_id, sim, rank)."""
    from pyspark.sql.window import Window

    base = emb.select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nvec"))
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        F.broadcast(q)
        .join(base, F.col("q_id") != F.col("nid"))
        .select(
            "q_id",
            F.col("nid").alias("neighbor_id"),
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: bit_i = (vec · plane_i) > 0. Planes are constant
    arrays folded into the plan (broadcast-free)."""
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) > 0.0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    n_planes: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k restricted to the query's hyperplane bucket. Planes are
    the first ``n_planes`` corpus vectors (deterministic, data-derived).
    Output: (q_id, neighbor_id, sim, rank) — recall < 1 vs brute force by
    construction; that's the documented ANN tradeoff."""
    from pyspark.sql.window import Window

    planes = [
        [float(x) for x in r[0]]
        for r in emb.orderBy(id_col).limit(n_planes).select(vec_col).collect()
    ]
    base = emb.select(
        F.col(id_col).alias("nid"),
        as_double(F.col(vec_col)).alias("nvec"),
    ).withColumn("bucket", hyperplane_signature(F.col("nvec"), planes))
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_id"), as_double(F.col(vec_col)).alias("qvec"))
        .withColumn("bucket", hyperplane_signature(F.col("qvec"), planes))
    )
    scored = (
        F.broadcast(q)
        .join(base, "bucket")
        .filter(F.col("q_id") != F.col("nid"))
        .select(
            "q_id",
            F.col("nid").alias("neighbor_id"),
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
