"""Banded range join — point-in-interval joins without a nested loop.

The north-star brief's named custom-operator family (as-of join, range
join, hypertable rollup); as-of and rollup live in
operators/timeseries.py, this is the range member: join left rows whose
scalar falls inside right-side [lo, hi) intervals (optionally sharing
equi-keys).

A plain ``l.v >= r.lo AND l.v < r.hi`` join has no equi-condition, so
Spark plans BroadcastNestedLoopJoin — O(|L|·|R|) compares, the
100 TB killer. The banded form recovers a hash join:

- pick a band width w; band(x) = floor(x / w)
- each interval is exploded to the bands it covers
  (⌈(hi−lo)/w⌉ + 1 rows — bounded when interval lengths are bounded)
- each point maps to exactly ONE band; join on band (+ equi-keys),
  then verify the exact predicate as a post-join filter.

One shuffle on the band key, candidate pairs bounded by band
population × overlapping intervals — the same bound-the-candidates
shape as the LSH/salting paths. Pick ``band_width`` near the median
interval length: too small explodes interval rows, too large inflates
candidates per band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    band_width: float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` × matching intervals of ``right`` where
    ``right_lo <= left_val < right_hi`` (and equi-keys ``on`` match).
    ``how``: inner | left (left keeps unmatched rows with null right
    columns). Output: left columns + right columns."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r}")
    on = list(on or [])
    overlap = set(left.columns) & set(right.columns) - set(on)
    if overlap:
        raise ValueError(f"ambiguous columns (rename first): {sorted(overlap)}")
    reserved = {"_band"}  # the only internal working column
    bad = sorted(reserved & (set(left.columns) | set(right.columns)))
    if bad:
        raise ValueError(f"columns collide with range_join internals: {bad}")

    w = float(band_width)
    lo_band = F.floor(F.col(right_lo) / w).cast("long")
    hi_band = F.floor(F.col(right_hi) / w).cast("long")
    # empty intervals ([lo, hi) with hi <= lo) can't match and would
    # make sequence() run backwards — drop them before exploding
    r = right.filter(F.col(right_hi) > F.col(right_lo)).withColumn(
        "_band", F.explode(F.sequence(lo_band, hi_band))
    )
    l = left.withColumn("_band", F.floor(F.col(left_val) / w).cast("long"))
    cond = [l["_band"] == r["_band"], *[l[k] == r[k] for k in on]]
    matched_filter = (F.col(left_val) >= F.col(right_lo)) & (
        F.col(left_val) < F.col(right_hi)
    )
    if how == "inner":
        out = l.join(r, cond).filter(matched_filter)
        return out.drop(l["_band"]).drop(r["_band"]).drop(*[r[k] for k in on])
    # left outer: verify inside the join condition so unmatched left
    # rows survive with nulls (filtering after an outer join would
    # drop them)
    out = l.join(r, [*cond, matched_filter], "left")
    return out.drop(l["_band"]).drop(r["_band"]).drop(*[r[k] for k in on])
