"""Query → view routing with the reference's scoring rules.

Reference parity (graph/views/src/query_router.rs):
- QueryPattern variants: VertexLookup / Aggregation / Analytics /
  EdgeTraversal / Hybrid                       (:16-53)
- calculate_match_score: exact lookup 100, aggregation 95, analytics 90,
  traversal 75, SQL fallback 50                (:192-260)
- tie-break by observed latency stats          (:152-189)
- execute path: route → cache probe → compute on miss → stats update
                                               (:326-375)

This is semantic API surface, not execution — routing picks a
materialized view; the read itself is a parquet scan Spark optimizes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from dd_graphdb_spark.views.catalog import ViewCatalog

# scoring table (query_router.rs:192-260)
SCORE_EXACT_LOOKUP = 100
SCORE_AGGREGATION = 95
SCORE_ANALYTICS = 90
SCORE_TRAVERSAL = 75
SCORE_SQL_FALLBACK = 50

_PATTERN_SCORES = {
    ("vertex_lookup", "lookup"): SCORE_EXACT_LOOKUP,
    ("aggregation", "aggregation"): SCORE_AGGREGATION,
    ("analytics", "analytics"): SCORE_ANALYTICS,
    ("edge_traversal", "lookup"): SCORE_TRAVERSAL,
    ("edge_traversal", "analytics"): SCORE_TRAVERSAL,
}


@dataclass
class QueryPattern:
    kind: str  # vertex_lookup | aggregation | analytics | edge_traversal | hybrid
    target: str | None = None  # requested view name hint (exact match bonus)


@dataclass
class RoutingDecision:
    view: str
    score: int
    reason: str


@dataclass
class _ViewStats:
    hits: int = 0
    total_latency_s: float = 0.0

    @property
    def avg_latency_s(self) -> float:
        return self.total_latency_s / self.hits if self.hits else 0.0


class QueryRouter:
    """``measure_latency=True`` forces each routed read (a ``count()``)
    so recorded latency measures real execution — the reference's stats
    track query latency (query_router.rs:326-375). Default OFF: the
    forcing count doubles IO per route and makes ``execute`` blocking
    for large views, so production routing records hits only (the
    latency tie-break then degrades to the deterministic name order)
    and the consumer's own action is the one that pays for the scan."""

    def __init__(self, catalog: ViewCatalog, measure_latency: bool = False):
        self.catalog = catalog
        self.measure_latency = measure_latency
        self.stats: dict[str, _ViewStats] = {}

    def score(self, pattern: QueryPattern, view_name: str) -> int:
        d = self.catalog.defs[view_name]
        if pattern.target == view_name:
            return SCORE_EXACT_LOOKUP
        base = _PATTERN_SCORES.get((pattern.kind, d.view_type))
        if base is not None:
            return base
        if d.view_type in ("sql", "hybrid"):
            return SCORE_SQL_FALLBACK
        return 0

    def route(self, pattern: QueryPattern) -> RoutingDecision | None:
        """Best-scoring view; ties broken by lower observed latency then
        name (route_query, query_router.rs:152-189)."""
        best: RoutingDecision | None = None
        best_key: tuple | None = None
        for name in self.catalog.list_views():
            s = self.score(pattern, name)
            if s <= 0:
                continue
            key = (-s, self.stats.get(name, _ViewStats()).avg_latency_s, name)
            if best_key is None or key < best_key:
                best_key = key
                best = RoutingDecision(view=name, score=s, reason=f"{pattern.kind}→{name}")
        return best

    def execute(self, pattern: QueryPattern) -> DataFrame:
        """Route and read, recording latency stats
        (execute_query_with_cache, query_router.rs:326-375). The read
        consults the view's refresh policy first — a dirty or
        TTL-expired view (RefreshPolicy::OnDemand{ttl},
        view_types.rs:159-190) recomputes before serving, so a routed
        read never returns data older than the policy allows."""
        decision = self.route(pattern)
        if decision is None:
            raise LookupError(f"no view matches pattern {pattern.kind}")
        t0 = time.time()
        self.catalog.refresh(decision.view)  # policy-gated, usually a no-op
        df = self.catalog.read(decision.view)
        st = self.stats.setdefault(decision.view, _ViewStats())
        st.hits += 1
        if self.measure_latency:
            # forcing count: recorded latency measures EXECUTION, not
            # the microsecond lazy-scan construction; the consumer's
            # re-read hits the freshly-cached parquet
            df.count()
            st.total_latency_s += time.time() - t0
        return df

    def report(self) -> dict[str, dict]:
        return {
            n: {"hits": s.hits, "avg_latency_s": round(s.avg_latency_s, 6)}
            for n, s in self.stats.items()
        }
