from dd_graphdb_spark.views.catalog import (
    RefreshPolicy,
    ViewCatalog,
    ViewDefinition,
)
from dd_graphdb_spark.views.incremental import IncrementalAggState, IncrementalPageRank
from dd_graphdb_spark.views.router import QueryPattern, QueryRouter, RoutingDecision

__all__ = [
    "RefreshPolicy",
    "ViewCatalog",
    "ViewDefinition",
    "IncrementalAggState",
    "IncrementalPageRank",
    "QueryPattern",
    "QueryRouter",
    "RoutingDecision",
]
