from dd_graphdb_spark.views.catalog import (
    RefreshPolicy,
    ViewCatalog,
    ViewDefinition,
)
from dd_graphdb_spark.views.incremental import (
    IncrementalAggState,
    IncrementalConnectivity,
    IncrementalDegreeCentrality,
    IncrementalKCore,
    IncrementalLPA,
    IncrementalPageRank,
    IncrementalSSSP,
    IncrementalTriangles,
)
from dd_graphdb_spark.views.router import QueryPattern, QueryRouter, RoutingDecision

__all__ = [
    "RefreshPolicy",
    "ViewCatalog",
    "ViewDefinition",
    "IncrementalAggState",
    "IncrementalConnectivity",
    "IncrementalDegreeCentrality",
    "IncrementalKCore",
    "IncrementalLPA",
    "IncrementalPageRank",
    "IncrementalSSSP",
    "IncrementalTriangles",
    "QueryPattern",
    "QueryRouter",
    "RoutingDecision",
]
