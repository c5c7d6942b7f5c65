from dd_graphdb_spark.algorithms.pagerank import pagerank, personalized_pagerank
from dd_graphdb_spark.algorithms.components import connected_components, component_count, strongly_connected_components
from dd_graphdb_spark.algorithms.paths import sssp, bfs_shortest_path, reachability
from dd_graphdb_spark.algorithms.structure import k_core, triangle_count, degree_centrality
from dd_graphdb_spark.algorithms.community import label_propagation
from dd_graphdb_spark.algorithms.centrality import (
    betweenness_centrality,
    closeness_centrality,
    eigenvector_centrality,
)

__all__ = [
    "personalized_pagerank",
    "label_propagation",
    "eigenvector_centrality",
    "betweenness_centrality",
    "closeness_centrality",
    "pagerank",
    "connected_components",
    "component_count",
    "strongly_connected_components",
    "sssp",
    "bfs_shortest_path",
    "reachability",
    "k_core",
    "triangle_count",
    "degree_centrality",
]
