from dd_graphdb_spark.operators.traversal import (
    out_neighbors,
    in_neighbors,
    all_neighbors,
    traverse_1hop,
    traverse_2hop,
    edges_between,
    common_neighbors,
)

__all__ = [
    "out_neighbors",
    "in_neighbors",
    "all_neighbors",
    "traverse_1hop",
    "traverse_2hop",
    "edges_between",
    "common_neighbors",
]
