from dd_graphdb_spark.storage.store import (
    ConflictError,
    GraphOp,
    GraphStore,
    Transaction,
    add_edge,
    add_vertex,
    remove_edge,
    remove_vertex,
    update_edge_props,
    update_vertex_props,
)

__all__ = [
    "ConflictError",
    "GraphOp",
    "GraphStore",
    "Transaction",
    "add_vertex",
    "remove_vertex",
    "add_edge",
    "remove_edge",
    "update_vertex_props",
    "update_edge_props",
]
