"""dd_graphdb_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
DD-graphDB reference (a single-process Rust property-graph database with
materialized views, incremental maintenance, stream processing and graph
algorithms), re-expressed Spark-first:

- Data model: property graph as (vertices DF, edges DF)  [SURVEY.md §1.3]
- Query surface: GQL (MATCH/WHERE/RETURN/CREATE/DELETE) lowered to
  DataFrame plans + full Spark SQL over registered views
- Graph algorithms: PageRank, CC, SSSP, BFS, reachability, k-core,
  triangles, SCC, degree centrality as DataFrame fixpoint loops
- Views: catalog + refresh policies + pattern-scored query routing
- Streaming: Structured-Streaming windows, watermarks, dedup,
  incremental view maintenance via foreachBatch
- LLM-data-pipeline extensions: dedup (exact/minhash/jaccard/simhash),
  similarity search, text analysis, multimodal column plumbing
"""

from dd_graphdb_spark.session import get_spark
from dd_graphdb_spark.graph import PropertyGraph, load_tables, tpch_graph

__all__ = ["get_spark", "PropertyGraph", "load_tables", "tpch_graph"]
__version__ = "0.1.0"
