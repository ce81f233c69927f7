"""knowledge_graph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of the reference
GraphRAG-style indexer (DucHungGithub/knowledge_graph) as streaming
``ray.data.Dataset`` pipelines: span-aware chunking, actor-pool triple
extraction, groupby-aggregate entity/edge canonicalization, distributed
connected components (iterative groupby-min label propagation),
hierarchical community detection + report generation, and materialized,
adjacency-sharded triple tables with per-partition lineage manifests.

Never calls ``ray.init()`` — sessions are owned by the caller
(bench.py / tests / the driver).
"""

__version__ = "0.1.0"
