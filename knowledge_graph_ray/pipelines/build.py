"""End-to-end KG construction pipeline (the reference's
workflow/build_workflow.py:20-83 re-expressed as streaming Ray Data stages).

Stage graph::

    docs (interleaved spans)
      └─ chunk_documents            (stateless map_batches)        M1
         └─ extract_mentions        (actor pool)                   A1/A2
            ├─ canonicalize_entities      (partial + groupby)      G1
            └─ canonicalize_relationships (partial + groupby)      G2
               └─ degrees / rank          (G4/J1)
                  └─ components → communities → reports  (§7.3 steps 7-8)

Nothing here calls ray.init(); callers own the session.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from knowledge_graph_ray.config import PipelineConfig
from knowledge_graph_ray.stages.chunk import chunk_documents
from knowledge_graph_ray.stages.extract import PatternExtractor, extract_mentions
from knowledge_graph_ray.stages.canonicalize import (
    canonicalize_entities,
    canonicalize_relationships,
)


@dataclass
class GraphTables:
    """Canonical outputs of the construction core (lazy Datasets)."""

    text_units: Any
    mentions: Any
    entities: Any
    relationships: Any


def build_graph(
    docs,
    config: PipelineConfig | None = None,
    extractor_cls=PatternExtractor,
    materialize_mentions: bool = True,
    **extractor_kwargs,
) -> GraphTables:
    """docs Dataset (interleaved schema) -> canonical entity/relationship tables.

    ``materialize_mentions`` pins the mention dataset in the object store so
    the two downstream canonicalization shuffles don't re-run extraction
    (the expensive stage).  Mentions are a small fraction of input bytes;
    at extreme scale pass False and checkpoint mentions to Parquet instead
    (pipelines.checkpoint) — same effect, spillable to disk.
    """
    cfg = config or PipelineConfig()
    text_units = chunk_documents(
        docs, cfg.chunk_size, cfg.chunk_overlap, batch_size=cfg.chunk_batch_size
    )
    mentions = extract_mentions(
        text_units,
        extractor_cls=extractor_cls,
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        **extractor_kwargs,
    )
    if materialize_mentions:
        mentions = mentions.materialize()
    entities = canonicalize_entities(mentions)
    relationships = canonicalize_relationships(mentions)
    return GraphTables(
        text_units=text_units,
        mentions=mentions,
        entities=entities,
        relationships=relationships,
    )
