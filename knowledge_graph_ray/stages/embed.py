"""Entity-description embedding stage (SURVEY.md A8 / S6).

Reference: OpenAIEmbeddings over entity descriptions for the LanceDB /
Weaviate / FAISS vector sinks (mostly commented out there —
verbs/community_summarization/prepare_report/community_entities.py:3-24,
search_test.py:17-19, vectorstore/__init__.py:6-29).

Here: an actor-pool ``map_batches`` stage with a pluggable embedder.
``HashingEmbedder`` is the deterministic default (feature-hashing
bag-of-tokens, L2-normalized — no model download, stable across runs);
an API/model embedder subclasses and overrides ``embed_batch``.  Output
adds a ``fixed_size_list<float32>`` column compatible with the
similarity stages (stages/similarity.py) and a vector-table sink.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


class HashingEmbedder:
    """Feature-hashing embedder: token -> crc32 bucket, signed, L2-norm."""

    def __init__(self, dim: int = 64, column: str = "description",
                 out_column: str = "embedding"):
        self.dim = dim
        self.column = column
        self.out_column = out_column

    def embed_one(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float32)
        for tok in _TOKEN_RE.findall((text or "").lower()):
            h = zlib.crc32(tok.encode())
            sign = 1.0 if (h >> 31) & 1 else -1.0
            vec[h % self.dim] += sign
        norm = float(np.linalg.norm(vec))
        return vec / norm if norm else vec

    def embed_batch(self, texts: list[str]) -> list[np.ndarray]:
        return [self.embed_one(t) for t in texts]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self.embed_batch(batch.column(self.column).to_pylist())
        flat = pa.array(np.concatenate(vecs) if vecs else [], type=pa.float32())
        col = (
            pa.FixedSizeListArray.from_arrays(flat, self.dim)
            if vecs
            else pa.array([], type=pa.list_(pa.float32(), self.dim))
        )
        return batch.append_column(self.out_column, col)


def embed_descriptions(ds, embedder_cls=HashingEmbedder, batch_size: int = 1024,
                       concurrency=(1, 4), **kwargs):
    """Dataset[entity] -> same + embedding column (actor pool)."""
    return ds.map_batches(
        embedder_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def write_vector_table(ds, path: str, fingerprint: str = "none"):
    """Vector-store sink: Parquet with the embedding column + manifest
    (stands in for the reference's LanceDB table, S6)."""
    from knowledge_graph_ray.state.checkpoint import write_checkpoint

    return write_checkpoint(ds, path, fingerprint=fingerprint, stage="vector_table")
