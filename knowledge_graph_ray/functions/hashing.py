"""Vectorized, process-stable row hashing for shuffle helpers.

Every partitioned shuffle in the engine (hash_join, bucketed_group_map,
the dedup band buckets) needs a per-row bucket id computed from one or
more key columns.  A Python ``crc32(str(row))`` loop on the hot path
costs more than the shuffle itself at scale, so this uses polars'
vectorized ``hash_rows`` (stable across processes within one polars
version — all cluster tasks share the environment) with a pandas
``hash_pandas_object`` fallback.

The polars-vs-pandas choice is made ONCE per process (probed on first
use and cached): the two hash functions produce DIFFERENT values, so a
per-batch fallback could silently route equal keys to different buckets
if polars failed on only some batches / workers / one side of a join —
matches would be dropped with no error.  Inside the chosen
implementation, real hashing errors propagate.

NOT stable across library upgrades — bucket ids are transient shuffle
state, never persisted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_IMPL: tuple | None = None  # ("polars", module) | ("pandas", module)


def _hasher() -> tuple:
    """Probe polars once per process; cache the decision."""
    global _IMPL
    if _IMPL is None:
        try:
            import os

            # every Ray worker process would otherwise start a full-width
            # polars thread pool (32 workers x 32 threads oversubscribes
            # the node and cost ~40% of 32-CPU throughput); hashing one
            # batch is single-thread work
            os.environ.setdefault("POLARS_MAX_THREADS", "1")
            import polars as pl

            # probe an actual hash so a broken install fails the probe,
            # not a mid-shuffle batch
            pl.DataFrame({"x": ["probe"]}).hash_rows(seed=0)
            _IMPL = ("polars", pl)
        except Exception:
            import pandas as pd

            _IMPL = ("pandas", pd)
    return _IMPL


def hash_rows_u64(batch: pa.Table, keys: list[str], seed: int = 0) -> np.ndarray:
    """uint64 per-row hash of the key columns, vectorized + process-stable.

    ``seed`` selects an independent hash family — combine two seeds for a
    128-bit content fingerprint where u64 birthday collisions matter
    (~10^11 rows)."""
    sub = batch.select(keys)
    kind, mod = _hasher()
    if kind == "polars":
        return mod.from_arrow(sub).hash_rows(seed=seed).to_numpy()
    key = None if seed == 0 else f"{seed:016d}"[:16]
    return mod.util.hash_pandas_object(
        sub.to_pandas(), index=False, hash_key=key
    ).to_numpy()


def bucket_column(batch: pa.Table, keys: list[str], num_buckets: int,
                  name: str = "__bucket") -> pa.Array:
    """int32 bucket id per row from the key columns, vectorized."""
    h = hash_rows_u64(batch, keys)
    return pa.array((h % num_buckets).astype("int32"), type=pa.int32())
