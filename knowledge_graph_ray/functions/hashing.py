"""Vectorized, process-stable bucket hashing for shuffle helpers.

Every partitioned shuffle in the engine (hash_join, bucketed_group_map,
the dedup band buckets) needs a per-row bucket id computed from one or
more key columns.  A Python ``crc32(str(row))`` loop on the hot path
costs more than the shuffle itself at scale, so this uses polars'
vectorized ``hash_rows`` (stable across processes within one polars
version — all cluster tasks share the environment) with a pandas
``hash_pandas_object`` fallback.

NOT stable across library upgrades — bucket ids are transient shuffle
state, never persisted.
"""

from __future__ import annotations

import pyarrow as pa


def bucket_column(batch: pa.Table, keys: list[str], num_buckets: int,
                  name: str = "__bucket") -> pa.Array:
    """int32 bucket id per row from the key columns, vectorized."""
    sub = batch.select(keys)
    try:
        import os

        # every Ray worker process would otherwise start a full-width
        # polars thread pool (32 workers x 32 threads oversubscribes the
        # node and cost ~40% of 32-CPU throughput); hashing one batch is
        # single-thread work
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        h = pl.from_arrow(sub).hash_rows(seed=0)
        arr = (h % num_buckets).cast(pl.Int32).rename(name).to_arrow()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.cast(pa.int32())
    except Exception:
        import pandas as pd

        h = pd.util.hash_pandas_object(sub.to_pandas(), index=False)
        return pa.array((h % num_buckets).astype("int32"), type=pa.int32())
