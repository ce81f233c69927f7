"""Vectorized, process-stable row hashing for shuffle helpers.

Every partitioned shuffle in the engine (hash_join, bucketed_group_map,
the dedup band buckets) needs a per-row bucket id computed from one or
more key columns.  A Python ``crc32(str(row))`` loop on the hot path
costs more than the shuffle itself at scale, so this uses polars'
vectorized ``hash_rows`` (stable across processes within one polars
version — all cluster tasks share the environment) with a pandas
``hash_pandas_object`` fallback.

The polars-vs-pandas choice must be IDENTICAL in every process: the two
hash functions produce DIFFERENT values, so a fallback taken on only
some workers would silently route equal keys to different buckets and
drop join/group matches with no error.  The implementation is therefore
selected by the ``KG_RAY_HASH_IMPL`` env var (``polars`` default,
``pandas`` opt-out) — set BEFORE ``ray.init`` so every worker inherits
it — and a per-process polars failure RAISES instead of silently
falling back (a loud task error beats silently dropped matches).

NOT stable across library upgrades — bucket ids are transient shuffle
state, never persisted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_IMPL: tuple | None = None  # ("polars", module) | ("pandas", module)


def _hasher() -> tuple:
    """Resolve the configured hash family; cache per process.

    The choice comes from ``KG_RAY_HASH_IMPL`` (inherited by every Ray
    worker when set before ``ray.init``), NOT from a local probe — a
    probe that failed on a subset of workers (transient OOM, partial
    install) would silently split equal keys across buckets.  A broken
    polars install therefore raises here, loudly."""
    global _IMPL
    if _IMPL is None:
        import os

        choice = os.environ.get("KG_RAY_HASH_IMPL", "polars")
        if choice == "pandas":
            import pandas as pd

            _IMPL = ("pandas", pd)
        else:
            # every Ray worker process would otherwise start a full-width
            # polars thread pool (32 workers x 32 threads oversubscribes
            # the node and cost ~40% of 32-CPU throughput); hashing one
            # batch is single-thread work
            os.environ.setdefault("POLARS_MAX_THREADS", "1")
            try:
                import polars as pl

                # probe an actual hash so a broken install fails HERE,
                # not mid-shuffle
                pl.DataFrame({"x": ["probe"]}).hash_rows(seed=0)
            except Exception as exc:
                raise RuntimeError(
                    "polars row hashing is unavailable in this process; "
                    "set KG_RAY_HASH_IMPL=pandas before ray.init so ALL "
                    "processes use the same hash family (a silent local "
                    "fallback would route equal keys to different "
                    "shuffle buckets)"
                ) from exc
            _IMPL = ("polars", pl)
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
