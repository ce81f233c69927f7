"""Sequence packing: assign documents to fixed-budget training shards.

Beyond-reference operator (SURVEY §2.11 family): training pipelines
consume documents as packs of ~max_tokens each; the pack id must be a
deterministic function of the corpus so re-runs and auditors agree.

Two packing rules, same API:

* ``pack_by_offset`` — doc goes to pack ``floor(start_offset /
  max_weight)`` where start_offset is the exclusive running sum of the
  weight column in sorted order.  Packs average exactly ``max_weight``
  (a doc may straddle its boundary by < one doc).  Fully vectorized and
  ANSI-SQL-expressible (window cumulative sum), so it carries a DuckDB
  oracle (`pack_documents`).
* ``pack_greedy`` — classic first-fit-contiguous: a new pack starts
  when adding the next doc would exceed ``max_weight`` (oversized docs
  get a pack of their own).  The running reset makes this
  order-sequential, so it runs per PARTITION (each training shard packs
  independently — the standard production shape); within a partition
  the scan is O(packs) numpy ``searchsorted`` jumps, not O(rows) Python.

Scale: ``pack_by_offset`` costs one sort plus an O(blocks) driver
prefix-sum (`functions/index.with_weight_offsets` — block payloads
never touch the driver).  ``pack_greedy`` is a bucketed per-partition
pass (`functions/grouping.bucketed_group_map`); per-partition rows must
fit one task, which is the definition of a shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_by_offset(ds, weight_col: str, max_weight: int, sort_key: str,
                   offset_col: str = "start_offset",
                   pack_col: str = "pack_id"):
    """Append ``start_offset`` (exclusive running weight sum in
    ``sort_key`` order) and ``pack_id = floor(start_offset/max_weight)``.

    ``weight_col`` must be integer-valued (token/char counts); a
    non-integral float column raises in the offset pass rather than
    silently truncating."""
    from knowledge_graph_ray.functions.index import with_weight_offsets

    with_off = with_weight_offsets(ds, weight_col, column=offset_col,
                                   sort_key=sort_key)

    def assign(batch: pa.Table) -> pa.Table:
        off = batch.column(offset_col).to_numpy(zero_copy_only=False)
        packs = off // max_weight
        return batch.append_column(pack_col, pa.array(packs, type=pa.int64()))

    return with_off.map_batches(assign, batch_format="pyarrow")


def greedy_boundaries(weights: np.ndarray, max_weight: int) -> np.ndarray:
    """Pack id per row for first-fit-contiguous packing of ``weights``.

    O(packs) loop: each step jumps to the first index whose cumulative
    weight exceeds the current pack's budget (``searchsorted`` on the
    running sum); an oversized doc always terminates its own pack.
    """
    n = len(weights)
    packs = np.zeros(n, dtype=np.int64)
    if n == 0:
        return packs
    cum = np.cumsum(weights.astype(np.int64))
    start = 0
    pack = 0
    while start < n:
        base = cum[start - 1] if start > 0 else 0
        # last index with cum - base <= max_weight; at least one row
        end = int(np.searchsorted(cum, base + max_weight, side="right"))
        if end == start:  # oversized doc: own pack
            end = start + 1
        packs[start:end] = pack
        pack += 1
        start = end
    return packs


def pack_greedy(ds, weight_col: str, max_weight: int, sort_key: str,
                partition_col: str, pack_col: str = "pack_id",
                num_buckets: int = 64,
                driver_threshold: int | None = None,
                size_hint: int | None = None):
    """First-fit-contiguous packing within each ``partition_col`` group,
    rows ordered by ``sort_key``; pack ids are (partition, local) —
    returned as the ``pack_col`` int64 local id alongside the partition
    column, so ids are stable under any cross-partition interleaving."""
    from knowledge_graph_ray.functions.grouping import bucketed_group_map

    def pack_partition(sub: pd.DataFrame) -> pa.Table:
        sub = sub.sort_values(sort_key, kind="stable")
        w = sub[weight_col].to_numpy()
        out = sub.assign(**{pack_col: greedy_boundaries(w, max_weight)})
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed_group_map(ds, [partition_col], pack_partition,
                              num_buckets=num_buckets,
                              driver_threshold=driver_threshold,
                              size_hint=size_hint)
