"""Distributed row indexing: global contiguous ids without driver collect.

The reference assigns ``human_readable_id`` by enumeration order over the
in-memory graph (/root/reference/verbs/community_detection/
cluster_graph.py:60-68).  Distributed equivalent (SURVEY §7.5 'Ordering
requirements'): sort on the stable key, then a two-pass prefix-sum —
per-block row counts (tiny remote tasks) -> offsets on the driver ->
per-block index append.  Block payloads never touch the driver.
"""

from __future__ import annotations

import pyarrow as pa


def with_row_index(ds, column: str = "human_readable_id", sort_key=None):
    """Append a 0-based contiguous global index in dataset order.

    ``sort_key`` (optional) sorts first — e.g. ``"name"`` gives the
    stable enumeration the reference's exports rely on (utils/graph.py
    stabilize_graph sorts nodes by name).
    """
    import ray
    import ray.data

    if sort_key is not None:
        ds = ds.sort(sort_key)
    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_count(table: pa.Table) -> int:
        return table.num_rows

    counts = ray.get([block_count.remote(r) for r in refs])
    offsets = []
    total = 0
    for c in counts:
        offsets.append(total)
        total += c

    @ray.remote
    def add_index(table: pa.Table, offset: int) -> pa.Table:
        idx = pa.array(range(offset, offset + table.num_rows), type=pa.int64())
        return table.append_column(column, idx)

    return ray.data.from_arrow_refs(
        [add_index.remote(r, off) for r, off in zip(refs, offsets)]
    )
