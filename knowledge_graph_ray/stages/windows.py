"""Windowed aggregation over stream-shaped tables (events).

Ray Data is a batch engine with no event-time watermarks (guide:
"Streaming-shaped workloads"); windows are computed by treating the
input as a partitioned log — partition by key, sort by timestamp within
the partition, window inside ``map_groups``.  Ordering assumption: all
rows of one key fit one group task (bound per-key state by splitting hot
keys on a coarser key + window prefix when needed).

* tumbling windows: pure vectorized bucketing (no shuffle beyond the
  aggregate) — see pipelines/queries.events_hourly_agg
* session windows: gap-based sessionization per key (this module)
* sliding windows: enumeration of overlapping window starts per row
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.grouping import bucketed_group_map
from knowledge_graph_ray.functions.numeric import round_half_away

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_start", pa.int64()),  # epoch seconds
        ("session_end", pa.int64()),
        ("n_events", pa.int64()),
        ("sum_value_cents", pa.int64()),
    ]
)


def sessionize(events, gap_seconds: int = 1800, key: str = "user_id",
               ts_column: str = "ts", value_column: str = "value",
               num_buckets: int = 64):
    """Gap-based session windows per key.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_seconds``.  One groupby shuffle on the key; the
    per-key body sorts by timestamp and segments vectorized.
    """

    def per_key(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("ts_s")
        ts = g["ts_s"].to_numpy()
        vals = g["value"].to_numpy()
        new_session = (ts[1:] - ts[:-1]) > gap_seconds
        rows = []
        start = 0
        n = len(ts)
        for i in range(1, n + 1):
            if i == n or new_session[i - 1]:
                seg_vals = vals[start:i]
                rows.append(
                    {
                        "user_id": int(g[key].iloc[0]),
                        "session_start": int(ts[start]),
                        "session_end": int(ts[i - 1]),
                        "n_events": i - start,
                        "sum_value_cents": round_half_away(float(seg_vals.sum()) * 100),
                    }
                )
                start = i
        return pa.Table.from_pylist(rows, schema=SESSION_SCHEMA)

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_s = pc.divide(batch.column(ts_column).cast(pa.int64()), 1_000_000)
        return pa.Table.from_pydict(
            {
                key: batch.column(key),
                "ts_s": ts_s.cast(pa.int64()),
                "value": batch.column(value_column),
            }
        )

    prepped = events.select_columns([key, ts_column, value_column]).map_batches(
        prep, batch_format="pyarrow"
    )
    return bucketed_group_map(prepped, [key], per_key, num_buckets=num_buckets)


def sliding_window_agg(events, window_seconds: int, slide_seconds: int,
                       key: str = "event_type", ts_column: str = "ts",
                       value_column: str = "value"):
    """Sliding windows: each row is enumerated into every window that
    covers it (window_seconds / slide_seconds copies) inside map_batches,
    then a tumbling-style groupby aggregates (key, window_start)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    copies = window_seconds // slide_seconds

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        ts_s = (
            pc.divide(batch.column(ts_column).cast(pa.int64()), 1_000_000)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keys = batch.column(key)
        vals = batch.column(value_column)
        last_start = (ts_s // slide_seconds) * slide_seconds
        out_keys, out_starts, out_vals = [], [], []
        for c in range(copies):  # loop over COPIES (small), not rows
            starts = last_start - c * slide_seconds
            mask = starts + window_seconds > ts_s
            mask_arr = pa.array(mask)
            out_keys.append(keys.filter(mask_arr).combine_chunks())
            out_starts.append(pa.array(starts[mask], type=pa.int64()))
            out_vals.append(vals.filter(mask_arr).combine_chunks())
        return pa.Table.from_pydict(
            {
                key: pa.concat_arrays([a if isinstance(a, pa.Array) else a.combine_chunks() for a in out_keys]),
                "window_start": pa.concat_arrays(out_starts),
                value_column: pa.concat_arrays([a if isinstance(a, pa.Array) else a.combine_chunks() for a in out_vals]),
            }
        )

    return (
        events.select_columns([key, ts_column, value_column])
        .map_batches(explode, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum(value_column, alias_name="sum_value"))
    )
