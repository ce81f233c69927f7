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


def asof_join_backward(left, right, by: str, on: str,
                       right_value_columns: list[str] | None = None,
                       num_buckets: int = 64):
    """As-of join (backward): each left row is paired with the LATEST
    right row of the same ``by`` key whose ``on`` value is <= the left
    row's (DuckDB ``ASOF LEFT JOIN`` semantics; an operator Ray Data
    lacks natively).  Unmatched left rows get ``asof_<on> = -1`` and
    null value columns.

    Shape: tag sides into one aligned schema, one shuffle on the key,
    per-key vectorized ``np.searchsorted`` of left timestamps into the
    sorted right timestamps.  Partitioning assumption (documented per
    the custom-operator rule): all rows of one key fit one group task —
    split hot keys on (key, coarse time prefix) upstream when that
    breaks.

    Tie note: among right rows sharing one ``on`` value the LAST after a
    stable (on) sort wins; emit value columns that are functions of
    ``on`` (e.g. the matched timestamp) when the oracle's tie choice is
    unspecified.
    """
    import numpy as np

    rvals = right_value_columns or []
    lschema = left.schema()
    rschema = right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    left_payload = [n for n in lschema.names if n not in (by, on)]

    # one aligned wire schema for both tagged sides
    wire_fields = (
        [("__side", pa.int8()), (by, ltypes[by]), (on, pa.int64())]
        + [(n, ltypes[n]) for n in left_payload]
        + [(f"__r_{n}", rtypes[n]) for n in rvals]
    )
    wire_schema = pa.schema(wire_fields)

    out_schema = pa.schema(
        [(by, ltypes[by]), (on, pa.int64())]
        + [(n, ltypes[n]) for n in left_payload]
        + [(f"asof_{on}", pa.int64())]
        + [(f"asof_{n}", rtypes[n]) for n in rvals]
    )

    def tag(side: int, present: dict):
        def body(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = {}
            for name, typ in wire_fields:
                if name == "__side":
                    cols[name] = pa.array([side] * n, type=pa.int8())
                elif name in (by, on):
                    cols[name] = b.column(name).cast(typ)
                elif name in present:
                    cols[name] = b.column(present[name]).cast(typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            return pa.Table.from_pydict(cols, schema=wire_schema)

        return body

    lt = left.map_batches(
        tag(0, {n: n for n in left_payload}), batch_format="pyarrow"
    )
    rt = right.map_batches(
        tag(1, {f"__r_{n}": n for n in rvals}), batch_format="pyarrow"
    )

    def per_key(group: pd.DataFrame) -> pa.Table:
        lhs = group[group["__side"] == 0]
        if lhs.empty:
            return out_schema.empty_table()
        rhs = group[group["__side"] == 1].sort_values(on, kind="stable")
        out = {by: lhs[by].to_numpy(), on: lhs[on].to_numpy()}
        for n in left_payload:
            out[n] = lhs[n].to_numpy()
        if len(rhs):
            r_on = rhs[on].to_numpy()
            idx = np.searchsorted(r_on, lhs[on].to_numpy(), side="right") - 1
            matched = idx >= 0
            out[f"asof_{on}"] = np.where(matched, r_on[idx.clip(0)], -1)
            for n in rvals:
                vals = rhs[f"__r_{n}"].to_numpy()[idx.clip(0)].astype(object)
                vals[~matched] = None
                out[f"asof_{n}"] = vals
        else:
            out[f"asof_{on}"] = np.full(len(lhs), -1, dtype=np.int64)
            for n in rvals:
                out[f"asof_{n}"] = np.full(len(lhs), None, dtype=object)
        return pa.Table.from_pandas(
            pd.DataFrame(out).reset_index(drop=True), schema=out_schema,
            preserve_index=False,
        )

    return bucketed_group_map(
        lt.union(rt), [by], per_key, num_buckets=num_buckets,
        empty_schema=out_schema,
    )
