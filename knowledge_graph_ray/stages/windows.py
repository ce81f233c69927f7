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

from knowledge_graph_ray.functions.grouping import bucketed_bucket_map

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
               num_buckets: int = 64,
               driver_threshold: int | None = None,
               size_hint: int | None = None):
    """Gap-based session windows per key.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_seconds``.  One groupby shuffle on the key; the
    per-key body sorts by timestamp and segments vectorized.
    ``driver_threshold``/``size_hint``: size-adaptive single-pass driver
    path for provably small inputs (the bucket shuffle costs ~1-3s of
    fixed sort-round latency regardless of size) — see
    functions/grouping.bucketed_bucket_map.
    """

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        """ONE vectorized pass for every key in the bucket: sort by
        (key, ts), session breaks = key change OR gap, cumsum session
        ids, one pandas groupby — no per-key Python loop."""
        import numpy as np

        g = g.sort_values([key, "ts_s"], kind="stable")
        n = len(g)
        ts = g["ts_s"].to_numpy()
        # factorize handles null keys as one group (old per-key dropna=False)
        codes, _ = pd.factorize(g[key], use_na_sentinel=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (codes[1:] != codes[:-1]) | ((ts[1:] - ts[:-1]) > gap_seconds)
        sid = np.cumsum(brk)
        df = pd.DataFrame(
            {
                "sid": sid,
                "user_id": g[key].to_numpy(),
                "ts_s": ts,
                "value": g["value"].to_numpy(),
            }
        )
        agg = df.groupby("sid", sort=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts_s", "first"),
            session_end=("ts_s", "last"),
            n_events=("ts_s", "size"),
            sum_value=("value", "sum"),
        )
        # vectorized DuckDB round-half-away (matches round_half_away)
        sv = agg["sum_value"].to_numpy(dtype="float64") * 100.0
        cents = np.where(sv >= 0, np.floor(sv + 0.5), np.ceil(sv - 0.5))
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(agg["user_id"].astype("int64")),
                "session_start": pa.array(agg["session_start"].astype("int64")),
                "session_end": pa.array(agg["session_end"].astype("int64")),
                "n_events": pa.array(agg["n_events"].astype("int64")),
                "sum_value_cents": pa.array(cents.astype("int64")),
            },
            schema=SESSION_SCHEMA,
        )

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
    return bucketed_bucket_map(prepped, [key], bucket_body,
                               num_buckets=num_buckets,
                               empty_schema=SESSION_SCHEMA,
                               driver_threshold=driver_threshold,
                               size_hint=size_hint)


def sliding_window_agg(events, window_seconds: int, slide_seconds: int,
                       key: str = "event_type", ts_column: str = "ts",
                       value_column: str = "value"):
    """Sliding windows: each row is enumerated into every window that
    covers it (window_seconds / slide_seconds copies) inside map_batches,
    then a tumbling-style partial-aggregate groupby over (key,
    window_start)."""
    import pyarrow.compute as pc

    from knowledge_graph_ray.functions.agg import grouped_agg

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

    return grouped_agg(
        events.select_columns([key, ts_column, value_column])
        .map_batches(explode, batch_format="pyarrow"),
        [key, "window_start"],
        [("n_events", None, "count"), ("sum_value", value_column, "sum")],
    )


def asof_join_backward(left, right, by: str, on: str,
                       right_value_columns: list[str] | None = None,
                       num_buckets: int = 64,
                       driver_threshold: int | None = None,
                       size_hint: int | None = None):
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

    from knowledge_graph_ray.functions.dsschema import dataset_schema

    rvals = right_value_columns or []
    lschema, left = dataset_schema(left)
    rschema, right = dataset_schema(right)
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

    def _searchsorted_asof(lhs: pd.DataFrame, rhs: pd.DataFrame) -> pd.DataFrame:
        """Single-key asof (the null-key fallback path)."""
        rhs = rhs.sort_values(on, kind="stable")
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
        return pd.DataFrame(out)

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        # ONE vectorized pd.merge_asof over every key in the bucket
        # (backward + last-duplicate-wins matches the searchsorted rule);
        # null keys can't equality-match in merge_asof, so they take the
        # single-key fallback where null==null within the group
        lhs = g[g["__side"] == 0]
        if lhs.empty:
            return out_schema.empty_table()
        rhs = g[g["__side"] == 1]
        frames = []
        lnull = lhs[by].isna()
        if lnull.any():
            frames.append(
                _searchsorted_asof(lhs[lnull], rhs[rhs[by].isna()])
            )
            lhs = lhs[~lnull]
            rhs = rhs[rhs[by].notna()]
        if len(lhs):
            rcols = {by: rhs[by], on: rhs[on], f"asof_{on}": rhs[on]}
            for n in rvals:
                rcols[f"asof_{n}"] = rhs[f"__r_{n}"]
            rframe = pd.DataFrame(rcols).sort_values(on, kind="stable")
            merged = pd.merge_asof(
                lhs.sort_values(on, kind="stable").drop(columns=["__side"]),
                rframe, on=on, by=by, direction="backward",
            )
            merged[f"asof_{on}"] = (
                merged[f"asof_{on}"].fillna(-1).astype("int64")
            )
            for n in rvals:
                col = merged[f"asof_{n}"]
                merged[f"asof_{n}"] = col.astype(object).where(col.notna(), None)
            frames.append(merged)
        out = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        return pa.Table.from_pandas(
            out[[f.name for f in out_schema]], schema=out_schema,
            preserve_index=False,
        )

    return bucketed_bucket_map(
        lt.union(rt), [by], bucket_body, num_buckets=num_buckets,
        empty_schema=out_schema, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )


def interval_join_count(intervals, points, by: str, start_col: str,
                        end_col: str, on: str,
                        count_col: str = "n_points",
                        num_buckets: int = 64,
                        driver_threshold: int | None = None,
                        size_hint: int | None = None):
    """Range join, count form: for each interval row, how many point
    rows of the same ``by`` key have ``start <= on < end`` (an operator
    Ray Data lacks natively; LEFT semantics — intervals with no hit
    keep count 0).  ``start_col``/``end_col``/``on`` must be int64
    (cast timestamps to epoch micros upstream).

    Shape: tag both sides into one aligned wire schema, ONE shuffle on
    the key, then per key a vectorized double ``np.searchsorted`` of
    interval bounds into that key's sorted point values — O((I+P) log P)
    per key, never the I×P expansion a blind join would pay.
    Partitioning assumption (documented per the custom-operator rule):
    all rows of one key fit one group task; split hot keys on
    (key, coarse time bucket) upstream — replicating intervals into
    every bucket they overlap — when that breaks.
    """
    import numpy as np

    from knowledge_graph_ray.functions.dsschema import dataset_schema
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map

    ischema, intervals = dataset_schema(intervals)
    itypes = dict(zip(ischema.names, ischema.types))
    payload = [n for n in ischema.names
               if n not in (by, start_col, end_col)]

    wire_fields = (
        [("__side", pa.int8()), (by, itypes[by]),
         ("__t0", pa.int64()), ("__t1", pa.int64())]
        + [(n, itypes[n]) for n in payload]
    )
    wire_schema = pa.schema(wire_fields)
    out_schema = pa.schema(
        [(by, itypes[by])] + [(n, itypes[n]) for n in payload]
        + [(start_col, pa.int64()), (end_col, pa.int64()),
           (count_col, pa.int64())]
    )

    def tag_intervals(b: pa.Table) -> pa.Table:
        cols = {
            "__side": pa.array([0] * len(b), type=pa.int8()),
            by: b.column(by),
            "__t0": b.column(start_col).cast(pa.int64()),
            "__t1": b.column(end_col).cast(pa.int64()),
        }
        for n in payload:
            cols[n] = b.column(n)
        return pa.Table.from_pydict(cols, schema=wire_schema)

    def tag_points(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {
            "__side": pa.array([1] * n, type=pa.int8()),
            by: b.column(by),
            "__t0": b.column(on).cast(pa.int64()),
            "__t1": pa.nulls(n, pa.int64()),
        }
        for name in payload:
            cols[name] = pa.nulls(n, itypes[name])
        return pa.Table.from_pydict(cols, schema=wire_schema)

    it = intervals.map_batches(tag_intervals, batch_format="pyarrow")
    pt = points.map_batches(tag_points, batch_format="pyarrow")

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        """Fully vectorized across keys: one joint factorize + lexsort,
        per-key contiguous slices, TWO searchsorted calls per distinct
        key on numpy slices, ONE output frame.  (The obvious per-key
        ``pd.DataFrame`` loop costs ~1-2ms/key of frame construction —
        seconds at a few thousand keys on the driver fast path.)"""
        import numpy as np

        side = g["__side"].to_numpy()
        iv_mask = side == 0
        if not iv_mask.any():
            return out_schema.empty_table()
        # joint factorize so interval and point key codes align; null
        # keys get a code (use_na_sentinel=False) but null-key POINTS
        # are excluded from matching — SQL equality (the oracle's
        # ``ON c.key = p.key``) never matches NULL = NULL, so a
        # null-key interval keeps count 0 (LEFT semantics)
        codes = pd.factorize(g[by], use_na_sentinel=False)[0]
        t0_all = g["__t0"].to_numpy()
        nonnull = g[by].notna().to_numpy()

        p_codes = codes[~iv_mask & nonnull]
        p_t = t0_all[~iv_mask & nonnull]
        p_order = np.lexsort((p_t, p_codes))
        p_codes_s = p_codes[p_order]
        p_t_s = p_t[p_order]

        iv_codes = codes[iv_mask]
        iv_t0 = t0_all[iv_mask]
        iv_t1 = g["__t1"].to_numpy()[iv_mask]
        i_order = np.argsort(iv_codes, kind="stable")
        counts_sorted = np.zeros(len(iv_codes), dtype=np.int64)

        uniq = np.unique(iv_codes)
        i_bounds = np.searchsorted(iv_codes[i_order], uniq, side="left")
        i_ends = np.searchsorted(iv_codes[i_order], uniq, side="right")
        p_bounds = np.searchsorted(p_codes_s, uniq, side="left")
        p_ends = np.searchsorted(p_codes_s, uniq, side="right")
        for c_i in range(len(uniq)):
            ps, pe = p_bounds[c_i], p_ends[c_i]
            if ps == pe:
                continue  # no points for this key: counts stay 0
            s, e = i_bounds[c_i], i_ends[c_i]
            sl = i_order[s:e]
            seg = p_t_s[ps:pe]
            counts_sorted[s:e] = (
                np.searchsorted(seg, iv_t1[sl], side="left")
                - np.searchsorted(seg, iv_t0[sl], side="left")
            )
        counts = np.empty(len(iv_codes), dtype=np.int64)
        counts[i_order] = counts_sorted

        iv = g[iv_mask]
        out = pd.DataFrame({
            by: iv[by].to_numpy(),
            **{n: iv[n].to_numpy() for n in payload},
            start_col: iv_t0, end_col: iv_t1, count_col: counts,
        })
        return pa.Table.from_pandas(out[[f.name for f in out_schema]],
                                    schema=out_schema, preserve_index=False)

    return bucketed_bucket_map(
        it.union(pt), [by], bucket_body, num_buckets=num_buckets,
        empty_schema=out_schema, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )


def global_trailing_distinct(ds, order_col: str, user_col: str,
                             id_cols: list[str], window: int,
                             block: int | None = None):
    """Distinct ``user_col`` count over a GLOBAL trailing window
    (``RANGE BETWEEN window-1 PRECEDING AND CURRENT ROW`` with no
    partition key) — the sliding-distinct window that neither the
    per-key range kit nor a prefix sum can express (distinct does not
    sum).

    Algorithm (interval stabbing): an event j with previous same-user
    time p_j is the FIRST of its user inside the window of query time t
    iff ``max(ts_j, p_j + window) <= t <= ts_j + window - 1``; the
    distinct count at t is therefore the number of stabbed intervals,
    i.e. ``count(lo <= t) - count(hi < t)`` — two vectorized
    searchsorteds over the sorted interval endpoints, no per-row loop.

    Scale shape: time is range-partitioned into blocks; each event is
    shipped to its own block, and events in a block's final ``window``
    seconds are replicated once into the NEXT block as halo rows
    (bounded <= window/block duplication).  A halo row older than the
    block's window start cannot exist, so per-block ``p_j`` recovered
    from block+halo alone is exact for every OWNED query time.  One
    shuffle total; each block's body is O(n log n) numpy."""
    import numpy as np
    import pyarrow.compute as pc

    if block is None:
        block = 4 * window
    assert block >= window

    def route(batch: pa.Table) -> pa.Table:
        ts = batch.column(order_col)
        blk = pc.divide(ts, block).cast(pa.int64())
        own = batch.append_column("_blk", blk).append_column(
            "_owned", pa.array([True] * len(batch), type=pa.bool_()))
        # rows in the last `window-1` seconds also serve the next block
        off = pc.subtract(ts, pc.multiply(blk, block))
        halo_mask = pc.greater_equal(off, pa.scalar(block - (window - 1),
                                                    type=pa.int64()))
        halo = batch.filter(halo_mask)
        if len(halo):
            hblk = pc.add(
                pc.divide(halo.column(order_col), block).cast(pa.int64()),
                pa.scalar(1, type=pa.int64()))
            halo = halo.append_column("_blk", hblk).append_column(
                "_owned", pa.array([False] * len(halo), type=pa.bool_()))
            return pa.concat_tables([own, halo])
        return own

    routed = ds.map_batches(route, batch_format="pyarrow")

    out_fields = [(c, pa.int64()) for c in id_cols] + [
        (order_col, pa.int64()), ("trailing_users", pa.int64())]

    def body(g: pd.DataFrame) -> pa.Table:
        ts = g[order_col].to_numpy(np.int64)
        u = g[user_col].to_numpy()
        owned = g["_owned"].to_numpy(bool)
        order = np.lexsort((ts, u))
        ts_u = ts[order]
        prev = np.full(len(g), np.iinfo(np.int64).min // 4, dtype=np.int64)
        same = np.empty(len(g), dtype=bool)
        same[0] = False
        if len(g) > 1:
            same[1:] = u[order][1:] == u[order][:-1]
        prev_sorted = np.where(same, np.concatenate(([0], ts_u[:-1])),
                               prev[0])
        prev[order] = prev_sorted
        lo = np.maximum(ts, prev + window)
        hi = ts + window - 1
        lo_s = np.sort(lo)
        hi_s = np.sort(hi)
        t_q = ts[owned]
        d = (np.searchsorted(lo_s, t_q, side="right")
             - np.searchsorted(hi_s, t_q, side="left"))
        cols = {c: pa.array(g[c].to_numpy(np.int64)[owned],
                            type=pa.int64()) for c in id_cols}
        cols[order_col] = pa.array(t_q, type=pa.int64())
        cols["trailing_users"] = pa.array(d.astype(np.int64),
                                          type=pa.int64())
        return pa.Table.from_pydict(cols)

    del out_fields  # schema carried by the emitted tables
    return routed.groupby("_blk").map_groups(body, batch_format="pandas")
