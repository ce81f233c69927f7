"""Ordered-sequence funnel analysis over a partitioned event log.

The classic product/training-telemetry question — how many keys
completed step 1, then step 2 at-or-after it, then step 3... — has no
Ray Data native form.  Shape: ONE shuffle on the key
(functions/grouping.bucketed_bucket_map), a vectorized per-bucket
threshold sweep (one pandas groupby-min per step, no per-key Python),
and a per-bucket PARTIAL count so the final exchange moves
``steps x buckets`` rows regardless of input size.

Step semantics: a key reaches step i when it has an event of
``steps[i]`` with ``ts >= `` its step-(i-1) arrival time (first
occurrences; simultaneous events count — both engines apply the same
``>=`` rule, so the oracle is exact).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.grouping import bucketed_bucket_map

FUNNEL_SCHEMA = pa.schema(
    [("step", pa.string()), ("step_idx", pa.int64()),
     ("n_keys", pa.int64())]
)


def funnel_counts(events, steps: list[str], key: str = "user_id",
                  ts_col: str = "ts", step_col: str = "event_type",
                  num_buckets: int = 64,
                  driver_threshold: int | None = None,
                  size_hint: int | None = None):
    """-> Dataset[(step, step_idx, n_keys)]: keys completing the ordered
    prefix ``steps[0..i]`` (one output row per step after the final
    tiny merge)."""
    from knowledge_graph_ray.functions.agg import grouped_agg

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column(step_col),
                        value_set=pa.array(steps))
        b = batch.filter(mask)
        ts_s = pc.divide(b.column(ts_col).cast(pa.int64()), 1_000_000)
        return pa.Table.from_pydict(
            {
                key: b.column(key),
                "ts_s": ts_s.cast(pa.int64()),
                "step": b.column(step_col),
            }
        )

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        # threshold sweep: per step, the per-key min ts among events
        # at-or-after the key's previous-step arrival — each step is one
        # boolean mask + one vectorized groupby-min over the bucket
        rows = []
        arrived: "pd.Series | None" = None  # key -> arrival ts of prev step
        for i, s in enumerate(steps):
            sub = g[g["step"] == s]
            if arrived is not None:
                thr = arrived.reindex(sub[key]).to_numpy()
                sub = sub[sub["ts_s"].to_numpy() >= thr]  # NaN -> False
            # dropna=False: a NULL key forms a group at step 1 (SQL
            # GROUP BY keeps the NULL group)...
            arrived = sub.groupby(key, sort=False, dropna=False)["ts_s"].min()
            rows.append((s, i + 1, int(len(arrived))))
            # ...but can never advance (SQL NULL = NULL never joins):
            # drop it from the threshold lookup for the next step
            arrived = arrived[arrived.index.notna()]
            if arrived.empty:
                # no key reached this step in this bucket; later steps
                # are empty too but must still emit 0 rows
                for j, s2 in enumerate(steps[i + 1:], start=i + 2):
                    rows.append((s2, j, 0))
                break
        return pa.Table.from_pylist(
            [{"step": s, "step_idx": i, "n_keys": n} for s, i, n in rows],
            schema=FUNNEL_SCHEMA,
        )

    prepped = events.select_columns([key, ts_col, step_col]).map_batches(
        prep, batch_format="pyarrow"
    )
    partials = bucketed_bucket_map(
        prepped, [key], bucket_body, num_buckets=num_buckets,
        empty_schema=FUNNEL_SCHEMA, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )
    agg = grouped_agg(
        partials, ["step", "step_idx"], [("n_keys", "n_keys", "sum")],
        num_buckets=4,
    ).to_pandas()  # bounded: <= len(steps) rows
    if "step" not in agg.columns:
        # empty Datasets lose their schema through to_pandas (known
        # Ray 2.49 pitfall) — rebuild the empty frame with columns
        agg = pd.DataFrame({"step": pd.Series([], dtype="object"),
                            "step_idx": pd.Series([], dtype="int64"),
                            "n_keys": pd.Series([], dtype="int64")})
    # a step no bucket reached (or an entirely empty log) must still
    # emit its zero row — the SQL oracle's UNION ALL always yields one
    # row per step
    import ray.data as rd

    full = pd.DataFrame(
        {"step": steps,
         "step_idx": pd.array(range(1, len(steps) + 1), dtype="int64")}
    )
    merged = full.merge(agg, on=["step", "step_idx"], how="left")
    merged["n_keys"] = merged["n_keys"].fillna(0).astype("int64")
    return rd.from_arrow(
        pa.Table.from_pandas(merged, schema=FUNNEL_SCHEMA,
                             preserve_index=False)
    )


RETENTION_SCHEMA = pa.schema(
    [("cohort_week", pa.int64()), ("week_offset", pa.int64()),
     ("n_keys", pa.int64())]
)


def cohort_retention(events, key: str = "user_id", ts_col: str = "ts",
                     week_seconds: int = 604_800, num_buckets: int = 64,
                     driver_threshold: int | None = None,
                     size_hint: int | None = None):
    """-> Dataset[(cohort_week, week_offset, n_keys)]: keys grouped into
    cohorts by their FIRST active week; for each (cohort, offset) the
    count of cohort keys active ``offset`` weeks later (offset 0 = the
    cohort size).  Output is cohorts x offsets rows — weeks-squared
    bounded however large the log.

    Same shape as funnel_counts: one key shuffle, vectorized bucket
    body (two groupbys + a drop_duplicates), per-bucket partial counts
    merged by a tiny grouped_agg.
    """
    from knowledge_graph_ray.functions.agg import grouped_agg

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_s = pc.divide(batch.column(ts_col).cast(pa.int64()), 1_000_000)
        wk = pc.divide(ts_s, week_seconds)
        return pa.Table.from_pydict(
            {key: batch.column(key), "wk": wk.cast(pa.int64())}
        )

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        import numpy as np

        g = g.drop_duplicates([key, "wk"])
        cohort = g.groupby(key, sort=False)["wk"].transform("min")
        df = pd.DataFrame(
            {
                "cohort_week": cohort.to_numpy(),
                "week_offset": g["wk"].to_numpy() - cohort.to_numpy(),
            }
        )
        counts = df.groupby(["cohort_week", "week_offset"], sort=False).size()
        idx = counts.index
        return pa.Table.from_pydict(
            {
                "cohort_week": pa.array(
                    idx.get_level_values(0).to_numpy().astype(np.int64)),
                "week_offset": pa.array(
                    idx.get_level_values(1).to_numpy().astype(np.int64)),
                "n_keys": pa.array(counts.to_numpy().astype(np.int64)),
            },
            schema=RETENTION_SCHEMA,
        )

    prepped = events.select_columns([key, ts_col]).map_batches(
        prep, batch_format="pyarrow"
    )
    partials = bucketed_bucket_map(
        prepped, [key], bucket_body, num_buckets=num_buckets,
        empty_schema=RETENTION_SCHEMA, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )
    return grouped_agg(
        partials, ["cohort_week", "week_offset"],
        [("n_keys", "n_keys", "sum")], num_buckets=4,
    )
