"""Bucketed group-map: groupby(key).map_groups without per-key overhead.

Ray's ``groupby(key).map_groups(fn)`` invokes ``fn`` once per DISTINCT
KEY (~1ms overhead each) — ruinous for high-cardinality keys (measured:
8000 tiny groups ≈ 9s vs 1.2s for the same groupby as a vectorized
aggregate).  ``bucketed_group_map`` shuffles once on a stable vectorized
hash bucket of the key (one Ray group per bucket) and iterates the per-key
sub-groups with a pandas groupby inside the bucket — same semantics, one
task per bucket.  ``bucketed_bucket_map`` is the lower-level form whose
body receives the WHOLE bucket, for bodies that can vectorize across
groups (sort/filter once per bucket instead of once per tiny group).

``num_buckets`` is also the skew lever: it bounds per-task memory to
~|dataset|/num_buckets (hot KEYS still colocate — per-key state must fit
one task, which holds for every use here since upstream partial
aggregation bounds per-key rows).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.hashing import bucket_column

_BUCKET = "__gb"


def bucketed_bucket_map(ds, keys: list[str], bucket_fn, num_buckets: int = 64,
                        empty_schema: pa.Schema | None = None,
                        driver_threshold: int | None = None,
                        size_hint: int | None = None,
                        body_format: str = "pandas",
                        pre_partition: int | None = None):
    """Apply ``bucket_fn(bucket_df) -> pyarrow.Table`` once per key-hash
    bucket; all rows of a key land in the same bucket.

    ``bucket_fn`` must return an Arrow table with a fixed schema (may be
    empty); ``empty_schema`` covers the zero-row input case.

    ``body_format="pyarrow"`` hands ``bucket_fn`` a ``pyarrow.Table``
    instead of a pandas DataFrame — use it when the body must see the
    exact Arrow types (a pandas conversion turns int64-with-null
    columns into float64, losing the type for the output schema).

    ``driver_threshold``: size-adaptive final merge — when the input is
    PROVABLY small, the merge runs on the driver in one pass instead of
    paying an all-to-all sort round (~4s of fixed latency at 32 CPUs
    regardless of data size).  Larger inputs take the distributed path.

    ``size_hint``: a cheap caller-supplied row-count upper bound (e.g.
    the materialized mention count upstream of a combiner).  When the
    hint already exceeds ``driver_threshold`` the probe is skipped
    entirely — the hot path stays streaming instead of forcing a full
    materialize barrier just to learn it is big.  When the hint is under
    the threshold the driver path runs directly (the hint is an upper
    bound, so smallness is proven without a count).  Either path is
    semantically identical; the hint only picks the regime.
    """
    import ray.data as rd

    if driver_threshold is not None and (
        size_hint is None or size_hint <= driver_threshold
    ):
        if size_hint is None:
            ds = ds.materialize()
            small = ds.count() <= driver_threshold
        else:
            # materialize even when the hint proves smallness: Ray
            # 2.49's to_arrow_refs/to_pandas on a LAZY dataset launch a
            # second executor just for .schema(); on a materialized
            # handle both are metadata-only (one execution total)
            ds = ds.materialize()
            small = True
        if small:
            if body_format == "pyarrow":
                import ray

                tables = ray.get(ds.to_arrow_refs())
                tables = [t for t in tables if t.num_rows]
                if not tables:
                    if empty_schema is not None:
                        return rd.from_arrow(empty_schema.empty_table())
                    raise RuntimeError(
                        "bucketed map: empty input needs empty_schema"
                    )
                whole = pa.concat_tables(tables, promote_options="default")
                return rd.from_arrow(bucket_fn(whole))
            pdf = ds.to_pandas()
            if pdf.empty:
                if empty_schema is not None:
                    return rd.from_arrow(empty_schema.empty_table())
                raise RuntimeError(
                    "bucketed map: empty input needs empty_schema"
                )
            return rd.from_arrow(bucket_fn(pdf))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _BUCKET, bucket_column(batch, keys, num_buckets)
        )

    if pre_partition is not None:
        # groupby().map_groups schedules ONE task per post-sort block,
        # and the sort preserves the input block count — a small
        # (often 1-block) input therefore serializes every bucket body
        # on one core.  Callers whose bodies do heavy per-bucket work
        # (the quadratic pair scans) opt into an input repartition so
        # the map runs wide; measured 8x on the JW join at 100k names.
        bucketed = ds.repartition(pre_partition)
    else:
        bucketed = ds
    bucketed = bucketed.map_batches(add_bucket, batch_format="pyarrow")

    if body_format == "pyarrow":
        def abody(group: pa.Table) -> pa.Table:
            keep = [c for c in group.column_names if c != _BUCKET]
            return bucket_fn(group.select(keep))

        return bucketed.groupby(_BUCKET).map_groups(
            abody, batch_format="pyarrow"
        )

    def body(group: pd.DataFrame) -> pa.Table:
        return bucket_fn(group.drop(columns=[_BUCKET]))

    return bucketed.groupby(_BUCKET).map_groups(body, batch_format="pandas")


def bucketed_group_map(ds, keys: list[str], fn, num_buckets: int = 64,
                       dropna: bool = False, empty_schema: pa.Schema | None = None,
                       driver_threshold: int | None = None,
                       size_hint: int | None = None):
    """Apply ``fn(sub_df) -> pyarrow.Table`` per distinct key group.

    ``fn`` must always return an Arrow table with a fixed schema (may be
    empty).  ``dropna=True`` skips groups whose key is null (pandas
    groupby semantics, used where the reference drops NaN keys);
    ``empty_schema`` is returned for buckets left with zero groups.
    See ``bucketed_bucket_map`` for ``driver_threshold`` / ``size_hint``.
    """
    group_keys = keys[0] if len(keys) == 1 else keys

    def bucket_fn(bucket: pd.DataFrame) -> pa.Table:
        sub_groups = bucket.groupby(group_keys, sort=False, dropna=dropna)
        out = [fn(sub) for _, sub in sub_groups]
        out = [t for t in out if t is not None]
        if not out:
            if empty_schema is not None:
                return empty_schema.empty_table()
            raise RuntimeError(
                "bucketed_group_map: bucket produced no groups "
                "(pass empty_schema when dropna can empty a bucket)"
            )
        return pa.concat_tables(out, promote_options="default")

    return bucketed_bucket_map(
        ds, keys, bucket_fn, num_buckets=num_buckets,
        empty_schema=empty_schema, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )


def grouped_topk(ds, group_cols: list[str], order_col: str, k: int,
                 descending: bool = True, tie_cols: list[str] | None = None,
                 num_buckets: int = 64, driver_threshold: int | None = None,
                 size_hint: int | None = None):
    """Top-k rows per group with a dense 1..k ``rk`` column.

    Scale shape: a per-batch local top-k combiner bounds the shuffle to
    <= k rows per (group, batch) — hub groups ship k rows per upstream
    block, never their full row count — then the bucketed final pass
    re-ranks.  Ties broken by ``tie_cols`` ascending (deterministic).
    """
    tie = tie_cols or []
    sort_cols = [order_col] + tie
    ascending = [not descending] + [True] * len(tie)

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        top = (
            df.sort_values(sort_cols, ascending=ascending, kind="stable")
            # dropna=False to match the final bucketed_group_map pass —
            # pandas' default dropna=True would silently discard
            # null-key rows in the combiner only
            .groupby(group_cols, sort=False, dropna=False)
            .head(k)
        )
        return pa.Table.from_pandas(top, preserve_index=False)

    partials = ds.map_batches(local_topk, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pa.Table:
        top = group.sort_values(sort_cols, ascending=ascending,
                                kind="stable").head(k)
        top = top.assign(rk=range(1, len(top) + 1))
        return pa.Table.from_pandas(top, preserve_index=False)

    # the combiner bounds partials to <= k per (group, batch), so a
    # driver_threshold probe over PARTIALS is cheap even for huge inputs
    return bucketed_group_map(partials, group_cols, final_topk,
                              num_buckets=num_buckets,
                              driver_threshold=driver_threshold,
                              size_hint=size_hint)
