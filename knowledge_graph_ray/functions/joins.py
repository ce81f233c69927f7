"""Portable partitioned hash join built on groupby shuffles.

Ray 2.49's native ``Dataset.join`` intermittently fails when several
hash-join operators land in one fused DAG (aggregator finalize raises
"No match or multiple matches for key field reference FieldRef..."), so
the engine uses the portable pattern instead: bucket both sides by a
stable hash of the key, shuffle once with ``groupby(bucket)``, and run
one vectorized pandas merge per bucket inside ``map_groups``.

Scale properties: a single all-to-all exchange partitioned on the key
hash; ``num_partitions`` bounds per-bucket memory; hot keys can be
salted by raising ``num_partitions`` (same-key rows must share a bucket,
so true key skew is bounded by the hot key's own row count — for the
joins in this engine the right side is entity-keyed and near-unique).
Join semantics: 'inner' and 'left_outer', composite keys supported.
Non-key output columns must be disjoint between the two sides (callers
rename first) — asserted.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

_BUCKET = "__jb"
_SIDE = "__js"


def _arrow_schema(ds) -> pa.Schema:
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    # pandas-block schema fallback
    sch = ds.schema()
    return pa.schema(
        [
            (n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
            for n, t in zip(sch.names, sch.types)
        ]
    )


def _bucket_of(values, num_partitions: int):
    return pa.array(
        [zlib.crc32("|".join(map(str, v)).encode()) % num_partitions for v in zip(*values)],
        type=pa.int32(),
    )


def hash_join(
    left,
    right,
    on: list[str] | tuple[str, ...],
    how: str = "inner",
    num_partitions: int = 32,
):
    """left ⨝ right on key columns ``on`` -> Dataset.

    Output columns: all left columns, then right's non-key columns.
    """
    assert how in ("inner", "left_outer"), how
    on = list(on)
    left_schema = _arrow_schema(left)
    right_schema = _arrow_schema(right)
    left_cols = left_schema.names
    right_payload = [c for c in right_schema.names if c not in on]
    overlap = set(left_cols) & set(right_payload)
    assert not overlap, f"rename right columns before joining: {overlap}"

    out_fields = [left_schema.field(c) for c in left_cols] + [
        right_schema.field(c) for c in right_payload
    ]
    out_schema = pa.schema(out_fields)

    def tag(side: int, add_cols: list[tuple[str, pa.DataType]]):
        def body(batch: pa.Table) -> pa.Table:
            cols = {name: batch.column(name) for name in batch.schema.names}
            for name, typ in add_cols:
                cols[name] = pa.nulls(len(batch), typ)
            cols[_SIDE] = pa.array([side] * len(batch), type=pa.int8())
            cols[_BUCKET] = _bucket_of(
                [batch.column(k).to_pylist() for k in on], num_partitions
            )
            # fixed column order so the union schemas align
            ordered = {f.name: cols[f.name] for f in out_fields}
            ordered[_SIDE] = cols[_SIDE]
            ordered[_BUCKET] = cols[_BUCKET]
            return pa.Table.from_pydict(ordered)

        return body

    left_tagged = left.map_batches(
        tag(0, [(f.name, f.type) for f in out_fields if f.name in right_payload]),
        batch_format="pyarrow",
    )
    right_tagged = right.map_batches(
        tag(
            1,
            [
                (f.name, f.type)
                for f in out_fields
                if f.name in left_cols and f.name not in on
            ],
        ),
        batch_format="pyarrow",
    )

    left_only_cols = [c for c in left_cols if c not in on]

    def _to_arrow_col(series, field: pa.Field):
        vals = [
            None if v is None or (isinstance(v, float) and v != v) else v
            for v in series.tolist()
        ]
        if pa.types.is_integer(field.type):
            vals = [None if v is None else int(v) for v in vals]
        return pa.array(vals, type=field.type)

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        lhs = group[group[_SIDE] == 0]
        rhs = group[group[_SIDE] == 1]
        lhs = lhs[on + left_only_cols]
        rhs = rhs[on + right_payload]
        merged = lhs.merge(rhs, on=on, how="left" if how == "left_outer" else "inner")
        # explicit column-wise Arrow conversion: pandas upcasts ints with
        # NaN to float64, which from_pandas(schema=) refuses to cast back
        return pa.Table.from_arrays(
            [_to_arrow_col(merged[f.name], f) for f in out_fields],
            schema=out_schema,
        )

    return left_tagged.union(right_tagged).groupby(_BUCKET).map_groups(
        merge_bucket, batch_format="pandas"
    )
