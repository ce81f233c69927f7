"""Distributed summary statistics: exact grouped quantiles, exact and
sketched (HyperLogLog) distinct counts.

Scale shapes:

* ``grouped_quantiles`` — EXACT quantiles without a global sort: one
  ``groupby(group, value).count()`` (shuffle bounded by DISTINCT
  (group, value) pairs — the combiner), then per-group quantile reads
  off the sorted value histogram.  Right whenever the value space is
  bounded (prices, scores, durations at fixed precision).  For unbounded
  high-cardinality values switch to the t-digest-style fallback of
  quantizing first (document the error bound).
* ``grouped_distinct_count`` — exact: per-batch (group, value) dedup,
  ``groupby`` pair-distinct, per-group count.  Shuffle bounded by
  distinct pairs.
* ``HyperLogLog`` / ``grouped_hll_distinct`` — the sketch path when
  distinct pairs themselves are too many to shuffle: per-batch HLL
  registers per group (fixed 2^p bytes), merged by max inside a groupby
  — shuffle is O(groups x 2^p) regardless of cardinality.  Standard
  error ~ 1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.grouping import bucketed_group_map


def grouped_quantiles(ds, group_col: str, value_col: str, qs: list[float],
                      num_buckets: int = 16):
    """-> Dataset[(group, q, value)] — exact ``quantile_disc`` parity:
    the selected element is the ``ceil(n*q)``-th (1-indexed) of the
    sorted values — the classic lower empirical quantile (rule probed
    against DuckDB across fractional boundary cases)."""
    counts = ds.groupby([group_col, value_col]).count()
    out_schema = pa.schema(
        [(group_col, pa.string()), ("q", pa.float64()),
         (value_col, pa.float64())]
    )

    def per_group(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(value_col)
        cum = g["count()"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g[value_col].to_numpy()
        import math

        rows = []
        for q in qs:
            rank = max(1, math.ceil(round(n * q, 9)))  # 1-indexed
            i = int(np.searchsorted(cum, rank))
            rows.append(
                {group_col: str(g[group_col].iloc[0]), "q": float(q),
                 value_col: float(vals[i])}
            )
        return pa.Table.from_pylist(rows, schema=out_schema)

    return bucketed_group_map(counts, [group_col], per_group,
                              num_buckets=num_buckets)


def grouped_distinct_count(ds, group_col: str, value_col: str,
                           num_buckets: int = 16):
    """-> Dataset[(group, n_distinct)] — exact, pair-distinct shuffle."""
    from ray.data.aggregate import Count

    def batch_distinct(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .count()
    )
    return pairs.groupby(group_col).aggregate(Count(alias_name="n_distinct"))


class HyperLogLog:
    """Minimal numpy HLL: add_many / merge / estimate.

    Registers are uint8; the packed bytes form travels through Arrow
    binary columns, merged by elementwise max (associative/commutative).
    """

    def __init__(self, p: int = 12, registers: "np.ndarray | None" = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    def _hashes(self, values) -> "np.ndarray":
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            h = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
            out[i] = int.from_bytes(h, "big")
        return out

    def add_many(self, values) -> None:
        if not len(values):
            return
        h = self._hashes(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        done = np.zeros(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            top = (rest_work & mask) != 0
            newly = top & ~done
            done |= top
            if done.all():
                break
            lz[~done] += 1
            rest_work = rest_work << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(
            self.p, np.maximum(self.registers, other.registers)
        )

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # small-range correction
        return raw

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def grouped_hll_distinct(ds, group_col: str, value_col: str, p: int = 12,
                         num_buckets: int = 16):
    """-> Dataset[(group, n_distinct_est)] — HLL sketch path: shuffle is
    O(groups x 2^p bytes) no matter the value cardinality."""

    def batch_sketches(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas()
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            hll = HyperLogLog(p)
            hll.add_many(sub[value_col].tolist())
            rows.append({group_col: g, "sketch": hll.to_bytes()})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([(group_col, pa.string()), ("sketch", pa.binary())]),
        )

    sketches = ds.map_batches(batch_sketches, batch_format="pyarrow")
    out_schema = pa.schema(
        [(group_col, pa.string()), ("n_distinct_est", pa.int64())]
    )

    def merge_group(group: pd.DataFrame) -> pa.Table:
        hll = HyperLogLog(p)
        for b in group["sketch"]:
            hll = hll.merge(HyperLogLog.from_bytes(b, p))
        return pa.Table.from_pylist(
            [
                {
                    group_col: str(group[group_col].iloc[0]),
                    "n_distinct_est": int(round(hll.estimate())),
                }
            ],
            schema=out_schema,
        )

    return bucketed_group_map(sketches, [group_col], merge_group,
                              num_buckets=num_buckets)
