"""Deterministic sampling / splitting for training-data pipelines.

Beyond-reference operators (SURVEY §2.11 family): a 100-TB corpus needs
reproducible train/val/test splits and per-group subsamples that any
worker — or an auditing SQL engine — can recompute from the row alone,
with no RNG state and no shuffle.

The hash is Knuth's multiplicative scheme over the low 32 bits of the
integer key, ``h = ((key mod 2^32) * 2654435761 + seed) mod 2^32`` —
chosen because it is exactly expressible in both vectorized numpy
(uint64 arithmetic, no wraparound: max intermediate < 2^64) and ANSI
SQL (HUGEINT arithmetic), so every split/sample below carries a full
DuckDB oracle.  For sequential keys the lattice structure makes split
sizes *more* even than iid-random — fine for splits/samples; a
production pipeline with adversarial keys would swap in any u64 hash
behind the same API (the SQL-parity constraint picks this form here).

Scale shapes:
* ``hash_split``     — stateless ``map_batches``; no shuffle at all.
* ``grouped_sample`` — rank-by-hash routed through
  ``functions/grouping.grouped_topk``: the per-batch local top-n
  combiner bounds the shuffle to <= n rows per (group, batch), so hot
  groups never ship their full membership.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH_A = 2654435761  # 2^32 / phi, Knuth multiplicative hashing
_M32 = np.uint64(1) << np.uint64(32)


def hash_u32(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized ``((key mod 2^32) * A + seed) mod 2^32`` as uint64.

    Negative int64 keys wrap modulo 2^64 first (numpy uint cast), so
    ``k mod 2^32`` equals the NON-NEGATIVE residue — the SQL oracles
    use the sign-safe ``((x % 2^32) + 2^32) % 2^32`` form to match
    (DuckDB's ``%`` follows the sign of the dividend)."""
    k = keys.astype(np.uint64) % _M32
    return (k * np.uint64(KNUTH_A) + np.uint64(seed)) % _M32


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper hash bound) pairs, cumulative over 2^32."""
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    out, cum = [], 0.0
    for label, frac in fractions.items():
        cum += frac
        out.append((label, int(round(cum * float(_M32)))))
    out[-1] = (out[-1][0], int(_M32))  # close rounding gap at the top
    return out


def hash_split(ds, key_col: str, fractions: dict[str, float],
               seed: int = 0, column: str = "split"):
    """Append a deterministic split label (e.g. train/val/test) per row.

    The label depends only on ``key_col`` and ``seed`` — rows keep their
    split across re-runs, repartitions, and incremental appends (the
    property that matters for a growing 100-TB corpus: yesterday's val
    docs never leak into today's train set).
    """
    bounds = split_thresholds(fractions)
    labels = [label for label, _ in bounds]
    uppers = np.array([u for _, u in bounds], dtype=np.uint64)

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = hash_u32(keys, seed)
        idx = np.searchsorted(uppers, h, side="right")
        arr = pa.DictionaryArray.from_arrays(
            pa.array(idx.astype("int32")), pa.array(labels)
        ).cast(pa.string())
        return batch.append_column(column, arr)

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_sample(ds, group_cols: list[str], key_col: str, n: int,
                   seed: int = 0, num_buckets: int = 64,
                   driver_threshold: int | None = None,
                   size_hint: int | None = None):
    """Deterministic uniform sample of ``n`` rows per group: rank rows by
    ``hash_u32(key, seed)`` ascending (ties by key) and keep the first n.

    Equivalent to seeded sampling without replacement, but recomputable
    row-locally — and oracle-checkable via ``row_number() OVER
    (PARTITION BY group ORDER BY hash, key)``.  Adds the rank as ``rk``.
    """
    from knowledge_graph_ray.functions.grouping import grouped_topk

    rank_col = "__sample_h"

    def add_hash(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = hash_u32(keys, seed).astype("int64")
        return batch.append_column(rank_col, pa.array(h, type=pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    top = grouped_topk(hashed, group_cols, rank_col, n,
                       descending=False, tie_cols=[key_col],
                       num_buckets=num_buckets,
                       driver_threshold=driver_threshold,
                       size_hint=size_hint)
    return top.drop_columns([rank_col])


def weighted_repeat(ds, weight_col: str, key_col: str, seed: int = 0,
                    copy_col: str = "copy_idx"):
    """Deterministic mixture upsampling: emit each row ``floor(w)``
    times plus one extra copy iff ``hash(key) < frac(w) * 2^32`` — the
    hash plays the Bernoulli draw, so expected multiplicity is exactly
    the weight yet every worker (and the SQL oracle) recomputes the
    same copies row-locally.  Rows with resolved count 0 are dropped.

    Adds ``copy_col`` (0..n_copies-1) so downstream shuffles can tell
    copies apart.  Stateless ``map_batches``; no shuffle — the standard
    domain-reweighting step before sequence packing.
    """

    def expand(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # np.concatenate(([0], cumsum[:-1])) has shape (1,) for an
            # empty batch and np.repeat then raises — and upstream
            # filters (hash_split, drop_contaminated) routinely empty a
            # whole block
            return batch.append_column(
                copy_col, pa.array([], type=pa.int64())
            )
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        base = np.floor(w)
        frac = w - base
        h = hash_u32(batch.column(key_col).to_numpy(zero_copy_only=False),
                     seed)
        extra = h < np.floor(frac * float(_M32)).astype(np.uint64)
        n_copies = base.astype(np.int64) + extra.astype(np.int64)
        idx = np.repeat(np.arange(len(batch)), n_copies)
        out = batch.take(pa.array(idx))
        # per-source-row 0..n-1 counter, vectorized
        starts = np.concatenate(([0], np.cumsum(n_copies)[:-1]))
        copy_idx = np.arange(len(idx)) - np.repeat(starts, n_copies)
        return out.append_column(copy_col,
                                 pa.array(copy_idx, type=pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def weighted_sample_per_group(ds, group_cols: list[str], key_col: str,
                              weight_col: str, n: int, seed: int = 0,
                              num_buckets: int = 64,
                              driver_threshold: int | None = None,
                              size_hint: int | None = None):
    """Deterministic weighted sample WITHOUT replacement of ``n`` rows
    per group (Efraimidis-Spirakis exponential races): each row gets a
    priority ``-ln(u) / w`` from its hash-derived uniform
    ``u = (hash_u32(key, seed) + 0.5) / 2^32`` and the n SMALLEST
    priorities per group win — inclusion probability proportional to
    ``weight_col`` at each draw, yet fully recomputable row-locally
    (zero extra shuffle beyond the top-n combiner) and SQL-mirrorable:
    ``row_number() OVER (PARTITION BY g ORDER BY -ln(u)/w, key) <= n``.

    Rows with weight <= 0 or NULL never win (priority +inf here; the
    SQL mirror CASE-guards the priority to NULL, which sorts last with
    the same key tiebreak — an unguarded ``-ln(u)/w`` would let a
    NEGATIVE weight sort first and win).  Ties (measure zero for
    continuous weights) break by ``key_col``.
    """
    from knowledge_graph_ray.functions.grouping import grouped_topk

    pri_col = "__es_priority"

    def add_priority(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        u = (hash_u32(keys, seed).astype(np.float64) + 0.5) / float(_M32)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = -np.log(u) / w
        pri = np.where(np.isfinite(pri) & (w > 0), pri, np.inf)
        return batch.append_column(pri_col, pa.array(pri,
                                                     type=pa.float64()))

    prioritized = ds.map_batches(add_priority, batch_format="pyarrow")
    top = grouped_topk(prioritized, group_cols, pri_col, n,
                       descending=False, tie_cols=[key_col],
                       num_buckets=num_buckets,
                       driver_threshold=driver_threshold,
                       size_hint=size_hint)
    return top.drop_columns([pri_col])


def stratified_take_fraction(ds, group_cols: list[str], key_col: str,
                             fraction: float, seed: int = 0,
                             num_buckets: int = 64,
                             driver_threshold: int | None = None,
                             size_hint: int | None = None):
    """EXACT stratified split: the first ``floor(fraction * n_g)`` rows
    of each group in hash order — every stratum contributes exactly its
    proportional share (a global hash-Bernoulli split only matches in
    expectation; small strata can be wiped out by variance).

    One shuffle on the group; per bucket a vectorized hash-rank +
    group-size transform, filter ``rk <= floor(f * n_g)``.  Hash order
    makes the selection deterministic, row-local to recompute, and
    SQL-mirrorable: ``row_number() OVER (PARTITION BY g ORDER BY hash,
    key) <= floor(f * count(*) OVER (PARTITION BY g))``.

    FLOAT-FLOOR PARITY: the cutoff is ``np.floor(float64(f) * n)`` —
    a SQL mirror must CAST the fraction to DOUBLE (DuckDB's exact
    DECIMAL arithmetic floors 0.7*90 to 63 where float64 gives 62).
    """
    assert 0 < fraction < 1
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map

    rank_col = "__sf_h"

    def add_hash(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = hash_u32(keys, seed).astype("int64")
        return batch.append_column(rank_col, pa.array(h, type=pa.int64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(group_cols + [rank_col, key_col], kind="stable")
        gb = g.groupby(group_cols, sort=False, dropna=False)
        rk = gb.cumcount().to_numpy() + 1
        n = gb[key_col].transform("size").to_numpy()
        keep = rk <= np.floor(fraction * n).astype("int64")
        out = g.loc[keep].drop(columns=[rank_col])
        return pa.Table.from_pandas(out, preserve_index=False)

    return bucketed_bucket_map(
        hashed, group_cols, bucket_body, num_buckets=num_buckets,
        driver_threshold=driver_threshold, size_hint=size_hint,
    )


def kfold_assign(ds, key_col: str, k: int, seed: int = 0,
                 fold_col: str = "fold"):
    """Deterministic k-fold assignment: ``fold = hash_u32(key) % k`` —
    stateless, zero-shuffle, recomputable row-locally (the cross-
    validation counterpart of ``hash_split``), SQL-mirrorable with the
    same Knuth-hash expression."""
    assert k >= 2

    def body(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        fold = (hash_u32(keys, seed) % np.uint64(k)).astype("int64")
        return batch.append_column(fold_col,
                                   pa.array(fold, type=pa.int64()))

    return ds.map_batches(body, batch_format="pyarrow")
