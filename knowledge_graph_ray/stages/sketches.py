"""Distributed summary statistics: exact grouped quantiles, exact and
sketched (HyperLogLog) distinct counts.

Scale shapes:

* ``grouped_quantiles`` — EXACT quantiles without a global sort: one
  ``groupby(group, value).count()`` (shuffle bounded by DISTINCT
  (group, value) pairs — the combiner), then per-group quantile reads
  off the sorted value histogram.  Right whenever the value space is
  bounded (prices, scores, durations at fixed precision).  For unbounded
  high-cardinality values ``grouped_quantiles_binned`` (or
  ``grouped_quantiles(..., bins=N)``) quantizes first: per-group min/max
  aggregate, then a groups x bins histogram — absolute error <= one bin
  width ``(max-min)/bins`` per group.
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

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.grouping import bucketed_group_map


def grouped_quantiles(ds, group_col: str, value_col: str, qs: list[float],
                      num_buckets: int = 16, bins: int | None = None):
    """-> Dataset[(group, q, value)] — exact ``quantile_disc`` parity:
    the selected element is the ``ceil(n*q)``-th (1-indexed) of the
    sorted values — the classic lower empirical quantile (rule probed
    against DuckDB across fractional boundary cases).

    ``bins=None`` (exact) shuffles one row per DISTINCT (group, value)
    pair — right whenever the value space is bounded (prices, scores,
    durations at fixed precision).  For unbounded high-cardinality
    values pass ``bins=N`` to take ``grouped_quantiles_binned``'s
    quantize-first path instead (shuffle bounded by groups x N; value
    error <= one bin width, see its docstring)."""
    import math

    if bins is not None:
        return grouped_quantiles_binned(ds, group_col, value_col, qs,
                                        bins=bins, num_buckets=num_buckets)

    def disc(vals, cum, n, q):
        rank = max(1, math.ceil(round(n * q, 9)))  # 1-indexed
        return float(vals[int(np.searchsorted(cum, rank))])

    return _grouped_quantile_walk(ds, group_col, value_col, qs, disc,
                                  num_buckets)


def grouped_quantiles_cont(ds, group_col: str, value_col: str,
                           qs: list[float], num_buckets: int = 16):
    """-> Dataset[(group, q, value)] — SQL ``quantile_cont`` /
    PERCENTILE_CONT parity: linear interpolation between the two order
    statistics around rank ``h = (n-1)*q`` of the sorted multiset,
    ``v[floor(h)] + (h - floor(h)) * (v[floor(h)+1] - v[floor(h)])``.

    Same scale shape as grouped_quantiles: the shuffle moves one row
    per DISTINCT (group, value) pair (the value-histogram combiner),
    never data rows; the interpolation walks the cumulative counts so
    duplicate values are weighted exactly like the raw multiset."""
    import math

    def cont(vals, cum, n, q):
        def elem(idx0: int) -> float:
            # idx0-th (0-indexed) element of the sorted multiset
            return float(vals[int(np.searchsorted(cum, idx0 + 1))])

        h = (n - 1) * q
        lo = math.floor(h)
        vlo = elem(lo)
        frac = h - lo
        return vlo if frac == 0.0 else vlo + (elem(lo + 1) - vlo) * frac

    return _grouped_quantile_walk(ds, group_col, value_col, qs, cont,
                                  num_buckets)


def _grouped_quantile_walk(ds, group_col: str, value_col: str,
                           qs: list[float], pick, num_buckets: int):
    """Shared scaffolding of the exact quantile family: NULL values are
    dropped first (SQL quantile_disc/quantile_cont ignore NULLs — a
    NULL landing in the histogram would inflate every rank and can
    surface as NaN), then the (group, value) count combiner, one sorted
    cumsum walk per group, and ``pick(vals, cum, n, q) -> float``
    selects per rank rule.  Groups whose values are ALL null disappear
    (same documented edge as the sufficient-statistics family)."""
    from knowledge_graph_ray.functions.agg import grouped_agg

    def drop_null_values(b: pa.Table) -> pa.Table:
        col = b.column(value_col)
        if col.null_count:
            b = b.filter(col.is_valid())
        return b

    counts = grouped_agg(
        ds.select_columns([group_col, value_col])
          .map_batches(drop_null_values, batch_format="pyarrow"),
        [group_col, value_col],
        [("cnt", None, "count")], num_buckets=num_buckets)
    out_schema = pa.schema(
        [(group_col, pa.string()), ("q", pa.float64()),
         (value_col, pa.float64())]
    )

    def per_group(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(value_col)
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g[value_col].to_numpy()
        rows = [
            {group_col: str(g[group_col].iloc[0]), "q": float(q),
             value_col: pick(vals, cum, n, q)}
            for q in qs
        ]
        return pa.Table.from_pylist(rows, schema=out_schema)

    return bucketed_group_map(counts, [group_col], per_group,
                              num_buckets=num_buckets)


def grouped_quantiles_binned(ds, group_col: str, value_col: str,
                             qs: list[float], bins: int = 8192,
                             num_buckets: int = 16):
    """-> Dataset[(group, q, value)] — quantize-first quantiles for
    UNBOUNDED / high-cardinality value domains (the t-digest-style
    fallback the exact path documents).

    Two passes, both bounded:

    1. per-group min/max via one tiny aggregate (shuffle O(groups)),
       broadcast via ray.put;
    2. per-row bin id ``floor((v - min) / width)`` computed vectorized
       inside map_batches, then the same (group, bin) histogram +
       cumulative-rank read-off as the exact path — shuffle is bounded
       by groups x bins REGARDLESS of value cardinality.

    The reported value is the selected bin's midpoint clamped to
    [min, max]: ABSOLUTE ERROR <= one bin width
    ``(max - min) / bins`` per group (exact when a group is constant).
    Rank semantics match quantile_disc (ceil(n*q), 1-indexed) at bin
    granularity.
    """
    import math

    import ray

    from knowledge_graph_ray.functions.agg import grouped_agg

    ranges = grouped_agg(
        ds, [group_col],
        [("lo", value_col, "min"), ("hi", value_col, "max")],
    ).to_pandas()
    lo_map = dict(zip(ranges[group_col], ranges["lo"].astype("float64")))
    hi_map = dict(zip(ranges[group_col], ranges["hi"].astype("float64")))
    # broadcast once via the object store — the maps are O(groups) and a
    # closure capture would re-ship them with every task submission
    range_ref = ray.put((lo_map, hi_map))

    def to_bins(b: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(range_ref)
        df = b.select([group_col, value_col]).to_pandas()
        lo = df[group_col].map(lo_m).to_numpy(dtype="float64")
        hi = df[group_col].map(hi_m).to_numpy(dtype="float64")
        width = (hi - lo) / bins
        v = df[value_col].to_numpy(dtype="float64")
        with np.errstate(divide="ignore", invalid="ignore"):
            idx = np.floor((v - lo) / width)
        idx = np.where(np.isfinite(idx), idx, 0.0)  # zero-width group
        idx = np.clip(idx, 0, bins - 1).astype("int64")
        return pa.Table.from_pydict(
            {group_col: pa.array(df[group_col], type=pa.string()),
             "__bin": pa.array(idx, type=pa.int64())}
        )

    counts = grouped_agg(
        ds.map_batches(to_bins, batch_format="pyarrow"),
        [group_col, "__bin"], [("cnt", None, "count")],
        num_buckets=num_buckets,
    )
    out_schema = pa.schema(
        [(group_col, pa.string()), ("q", pa.float64()),
         (value_col, pa.float64())]
    )

    def per_group(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("__bin")
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        bin_ids = g["__bin"].to_numpy()
        key = str(g[group_col].iloc[0])
        lo_m, hi_m = ray.get(range_ref)  # node-local cached plasma read
        lo, hi = lo_m[key], hi_m[key]
        width = (hi - lo) / bins
        rows = []
        for q in qs:
            rank = max(1, math.ceil(round(n * q, 9)))  # 1-indexed
            i = int(np.searchsorted(cum, rank))
            mid = lo + (float(bin_ids[i]) + 0.5) * width
            rows.append(
                {group_col: key, "q": float(q),
                 value_col: float(min(max(mid, lo), hi))}
            )
        return pa.Table.from_pylist(rows, schema=out_schema)

    return bucketed_group_map(counts, [group_col], per_group,
                              num_buckets=num_buckets)


def grouped_distinct_count(ds, group_col: str, value_col: str,
                           num_buckets: int = 16):
    """-> Dataset[(group, n_distinct)] — exact, pair-distinct shuffle
    (per-batch dedup combiner, then two partial-aggregate groupbys)."""
    from knowledge_graph_ray.functions.agg import grouped_agg

    def batch_distinct(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = grouped_agg(
        ds.map_batches(batch_distinct, batch_format="pyarrow"),
        [group_col, value_col], [("n", None, "count")],
        num_buckets=num_buckets,
    )
    return grouped_agg(
        pairs, [group_col], [("n_distinct", None, "count")],
        num_buckets=num_buckets,
    )


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
        # vectorized + process-stable: hash_pandas_object is siphash
        # with a FIXED default key (unlike Python's salted str hash).
        # Values are normalized to ONE canonical dtype first so the
        # same logical value cannot land in two registers when it
        # arrives as int64 in one batch and float64 in another —
        # str() would render those "1" vs "1.0" (ADVICE r3).  Numerics
        # canonicalize to float64 (+0.0 folds -0.0; exact for ints up
        # to 2^53 — HLL's use here counts ids/user keys, well inside);
        # everything else hashes its string form.
        s = values if isinstance(values, pd.Series) else pd.Series(list(values))
        if pd.api.types.is_numeric_dtype(s) and not pd.api.types.is_bool_dtype(s):
            s = s.astype("float64") + 0.0
        else:
            s = s.astype(str)
        return pd.util.hash_pandas_object(s, index=False).to_numpy()

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
            hll.add_many(sub[value_col])
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


def quantile_threshold_filter(ds, group_col: str, value_col: str,
                              q: float = 0.9, num_buckets: int = 16,
                              threshold_col: str = "q_threshold"):
    """Keep rows strictly ABOVE their group's q-quantile of ``value_col``
    (per-group outlier / long-tail selection — e.g. the longest 10% of
    documents per language for a curation pass).

    Scale shape: the per-group quantile table is group-cardinality-sized
    (grouped_quantiles' distinct-pair shuffle), pulled once and
    broadcast via ``ray.put``; the filter itself is a stateless
    vectorized ``map_batches`` — no join, no second shuffle.  Rows whose
    group has no quantile (all-null values) are dropped, matching the
    SQL inner-join formulation.
    """
    import ray

    qt = grouped_quantiles(ds, group_col, value_col, [q],
                           num_buckets=num_buckets).to_pandas()
    thresholds = pd.Series(
        qt[value_col].to_numpy(),
        index=qt[group_col].to_numpy(),
    )
    ref = ray.put(thresholds)

    def body(batch: pa.Table) -> pa.Table:
        import numpy as np

        th = ray.get(ref)
        groups = batch.column(group_col).to_pandas()
        t = th.reindex(groups).to_numpy(dtype="float64")
        vals = (
            batch.column(value_col)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        mask = vals > t  # NaN threshold (unknown group) compares False
        out = batch.filter(pa.array(mask))
        return out.append_column(
            threshold_col, pa.array(t[mask], type=pa.float64())
        )

    return ds.map_batches(body, batch_format="pyarrow")


def group_minmax_normalize(ds, group_col: str, value_col: str,
                           out_col: str = "norm", num_buckets: int = 16):
    """Per-group min-max normalization: ``(v - min) / (max - min)`` in
    [0, 1]; constant groups (max == min) normalize to 0.0.

    Scale shape: one partial-aggregate min/max groupby (combiner-
    compressed, group-cardinality output) pulled once and broadcast via
    ``ray.put``; the normalization is a stateless vectorized
    ``map_batches``.  Bit-stability note: with an integer value column
    both operands of the single division are exact, so the result is
    IEEE-identical to a SQL ``(v - mn)::DOUBLE / (mx - mn)`` oracle.
    """
    import ray

    from knowledge_graph_ray.functions.agg import grouped_agg

    stats = grouped_agg(
        ds.select_columns([group_col, value_col]), [group_col],
        [("mn", value_col, "min"), ("mx", value_col, "max")],
        num_buckets=num_buckets,
    ).to_pandas()
    mins = pd.Series(stats["mn"].to_numpy(),
                     index=stats[group_col].to_numpy())
    maxs = pd.Series(stats["mx"].to_numpy(),
                     index=stats[group_col].to_numpy())
    ref = ray.put((mins, maxs))

    def body(batch: pa.Table) -> pa.Table:
        import numpy as np

        mn_s, mx_s = ray.get(ref)
        groups = batch.column(group_col).to_pandas()
        mn = mn_s.reindex(groups).to_numpy(dtype="float64")
        span = mx_s.reindex(groups).to_numpy(dtype="float64") - mn
        vals = (
            batch.column(value_col)
            .cast(pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        norm = np.where(span > 0, (vals - mn) / np.where(span > 0, span, 1.0),
                        0.0)
        return batch.append_column(out_col,
                                   pa.array(norm, type=pa.float64()))

    return ds.map_batches(body, batch_format="pyarrow")


def frequent_items(ds, cols: list[str], min_share: float,
                   candidate_cap: int = 1_000_000,
                   num_buckets: int = 16):
    """EXACT heavy hitters: every ``cols`` combination whose row share
    exceeds ``min_share``, with its exact count — at sketch cost.

    Phase 1 (candidates): each batch emits the value combinations whose
    share WITHIN THAT BATCH exceeds ``min_share`` — at most
    floor(1/min_share) rows per batch on the wire.  Global share is a
    weighted average of batch shares, so an item above the threshold
    globally must be above it in >= 1 batch: the union is a guaranteed
    candidate SUPERSET (the pigeonhole that makes Misra-Gries work),
    with no per-row state.

    Phase 2 (exact verify): the distinct candidate set (driver-bounded;
    raises above ``candidate_cap`` — a cap hit means min_share is too
    small to be a heavy-hitter query) broadcasts via ``ray.put``; one
    stateless filtered-count pass recounts ONLY candidate rows exactly
    and keeps those above min_share x total.  Output = exactly SQL
    ``GROUP BY cols HAVING count(*) > min_share * total`` — false
    positives are recount-filtered, false negatives are impossible.
    """
    assert 0 < min_share < 1
    import ray

    from knowledge_graph_ray.functions.agg import grouped_agg

    # projected to the key columns only (a sliver of the table), then
    # materialized ONCE so the candidate pass, the count, and the exact
    # recount share one execution of any upstream compute — the pin is
    # |cols|-width, object-store-spillable, not the full table
    ds = ds.select_columns(cols).materialize()
    total = ds.count()

    def batch_candidates(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        counts = b.group_by(cols).aggregate([([], "count_all")])
        import pyarrow.compute as pc

        keep = pc.greater(counts.column("count_all"),
                          pa.scalar(min_share * len(b)))
        return counts.filter(keep).select(cols)

    def fold_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(cols).aggregate([]).select(cols) if len(b) else b

    # tree-fold distinct (each fold task dedupes an 8192-ROW window of
    # candidate rows — several hundred batches' worth at typical
    # min_share) instead of a full bucket shuffle: the driver pull is
    # then ~ (total candidate rows / 8192) x (1/min_share) rows, and
    # no shuffle round is paid.  limit() bounds the pull itself.
    cand = ds.map_batches(
        batch_candidates, batch_format="pyarrow"
    ).map_batches(fold_distinct, batch_size=8192, batch_format="pyarrow")
    pulled = cand.limit(candidate_cap + 1).to_pandas()
    # the PRE-dedup pull hitting the bound means candidate rows were
    # truncated — proceeding would silently drop heavy hitters (the
    # guarantee is no false negatives), so fail loudly on the bound
    # itself, not only on the distinct count
    if len(pulled) > candidate_cap:
        raise ValueError(
            f"frequent_items: candidate row pull hit the "
            f"{candidate_cap}-row bound (duplicate-heavy stream or too "
            f"many distinct candidates); min_share={min_share} is too "
            "small for a heavy-hitter query, or raise candidate_cap"
        )
    cdf = pulled.drop_duplicates()
    if len(cdf) == 0 or total == 0:
        out = cdf.head(0).copy()
        out["n"] = pd.Series([], dtype="int64")
        import ray.data as rd

        return rd.from_pandas(out)
    cand_idx = pd.MultiIndex.from_frame(cdf[cols])
    ref = ray.put(cand_idx)

    def keep_candidates(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        idx = ray.get(ref)
        mask = pd.MultiIndex.from_frame(b.select(cols).to_pandas()).isin(idx)
        return b.filter(pa.array(mask))

    counted = grouped_agg(
        ds.map_batches(keep_candidates, batch_format="pyarrow"),
        cols, [("n", None, "count")], num_buckets=num_buckets,
    )

    def above(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater(b.column("n"),
                                   pa.scalar(min_share * total)))

    return counted.map_batches(above, batch_format="pyarrow")


def grouped_weighted_quantile(ds, group_col: str, value_col: str,
                              weight_col: str, q_num: int = 1,
                              q_den: int = 2, num_buckets: int = 16):
    """-> Dataset[(group, value)] — the lower weighted quantile: the
    smallest value whose cumulative weight reaches q_num/q_den of the
    group's total weight (q=1/2 is the weighted median used for
    importance-weighted corpus statistics).

    Same scale shape as grouped_quantiles, with the count combiner
    replaced by a weight-sum combiner: the shuffle moves one row per
    DISTINCT (group, value) pair carrying its exact int64 weight sum.
    The rank rule compares ``cumw * q_den >= q_num * totw`` in exact
    integer arithmetic — no float boundary can flip the pick, so a SQL
    oracle writing the same comparison matches exactly.  Weights must
    be non-negative int64 (scale upstream); NULL values are dropped
    like SQL quantiles; all-null groups disappear.
    """
    from knowledge_graph_ray.functions.agg import grouped_agg
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map

    def drop_null(b: pa.Table) -> pa.Table:
        col = b.column(value_col)
        if col.null_count:
            b = b.filter(col.is_valid())
        return b

    sums = grouped_agg(
        ds.select_columns([group_col, value_col, weight_col])
          .map_batches(drop_null, batch_format="pyarrow"),
        [group_col, value_col],
        [("w", weight_col, "sum")], num_buckets=num_buckets)

    def per_group(bucket: pd.DataFrame) -> pa.Table:
        rows = []
        for g, grp in bucket.groupby(group_col, sort=False):
            grp = grp.sort_values(value_col, kind="stable")
            w = grp["w"].to_numpy(dtype=np.int64)
            cum = np.cumsum(w)
            tot = int(cum[-1])
            idx = int(np.searchsorted(cum * q_den, q_num * tot,
                                      side="left"))
            rows.append((g, float(grp[value_col].to_numpy()[idx])))
        return pa.table({
            group_col: pa.array([r[0] for r in rows], type=pa.string()),
            value_col: pa.array([r[1] for r in rows], type=pa.float64()),
        })

    return bucketed_bucket_map(
        sums, [group_col], per_group, num_buckets=num_buckets,
        empty_schema=pa.schema([(group_col, pa.string()),
                                (value_col, pa.float64())]),
    )


def grouped_kmv_quantiles(ds, group_col: str, id_col: str, value_col: str,
                          qs: list[float], k: int = 4096):
    """Discrete quantile ESTIMATES from a bottom-k (KMV) uniform sample
    per group — the mergeable quantile sketch for value spaces too wide
    for the exact histogram walk.

    Sketch property: hashing the row id uniformly orders the group's
    rows; the k smallest hashes are a uniform k-sample, and each block's
    k smallest are a superset of its contribution to the global k
    smallest — so per-batch partials of at most k rows per group merge
    exactly (union -> k smallest).  Sample-quantile rank error is
    ~sqrt(q(1-q)/k) (0.8% at k=4096, q=0.5); groups with <= k rows are
    sampled completely and estimate exactly.

    Scale shape: shuffle bounded by k rows per (group, block) partial;
    the per-group body sees at most blocks x k rows.  Hash is
    process-stable siphash (``pd.util.hash_pandas_object``), the same
    determinism contract as the HLL path above."""
    cols = [group_col, id_col, value_col]

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(cols).to_pandas().dropna(subset=[value_col])
        h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
        out = pd.DataFrame({group_col: df[group_col].to_numpy(),
                            "_h": h,
                            value_col: df[value_col].to_numpy()})
        out = (out.sort_values([group_col, "_h"], kind="stable")
                  .groupby(group_col, sort=False).head(k))
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def per_group(g: pd.DataFrame) -> pa.Table:
        if len(g) > k:
            g = g.nsmallest(k, "_h")
        vals = np.sort(g[value_col].to_numpy())
        m = len(vals)
        idxs = [max(int(np.ceil(q * m)) - 1, 0) for q in qs]
        return pa.Table.from_pydict({
            group_col: pa.array([g[group_col].iloc[0]] * len(qs)),
            "q": pa.array(qs, type=pa.float64()),
            "est": pa.array([float(vals[i]) for i in idxs],
                            type=pa.float64()),
        })

    return partials.groupby(group_col).map_groups(
        per_group, batch_format="pandas"
    )


def exact_kth_value(ds, value_col: str, k: int,
                    sample_k: int = 8192,
                    bracket_cap: int = 2_000_000) -> int:
    """EXACT k-th smallest (1-indexed) of an UNBOUNDED-cardinality
    integer column — the distributed selection that replaces the
    value-histogram quantile walk when the distinct-value space is too
    wide to shuffle (mostly-unique prices at 100TB).

    Iterative sample-guided narrowing: each round draws a bottom-k
    (KMV) uniform sample of the current value range, brackets the
    target rank with a +-5-sigma rank margin, then one exact combiner
    pass counts below/inside the bracket (nothing is collected yet).
    The rank verdict either selects (bracket small enough to pull,
    <= bracket_cap rows), narrows the bounds to the side holding the
    rank, or — under pathological duplication — collapses the bounds
    to a single value and returns it.  Never wrong: every decision is
    validated by exact counts; the sample only steers.

    Passes per round: 1 sample + 1 count (+1 final collect); rounds
    are O(log) with geometric range shrink — no global sort, no wide
    shuffle, driver pull bounded by bracket_cap."""
    import pyarrow.compute as pc

    def in_range_view(blo: int, bhi: int):
        def body(b: pa.Table) -> pa.Table:
            v = b.column(value_col)
            keep = pc.and_(pc.greater_equal(v, pa.scalar(blo)),
                           pc.less_equal(v, pa.scalar(bhi)))
            return pa.table({"v": v.filter(keep)})

        return ds.map_batches(body, batch_format="pyarrow")

    def kmv_sample(view) -> np.ndarray:
        def partial(b: pa.Table) -> pa.Table:
            vals = b.column("v").to_pandas().dropna()
            # stable per-value siphash salted by an in-block counter so
            # duplicates spread across slots; residual cross-block
            # collisions only bias the SAMPLE — every decision below is
            # validated by exact counts
            h = pd.util.hash_pandas_object(vals.reset_index(drop=True),
                                           index=False).to_numpy()
            salt = np.arange(len(vals), dtype=np.uint64)
            h = h ^ (salt * np.uint64(0x9E3779B97F4A7C15))
            out = pd.DataFrame({"_h": h, "v": vals.to_numpy()})
            out = out.nsmallest(min(sample_k, len(out)), "_h")
            return pa.Table.from_pandas(out, preserve_index=False)

        samp = view.map_batches(partial, batch_format="pyarrow").to_pandas()
        samp = samp.nsmallest(min(sample_k, len(samp)), "_h")
        return np.sort(samp["v"].to_numpy())

    def count_below_in(view, a_lo: int, a_hi: int) -> tuple[int, int]:
        def body(b: pa.Table) -> pa.Table:
            v = b.column("v")
            below = pc.sum(pc.less(v, pa.scalar(a_lo))).as_py() or 0
            inb = pc.sum(pc.and_(pc.greater_equal(v, pa.scalar(a_lo)),
                                 pc.less_equal(v, pa.scalar(a_hi)))
                         ).as_py() or 0
            return pa.table({"below": pa.array([below], type=pa.int64()),
                             "inb": pa.array([inb], type=pa.int64())})

        parts = view.map_batches(body, batch_format="pyarrow").to_pandas()
        return int(parts["below"].sum()), int(parts["inb"].sum())

    def collect(view, a_lo: int, a_hi: int) -> np.ndarray:
        def body(b: pa.Table) -> pa.Table:
            v = b.column("v")
            keep = pc.and_(pc.greater_equal(v, pa.scalar(a_lo)),
                           pc.less_equal(v, pa.scalar(a_hi)))
            return pa.table({"v": v.filter(keep)})

        return view.map_batches(
            body, batch_format="pyarrow").to_pandas()["v"].to_numpy()

    n = ds.count()
    assert 1 <= k <= n, (k, n)
    blo, bhi = -(1 << 62), 1 << 62
    k_rem, n_range = k, n
    while True:
        view = in_range_view(blo, bhi)
        if n_range <= bracket_cap:
            vals = collect(view, blo, bhi)
            return int(np.partition(vals, k_rem - 1)[k_rem - 1])
        svals = kmv_sample(view)
        m = len(svals)
        p = k_rem / n_range
        sigma = np.sqrt(max(p * (1 - p), 1e-12) / m)
        margin = 5 * sigma
        lo_i = max(int(np.floor((p - margin) * m)) - 1, 0)
        hi_i = min(int(np.ceil((p + margin) * m)), m - 1)
        a_lo, a_hi = int(svals[lo_i]), int(svals[hi_i])
        if lo_i == 0:
            a_lo = blo  # rank can sit below the smallest sampled value
        if hi_i == m - 1:
            a_hi = bhi
        c_lo, c_in = count_below_in(view, a_lo, a_hi)
        if k_rem - 1 < c_lo:
            bhi, n_range = a_lo - 1, c_lo
        elif k_rem - 1 >= c_lo + c_in:
            blo = a_hi + 1
            k_rem -= c_lo + c_in
            n_range -= c_lo + c_in
        elif c_in <= bracket_cap:
            vals = collect(view, a_lo, a_hi)
            return int(np.partition(vals, k_rem - 1 - c_lo)[
                k_rem - 1 - c_lo])
        elif a_lo == a_hi:
            return a_lo  # duplication plateau: the k-th IS this value
        else:
            blo, bhi = a_lo, a_hi
            k_rem -= c_lo
            n_range = c_in


class CountMinSketch:
    """Numpy count-min sketch (Cormode & Muthukrishnan 2005, public
    literature): d seeded universal-hash rows of width w; add/merge/
    point-query.  Never underestimates; overestimates by at most
    (e/w) * N with high probability over the (fixed, seeded) hashes.
    The d x w int64 table travels through Arrow binary columns and
    merges by elementwise sum (associative/commutative) — the same
    mergeable-bytes discipline as HyperLogLog above."""

    P = (1 << 61) - 1

    def __init__(self, d: int = 4, w: int = 2048, seed: int = 6969,
                 table: "np.ndarray | None" = None):
        rng = np.random.RandomState(seed)
        self.d, self.w, self.seed = d, w, seed
        # a < 2^30 x 32-bit base hash keeps a*x + b inside int64 (the
        # MinHasher bound); 32 base bits are ample for w <= 2^20
        self.a = rng.randint(1, 1 << 30, size=d).astype(np.int64)
        self.b = rng.randint(0, 1 << 61, size=d).astype(np.int64)
        self.table = (table if table is not None
                      else np.zeros((d, w), dtype=np.int64))

    def _rows(self, values) -> "np.ndarray":
        s = values if isinstance(values, pd.Series) else pd.Series(list(values))
        if pd.api.types.is_numeric_dtype(s) and not pd.api.types.is_bool_dtype(s):
            s = s.astype("float64") + 0.0  # canonical dtype (HLL note)
        else:
            s = s.astype(str)
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        x = (h >> np.uint64(32)).astype(np.int64)
        return ((self.a[:, None] * x[None, :] + self.b[:, None])
                % self.P) % self.w

    def add_many(self, values) -> None:
        if not len(values):
            return
        idx = self._rows(values)
        for i in range(self.d):
            np.add.at(self.table[i], idx[i], 1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        return CountMinSketch(self.d, self.w, self.seed,
                              self.table + other.table)

    def query_many(self, values) -> "np.ndarray":
        if not len(values):
            return np.zeros(0, dtype=np.int64)
        idx = self._rows(values)
        ests = np.stack([self.table[i][idx[i]] for i in range(self.d)])
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, d: int = 4, w: int = 2048,
                   seed: int = 6969) -> "CountMinSketch":
        return cls(d, w, seed,
                   np.frombuffer(buf, dtype=np.int64).reshape(d, w).copy())


def cms_sketch(ds, value_col: str, d: int = 4, w: int = 2048,
               seed: int = 6969, num_buckets: int = 16) -> CountMinSketch:
    """Build one merged count-min sketch over a column: per-batch
    partial sketches (one d x w table per block) tree-fold through a
    salted groupby so the driver merges ``num_buckets`` tables, not one
    per block — at 10^12 rows the driver pull stays ~num_buckets x 64 KB
    while the per-block partials merge in parallel."""
    import zlib as _z

    def batch_sketch(b: pa.Table) -> pa.Table:
        cms = CountMinSketch(d, w, seed)
        cms.add_many(b.column(value_col).to_pandas())
        buf = cms.to_bytes()
        return pa.table({
            "salt": pa.array([_z.crc32(buf) % num_buckets], type=pa.int64()),
            "sketch": pa.array([buf], type=pa.binary()),
        })

    partials = ds.map_batches(batch_sketch, batch_format="pyarrow")

    merged_schema = pa.schema([("sketch", pa.binary())])

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        acc = CountMinSketch(d, w, seed)
        for buf in group["sketch"]:
            acc = acc.merge(CountMinSketch.from_bytes(buf, d, w, seed))
        return pa.table({"sketch": pa.array([acc.to_bytes()],
                                            type=pa.binary())})

    folded = bucketed_group_map(partials, ["salt"], merge_bucket,
                                num_buckets=num_buckets,
                                empty_schema=merged_schema)
    out = CountMinSketch(d, w, seed)
    fdf = folded.to_pandas()
    if "sketch" not in fdf.columns:  # empty input: zero sketch
        return out
    for buf in fdf["sketch"]:
        out = out.merge(CountMinSketch.from_bytes(buf, d, w, seed))
    return out
