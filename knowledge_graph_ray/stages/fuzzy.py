"""Blocked fuzzy string-similarity self-join (character-set Jaccard).

The classic fuzzy-dedup primitive the reference lacks: find pairs of
near-identical names/titles inside blocking groups.  The similarity is
CHARACTER-SET Jaccard (|chars(a) ∩ chars(b)| / |chars(a) ∪ chars(b)|,
case-sensitive, duplicates ignored) — exactly DuckDB's ``jaccard()``,
which makes the operator SQL-oracle-able, and a useful cheap pre-metric
before an expensive edit-distance verify.

Scale shape: ONE shuffle on the blocking key
(functions/grouping.bucketed_bucket_map); inside each bucket every
block builds a (rows x 256) byte-presence bit matrix VECTORIZED (no
per-string Python loop: one np.add.at over the concatenated bytes) and
gets pairwise intersections from a single int matmul — O(n·256 + n²)
per block with SIMD, never a per-pair Python DP.  Blocks are the unit
of quadratic cost; ``max_block_rows`` bounds MEMORY, not coverage: a
block above it is automatically secondary-blocked — the id-sorted block
is cut into chunks of <= max_block_rows and every chunk pair (i <= j)
runs the same matmul, so the emitted pair set is EXACTLY the
single-matrix result (within-chunk triu + cross-chunk full rectangles
partition the positional upper triangle) while peak memory stays at one
max_block_rows² tile.  A hot blocking key therefore degrades to more
compute instead of aborting a long run; total work is still quadratic
in the hot-block size — that is inherent to exact all-pairs, pick a
finer blocking key when the quadratic cost itself is the problem.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.grouping import bucketed_bucket_map


def _presence_matrix(names: "pd.Series") -> np.ndarray:
    """(n, 256) uint8 byte-presence matrix, vectorized across strings."""
    encoded = names.fillna("").astype(str).str.encode("utf-8")
    lengths = encoded.str.len().to_numpy()
    n = len(encoded)
    m = np.zeros((n, 256), dtype=np.uint8)
    if lengths.sum() == 0:
        return m
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    rows = np.repeat(np.arange(n), lengths)
    m[rows, flat] = 1
    return m


def _sim_matrix(m_a: np.ndarray, sizes_a: np.ndarray,
                m_b: np.ndarray, sizes_b: np.ndarray) -> np.ndarray:
    inter = (m_a.astype(np.float32) @ m_b.astype(np.float32).T).astype(
        np.int32
    )
    union = sizes_a[:, None] + sizes_b[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        return inter.astype(np.float64) / union


def char_jaccard_pairs(ds, id_col: str, text_col: str,
                       block_cols: list[str], threshold: float,
                       max_block_rows: int = 50_000,
                       num_buckets: int = 32,
                       driver_threshold: "int | None" = None,
                       size_hint: "int | None" = None):
    """All pairs (id_a < id_b) within each block whose character-set
    Jaccard >= threshold.  Output: block_cols + id_a, id_b, sim.

    ``sim`` is an int/int IEEE division (intersection / union of byte
    sets), bit-identical to DuckDB ``jaccard()`` on both engines.
    """

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        frames: list[pd.DataFrame] = []
        for _key_vals, blk in g.groupby(block_cols, sort=False, dropna=False):
            n = len(blk)
            if n < 2:
                continue
            blk = blk.sort_values(id_col, kind="stable")
            ids = blk[id_col].to_numpy()
            # secondary blocking: id-sorted chunks of <= max_block_rows;
            # chunk pairs (i <= j) tile the positional upper triangle
            # exactly, bounding peak memory at one max_block_rows² tile
            nchunks = -(-n // max_block_rows)
            for ci in range(nchunks):
                a_lo, a_hi = ci * max_block_rows, min((ci + 1) * max_block_rows, n)
                blk_a = blk.iloc[a_lo:a_hi]
                m_a = _presence_matrix(blk_a[text_col])
                sizes_a = m_a.sum(axis=1).astype(np.int32)
                for cj in range(ci, nchunks):
                    if cj == ci:
                        sim = _sim_matrix(m_a, sizes_a, m_a, sizes_a)
                        ia, ib = np.triu_indices(a_hi - a_lo, k=1)
                        hit = sim[ia, ib] >= threshold
                        ia, ib = ia[hit], ib[hit]
                        b_lo = a_lo
                    else:
                        b_lo = cj * max_block_rows
                        b_hi = min(b_lo + max_block_rows, n)
                        blk_b = blk.iloc[b_lo:b_hi]
                        m_b = _presence_matrix(blk_b[text_col])
                        sizes_b = m_b.sum(axis=1).astype(np.int32)
                        sim = _sim_matrix(m_a, sizes_a, m_b, sizes_b)
                        ia, ib = np.nonzero(sim >= threshold)
                    if not len(ia):
                        continue
                    # block-key columns ride along via a positional take so
                    # their dtypes survive (no Python-list round trip)
                    frame = blk_a.iloc[ia][block_cols].reset_index(drop=True)
                    frame["id_a"] = ids[a_lo + ia]
                    frame["id_b"] = ids[b_lo + ib]
                    frame["sim"] = sim[ia, ib]
                    frames.append(frame)
        if not frames:
            empty = g.head(0)[block_cols].copy()
            empty["id_a"] = g[id_col].head(0)
            empty["id_b"] = g[id_col].head(0)
            empty["sim"] = pd.Series([], dtype="float64")
            return pa.Table.from_pandas(empty, preserve_index=False)
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                    preserve_index=False)

    needed = list(dict.fromkeys(block_cols + [id_col, text_col]))
    return bucketed_bucket_map(
        ds.select_columns(needed), block_cols, bucket_body,
        num_buckets=num_buckets, driver_threshold=driver_threshold,
        size_hint=size_hint, pre_partition=num_buckets,
    )


def hamming1_pairs(ds, text_col: str):
    """Same-length single-substitution pairs via the SymSpell/FastSS
    positional-deletion join: each string emits one (variant, pos) row
    per deleted position; two strings share a (variant, pos) key iff
    they are identical EXCEPT at that position — so the join IS the
    exact hamming-1 verdict, no post-verification DP needed.

    -> Dataset[(diff_pos, n_pairs)]: pair counts by the 1-based
    position of the differing character.

    Scale shape: candidate generation is a stateless vectorized
    explode (length x rows variant rows, each shorter than the
    input); ONE shuffle on the variant hash; group sizes are bounded
    by the alphabet (all members differ only at one fixed position),
    so the within-group pair product cannot blow up the way a naive
    length/prefix block can."""
    import pyarrow.compute as pc

    def variants(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas()
        lens = s.str.len()
        max_len = int(lens.max()) if len(s) else 0
        outs = []
        for p in range(1, max_len + 1):
            m = lens >= p
            sub = s[m]
            outs.append(pd.DataFrame({
                "var": sub.str.slice(0, p - 1) + sub.str.slice(p),
                "p": np.full(m.sum(), p, dtype=np.int64),
                "name": sub,
            }))
        if not outs:
            return pa.table({"var": pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "name": pa.array([], type=pa.string())})
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    exploded = ds.map_batches(variants, batch_format="pyarrow")

    def pair_body(bucket: pd.DataFrame) -> pa.Table:
        df = bucket[["var", "p", "name"]]
        m = df.merge(df, on=["var", "p"])
        m = m[m["name_x"] < m["name_y"]]
        counts = m.groupby("p", sort=False).size()
        return pa.Table.from_pydict({
            "diff_pos": pa.array(counts.index.to_numpy(np.int64)),
            "n_partial": pa.array(counts.to_numpy(np.int64)),
        })

    partials = bucketed_bucket_map(
        exploded, ["var", "p"], pair_body,
        empty_schema=pa.schema([("diff_pos", pa.int64()),
                                ("n_partial", pa.int64())]),
    )
    from knowledge_graph_ray.functions.agg import grouped_agg

    return grouped_agg(partials, ["diff_pos"],
                       [("n_pairs", "n_partial", "sum")])


def _ed1_class_mask(a_list, b_list):
    """Boolean mask: levenshtein(a[i], b[i]) <= 1 for paired string
    lists — vectorized within (len_a, len_b) classes via fixed-width
    UCS4 char matrices (no per-pair DP; the <=1 check decomposes into
    one elementwise compare for equal lengths and two shifted compares
    for a length-1 gap)."""
    n = len(a_list)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    la = np.fromiter((len(x) for x in a_list), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b_list), dtype=np.int64, count=n)
    # orient so s(horter) <= t(aller); equal lengths keep order
    swap = la > lb
    ls = np.where(swap, lb, la)
    lt = np.where(swap, la, lb)
    valid = (lt - ls) <= 1
    comb = ls * 100_000 + lt
    for key in np.unique(comb[valid]):
        idx = np.flatnonzero((comb == key) & valid)
        m = int(ls[idx[0]])
        L = int(lt[idx[0]])
        if m == 0:
            out[idx] = True  # "" vs <=1-char string
            continue
        s_strs = [(b_list[i] if swap[i] else a_list[i]) for i in idx]
        t_strs = [(a_list[i] if swap[i] else b_list[i]) for i in idx]
        S = np.array(s_strs, dtype=f"U{m}").view(np.uint32).reshape(len(idx), m)
        T = np.array(t_strs, dtype=f"U{L}").view(np.uint32).reshape(len(idx), L)
        if m == L:
            out[idx] = (S != T).sum(axis=1) <= 1
        else:
            pre = S != T[:, :m]
            shift = S != T[:, 1:]
            has = pre.any(axis=1)
            p = np.where(has, pre.argmax(axis=1), m)
            # suffix-count of shifted mismatches at/after p must be 0
            sfx = np.cumsum(shift[:, ::-1], axis=1)[:, ::-1]
            sfxp = np.concatenate(
                [sfx, np.zeros((len(idx), 1), dtype=sfx.dtype)], axis=1)
            out[idx] = np.take_along_axis(
                sfxp, p[:, None], axis=1)[:, 0] == 0
    return out


def levenshtein1_pairs(ds, text_col: str, num_buckets: int = 64):
    """ALL unordered pairs of distinct string VALUES at Levenshtein
    distance <= 1 — the exact global edit-distance join, via the
    SymSpell deletion-neighborhood equi-join: ed(x, y) <= 1 implies x
    and y share a member of {s} ∪ {single-char deletes of s}, so one
    variant-hash shuffle yields a candidate superset; an exact
    vectorized <=1 check then filters it (the key alone overmatches:
    'ab'/'ba' share the delete 'a' but sit at distance 2).

    -> Dataset[{a, b}] with a < b, distinct.

    Scale shape: variant explode is vectorized per position (loop over
    string positions, each one full-column slice); ONE shuffle on the
    variant key; per-variant group size is ALPHABET-BOUNDED — a
    variant v of length m is reachable only from names equal to v or
    names that insert one of |alphabet| chars at one of m+1 positions,
    so the within-group pair product cannot blow up on any input; the
    verify pass is candidate-bounded and vectorized (no per-pair DP
    loop).  Reference analogue: the blocking+verify fuzzy joins of
    stages/fuzzy.char_jaccard_pairs with an EXACT recall guarantee."""
    from knowledge_graph_ray.functions.agg import distinct_rows

    def variants(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).to_pandas().astype(str)
        lens = s.str.len()
        max_len = int(lens.max()) if len(s) else 0
        outs = [pd.DataFrame({"var": s, "name": s})]  # identity variant
        for p in range(1, max_len + 1):
            msk = lens >= p
            sub = s[msk]
            outs.append(pd.DataFrame({
                "var": sub.str.slice(0, p - 1) + sub.str.slice(p),
                "name": sub,
            }))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    exploded = ds.map_batches(variants, batch_format="pyarrow")

    def pair_body(bucket: pd.DataFrame) -> pa.Table:
        df = bucket[["var", "name"]].drop_duplicates()
        m = df.merge(df, on="var")
        m = m[m["name_x"] < m["name_y"]]
        m = m[["name_x", "name_y"]].drop_duplicates()
        return pa.Table.from_pydict({
            "a": pa.array(m.name_x.to_numpy(), type=pa.string()),
            "b": pa.array(m.name_y.to_numpy(), type=pa.string()),
        })

    cand = distinct_rows(
        bucketed_bucket_map(
            exploded, ["var"], pair_body,
            empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
        ),
        ["a", "b"],
        empty_schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        return batch.filter(pa.array(_ed1_class_mask(a, b)))

    return cand.map_batches(verify, batch_format="pyarrow")


def _char_matrix(names: "pd.Series", width: "int | None" = None):
    """(n, L) uint8 padded byte matrix + int64 lengths, vectorized
    (single frombuffer over the concatenated bytes, no per-string
    Python loop).  Byte semantics == DuckDB's similarity functions;
    identical to characters on ASCII corpora."""
    encoded = names.fillna("").astype(str).str.encode("utf-8")
    lens = encoded.str.len().to_numpy().astype(np.int64)
    n = len(encoded)
    L = int(width if width is not None else (lens.max() if n else 0))
    m = np.zeros((n, max(L, 1)), dtype=np.uint8)
    if n and lens.sum():
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        rows = np.repeat(np.arange(n), lens)
        cols = np.concatenate([np.arange(l) for l in lens]) if n else \
            np.array([], np.int64)
        m[rows, cols] = flat
    return m, lens


def _jw_pairs(ca: np.ndarray, la: np.ndarray,
              cb: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Jaro-Winkler similarity for P string pairs, vectorized ACROSS
    pairs (the sequential greedy-matching scan runs over character
    POSITIONS — O(L·window) numpy steps of O(P) work each, never a
    per-pair Python loop).  Bit-identical to DuckDB
    ``jaro_winkler_similarity`` (p=0.1, boost threshold 0.7, 4-char
    prefix cap; verified in tests) on byte strings.

    ``ca``/``cb``: (P, L) uint8 padded byte matrices; ``la``/``lb``
    true lengths."""
    P, L = ca.shape
    if P == 0:
        return np.zeros(0, np.float64)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    wmax = int(window.max(initial=0))
    m1 = np.zeros((P, L), dtype=bool)
    m2 = np.zeros((P, L), dtype=bool)
    for i in range(int(la.max(initial=0))):
        active = i < la
        if not active.any():
            break
        ai = ca[:, i]
        open_i = active.copy()          # query char i still unmatched
        for j in range(max(0, i - wmax), min(L, i + wmax + 1)):
            ok = (open_i & (j < lb) & (np.abs(j - i) <= window)
                  & ~m2[:, j] & (cb[:, j] == ai))
            m1[:, i] |= ok
            m2[:, j] |= ok
            open_i &= ~ok
    m = m1.sum(axis=1)
    # transpositions: matched chars of each side in positional order
    pos = np.arange(L)
    key1 = np.where(m1, pos, L + 1)
    key2 = np.where(m2, pos, L + 1)
    g1 = np.take_along_axis(ca, np.argsort(key1, axis=1, kind="stable"), 1)
    g2 = np.take_along_axis(cb, np.argsort(key2, axis=1, kind="stable"), 1)
    valid = pos[None, :] < m[:, None]
    t = ((g1 != g2) & valid).sum(axis=1) // 2
    ms = np.maximum(m, 1).astype(np.float64)
    laf = np.maximum(la, 1).astype(np.float64)
    lbf = np.maximum(lb, 1).astype(np.float64)
    jaro = np.where(
        m > 0,
        (m / laf + m / lbf + (m - t) / ms) / 3.0,
        0.0,
    )
    # common prefix (<= 4): run length of leading equal bytes
    k = min(4, L)
    eq = (ca[:, :k] == cb[:, :k]) & (pos[None, :k] < la[:, None]) \
        & (pos[None, :k] < lb[:, None])
    prefix = np.cumprod(eq, axis=1).sum(axis=1)
    return np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)


def _blocked_pairs_scan(ds, id_col: str, text_col: str,
                        block_cols: list[str], score_keep,
                        out_col: str, out_dtype: str,
                        max_block_rows: int = 10_000,
                        pair_tile: int = 200_000,
                        num_buckets: int = 32,
                        driver_threshold: "int | None" = None,
                        size_hint: "int | None" = None):
    """Shared blocked string-pair scan (Jaro-Winkler / Levenshtein /
    any pair-vectorized kernel): ONE shuffle on the blocking key;
    oversized blocks secondary-block into id-sorted chunks whose pairs
    tile the positional upper triangle exactly (char_jaccard_pairs'
    discipline); the kernel runs vectorized across pair tiles of
    <= ``pair_tile`` (a-row bands x candidate chunk), so peak memory is
    one tile of (P, L) byte matrices regardless of block size.

    ``score_keep(ca, la, cb, lb) -> (keep_mask, values)`` evaluates one
    pair tile.  Output: block_cols + id_a, id_b, ``out_col``."""

    def eval_pairs(ca, la, cb, lb, tri: bool):
        na, nb = len(la), len(lb)
        band = max(1, pair_tile // max(nb, 1))
        for r0 in range(0, na, band):
            r1 = min(r0 + band, na)
            rows = np.arange(r0, r1)
            if tri:
                ia = np.repeat(rows, nb - rows - 1)
                ib = np.concatenate(
                    [np.arange(r + 1, nb) for r in rows]) if len(rows) \
                    else np.array([], np.int64)
            else:
                ia = np.repeat(rows, nb)
                ib = np.tile(np.arange(nb), r1 - r0)
            if not len(ia):
                continue
            keep, val = score_keep(ca[ia], la[ia], cb[ib], lb[ib])
            if keep.any():
                yield ia[keep], ib[keep], val[keep]

    def bucket_body(g: pd.DataFrame) -> pa.Table:
        frames: list[pd.DataFrame] = []
        for _key, blk in g.groupby(block_cols, sort=False, dropna=False):
            n = len(blk)
            if n < 2:
                continue
            blk = blk.sort_values(id_col, kind="stable")
            ids = blk[id_col].to_numpy()
            width = int(blk[text_col].fillna("").astype(str)
                        .str.encode("utf-8").str.len().max())
            nchunks = -(-n // max_block_rows)
            for ci in range(nchunks):
                a_lo = ci * max_block_rows
                a_hi = min(a_lo + max_block_rows, n)
                blk_a = blk.iloc[a_lo:a_hi]
                ca, la = _char_matrix(blk_a[text_col], width)
                for cj in range(ci, nchunks):
                    if cj == ci:
                        gen = eval_pairs(ca, la, ca, la, tri=True)
                        b_lo = a_lo
                    else:
                        b_lo = cj * max_block_rows
                        b_hi = min(b_lo + max_block_rows, n)
                        blk_b = blk.iloc[b_lo:b_hi]
                        cb, lb = _char_matrix(blk_b[text_col], width)
                        gen = eval_pairs(ca, la, cb, lb, tri=False)
                    for ia, ib, val in gen:
                        frame = blk_a.iloc[ia][block_cols] \
                            .reset_index(drop=True)
                        frame["id_a"] = ids[a_lo + ia]
                        frame["id_b"] = ids[b_lo + ib]
                        frame[out_col] = val
                        frames.append(frame)
        if not frames:
            empty = g.head(0)[block_cols].copy()
            empty["id_a"] = g[id_col].head(0)
            empty["id_b"] = g[id_col].head(0)
            empty[out_col] = pd.Series([], dtype=out_dtype)
            return pa.Table.from_pandas(empty, preserve_index=False)
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True),
                                    preserve_index=False)

    needed = list(dict.fromkeys(block_cols + [id_col, text_col]))
    return bucketed_bucket_map(
        ds.select_columns(needed), block_cols, bucket_body,
        num_buckets=num_buckets, driver_threshold=driver_threshold,
        size_hint=size_hint, pre_partition=num_buckets,
    )


def jaro_winkler_blocked_pairs(ds, id_col: str, text_col: str,
                               block_cols: list[str], threshold: float,
                               max_block_rows: int = 10_000,
                               pair_tile: int = 200_000,
                               num_buckets: int = 32,
                               driver_threshold: "int | None" = None,
                               size_hint: "int | None" = None):
    """All pairs (id_a < id_b) within each block whose Jaro-Winkler
    similarity >= threshold — the record-linkage join.  Output:
    block_cols + id_a, id_b, sim, with sim bit-identical to DuckDB
    ``jaro_winkler_similarity`` (byte semantics; see _jw_pairs).
    Scale shape: see _blocked_pairs_scan."""

    def score_keep(ca, la, cb, lb):
        sim = _jw_pairs(ca, la, cb, lb)
        return sim >= threshold, sim

    return _blocked_pairs_scan(
        ds, id_col, text_col, block_cols, score_keep, "sim", "float64",
        max_block_rows=max_block_rows, pair_tile=pair_tile,
        num_buckets=num_buckets, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )


def levenshtein_blocked_pairs(ds, id_col: str, text_col: str,
                              block_cols: list[str], k: int = 2,
                              max_block_rows: int = 10_000,
                              pair_tile: int = 200_000,
                              num_buckets: int = 32,
                              driver_threshold: "int | None" = None,
                              size_hint: "int | None" = None):
    """All pairs (id_a < id_b) within each block at edit distance
    <= k — the bounded-edit record-linkage join, generalizing the
    global SymSpell edit-1 join to any k with per-pair exact distances
    (banded-DP kernel _lev_pairs, == DuckDB ``levenshtein``; a length
    pre-filter skips pairs with |len_a - len_b| > k before the DP).
    Output: block_cols + id_a, id_b, dist.  Scale shape: see
    _blocked_pairs_scan."""

    def score_keep(ca, la, cb, lb):
        dist = np.full(len(la), k + 1, np.int64)
        near = np.abs(la - lb) <= k
        if near.any():
            dist[near] = _lev_pairs(ca[near], la[near],
                                    cb[near], lb[near], k)
        return dist <= k, dist

    return _blocked_pairs_scan(
        ds, id_col, text_col, block_cols, score_keep, "dist", "int64",
        max_block_rows=max_block_rows, pair_tile=pair_tile,
        num_buckets=num_buckets, driver_threshold=driver_threshold,
        size_hint=size_hint,
    )


def _lev_pairs(ca: np.ndarray, la: np.ndarray,
               cb: np.ndarray, lb: np.ndarray, k: int) -> np.ndarray:
    """Exact Levenshtein distance for P string pairs, CAPPED at k+1
    (values > k all report k+1), vectorized ACROSS pairs via the
    banded DP over diagonals: dp[i, o] holds row i's cell at column
    j = i + o - k, so only 2k+1 offsets exist per row and the sweep is
    O(Lmax * (2k+1)) numpy steps of O(P) work — never a per-pair
    Python DP.  Byte semantics (== DuckDB ``levenshtein`` on ASCII)."""
    P, L = ca.shape
    if P == 0:
        return np.zeros(0, np.int64)
    INF = np.int32(k + 1)
    width = 2 * k + 1
    offs = np.arange(width) - k               # j - i
    # row 0: dp[0, j] = j
    dp = np.broadcast_to(offs, (P, width)).astype(np.int32).copy()
    dp[:, :k] = INF                            # j < 0
    np.minimum(dp, INF, out=dp)
    imax = int(la.max(initial=0))
    for i in range(1, imax + 1):
        prev = dp
        dp = np.full((P, width), INF, np.int32)
        ai = ca[:, i - 1]                      # row i consumes a[i-1]
        row_alive = i <= la
        for o in range(width):
            jv = i + int(offs[o])
            if jv < 0:
                continue
            # deletion: dp[i-1, j] = prev offset o+1
            best = (prev[:, o + 1] + 1 if o + 1 < width
                    else np.full(P, INF, np.int32))
            # substitution / match: dp[i-1, j-1] = prev offset o
            if jv >= 1:
                cost = (ai != cb[:, jv - 1]).astype(np.int32) \
                    if jv - 1 < L else np.ones(P, np.int32)
                np.minimum(best, prev[:, o] + cost, out=best)
            # insertion: dp[i, j-1] = current row offset o-1
            if o - 1 >= 0:
                np.minimum(best, dp[:, o - 1] + 1, out=best)
            valid = row_alive & (jv <= lb)     # stay inside b + its pad row
            np.minimum(best, INF, out=best)
            dp[:, o] = np.where(valid, best, dp[:, o])
        if not row_alive.any():
            break
        # freeze finished rows: once i > la the dp row must stop changing
        dp = np.where(row_alive[:, None], dp, prev)
    # answer at (la, lb): offset = lb - la + k; out of band -> k+1
    o_final = lb - la + k
    inband = (o_final >= 0) & (o_final < width)
    out = np.full(P, int(INF), np.int64)
    idx = np.flatnonzero(inband)
    out[idx] = dp[idx, o_final[idx]]
    return np.minimum(out, k + 1)
