"""Deduplication operators for large-scale training-data pipelines.

The reference only has exact id-dedup and set-unions (SURVEY.md §2.7,
"No near-dup (minhash/simhash) dedup exists"); these stages add the
standard large-corpus family, each expressed as Ray Data shuffles:

* exact dedup           — content hash -> groupby -> keep first
* MinHash + LSH         — shingle -> minhash sig -> band -> bucket groupby
                          -> candidate pairs -> sig-verify -> CC clusters
* SimHash               — 64-bit simhash -> 4x16-bit band pigeonhole ->
                          candidate pairs -> exact hamming verify
* n-gram Jaccard        — exact pairwise Jaccard within a partition key
                          (document the partition assumption; used as the
                          SQL-checkable oracle for the sketch variants)
* embedding cosine      — near-dup pairs by cosine within a bucket key

Duplicate-pair outputs are clustered into duplicate groups with the same
star-contraction connected components used for the entity graph
(stages/components.py) — pick min doc_id per group as the survivor.
All hashing is seeded/stable (no Python str hash).
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.grouping import (
    bucketed_bucket_map,
    bucketed_group_map,
)
from knowledge_graph_ray.functions.hashing import bucket_column
from knowledge_graph_ray.stages.components import connected_components_from_edges

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# ---------------------------------------------------------------- exact dedup


_H1, _H2 = "__ch1", "__ch2"


def add_content_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append a 128-bit vectorized content fingerprint (two independent
    u64 hash families): u64 alone has real birthday-collision odds at
    10^11+ rows; 128 bits keeps P(any collision) ~1e-15 at 10^12 docs."""
    from knowledge_graph_ray.functions.hashing import hash_rows_u64

    h1 = hash_rows_u64(batch, [column], seed=0).astype("int64")
    h2 = hash_rows_u64(batch, [column], seed=1).astype("int64")
    return batch.append_column(_H1, pa.array(h1)).append_column(
        _H2, pa.array(h2)
    )


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id",
                num_buckets: int = 64, driver_threshold: int | None = 50_000,
                size_hint: int | None = None):
    """Keep the first row (min id) per distinct content fingerprint.

    Hash-partition + per-group first (SURVEY.md D2 generalized from id
    equality to content equality).  Scale shape: a per-batch combiner
    keeps one row per distinct content per batch, so the shuffle moves
    distinct-per-batch rows, never the corpus; the final pass is the
    size-adaptive bucketed merge (vectorized drop_duplicates per bucket).
    """
    from knowledge_graph_ray.functions.grouping import bucketed_bucket_map

    def local_first(batch: pa.Table) -> pa.Table:
        hashed = add_content_hash(batch, column)
        if len(hashed) == 0:
            return hashed
        df = hashed.to_pandas()
        keep = df.sort_values(id_column, kind="stable").drop_duplicates(
            [_H1, _H2]
        )
        return pa.Table.from_pandas(keep, schema=hashed.schema,
                                    preserve_index=False)

    partials = ds.map_batches(local_first, batch_format="pyarrow")

    def keep_first(bucket: pd.DataFrame) -> pa.Table:
        keep = bucket.sort_values(id_column, kind="stable").drop_duplicates(
            [_H1, _H2]
        ).drop(columns=[_H1, _H2])
        return pa.Table.from_pandas(keep, preserve_index=False)

    from knowledge_graph_ray.functions.dsschema import plan_schema

    empty_schema = plan_schema(ds)
    return bucketed_bucket_map(
        partials, [_H1, _H2], keep_first, num_buckets=num_buckets,
        driver_threshold=driver_threshold, size_hint=size_hint,
        empty_schema=empty_schema,
    )


# ------------------------------------------------------------------- minhash


def _shingles(text: str, n: int) -> set[int]:
    toks = _WORD_RE.findall((text or "").lower())
    if len(toks) < n:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {
        zlib.crc32(" ".join(toks[i : i + n]).encode())
        for i in range(len(toks) - n + 1)
    }


def _crc32_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1), t >> 1).astype(
            np.uint32
        )
    return t


_CRC32_TABLE = _crc32_table()


def _crc32_of_strings(arr: pa.Array) -> np.ndarray:
    """zlib.crc32 of every string in an Arrow array, vectorized: the
    byte-position loop runs max_len iterations, each a table-lookup update
    over only the still-active strings, so total work is O(total bytes)
    in numpy kernels — no per-string Python call."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = np.diff(offsets)
    # Sort by length so the still-active set at byte-position k is a
    # contiguous SUFFIX — each iteration then costs O(active), making
    # the whole loop truly O(total bytes).  (A scan of ALL strings per
    # iteration would let one pathological multi-KB string make every
    # short string pay max_len scans — review finding round 5.)
    order = np.argsort(lengths, kind="stable")
    lens_s = lengths[order]
    offs_s = offsets[:-1][order]
    # rare very-long strings (sorted tail) go through zlib's C kernel
    # one-by-one — the byte-position loop would pay one Python-level
    # iteration per byte of the longest string otherwise
    long_start = int(np.searchsorted(lens_s, 1024, side="left"))
    crc_s = np.full(long_start, 0xFFFFFFFF, dtype=np.uint32)
    for k in range(int(lens_s[long_start - 1]) if long_start else 0):
        start = np.searchsorted(lens_s[:long_start], k, side="right")
        byte = data[offs_s[start:long_start] + k]
        c = crc_s[start:]
        crc_s[start:] = (c >> 8) ^ _CRC32_TABLE[(c ^ byte) & 0xFF]
    out = np.empty(n, dtype=np.uint32)
    out[order[:long_start]] = crc_s ^ np.uint32(0xFFFFFFFF)
    for i in range(long_start, n):
        o, ln = int(offs_s[i]), int(lens_s[i])
        out[order[i]] = zlib.crc32(data[o : o + ln].tobytes())
    return out


def _shingle_occurrence_codes(texts: pa.Array, ngram: int):
    """Vectorized n-gram shingling shared by MinHash and the prefix-filter
    join: every shingle occurrence as a dictionary code, doc-major order.

    Returns ``(doc_idx, codes, dict_crc)`` — ``doc_idx`` ascending
    (stable), ``dict_crc[codes]`` the crc32 shingle id of each
    occurrence (int64), all empty when no doc has tokens.  Tokenization
    is the batched polars / rust-regex ``\\w`` path (the operator
    contract — see MinHasher._shingle_hashes); docs shorter than
    ``ngram`` tokens contribute one whole-text shingle.
    """
    import os

    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl
    import pyarrow.compute as pc

    empty = (np.empty(0, dtype=np.int64),) * 3
    n = len(texts)
    if n == 0:
        return empty
    tok_lists = (
        pl.Series("t", texts)
        .fill_null("")
        .str.to_lowercase()
        .str.extract_all(r"\w+")
        .to_arrow()
    )
    if isinstance(tok_lists, pa.ChunkedArray):
        tok_lists = tok_lists.combine_chunks()
    tok_lists = tok_lists.cast(pa.large_list(pa.large_string()))
    offsets = np.frombuffer(tok_lists.buffers()[1], dtype=np.int64)[
        tok_lists.offset : tok_lists.offset + n + 1
    ]
    counts = np.diff(offsets)
    flat_toks = tok_lists.flatten()

    # long docs (>= ngram tokens): all ngram windows via shifted takes
    nsh = np.where(counts >= ngram, counts - ngram + 1, 0)
    doc_idx_long = np.repeat(np.arange(n, dtype=np.int64), nsh)
    cum = np.concatenate([[0], np.cumsum(nsh)])
    pos = np.arange(cum[-1], dtype=np.int64) - cum[doc_idx_long]
    starts = offsets[:-1][doc_idx_long] + pos
    if len(starts):
        parts = [
            pc.take(flat_toks, pa.array(starts + k)) for k in range(ngram)
        ]
        shingles_long = pc.binary_join_element_wise(
            *parts, pa.scalar(" ", type=pa.large_string())
        )
    else:
        shingles_long = pa.array([], type=pa.large_string())

    # short docs (0 < tokens < ngram): one shingle = all tokens joined
    short_idx = np.nonzero((counts > 0) & (counts < ngram))[0]
    if len(short_idx):
        shingles_short = pc.binary_join(
            tok_lists.take(pa.array(short_idx)),
            pa.scalar(" ", type=pa.large_string()),
        )
    else:
        shingles_short = pa.array([], type=pa.large_string())

    all_doc = np.concatenate([doc_idx_long, short_idx.astype(np.int64)])
    if len(all_doc) == 0:
        return empty
    all_sh = pa.concat_arrays(
        [
            shingles_long.cast(pa.large_string()),
            shingles_short.cast(pa.large_string()),
        ]
    )
    # dictionary-encode BEFORE hashing: crc32 runs only on the unique
    # shingle strings (typically ~10x fewer than occurrences), and the
    # doc-order sort moves int32 codes instead of strings. crc
    # collisions between distinct strings are merged downstream
    # (np.unique) so the result is identical to hashing every occurrence.
    dict_sh = pc.dictionary_encode(all_sh)
    codes = dict_sh.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    xd = _crc32_of_strings(dict_sh.dictionary).astype(np.int64)
    order = np.argsort(all_doc, kind="stable")
    return all_doc[order], codes[order], xd


class MinHasher:
    """Stateful minhash signer: permutation parameters built once per actor."""

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 128, ngram: int = 3, seed: int = 6969,
                 text_column: str = "text", id_column: str = "doc_id"):
        rng = np.random.RandomState(seed)
        # a < 2^30 keeps a*x in int64 for 32-bit shingle hashes
        # (2^30 * 2^32 = 2^62; + b < 2^61 stays under 2^63 — no overflow,
        # so (ax+b) mod p is the intended universal permutation family)
        self.a = rng.randint(1, 1 << 30, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, 1 << 61, size=num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.ngram = ngram
        self.text_column = text_column
        self.id_column = id_column

    def _shingle_hashes(self, text: str) -> set[int]:
        """Single-doc shingle set over the SAME tokenizer as the batched
        path (polars / Rust-regex ``\\w``, which differs from Python re
        ``\\w`` on No-category chars like '²' and on combining marks —
        the batch path defines the operator's tokenization, so the
        oracle must match it, review finding round 5)."""
        import polars as pl

        toks = (
            pl.Series([text or ""])
            .str.to_lowercase()
            .str.extract_all(r"\w+")[0]
            .to_list()
        ) or []
        if len(toks) < self.ngram:
            return {zlib.crc32(" ".join(toks).encode())} if toks else set()
        return {
            zlib.crc32(" ".join(toks[i : i + self.ngram]).encode())
            for i in range(len(toks) - self.ngram + 1)
        }

    def signature(self, text: str) -> np.ndarray:
        """Single-doc reference path (kept as the differential-test oracle
        for the batched path below)."""
        sh = np.fromiter(self._shingle_hashes(text), dtype=np.int64, count=-1)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.int64)
        # (a*x + b) mod p, vectorized over shingles x permutations
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.MERSENNE
        return vals.min(axis=1)

    def _signatures_batch(self, texts: pa.Array) -> np.ndarray:
        """(n, num_perm) signatures, vectorized across the whole batch:
        polars extract_all tokenizes, Arrow binary_join builds shingle
        strings, _crc32_of_strings hashes them, and per-doc mins come from
        one minimum.reduceat per permutation block — bit-identical to
        ``signature`` per doc (min over a multiset equals min over its
        set, so shingle dedup is unnecessary)."""
        n = len(texts)
        out = np.zeros((n, self.num_perm), dtype=np.int64)
        if n == 0:
            return out
        all_doc, codes, xd = _shingle_occurrence_codes(texts, self.ngram)
        if len(all_doc) == 0:
            return out
        # crc collisions between distinct shingle strings merge here, so
        # the result is identical to hashing every occurrence
        ux, inv_d = np.unique(xd, return_inverse=True)
        inv = inv_d[codes]
        nsh_total = len(codes)

        seg_counts = np.bincount(all_doc, minlength=n)
        have = seg_counts > 0
        seg_starts = np.concatenate([[0], np.cumsum(seg_counts)])[:-1][have]
        # mod-Mersenne via the shift-add reduction: y mod (2^61-1) =
        # (y>>61)+(y&M), minus M once if needed (y < 2^63, see __init__
        # bounds) — mathematically equal to the per-doc ``% MERSENNE``.
        # cache-sized (perms x shingles) blocks: ~1M int64 elements per
        # block keeps the gathered intermediate inside L2/L3 (chunk=4 at
        # the 260k-shingle batch profile, measured optimal 2026-08-18)
        perm_chunk = max(1, (1 << 20) // max(1, nsh_total))
        if len(ux) * 2 <= nsh_total and len(ux) * self.num_perm <= (64 << 20):
            # shared-shingle batches: run the permutation arithmetic once
            # per UNIQUE hash (V below), then a cheap int32 gather per
            # block rebuilds per-shingle values for the segment min —
            # measured 3.5x over per-shingle arithmetic at 10x sharing.
            inv32 = inv.astype(np.int32)
            y = ux[None, :] * self.a[:, None] + self.b[:, None]
            V = (y >> 61) + (y & self.MERSENNE)
            V = np.where(V >= self.MERSENNE, V - self.MERSENNE, V)
            for lo in range(0, self.num_perm, perm_chunk):
                hi = min(self.num_perm, lo + perm_chunk)
                g = V[lo:hi].take(inv32, axis=1)
                out[have, lo:hi] = np.minimum.reduceat(
                    g, seg_starts, axis=1
                ).T
        else:
            # low-sharing batches: gather would cost more than it saves —
            # compute the permutation arithmetic per shingle directly.
            x = xd[codes]
            for lo in range(0, self.num_perm, perm_chunk):
                hi = min(self.num_perm, lo + perm_chunk)
                y = x[None, :] * self.a[lo:hi, None] + self.b[lo:hi, None]
                v = (y >> 61) + (y & self.MERSENNE)
                v = np.where(v >= self.MERSENNE, v - self.MERSENNE, v)
                out[have, lo:hi] = np.minimum.reduceat(
                    v, seg_starts, axis=1
                ).T
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        sig_mat = self._signatures_batch(
            batch.column(self.text_column).combine_chunks()
        )
        sig = pa.ListArray.from_arrays(
            pa.array(
                np.arange(len(ids) + 1, dtype=np.int32) * self.num_perm
            ),
            pa.array(sig_mat.reshape(-1)),
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([str(i) for i in ids], type=pa.string()),
                "sig": sig,
            }
        )


def minhash_signatures(ds, num_perm=128, ngram=3, seed=6969,
                       text_column="text", id_column="doc_id",
                       batch_size=1024):
    # task pool + per-process cache: the permutation params are cheap to
    # build, and a fresh actor pool costs ~2-4s startup (poolcache.py)
    from knowledge_graph_ray.functions.poolcache import cached_class_map

    return cached_class_map(
        ds, MinHasher, batch_size=batch_size,
        num_perm=num_perm, ngram=ngram, seed=seed,
        text_column=text_column, id_column=id_column,
    )


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _band_rows(batch: pa.Table, num_bands: int) -> pa.Table:
    """(doc_id, sig) -> one row per band: (band, band_hash, doc_id, sig).

    Fully vectorized: the signature matrix is reshaped to
    (docs, bands, rows_per_band) and band hashes are an FNV-style fold
    over the band's components (r tiny iterations, each vectorized over
    docs x bands) — no per-row Python, no per-band crc32 calls."""
    import pyarrow.compute as pc

    n = len(batch)
    sig_col = batch.column("sig")
    if n == 0:
        return pa.Table.from_pydict(
            {
                "band": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.string()),
                "sig": pa.array([], type=sig_col.type),
            }
        )
    flat = sig_col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    num_perm = len(flat) // n
    r = num_perm // num_bands
    if r == 0:
        raise ValueError(
            f"num_bands={num_bands} exceeds signature length {num_perm}"
        )
    # trailing permutations beyond num_bands*r are ignored for BANDING
    # (the pre-vectorization loop sliced bands and dropped the tail);
    # est_jaccard still uses the full signature
    bm = (
        flat.reshape(n, num_perm)[:, : num_bands * r]
        .reshape(n, num_bands, r)
        .astype(np.uint64)
    )
    h = np.full((n, num_bands), _FNV_OFFSET, dtype=np.uint64)
    for k in range(r):
        h = (h ^ bm[:, :, k]) * _FNV_PRIME
    idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), num_bands))
    return pa.Table.from_arrays(
        [
            pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n)),
            pa.array(h.reshape(-1).view(np.int64)),
            pc.take(batch.column("doc_id"), idx),
            pc.take(sig_col, idx),
        ],
        names=["band", "band_hash", "doc_id", "sig"],
    )


def minhash_lsh_pairs(sigs, num_bands: int = 16, threshold: float = 0.8,
                      max_bucket: int = 2000, twomb: int = 2_000_000):
    """LSH candidate generation + signature-based Jaccard verification.

    -> Dataset[(a, b, est_jaccard)], a < b, est >= threshold.  Buckets
    larger than ``max_bucket`` are truncated deterministically (sorted by
    doc_id) and the truncation is recorded in the ``truncated`` column of
    the emitted pairs (no silent caps).
    """
    bands = sigs.map_batches(
        lambda b: _band_rows(b, num_bands), batch_format="pyarrow"
    )

    pair_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()),
         ("est_jaccard", pa.float64()), ("truncated", pa.bool_())]
    )

    def _segment_pairs(docs: list[str], sig_mat: np.ndarray, truncated: bool,
                       band: int, rows: list[dict]):
        # min-band emission: each passing pair is emitted ONLY from the
        # first band in which its signatures truly collide, so the same
        # pair never surfaces from two buckets and no global pair-dedup
        # shuffle is needed.  (Under band-hash truncation a pair whose
        # minimal colliding band was truncated is dropped even if a later
        # band kept both docs — the cap is already documented as lossy,
        # and `truncated` records it.)
        n = len(docs)
        num_perm = sig_mat.shape[1]
        r = num_perm // num_bands
        chunk = max(1, twomb // max(1, n * num_perm))
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            eq = sig_mat[lo:hi, None, :] == sig_mat[None, :, :]
            est_blk = eq.mean(axis=2)
            # banding ignores the tail beyond num_bands*r (matches
            # _band_rows; est_jaccard above still uses the full width)
            band_eq = (
                eq[:, :, : num_bands * r]
                .reshape(hi - lo, n, num_bands, r)
                .all(axis=3)
            )
            first_band = band_eq.argmax(axis=2)  # first True (0 if none)
            emit = (
                (est_blk >= threshold)
                & band_eq.any(axis=2)
                & (first_band == band)
            )
            ii, jj = np.where(emit)
            for i_, j in zip(ii, jj):
                i = lo + i_
                if j <= i:
                    continue
                a, b_ = sorted((docs[i], docs[j]))
                rows.append(
                    {"a": a, "b": b_, "est_jaccard": float(est_blk[i_, j]),
                     "truncated": truncated}
                )

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        # sorted-run scan: most (band, band_hash) buckets are singletons —
        # find multi-row runs vectorized and only those pay pair generation
        g = group.sort_values(["band", "band_hash", "doc_id"])
        keys = list(zip(g["band"].tolist(), g["band_hash"].tolist()))
        docs_all = g["doc_id"].tolist()
        sigs_all = g["sig"].tolist()
        rows: list[dict] = []
        start = 0
        n = len(keys)
        for i in range(1, n + 1):
            if i == n or keys[i] != keys[start]:
                seg = i - start
                if seg >= 2:
                    truncated = seg > max_bucket
                    end = start + min(seg, max_bucket)
                    docs = docs_all[start:end]
                    sig_mat = np.stack(
                        [np.asarray(s) for s in sigs_all[start:end]]
                    )
                    _segment_pairs(docs, sig_mat, truncated,
                                   int(keys[start][0]), rows)
                start = i
        return pa.Table.from_pylist(rows, schema=pair_schema)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__gb", bucket_column(batch, ["band", "band_hash"], 64)
        )

    # min-band emission inside _segment_pairs guarantees each pair
    # surfaces from exactly one bucket — one shuffle total, no global
    # pair-dedup round
    return (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(
            lambda g: bucket_pairs(g.drop(columns=["__gb"])),
            batch_format="pandas",
        )
    )


def duplicate_groups(pairs, id_column_pair=("a", "b"), **cc_kwargs):
    """Duplicate pairs -> (name=doc_id, component=group id) via the same
    distributed union-find used for the entity graph.  ``cc_kwargs`` pass
    through to connected_components_from_edges (e.g. ``driver_threshold=0``
    forces the distributed star-contraction path)."""
    a, b = id_column_pair
    edges = pairs.map_batches(
        lambda t: pa.Table.from_pydict({"u": t.column(a), "v": t.column(b)}),
        batch_format="pyarrow",
    )
    return connected_components_from_edges(edges, **cc_kwargs)


# ------------------------------------------------------------------- simhash


class SimHasher:
    """64-bit simhash over word tokens; stateful actor (stable hashing)."""

    def __init__(self, text_column="text", id_column="doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    @staticmethod
    def simhash64(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in _WORD_RE.findall((text or "").lower()):
            h = int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
            )
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
            ).astype(np.int64)
            acc += 2 * bits - 1
        out = 0
        for i, v in enumerate(acc):
            if v > 0:
                out |= 1 << (63 - i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Vectorized across the batch, bit-identical to simhash64 (the
        # per-row reference kept above for tests): blake2b runs once
        # per DISTINCT token (factorize), the ±1 bit contributions
        # scatter-add per doc, and the sign bits pack in one shot.
        import polars as pl

        ids = [str(i) for i in batch.column(self.id_column).to_pylist()]
        toks = (
            pl.from_arrow(batch.column(self.text_column).combine_chunks())
            .fill_null("").str.to_lowercase()
            .str.extract_all(r"[\p{L}\p{N}_]+")  # rust-regex spelling of Python \w
        )
        lens = toks.list.len().to_numpy()
        df = pd.DataFrame({
            "doc": np.repeat(np.arange(len(ids)), lens),
            "tok": toks.explode(empty_as_null=False).drop_nulls().to_pandas()
            if int(lens.sum()) else pd.Series([], dtype=object),
        })
        acc = np.zeros((len(ids), 64), dtype=np.int64)
        if len(df):
            codes, uniques = pd.factorize(df["tok"])
            digests = b"".join(
                hashlib.blake2b(t.encode(), digest_size=8).digest()
                for t in uniques
            )
            uniq_bits = np.unpackbits(
                np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8),
                axis=1,
            ).astype(np.int64) * 2 - 1          # (U, 64) in ±1
            # token rows are doc-contiguous (np.repeat order): one
            # reduceat per nonempty doc beats np.add.at's slow scatter
            nonempty = lens > 0
            starts = np.concatenate(
                ([0], np.cumsum(lens[nonempty])[:-1].astype(np.int64))
            )
            acc[nonempty] = np.add.reduceat(uniq_bits[codes], starts,
                                            axis=0)
        packed = np.packbits(acc > 0, axis=1).copy().view(">u8").ravel()
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "simhash": pa.array(packed.astype(np.uint64),
                                    type=pa.uint64()),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, text_column="text", id_column="doc_id",
                  max_bucket: int = 2000):
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole LSH: split 64 bits into 4 16-bit chunks; distance <= 3
    guarantees at least one identical chunk -> bucket groupby per chunk,
    exact hamming verify inside buckets (no false negatives for <= 3).
    """
    from knowledge_graph_ray.functions.poolcache import cached_class_map

    hashed = cached_class_map(
        ds, SimHasher, text_column=text_column, id_column=id_column
    )

    def chunk_rows(batch: pa.Table) -> pa.Table:
        docs, chunks, vals, full = [], [], [], []
        for doc, h in zip(
            batch.column("doc_id").to_pylist(), batch.column("simhash").to_pylist()
        ):
            for c in range(4):
                docs.append(doc)
                chunks.append(c)
                vals.append((h >> (16 * c)) & 0xFFFF)
                full.append(h)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(docs, type=pa.string()),
                "chunk": pa.array(chunks, type=pa.int32()),
                "chunk_val": pa.array(vals, type=pa.int64()),
                "simhash": pa.array(full, type=pa.uint64()),
            }
        )

    banded = hashed.map_batches(chunk_rows, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("hamming", pa.int32()),
         ("truncated", pa.bool_())]
    )
    popcount8 = np.array([bin(x).count("1") for x in range(256)], dtype=np.int32)

    def bucket_pairs(group: pd.DataFrame) -> pa.Table:
        # sorted-run scan over (chunk, chunk_val) segments (see minhash)
        g = group.sort_values(["chunk", "chunk_val", "doc_id"])
        keys = list(zip(g["chunk"].tolist(), g["chunk_val"].tolist()))
        docs_all = g["doc_id"].tolist()
        hs_all = g["simhash"].tolist()
        rows: list[dict] = []
        start = 0
        n = len(keys)
        for i in range(1, n + 1):
            if i == n or keys[i] != keys[start]:
                seg = i - start
                if seg >= 2:
                    # truncation recorded per pair (no silent caps): a
                    # truncated bucket may miss pairs, voiding the
                    # no-false-negative-<=3 guarantee for those docs
                    truncated = seg > max_bucket
                    end = start + min(seg, max_bucket)
                    docs = docs_all[start:end]
                    hs = np.asarray(hs_all[start:end], dtype=np.uint64)
                    m = len(docs)
                    xor = hs[:, None] ^ hs[None, :]
                    dist = popcount8[xor.view(np.uint8).reshape(m, m, 8)].sum(axis=2)
                    ii, jj = np.where(np.triu(dist <= max_hamming, k=1))
                    for i_, j in zip(ii, jj):
                        a, b = sorted((docs[i_], docs[j]))
                        rows.append({"a": a, "b": b, "hamming": int(dist[i_, j]),
                                     "truncated": truncated})
                start = i
        return pa.Table.from_pylist(rows, schema=pair_schema)

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__gb", bucket_column(batch, ["chunk", "chunk_val"], 64)
        )

    pairs = (
        banded.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(
            lambda g: bucket_pairs(g.drop(columns=["__gb"])),
            batch_format="pandas",
        )
    )

    def dedup_pairs(group: pd.DataFrame) -> pa.Table:
        keep = group.sort_values(["a", "b"]).drop_duplicates(["a", "b"])
        return pa.Table.from_pandas(keep, preserve_index=False)

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__gb", bucket_column(batch, ["a", "b"], 64))

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__gb")
        .map_groups(
            lambda g: dedup_pairs(g.drop(columns=["__gb"])),
            batch_format="pandas",
        )
    )


# ------------------------------------------------------------ exact jaccard


def ngram_jaccard_pairs(ds, threshold: float = 0.8, ngram: int = 3,
                        partition_column: str = "source",
                        text_column: str = "text", id_column: str = "doc_id",
                        max_partition: int = 20_000):
    """Exact n-gram Jaccard pairs >= threshold WITHIN a partition key.

    Partitioning assumption (documented per SURVEY §2.10 custom-operator
    rule): candidates are only sought inside ``partition_column`` groups —
    the exact-oracle companion to the MinHash sketch path, and the shape
    used when a corpus has a natural shard key (crawl, source, bucket).

    ``max_partition`` bounds the O(n^2): a hot partition is truncated
    deterministically (sorted by id) and every pair it emits carries
    ``truncated=True`` — no silent caps.  The SQL-oracle equivalence
    holds exactly while no partition exceeds the cap (the oracle query
    asserts this by ignoring the column at bench partition sizes).
    """
    schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()), ("jaccard", pa.float64()),
         ("n_inter", pa.int64()), ("n_union", pa.int64()),
         ("truncated", pa.bool_())]
    )

    def pairs_in_partition(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(id_column)
        truncated = len(g) > max_partition
        g = g.head(max_partition)
        ids = [str(i) for i in g[id_column]]
        shingle_sets = [_shingles(t, ngram) for t in g[text_column]]
        rows = []
        for i in range(len(ids)):
            si = shingle_sets[i]
            for j in range(i + 1, len(ids)):
                sj = shingle_sets[j]
                if not si and not sj:
                    continue
                n_inter = len(si & sj)
                n_union = len(si | sj)
                jac = n_inter / n_union
                if jac >= threshold:
                    rows.append(
                        {"a": ids[i], "b": ids[j], "jaccard": jac,
                         "n_inter": n_inter, "n_union": n_union,
                         "truncated": truncated}
                    )
        return pa.Table.from_pylist(rows, schema=schema)

    return ds.groupby(partition_column).map_groups(
        pairs_in_partition, batch_format="pandas"
    )


# -------------------------------------------- global exact jaccard (PPJoin)


PREFIX_PAIR_SCHEMA = pa.schema(
    [("a", pa.string()), ("b", pa.string()), ("jaccard", pa.float64()),
     ("n_inter", pa.int64()), ("n_union", pa.int64())]
)


def _stable_pairs(result):
    """Pin the pair table's schema.  The result is output-sized (bounded
    by the near-dup count), so materializing is cheap; the empty-result
    re-wrap matters because a mostly-empty shuffle leaves zero-column
    empty blocks whose schema would otherwise win ``to_pandas``."""
    import ray.data as rd

    result = result.materialize()
    if result.count() == 0:
        return rd.from_arrow(PREFIX_PAIR_SCHEMA.empty_table())
    return result

_FREQ_CLAMP = (1 << 31) - 1


class _DocShingleSets:
    """Per-doc distinct shingle sets as ORDER-KEY-sorted int64 arrays.

    The order key is ``min(doc_freq, 2^31-1) * 2^32 + crc32`` — ascending
    global rarity, ties (and ultra-hot clamped tokens) by crc.  Any fixed
    total order keeps prefix filtering exact; rarity-first only shrinks
    the candidate buckets.  The frequency map arrives via ray.put once
    per actor (``vocab_ref=None`` = crc-only order, the open-vocabulary
    fallback when the shingle vocabulary exceeds the broadcast budget).
    """

    def __init__(self, vocab_ref, ngram: int, text_column: str,
                 id_column: str):
        import ray

        self.crc_sorted, self.okeys = (
            ray.get(vocab_ref) if vocab_ref is not None else (None, None)
        )
        self.ngram = ngram
        self.text_column = text_column
        self.id_column = id_column

    def _order_keys(self, crc: np.ndarray) -> np.ndarray:
        if self.crc_sorted is None:
            return crc
        pos = np.searchsorted(self.crc_sorted, crc).clip(
            0, len(self.crc_sorted) - 1
        )
        # unseen crc (can't happen when the freq pass saw the same data;
        # defensive) -> deterministic max-freq bucket, consistent everywhere
        found = self.crc_sorted[pos] == crc
        return np.where(found, self.okeys[pos],
                        np.int64(_FREQ_CLAMP) * (1 << 32) + crc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column(self.id_column).to_pylist()]
        doc_idx, codes, xd = _shingle_occurrence_codes(
            batch.column(self.text_column).combine_chunks(), self.ngram
        )
        empty = pa.table({
            "doc_id": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
            "set_keys": pa.array([], type=pa.large_list(pa.int64())),
        })
        if len(doc_idx) == 0:
            return empty
        crc = xd[codes]
        # per-doc distinct occurrences (doc_idx < batch size, crc < 2^32)
        uniq = np.unique(doc_idx * (1 << 32) + crc)
        d = uniq >> 32
        okey = self._order_keys(uniq & np.int64(0xFFFFFFFF))
        order = np.lexsort((okey, d))
        d, okey = d[order], okey[order]
        counts = np.bincount(d, minlength=len(ids)).astype(np.int64)
        nz = np.nonzero(counts)[0]
        lens = counts[nz]
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        return pa.table({
            "doc_id": pa.array([ids[i] for i in nz], type=pa.string()),
            "n": pa.array(lens, type=pa.int64()),
            "set_keys": pa.LargeListArray.from_arrays(
                pa.array(offsets), pa.array(okey, type=pa.int64())
            ),
        })


class _PairVerifier:
    """Exact candidate verification against the broadcast per-doc set
    arrays: sorted-array intersect, ``J >= t`` spelled as the same float
    division the SQL oracle uses.  Duplicate candidates verify to
    identical rows (deduped downstream)."""

    def __init__(self, sets_ref, threshold: float):
        import ray

        self.ids, self.arrays = ray.get(sets_ref)
        self.threshold = threshold

    def _lookup(self, doc: str):
        pos = np.searchsorted(self.ids, doc)
        if pos < len(self.ids) and self.ids[pos] == doc:
            return self.arrays[pos]
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for a, b in zip(batch.column("a").to_pylist(),
                        batch.column("b").to_pylist()):
            sa, sb = self._lookup(a), self._lookup(b)
            if sa is None or sb is None:
                continue
            ni = len(np.intersect1d(sa, sb, assume_unique=True))
            if ni == 0:
                continue
            nu = len(sa) + len(sb) - ni
            jac = ni / nu
            if jac >= self.threshold:
                rows.append({"a": a, "b": b, "jaccard": jac,
                             "n_inter": ni, "n_union": nu})
        return pa.Table.from_pylist(rows, schema=PREFIX_PAIR_SCHEMA)


def prefix_filter_jaccard_pairs(
    ds, threshold: float = 0.5, ngram: int = 3,
    text_column: str = "text", id_column: str = "doc_id",
    vocab_broadcast_max: int = 5_000_000,
    sets_broadcast_max: int = 100_000,
    num_buckets: int = 64,
):
    """GLOBAL exact n-gram Jaccard self-join: all pairs with
    ``J >= threshold`` across the whole corpus — no blocking/partition
    key required (the exact complement to ``ngram_jaccard_pairs``'
    within-partition contract and to the MinHash/SimHash sketches).

    Prefix filtering (the PPJoin family — Chaudhuri et al. 2006, Xiao
    et al. 2008, public literature): under any fixed total token order,
    a doc of n distinct shingles indexes only its first
    ``p = n - ceil(t*n) + 1`` ("prefix") shingles.  For any pair with
    ``J >= t`` the smallest common shingle c lies in BOTH prefixes: if c
    sat outside x's prefix, all >= ceil(t*n_x) common shingles would
    occupy x's ceil(t*n_x) - 1 suffix slots — pigeonhole.  So grouping
    prefix entries by shingle finds every qualifying pair.

    Ray-Data shape (3 streaming passes over the corpus, no all-pairs
    step anywhere):

    1. document-frequency count: per-batch distinct-shingle combiner ->
       small groupby over the VOCABULARY (never the corpus); the
       (crc -> order-key) map broadcasts via ray.put under
       ``vocab_broadcast_max`` and degrades to crc-only order above it
       (correct, just larger candidate buckets).
    2. prefix index: per-doc sorted set-key arrays (one actor-pool
       vectorized pass), then (token, doc_id, n) prefix rows — ~24
       bytes each, (1-t)*n + 1 per doc; candidates = same-token pairs
       passing the length filter ``n_b <= n_a / t``, deduped by one
       (a, b) groupby.  Buckets are keyed by each doc's RAREST
       shingles, so bucket sizes track rare-token document frequencies.
    3. verify: candidates join the per-doc set arrays back (broadcast
       object-store lookup under ``sets_broadcast_max`` docs,
       ``hash_join`` above — the broadcast default is low because the
       driver-side array pull dominates early: measured 500k docs at
       32 cpus = 69s broadcast vs 32s partitioned) and an exact
       sorted-array intersect checks ``J >= t`` — float comparison
       spelled identically to the SQL oracle.

    Exactness holds for any threshold in (0, 1]; ``ceil(t*n)`` is
    computed with a downward epsilon so float rounding can only widen
    the prefix (a superset of candidates, never a miss).
    """
    import ray
    import ray.data as rd

    from knowledge_graph_ray.functions.agg import grouped_agg

    # ---- pass 1: document frequency per shingle -> order-key map
    def partial_df(batch: pa.Table) -> pa.Table:
        doc_idx, codes, xd = _shingle_occurrence_codes(
            batch.column(text_column).combine_chunks(), ngram
        )
        if len(doc_idx) == 0:
            return pa.table({"shingle": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        uniq = np.unique(doc_idx * (1 << 32) + xd[codes])
        u, cnt = np.unique(uniq & np.int64(0xFFFFFFFF), return_counts=True)
        return pa.table({"shingle": pa.array(u, type=pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    freq = grouped_agg(
        ds.map_batches(partial_df, batch_format="pyarrow"),
        ["shingle"], [("freq", "cnt", "sum")],
    ).materialize()
    if freq.count() == 0:  # no doc has tokens: no pairs, stable schema
        return rd.from_arrow(PREFIX_PAIR_SCHEMA.empty_table())
    if freq.count() <= vocab_broadcast_max:
        fdf = freq.to_pandas().sort_values("shingle")
        crc_sorted = fdf["shingle"].to_numpy()
        okeys = (
            np.minimum(fdf["freq"].to_numpy(), _FREQ_CLAMP) * (1 << 32)
            + crc_sorted
        )
        vocab_ref = ray.put((crc_sorted, okeys))
    else:
        vocab_ref = None  # crc-only total order (documented fallback)

    from knowledge_graph_ray.functions.poolcache import cached_class_map

    # task pool + per-process callable cache: the stage state is one
    # local ray.get, so an actor pool's startup latency would dominate
    sets_ds = cached_class_map(
        ds, _DocShingleSets, vocab_ref=vocab_ref, ngram=ngram,
        text_column=text_column, id_column=id_column,
    ).materialize()  # feeds both the prefix index and the verify side

    # ---- pass 2: prefix rows -> same-token candidates -> (a,b) dedup
    def emit_prefixes(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"token": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        import pyarrow.compute as pc

        ns = batch.column("n").to_numpy()
        # ceil with downward epsilon: boundary error only ever WIDENS the
        # prefix (superset of candidates), never narrows it
        p = (ns - np.ceil(threshold * ns - 1e-9) + 1).astype(np.int64)
        sets = batch.column("set_keys").combine_chunks()
        offsets = np.frombuffer(sets.buffers()[1], dtype=np.int64)[
            sets.offset : sets.offset + len(batch) + 1
        ]
        # flatten() rebases a SLICED array (map_batches hands zero-copy
        # slices with offset > 0) — make the offsets slice-relative too
        starts_rel = offsets[:-1] - offsets[0]
        values = sets.flatten().to_numpy()
        row = np.repeat(np.arange(len(batch)), p)
        slot = np.arange(int(p.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(p)])[:-1], p
        )
        return pa.table({
            "token": pa.array(values[starts_rel[row] + slot],
                              type=pa.int64()),
            "doc_id": pc.take(batch.column("doc_id"), pa.array(row)),
            "n": pa.array(ns[row], type=pa.int64()),
            "pos": pa.array(slot, type=pa.int64()),
        })

    prefix_rows = sets_ds.map_batches(emit_prefixes, batch_format="pyarrow")

    cand_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    # J >= t implies overlap >= t/(1+t) * (n_x + n_y)  (ni >= t*nu)
    t1 = threshold / (1.0 + threshold)

    def token_candidates(bucket: pd.DataFrame) -> pa.Table:
        g = bucket.sort_values(["token", "n", "doc_id"])
        toks = g["token"].to_numpy()
        ns = g["n"].to_numpy()
        pos = g["pos"].to_numpy()
        docs = g["doc_id"].to_numpy()
        m = len(g)
        new = np.concatenate([[True], toks[1:] != toks[:-1]]) if m else \
            np.empty(0, dtype=bool)
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [m]])
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            l = e - s
            if l < 2:
                continue
            xi, yi = np.triu_indices(l, k=1)
            nx, ny = ns[s + xi], ns[s + yi]
            px, py = pos[s + xi], pos[s + yi]
            # length filter + PPJoin positional filter: the overlap a
            # collision at prefix positions (px, py) can still reach is
            # 1 + min(suffix lengths); a qualifying pair always survives
            # in its MINIMAL common token's bucket, where both positions
            # are the earliest possible (Xiao et al. 2008)
            keep = (ny <= nx / threshold) & (
                1 + np.minimum(nx - px - 1, ny - py - 1)
                >= np.ceil(t1 * (nx + ny) - 1e-9)
            )
            if keep.any():
                dx = docs[s + xi[keep]]
                dy = docs[s + yi[keep]]
                a_parts.append(np.minimum(dx, dy))
                b_parts.append(np.maximum(dx, dy))
        if not a_parts:
            return cand_schema.empty_table()
        return pa.table({
            "a": pa.array(np.concatenate(a_parts), type=pa.string()),
            "b": pa.array(np.concatenate(b_parts), type=pa.string()),
        })

    # candidates flow straight into verify (duplicates across buckets
    # verify to IDENTICAL rows); the dedup shuffle runs on the verified
    # pair table — output-sized — instead of the candidate stream
    cands = bucketed_bucket_map(
        prefix_rows, ["token"], token_candidates,
        num_buckets=num_buckets, empty_schema=cand_schema,
    )

    def _dedup_verified(pairs_ds):
        def keep_first(bucket: pd.DataFrame) -> pa.Table:
            keep = bucket.drop_duplicates(["a", "b"])
            return pa.Table.from_pandas(keep, preserve_index=False,
                                        schema=PREFIX_PAIR_SCHEMA)

        return _stable_pairs(bucketed_bucket_map(
            pairs_ds, ["a", "b"], keep_first,
            num_buckets=num_buckets, empty_schema=PREFIX_PAIR_SCHEMA,
        ))

    # ---- pass 3: exact verify against the per-doc set arrays
    n_docs = sets_ds.count()
    if n_docs <= sets_broadcast_max:
        sp = sets_ds.to_pandas().sort_values("doc_id")
        ids_sorted = sp["doc_id"].to_numpy()
        arrays = [np.asarray(v, dtype=np.int64) for v in sp["set_keys"]]
        sets_ref = ray.put((ids_sorted, arrays))
        return _dedup_verified(
            cached_class_map(cands, _PairVerifier, sets_ref=sets_ref,
                             threshold=threshold)
        )

    # partitioned regime: join the set arrays onto the candidates (the
    # pandas join body carries list payloads; Acero is skipped for them)
    from knowledge_graph_ray.functions.joins import hash_join, project

    side_a = project(sets_ds, {"doc_id": "a", "set_keys": "__set_a"})
    side_b = project(sets_ds, {"doc_id": "b", "set_keys": "__set_b"})
    joined = hash_join(hash_join(cands, side_a, on=["a"]), side_b, on=["b"])

    def verify_joined(batch: pa.Table) -> pa.Table:
        sa_col = batch.column("__set_a").to_pylist()
        sb_col = batch.column("__set_b").to_pylist()
        rows: list[dict] = []
        for a, b, sa, sb in zip(batch.column("a").to_pylist(),
                                batch.column("b").to_pylist(),
                                sa_col, sb_col):
            if sa is None or sb is None:
                continue
            sa = np.asarray(sa, dtype=np.int64)
            sb = np.asarray(sb, dtype=np.int64)
            inter = np.intersect1d(sa, sb, assume_unique=True)
            ni = len(inter)
            if ni == 0:
                continue
            nu = len(sa) + len(sb) - ni
            jac = ni / nu
            if jac >= threshold:
                rows.append({"a": a, "b": b, "jaccard": jac,
                             "n_inter": ni, "n_union": nu})
        return pa.Table.from_pylist(rows, schema=PREFIX_PAIR_SCHEMA)

    return _dedup_verified(
        joined.map_batches(verify_joined, batch_format="pyarrow")
    )


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup_pairs(ds, threshold: float = 0.95,
                             bucket_column: str = "label",
                             vec_column: str = "embedding",
                             id_column: str = "vec_id"):
    """Cosine >= threshold pairs within a bucket key (numpy matmul per
    group).  The bucket key bounds the O(n^2): use a coarse cluster id
    (IVF assignment from stages/similarity.py) or any natural shard key."""

    def pairs_in_bucket(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(id_column)
        ids = [str(i) for i in g[id_column]]
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in g[vec_column]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sims = unit @ unit.T
        ii, jj = np.where(np.triu(sims, k=1) >= threshold)
        rows = [
            {"a": ids[i], "b": ids[j], "cosine": float(sims[i, j])}
            for i, j in zip(ii, jj)
        ]
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("a", pa.string()), ("b", pa.string()), ("cosine", pa.float64())]
            ),
        )

    return ds.groupby(bucket_column).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )


def anti_join_by_content_hash(new, prior, content_col: str = "text",
                              num_partitions: int = 16):
    """Keep ``new`` rows whose ``content_col`` value does NOT appear in
    ``prior`` — incremental-crawl dedup against an existing corpus.

    Equality is decided on the SAME 128-bit content fingerprint
    ``exact_dedup`` uses (``add_content_hash`` — one definition of
    "same content" in this module), so the anti-join shuffles 16 bytes
    per row instead of full document text — the difference between
    moving KBs and moving a fingerprint at 100-TB corpus scale.
    Collision odds at 2x64 bits are ~n^2/2^129 (negligible below
    ~10^17 rows).
    """
    from knowledge_graph_ray.functions.joins import hash_join

    def fp_full(b: pa.Table) -> pa.Table:
        return add_content_hash(b, content_col)

    def fp_only(b: pa.Table) -> pa.Table:
        return add_content_hash(b, content_col).select([_H1, _H2])

    new_fp = new.map_batches(fp_full, batch_format="pyarrow")
    prior_fp = prior.map_batches(fp_only, batch_format="pyarrow")
    kept = hash_join(new_fp, prior_fp, on=[_H1, _H2], how="left_anti",
                     num_partitions=num_partitions)

    def strip(b: pa.Table) -> pa.Table:
        return b.drop_columns([_H1, _H2])

    return kept.map_batches(strip, batch_format="pyarrow")
