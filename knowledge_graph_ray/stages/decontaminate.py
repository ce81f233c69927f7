"""Benchmark decontamination: flag training docs that share an n-gram
with an evaluation/benchmark set.

Beyond-reference operator (SURVEY §2.12 family): before training on a
web-scale corpus, every doc sharing a long-enough word n-gram with a
held-out benchmark must be dropped, or eval scores are meaningless.

Scale shape — the two sides are wildly asymmetric (100-TB train corpus
vs MB-scale benchmarks), so this is the canonical broadcast join:

* benchmark side: distinct n-grams collected once (streamed per batch,
  deduped driver-side) and shipped to the object store with ``ray.put``
  — one copy per node, read zero-copy by every task;
* train side: a stateless ``map_batches`` counts, per doc, the distinct
  grams that hit the broadcast set — no shuffle at all.

Grams are matched as exact strings (not hashes): a 32-bit gram hash
would collide ~0.02% per million benchmark grams and silently flip
counts; Python set lookups on interned strings are C-speed and exact.
If the "benchmark" side ever outgrows broadcast (contamination against
another corpus), the fallback is the flat-map-grams + ``hash_join`` on
gram + per-doc distinct count — same output, one all-to-all exchange.
"""

from __future__ import annotations

import re

import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _grams(text: str, n: int) -> set[str]:
    """Distinct lowercased word n-grams (space-joined). Docs shorter
    than ``n`` tokens contribute nothing — same rule as the SQL oracle,
    where ``lead(w, n-1)`` is NULL past the end."""
    toks = _WORD_RE.findall((text or "").lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _gram_frame(texts: "pa.ChunkedArray | pa.Array", n: int) -> "pd.DataFrame":
    """(doc_idx, gram) rows for a whole batch, vectorized: polars
    tokenize + explode, then the n-gram is a str.cat of n shifted
    token columns with a same-doc validity mask — no per-row Python
    loop.  Grams are NOT deduped per doc (callers dedupe when their
    semantics need it).  Matches _grams row-for-row."""
    import pandas as pd
    import polars as pl

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) \
        else texts
    toks = (
        pl.from_arrow(arr).fill_null("").str.to_lowercase()
        .str.extract_all(r"[\p{L}\p{N}_]+")  # rust-regex spelling of Python \w
    )
    lens = toks.list.len().to_numpy()
    import numpy as np

    doc = np.repeat(np.arange(len(arr)), lens)
    s = toks.explode(empty_as_null=False).drop_nulls().to_pandas()
    if not len(s):
        return pd.DataFrame({"doc": np.array([], dtype=np.int64),
                             "gram": pd.Series([], dtype=object)})
    parts = [s.shift(-k) for k in range(1, n)]
    gram = s.str.cat(parts, sep=" ") if parts else s
    doc_end = pd.Series(doc).shift(-(n - 1)) if n > 1 else pd.Series(doc)
    valid = (doc_end == doc).to_numpy() if n > 1 \
        else np.ones(len(doc), dtype=bool)
    return pd.DataFrame({"doc": doc[valid],
                         "gram": gram.to_numpy()[valid]})


def collect_benchmark_grams(bench, n: int, text_column: str = "text"):
    """Distinct n-grams of the benchmark side as a driver set.

    Streams per-batch distinct grams to the driver (never the texts);
    the union is small because benchmarks are. Returns the set — pass
    it through ``ray.put`` exactly once (``contaminated_counts`` does).
    """
    out: set[str] = set()
    for batch in bench.select_columns([text_column]).iter_batches(
        batch_format="pyarrow"
    ):
        for text in batch.column(text_column).to_pylist():
            out |= _grams(text, n)
    return out


def drop_contaminated(train, bench, n: int = 5,
                      text_column: str = "text",
                      id_column: str = "doc_id"):
    """Train rows sharing NO n-gram with the benchmark — the keep-side
    filter form of ``contaminated_counts``: same broadcast gram set,
    zero shuffle, original columns preserved."""
    import ray

    bench_ref = ray.put(collect_benchmark_grams(bench, n, text_column))

    def keep_clean(batch: pa.Table) -> pa.Table:
        import numpy as np

        bench_grams = ray.get(bench_ref)
        gf = _gram_frame(batch.column(text_column), n)
        hit_docs = gf["doc"].to_numpy()[
            gf["gram"].isin(bench_grams).to_numpy()
        ]
        mask = np.ones(len(batch), dtype=bool)
        mask[np.unique(hit_docs)] = False
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return train.map_batches(keep_clean, batch_format="pyarrow")


def contaminated_counts(train, bench, n: int = 5,
                        text_column: str = "text",
                        id_column: str = "doc_id",
                        count_column: str = "n_shared"):
    """Per contaminated train doc: how many DISTINCT n-grams it shares
    with the benchmark set (docs with zero overlap are dropped — the
    keep-set is ``train MINUS result``)."""
    import numpy as np
    import ray

    bench_ref = ray.put(collect_benchmark_grams(bench, n, text_column))

    def count_hits(batch: pa.Table) -> pa.Table:
        bench_grams = ray.get(bench_ref)  # zero-copy local object store read
        ids = batch.column(id_column)
        gf = _gram_frame(batch.column(text_column), n) \
            .drop_duplicates(["doc", "gram"])
        hits = gf[gf["gram"].isin(bench_grams).to_numpy()]
        counts = np.zeros(len(batch), dtype=np.int64)
        hc = hits.groupby("doc").size()
        counts[hc.index.to_numpy()] = hc.to_numpy()
        out = pa.table({
            id_column: ids,
            count_column: pa.array(counts, type=pa.int64()),
        })
        return out.filter(pa.compute.greater(out.column(count_column), 0))

    return train.map_batches(count_hits, batch_format="pyarrow")
