"""BM25 + reciprocal-rank fusion (stages/retrieval)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from knowledge_graph_ray.stages.retrieval import (
    bm25_corpus_stats,
    bm25_topk,
    rrf_fuse,
)

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana banana"),
    (2, "cherry date elderberry fig grape"),
    (3, "apple apple apple apple banana"),
    (4, ""),  # zero-token doc still counts toward N and can rank
    (5, "date fig"),
]


def _ds(rows, override_num_blocks=None):
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    })
    ds = ray.data.from_arrow(tbl)
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    return ds


def _brute_bm25(rows, terms, k1=1.2, b=0.75):
    """Row-at-a-time reference implementation (textbook Okapi form)."""
    toks = {i: [t for t in text.lower().split(" ") if t] for i, text in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, _ in rows:
        s = 0.0
        for t in sorted(terms):
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tf = toks[i].count(t)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(toks[i]) / avgdl))
        out[i] = s
    return out


def test_corpus_stats_exact():
    stats = bm25_corpus_stats(_ds(DOCS), ["apple", "banana", "zzz"])
    assert stats["n_docs"] == 6
    assert stats["sum_dl"] == 4 + 3 + 5 + 5 + 0 + 2
    assert stats["df"] == {"apple": 2, "banana": 3, "zzz": 0}


def test_bm25_matches_brute_force():
    top = bm25_topk(_ds(DOCS), ["apple", "banana"], k=6).to_pandas()
    brute = _brute_bm25(DOCS, ["apple", "banana"])
    want = sorted(brute.items(), key=lambda kv: (-round(kv[1] * 1e6), kv[0]))
    assert list(top["doc_id"]) == [i for i, _ in want]
    for _, row in top.iterrows():
        assert row["score_e6"] == round(brute[row["doc_id"]] * 1e6)


def test_bm25_partitioning_invariant():
    """Same result whether the corpus is 1 block or 4 blocks (the stats
    partials and local top-k must be genuinely additive/mergeable)."""
    one = bm25_topk(_ds(DOCS), ["apple", "cherry"], k=4).to_pandas()
    four = bm25_topk(_ds(DOCS, override_num_blocks=4),
                     ["apple", "cherry"], k=4).to_pandas()
    pd.testing.assert_frame_equal(one, four)


def test_bm25_absent_term_scores_zero_docs_rank_by_id():
    top = bm25_topk(_ds(DOCS), ["notinthecorpus"], k=3).to_pandas()
    assert list(top["doc_id"]) == [0, 1, 2]
    assert set(top["score_e6"]) == {0}


def test_bm25_empty_corpus():
    top = bm25_topk(_ds([]), ["apple"], k=3).to_pandas()
    assert len(top) == 0


def test_rrf_fuse_hand_math():
    a = pd.DataFrame({"doc_id": [1, 2, 3], "rk": [1, 2, 3]})
    b = pd.DataFrame({"doc_id": [3, 4], "rk": [1, 2]})
    out = rrf_fuse([a, b], k=10).to_pandas()
    want = {
        1: 1.0 / 61.0,
        2: 1.0 / 62.0,
        3: 1.0 / 63.0 + 1.0 / 61.0,
        4: 1.0 / 62.0,
    }
    for _, row in out.iterrows():
        assert row["rrf_e9"] == round(want[row["doc_id"]] * 1e9)
    # doc 3 appears in both lists -> highest fused score
    assert out.iloc[0]["doc_id"] == 3
    # ties (2 and 4 at 1/62) break by id asc
    ids = list(out["doc_id"])
    assert ids.index(2) < ids.index(4)
    assert list(out["rk"]) == list(range(1, len(out) + 1))


def test_rrf_k_cut():
    a = pd.DataFrame({"doc_id": list(range(20)), "rk": list(range(1, 21))})
    out = rrf_fuse([a], k=5).to_pandas()
    assert len(out) == 5
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4]
