"""stages/quality: repetition stats, unigram log-prob scoring, and
cross-document duplicated-span detection vs brute-force references."""

import math
from collections import Counter

import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.functions.numeric import round_half_away
from knowledge_graph_ray.stages.quality import (
    duplicated_spans,
    repetition_stats,
    unigram_logprob,
)

DOCS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the cat sat on a hat"),
    (3, "unique words only here today"),
    (4, "rep rep rep rep"),
    (5, "solo"),
    (6, "  spaced   out  tokens "),  # empty tokens dropped
]


def _ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
        "text": pa.array([t for _, t in DOCS], type=pa.string()),
    })).repartition(3)


def _toks(text):
    return [t for t in text.lower().split(" ") if t]


def test_repetition_stats_brute_force():
    got = {r["doc_id"]: r
           for r in repetition_stats(_ds()).to_pandas().to_dict("records")}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        toks = _toks(text)
        n, d = len(toks), len(set(toks))
        topc = max(Counter(toks).values())
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        row = got[doc_id]
        assert row["n_tokens"] == n
        assert row["dup_token_frac_e6"] == round_half_away((n - d) / n * 1e6)
        assert row["top_token_share_e6"] == round_half_away(topc / n * 1e6)
        exp_bg = (round_half_away(
            (len(bgs) - len(set(bgs))) / len(bgs) * 1e6) if bgs else 0)
        assert row["dup_bigram_frac_e6"] == exp_bg, (doc_id, text)
    # doc 4 is maximally repetitive, doc 3 has zero repetition
    assert got[4]["dup_token_frac_e6"] == 750_000
    assert got[4]["dup_bigram_frac_e6"] == round_half_away(2 / 3 * 1e6)
    assert got[3]["dup_token_frac_e6"] == 0
    assert got[5]["dup_bigram_frac_e6"] == 0  # single token: no bigrams


def test_unigram_logprob_brute_force():
    got = {r["doc_id"]: r
           for r in unigram_logprob(_ds()).to_pandas().to_dict("records")}
    corpus = Counter(t for _, text in DOCS for t in _toks(text))
    total = float(sum(corpus.values()))
    lp = {t: round_half_away(math.log(c / total) * 1e6)
          for t, c in corpus.items()}
    for doc_id, text in DOCS:
        toks = _toks(text)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["sum_logprob_e6"] == sum(lp[t] for t in toks)
    # common-word docs score higher (less negative) per token than
    # the unique-word doc
    mean3 = got[3]["sum_logprob_e6"] / got[3]["n_tokens"]
    mean1 = got[1]["sum_logprob_e6"] / got[1]["n_tokens"]
    assert mean1 > mean3


def test_unigram_logprob_vocab_guard():
    import pytest

    with pytest.raises(ValueError, match="vocab_max"):
        unigram_logprob(_ds(), vocab_max=3)


def test_duplicated_spans_brute_force():
    got = {r["doc_id"]: r
           for r in duplicated_spans(_ds(), window=3).to_pandas()
           .to_dict("records")}
    wins = {doc_id: [" ".join(_toks(t)[i:i + 3])
                     for i in range(len(_toks(t)) - 2)]
            for doc_id, t in DOCS}
    owners = {}
    for doc_id, ws in wins.items():
        for w in set(ws):
            owners.setdefault(w, set()).add(doc_id)
    dup = {w for w, o in owners.items() if len(o) > 1}
    for doc_id, ws in wins.items():
        if not ws:  # short docs have no spans and no output row
            assert doc_id not in got
            continue
        row = got[doc_id]
        n_dup = sum(1 for w in ws if w in dup)
        assert row["n_windows"] == len(ws)
        assert row["n_dup_windows"] == n_dup
        assert row["dup_span_frac_e6"] == round_half_away(
            n_dup / len(ws) * 1e6)
    # "the cat sat on" is shared between docs 1 and 2 -> both nonzero
    assert got[1]["n_dup_windows"] >= 2 and got[2]["n_dup_windows"] >= 2
    # doc 4's repeated span repeats only within itself -> not duplicated
    assert got[4]["n_dup_windows"] == 0


def test_quality_empty_input():
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
    }))
    assert repetition_stats(empty).count() == 0
    assert unigram_logprob(empty).count() == 0
    assert duplicated_spans(empty, window=3).count() == 0
