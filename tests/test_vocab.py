"""Vocabulary / PMI co-occurrence stage tests vs brute force."""

import math
from collections import Counter
from itertools import combinations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from knowledge_graph_ray.functions.numeric import round_half_away
from knowledge_graph_ray.stages.vocab import (
    document_frequency,
    term_cooccurrence_pmi,
    top_vocabulary,
)

SF = "/root/testdata/sf0.001"


def _brute_doc_terms(pdf):
    return {
        row.doc_id: {t for t in str(row.text).lower().split(" ") if t}
        for row in pdf.itertuples()
    }


def test_document_frequency_matches_bruteforce():
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = (
        document_frequency(docs).to_pandas()
        .sort_values("term").reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    df = Counter(t for terms in _brute_doc_terms(pdf).values() for t in terms)
    expected = (
        pd.DataFrame(sorted(df.items()), columns=["term", "df"])
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_top_vocabulary_deterministic_cut():
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b", "a c", "b z"],
    }))
    got = top_vocabulary(ds, k=2).to_pandas()
    # a and b tie at df=2 > c/z at 1; tie broken by term asc
    assert got.term.tolist() == ["a", "b"]
    assert got.df.tolist() == [2, 2]


def test_term_cooccurrence_pmi_matches_bruteforce():
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    n_docs = docs.count()
    got = (
        term_cooccurrence_pmi(docs, n_docs=n_docs, vocab_k=10)
        .to_pandas().sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    doc_terms = _brute_doc_terms(pdf)
    df = Counter(t for terms in doc_terms.values() for t in terms)
    vocab = dict(
        sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    pair_counts = Counter()
    for terms in doc_terms.values():
        vt = sorted(t for t in terms if t in vocab)
        for a, b in combinations(vt, 2):
            pair_counts[(a, b)] += 1
    rows = [
        (a, b, c, vocab[a], vocab[b],
         round_half_away(math.log(c * n_docs / (vocab[a] * vocab[b]))
                         * 1_000_000))
        for (a, b), c in sorted(pair_counts.items())
    ]
    expected = pd.DataFrame(
        rows, columns=["term_a", "term_b", "n_ab", "df_a", "df_b", "pmi_e6"]
    )
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)


def test_vocab_handles_null_and_empty_text():
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["  hello   world ", None, ""], type=pa.string()),
    }))
    got = document_frequency(ds).to_pandas().sort_values("term")
    # repeated separators produce empty tokens: dropped, not counted
    assert got.term.tolist() == ["hello", "world"]
    assert got.df.tolist() == [1, 1]


def test_term_doc_pairs_distinct_and_posting_order_numeric():
    from knowledge_graph_ray.stages.vocab import term_doc_pairs

    # doc ids 2 and 10 pin NUMERIC posting order (lexicographic would
    # emit "10,2"); repeated terms within a doc dedupe to one pair
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 2], type=pa.int64()),
        "text": pa.array(["alpha beta alpha", "beta gamma"],
                         type=pa.string()),
    }))
    pairs = term_doc_pairs(ds).to_pandas()
    got = set(map(tuple, pairs[["term", "doc_id"]].itertuples(index=False)))
    assert got == {("alpha", 10), ("beta", 10), ("beta", 2), ("gamma", 2)}

    from knowledge_graph_ray.functions.agg import grouped_string_agg

    with_str = term_doc_pairs(ds).map_batches(
        lambda t: t.append_column(
            "doc_id_str", t.column("doc_id").cast(pa.string())),
        batch_format="pyarrow",
    )
    postings = grouped_string_agg(
        with_str, ["term"], "doc_id_str", ["doc_id"], sep=",",
        out_col="postings",
    ).to_pandas().set_index("term")["postings"]
    assert postings["beta"] == "2,10"


def test_bigram_counts_vs_brute_force():
    from knowledge_graph_ray.stages.vocab import bigram_counts

    texts = ["a b a b c", "b  c b", "x", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    got = {
        (r.term_a, r.term_b): r.n
        for r in bigram_counts(ds).to_pandas().itertuples()
    }
    want = Counter()
    for t in texts:
        toks = [w for w in t.lower().split(" ") if w]
        for a, b in zip(toks, toks[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


def test_term_count_pairs_counts_duplicates():
    from knowledge_graph_ray.stages.vocab import term_count_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a a b", "b"], type=pa.string()),
    }))
    got = {
        (r.doc_id, r.term): r.tf
        for r in term_count_pairs(ds).to_pandas().itertuples()
    }
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1}
