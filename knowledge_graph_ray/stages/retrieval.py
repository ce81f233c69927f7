"""Keyword retrieval: BM25 scoring and reciprocal-rank fusion.

The query-serving half of a corpus pipeline needs lexical retrieval
next to the vector path (reference serves entities from a vector store,
`search_test.py:50-56`; production GraphRAG deployments pair that with
keyword search).  Two operators:

* ``bm25_topk`` — Okapi BM25 top-k for a fixed query-term set, in two
  streaming passes with NO all-to-all shuffle:

  - pass 1 (stats): one ``map_batches`` over the corpus emits ONE row
    per batch (n_docs, sum_dl, df per query term — a wide fixed schema
    because the term set is a bounded query constant); the driver sums
    the bounded (batches × 1) table.  At 100 TB this moves a few
    thousand tiny rows.
  - pass 2 (score): idf/avgdl broadcast via ``ray.put``; a stateless
    vectorized scorer computes tf/dl per doc (one split+explode per
    batch, no per-row loop) and keeps a local top-k, so only
    k × batches candidate rows reach the final bounded sort.

* ``rrf_fuse`` — reciprocal-rank fusion (Cormack et al. 2009,
  ``score = Σ 1/(c + rank)``) of bounded ranked lists (e.g. BM25 ∪
  cosine top-m) — pure driver-side math over ≤ m-row inputs.

SQL-parity discipline (same as stages/vocab PMI and functions/agg
grouped_corr): tokenization is ``string_split(lower(text), ' ')`` with
empty tokens dropped; tf/dl/df/N are exact integers; every float
expression is written with the SAME operand order and literals as the
DuckDB oracle (left-associative, ``(k1 + 1.0)`` spelled identically
both sides) so the float64 results are bit-identical; ``ln`` is scalar
``math.log`` (glibc libm, matches DuckDB ``ln``) over the bounded term
set; the exported score is e6 fixed point via
functions/numeric.round_half_away (DuckDB ``round`` semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _term_cols(terms: list[str]) -> list[str]:
    return [f"df_{i}" for i in range(len(terms))]


def bm25_corpus_stats(docs, terms: list[str], id_col: str = "doc_id",
                      text_col: str = "text") -> dict:
    """One streaming pass -> {'n_docs', 'sum_dl', 'df': {term: df}}.

    Each batch emits exactly one wide row of exact-int partials; the
    driver pull is bounded at one row per batch regardless of corpus
    size.
    """
    terms = sorted(terms)
    cols = _term_cols(terms)
    schema = pa.schema(
        [("n_partial", pa.int64()), ("dl_partial", pa.int64())]
        + [(c, pa.int64()) for c in cols]
    )

    def partial(batch: pa.Table) -> pa.Table:
        toks = (
            pd.DataFrame({
                "_id": batch.column(id_col).to_pandas(),
                "term": batch.column(text_col).cast(pa.string())
                .to_pandas().str.lower().str.split(" "),
            })
            .explode("term")
        )
        toks = toks[toks.term.notna() & (toks.term != "")]
        row = {"n_partial": batch.num_rows, "dl_partial": len(toks)}
        hit = toks[toks.term.isin(terms)]
        df_t = hit.drop_duplicates(["_id", "term"]).groupby(
            "term", sort=False).size()
        for c, t in zip(cols, terms):
            row[c] = int(df_t.get(t, 0))
        return pa.Table.from_pylist([row], schema=schema)

    stats = docs.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()  # bounded: one row per batch
    if stats.empty:  # zero-block corpus produces no partial rows at all
        return {"n_docs": 0, "sum_dl": 0, "df": {t: 0 for t in terms}}
    return {
        "n_docs": int(stats["n_partial"].sum()),
        "sum_dl": int(stats["dl_partial"].sum()),
        "df": {t: int(stats[c].sum()) for c, t in zip(cols, terms)},
    }


def bm25_topk(docs, terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              stats: dict | None = None):
    """-> Dataset[(doc_id, score_e6)] — global BM25 top-k, sorted by
    (score desc, doc_id asc).  Docs missing every term score 0 and
    still rank (SQL LEFT JOIN semantics).

    idf uses the standard smoothed form
    ``ln((N - df + 0.5) / (df + 0.5) + 1.0)``; per-doc contributions
    are summed in sorted-term order so the float64 sum matches the
    oracle's left-associative ``+`` chain bit for bit.
    """
    import ray

    terms = sorted(terms)
    if stats is None:
        stats = bm25_corpus_stats(docs, terms, id_col=id_col,
                                  text_col=text_col)
    n, sum_dl = stats["n_docs"], stats["sum_dl"]
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], type=pa.int64()),
             "score_e6": pa.array([], type=pa.int64())}))
    # all driver-side scalar float64, mirrored verbatim in the oracle
    avgdl = sum_dl / n
    idf = {t: math.log((n - stats["df"][t] + 0.5)
                       / (stats["df"][t] + 0.5) + 1.0)
           for t in terms}
    k1p1 = k1 + 1.0
    bc = ray.put((terms, idf, avgdl, k1, b, k1p1))

    def score_batch(batch: pa.Table) -> pa.Table:
        terms_, idf_, avgdl_, k1_, b_, k1p1_ = ray.get(bc)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        toks = (
            pd.DataFrame({
                "_row": np.arange(batch.num_rows),
                "term": batch.column(text_col).cast(pa.string())
                .to_pandas().str.lower().str.split(" "),
            })
            .explode("term")
        )
        toks = toks[toks.term.notna() & (toks.term != "")]
        dl = np.zeros(batch.num_rows, dtype=np.float64)
        dl_counts = toks.groupby("_row", sort=False).size()
        dl[dl_counts.index.to_numpy()] = dl_counts.to_numpy()
        hit = toks[toks.term.isin(terms_)]
        tf_by_term = {}
        if len(hit):
            tfc = hit.groupby(["term", "_row"], sort=False).size()
            for t in terms_:
                tf = np.zeros(batch.num_rows, dtype=np.float64)
                if t in tfc.index.get_level_values(0):
                    s = tfc.loc[t]
                    tf[s.index.to_numpy()] = s.to_numpy()
                tf_by_term[t] = tf
        else:
            tf_by_term = {t: np.zeros(batch.num_rows) for t in terms_}
        # identical operand order to the oracle:
        #   idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        denom_tail = k1_ * (1.0 - b_ + b_ * dl / avgdl_)
        score = np.zeros(batch.num_rows, dtype=np.float64)
        for t in terms_:  # sorted order == the SQL `+` chain
            tf = tf_by_term[t]
            score = score + idf_[t] * (tf * k1p1_) / (tf + denom_tail)
        scaled = score * 1_000_000.0
        # vectorized round-half-away (== functions/numeric.round_half_away
        # == DuckDB round()): floor(x+0.5) for x>=0, ceil(x-0.5) below
        score_e6 = np.where(
            scaled >= 0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
        ).astype(np.int64)
        take = min(k, batch.num_rows)
        order = np.lexsort((ids, -score_e6))[:take]
        return pa.table({
            id_col: pa.array(ids[order], type=pa.int64()),
            "score_e6": pa.array(score_e6[order], type=pa.int64()),
        })

    local = docs.select_columns([id_col, text_col]).map_batches(
        score_batch, batch_format="pyarrow"
    )
    # final exchange over <= k x batches candidate rows only
    return local.sort(["score_e6", id_col],
                      descending=[True, False]).limit(k)


def rrf_fuse(rankings: list[pd.DataFrame], id_col: str = "doc_id",
             rank_col: str = "rk", c: float = 60.0,
             k: int = 10) -> pa.Table:
    """Reciprocal-rank fusion over bounded ranked lists (driver-side;
    inputs are global top-m results, <= m rows each).

    -> pa.Table[(id_col, rrf_e9, rk)] sorted by (rrf desc, id asc).
    Contribution order follows the list order of ``rankings`` so the
    float64 sum mirrors the oracle's coalesce(+) chain.
    """
    from knowledge_graph_ray.functions.numeric import round_half_away

    all_ids = sorted({int(i) for r in rankings for i in r[id_col]})
    score = {i: 0.0 for i in all_ids}
    for r in rankings:
        by_id = dict(zip(r[id_col].astype(int), r[rank_col].astype(int)))
        for i in all_ids:
            if i in by_id:
                score[i] = score[i] + 1.0 / (c + by_id[i])
    rows = sorted(
        ((i, round_half_away(s * 1_000_000_000.0)) for i, s in score.items()),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    return pa.table({
        id_col: pa.array([r[0] for r in rows], type=pa.int64()),
        "rrf_e9": pa.array([r[1] for r in rows], type=pa.int64()),
        "rk": pa.array(range(1, len(rows) + 1), type=pa.int64()),
    })
