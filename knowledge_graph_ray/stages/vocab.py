"""Corpus vocabulary statistics: document frequency and PMI co-occurrence.

Two classic corpus-analysis operators a training-data pipeline needs
(vocabulary pruning, stopword discovery, PMI-weighted concept graphs —
the same shape as the reference's entity co-occurrence edges, reference
`graph_extractor.py` builds edges from per-chunk entity pairs):

* ``document_frequency`` — distinct-term-per-doc explode with a
  per-batch partial-count combiner: the shuffle moves one row per
  (term, batch), never one row per token occurrence.
* ``term_cooccurrence_pmi`` — two-pass broadcast pattern: pass 1
  derives a bounded vocabulary (top-k by document frequency) that is
  broadcast via ``ray.put`` (read once per task, never re-shipped per
  batch); pass 2 self-merges each batch's (doc, vocab-term) explode on
  doc_id — a vectorized pandas merge, no per-doc Python pair loop —
  and partial-counts the pairs.  Output is <= k*(k-1)/2 rows however
  large the corpus, so the final PMI computation is bounded.

Tokenization is the repo's SQL-parity convention (textstats.py):
whitespace split + lower, empty tokens dropped —
``string_split(lower(text), ' ')`` on the oracle side.

PMI note: ``pmi_e6 = round(ln(n_ab * n_docs / (df_a * df_b)) * 1e6)``
uses scalar ``math.log`` (glibc libm — bit-identical to DuckDB's
``ln``) over the bounded pair table, with DuckDB-style
round-half-away (functions/numeric.round_half_away).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.agg import grouped_agg


def _explode_distinct_terms(batch: pa.Table, id_col: str,
                            text_col: str) -> pd.DataFrame:
    """(doc_id, term) rows, terms deduped within each doc — vectorized
    pandas split/explode/drop_duplicates, no per-row loop."""
    df = pd.DataFrame(
        {
            id_col: batch.column(id_col).to_pandas(),
            "term": batch.column(text_col)
            .cast(pa.string())
            .to_pandas()
            .str.lower()
            .str.split(" "),
        }
    ).explode("term")
    df = df[df.term.notna() & (df.term != "")]
    return df.drop_duplicates([id_col, "term"])


def document_frequency(docs, id_col: str = "doc_id",
                       text_col: str = "text",
                       num_buckets: int = 16,
                       driver_threshold: int | None = 500_000):
    """-> Dataset[(term, df)]: number of docs containing each term.

    Combiner shape: each doc appears in exactly one batch, so counting
    per-doc-deduped rows per term inside the batch gives an additive
    partial — grouped_agg then moves one partial row per (term, batch).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = _explode_distinct_terms(batch, id_col, text_col)
        counts = df.groupby("term", sort=False).size()
        return pa.Table.from_pydict(
            {
                "term": pa.array(counts.index, type=pa.string()),
                "df_partial": pa.array(counts.to_numpy(), type=pa.int64()),
            }
        )

    partials = docs.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_agg(
        partials, ["term"], [("df", "df_partial", "sum")],
        num_buckets=num_buckets, driver_threshold=driver_threshold,
    )


def top_vocabulary(docs, k: int = 100, **kwargs):
    """Top-k terms by document frequency, ties broken by term asc
    (deterministic cut).  The sort runs over the term-cardinality df
    table, never the corpus."""
    return (
        document_frequency(docs, **kwargs)
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
    )


PAIR_SCHEMA = pa.schema(
    [("term_a", pa.string()), ("term_b", pa.string()),
     ("n_ab", pa.int64())]
)


def term_cooccurrence_pmi(docs, n_docs: int, vocab_k: int = 100,
                          id_col: str = "doc_id", text_col: str = "text",
                          num_buckets: int = 16,
                          driver_threshold: int | None = 500_000):
    """-> Dataset[(term_a, term_b, n_ab, df_a, df_b, pmi_e6)] for
    unordered vocab-term pairs co-occurring in at least one doc
    (term_a < term_b).

    ``n_docs`` is the corpus size (parquet metadata count — free).
    The vocabulary is bounded (``vocab_k``) so the pair space, the
    broadcast object, and the output are all O(k^2) regardless of
    corpus size.
    """
    import math

    import ray

    from knowledge_graph_ray.functions.numeric import round_half_away

    vocab_pdf = top_vocabulary(
        docs, k=vocab_k, id_col=id_col, text_col=text_col,
        num_buckets=num_buckets, driver_threshold=driver_threshold,
    ).to_pandas()  # bounded: k rows
    df_map = dict(zip(vocab_pdf["term"], vocab_pdf["df"].astype(int)))
    # sorted vocab: matrix column i < j  <=>  term_i < term_j, so the
    # upper triangle IS the term_a < term_b pair set
    vocab_terms = sorted(df_map)
    vocab_ref = ray.put({t: i for i, t in enumerate(vocab_terms)})

    def pair_partial(batch: pa.Table) -> pa.Table:
        """Incidence-matrix matmul: C = M^T M over the batch's
        docs x vocab 0/1 matrix — O(docs*k + k^2) per batch.  (A
        self-merge pair explode is O(docs * k^2) ROWS — measured 45x
        slower on a dense-vocabulary corpus.)"""
        import numpy as np

        term_idx = ray.get(vocab_ref)
        df = _explode_distinct_terms(batch, id_col, text_col)
        cols = df["term"].map(term_idx)
        keep = cols.notna()
        if not keep.any():
            return PAIR_SCHEMA.empty_table()
        rows = pd.factorize(df[id_col][keep])[0]
        k = len(term_idx)
        m = np.zeros((rows.max() + 1, k), dtype=np.float64)
        m[rows, cols[keep].to_numpy(dtype=np.int64)] = 1.0
        c = m.T @ m
        ai, bi = np.triu_indices(k, k=1)
        n_ab = c[ai, bi]
        nz = n_ab > 0
        terms = np.asarray(vocab_terms, dtype=object)
        return pa.Table.from_pydict(
            {
                "term_a": pa.array(terms[ai[nz]], type=pa.string()),
                "term_b": pa.array(terms[bi[nz]], type=pa.string()),
                "n_ab": pa.array(n_ab[nz].astype(np.int64)),
            },
            schema=PAIR_SCHEMA,
        )

    partials = docs.select_columns([id_col, text_col]).map_batches(
        pair_partial, batch_format="pyarrow"
    )
    agg = grouped_agg(
        partials, ["term_a", "term_b"], [("n_ab", "n_ab", "sum")],
        num_buckets=num_buckets, driver_threshold=driver_threshold,
    )

    def finish(batch: pa.Table) -> pa.Table:
        ta = batch.column("term_a").to_pylist()
        tb = batch.column("term_b").to_pylist()
        n_ab = batch.column("n_ab").to_pylist()
        df_a = [df_map[t] for t in ta]
        df_b = [df_map[t] for t in tb]
        # scalar math.log per pair over the bounded (<= k^2/2) table —
        # libm-exact vs the DuckDB ln oracle where a numpy SIMD log
        # could differ by one ulp
        pmi = [
            round_half_away(
                math.log((c * n_docs) / (a * b)) * 1_000_000
            )
            for c, a, b in zip(n_ab, df_a, df_b)
        ]
        return pa.Table.from_pydict(
            {
                "term_a": batch.column("term_a"),
                "term_b": batch.column("term_b"),
                "n_ab": batch.column("n_ab"),
                "df_a": pa.array(df_a, type=pa.int64()),
                "df_b": pa.array(df_b, type=pa.int64()),
                "pmi_e6": pa.array(pmi, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")

def term_doc_pairs(docs, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset[(term, doc_id)]: distinct (term, doc) incidence rows —
    the exploded form behind document_frequency, exported for postings
    / inverted-index builds.  Vectorized split/explode per batch; each
    doc's terms are deduped inside its batch, and docs never span
    batches, so the rows are globally distinct."""

    def explode(batch: pa.Table) -> pa.Table:
        df = _explode_distinct_terms(batch, id_col, text_col)
        return pa.Table.from_pydict({
            "term": pa.array(df["term"].to_numpy(dtype=object),
                             type=pa.string()),
            id_col: pa.array(df[id_col].to_numpy(), type=pa.int64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def term_count_pairs(docs, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset[(doc_id, term, tf)]: per-document term frequencies —
    the counted (not deduped) companion of term_doc_pairs, for TF-IDF.
    Docs never span batches, so in-batch (doc, term) counts are global."""

    def explode(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            id_col: batch.column(id_col).to_pandas(),
            "term": batch.column(text_col).cast(pa.string()).to_pandas()
            .str.lower().str.split(" "),
        }).explode("term")
        df = df[df.term.notna() & (df.term != "")]
        counts = df.groupby([id_col, "term"], sort=False).size()
        idx = counts.index.to_frame(index=False)
        return pa.Table.from_pydict({
            id_col: pa.array(idx[id_col].to_numpy(), type=pa.int64()),
            "term": pa.array(idx["term"].to_numpy(dtype=object),
                             type=pa.string()),
            "tf": pa.array(counts.to_numpy(), type=pa.int64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def bigram_counts(docs, id_col: str = "doc_id", text_col: str = "text",
                  num_buckets: int = 16,
                  driver_threshold: int | None = 500_000):
    """-> Dataset[(term_a, term_b, n)]: corpus-wide adjacent-token
    bigram counts (empty tokens dropped BEFORE pairing) — the n-gram
    language-model counting shape.

    Combiner shape: per batch one vectorized explode + within-doc
    shift(-1) produces the batch's bigram rows; in-batch pair counts
    are additive partials, so the shuffle moves (pair, batch) partial
    rows, never tokens."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            id_col: batch.column(id_col).to_pandas(),
            "term": batch.column(text_col).cast(pa.string()).to_pandas()
            .str.lower().str.split(" "),
        }).explode("term")
        df = df[df.term.notna() & (df.term != "")]
        df["next"] = df.groupby(id_col, sort=False)["term"].shift(-1)
        df = df[df["next"].notna()]
        counts = df.groupby(["term", "next"], sort=False).size()
        idx = counts.index.to_frame(index=False)
        return pa.Table.from_pydict({
            "term_a": pa.array(idx["term"].to_numpy(dtype=object),
                               type=pa.string()),
            "term_b": pa.array(idx["next"].to_numpy(dtype=object),
                               type=pa.string()),
            "n_partial": pa.array(counts.to_numpy(), type=pa.int64()),
        })

    partials = docs.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_agg(
        partials, ["term_a", "term_b"], [("n", "n_partial", "sum")],
        num_buckets=num_buckets, driver_threshold=driver_threshold,
    )
