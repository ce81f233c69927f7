"""Training-corpus quality signals: repetition stats, unigram-LM
log-probability scoring, and cross-document duplicated-span detection.

Three public-literature operators every 100-TB LLM-data pipeline runs
before training (the Gopher repetition rules, CCNet-style LM quality
filtering, and exact shared-span copy detection — the document-level
complement of the window/shingle dedup family in ``stages/dedup.py``):

* ``repetition_stats`` — per-document duplicate-token fraction,
  top-token share, and duplicate-bigram fraction.  Purely row-local:
  ONE stateless vectorized ``map_batches`` pass, ZERO shuffle at any
  corpus size (each document's stats never leave its batch).
* ``unigram_logprob`` — two-pass broadcast pattern: pass 1 folds
  per-batch token-count partials into the corpus unigram table (the
  shuffle moves one row per (term, batch), never per token); the
  bounded vocabulary's integer log-probs are broadcast ONCE via
  ``ray.put``; pass 2 is a stateless zero-shuffle scan that sums
  integer term scores per document.  Term scores are e6 fixed-point
  BIGINTs computed with scalar ``math.log`` (glibc libm — bit-identical
  to DuckDB ``ln``, same convention as vocab.term_cooccurrence_pmi), so
  the per-document sum is EXACT integer arithmetic — no
  float-summation-order drift against the SQL oracle.
* ``duplicated_spans`` — explodes each document into overlapping
  ``window``-token spans, fingerprints each span to 128 bits
  (two independent u64 families, the dedup_incremental convention), and
  counts per document the span occurrences whose text appears in more
  than one distinct document.  The shuffles move 24-byte
  (fp128, doc_id) rows, never span text; the duplicated-fingerprint set
  stays a Dataset and reaches the occurrence stream through the
  size-adaptive ``bloom_semi_join`` (broadcast when bounded, bitmap +
  residual join when not).

Tokenization is the repo's SQL-parity convention (textstats.py):
whitespace split + lower, empty tokens dropped —
``string_split(lower(text), ' ')`` on the oracle side.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from knowledge_graph_ray.functions.agg import grouped_agg

_E6 = 1_000_000.0


def _round_half_away_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized DuckDB round(): half away from zero -> int64."""
    return np.where(
        x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
    ).astype(np.int64)


def _explode_tokens(batch: pa.Table, id_col: str,
                    text_col: str) -> pd.DataFrame:
    """(rid, tok) rows in document order — vectorized split/explode,
    empty tokens dropped (SQL-parity: list_filter(split, x <> ''))."""
    df = pd.DataFrame(
        {
            "rid": batch.column(id_col).to_pandas(),
            "tok": batch.column(text_col)
            .cast(pa.string())
            .to_pandas()
            .str.lower()
            .str.split(" "),
        }
    ).explode("tok", ignore_index=True)
    return df[df.tok.notna() & (df.tok != "")]


def repetition_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset[(id_col, n_tokens, dup_token_frac_e6,
    top_token_share_e6, dup_bigram_frac_e6)] — the Gopher-style
    repetition signals, one zero-shuffle vectorized pass.

    dup_token_frac = 1 - distinct_tokens/total; top_token_share =
    most-frequent-token count/total; dup_bigram_frac = 1 -
    distinct_bigrams/total_bigrams (0 for docs with < 2 tokens).
    Documents with zero tokens are dropped (the SQL group-by shape).
    """

    def body(batch: pa.Table) -> pa.Table:
        df = _explode_tokens(batch, id_col, text_col)
        counts = df.groupby(["rid", "tok"], sort=False).size()
        per_doc = counts.groupby(level=0, sort=False)
        n = per_doc.sum()
        d = per_doc.size()
        topc = per_doc.max()
        # bigrams: explode preserves within-doc order, so consecutive
        # rows of the same rid are adjacent tokens
        same = (df.rid == df.rid.shift(-1)).to_numpy()
        bg = pd.DataFrame(
            {"rid": df.rid[same], "b": (df.tok + " " + df.tok.shift(-1))[same]}
        )
        nb = bg.groupby("rid", sort=False).size().reindex(n.index,
                                                          fill_value=0)
        db = (bg.drop_duplicates().groupby("rid", sort=False).size()
              .reindex(n.index, fill_value=0))
        nf = n.to_numpy(dtype=np.float64)
        nbf = nb.to_numpy(dtype=np.float64)
        bfrac = np.zeros(len(n))
        has_bg = nbf > 0
        bfrac[has_bg] = ((nbf[has_bg] - db.to_numpy(dtype=np.float64)[has_bg])
                         / nbf[has_bg] * _E6)
        id_type = batch.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(n.index.to_numpy(), type=id_type),
            "n_tokens": pa.array(n.to_numpy(dtype=np.int64),
                                 type=pa.int64()),
            "dup_token_frac_e6": pa.array(_round_half_away_vec(
                (nf - d.to_numpy(dtype=np.float64)) / nf * _E6)),
            "top_token_share_e6": pa.array(_round_half_away_vec(
                topc.to_numpy(dtype=np.float64) / nf * _E6)),
            "dup_bigram_frac_e6": pa.array(_round_half_away_vec(bfrac)),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        body, batch_format="pyarrow"
    )


def unigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text",
                    vocab_max: int = 5_000_000):
    """-> Dataset[(id_col, n_tokens, sum_logprob_e6)] — CCNet-style
    corpus-LM quality score: each token scores
    round(ln(count(token)/total_tokens) * 1e6) under the corpus's OWN
    unigram model; a document's score is the integer sum (low = rare /
    junk tokens, the filterable tail).

    The vocabulary table is pulled to the driver to compute the term
    scores (guarded by ``vocab_max`` — natural-language vocabularies
    plateau in the millions; raise the cap or pre-prune with
    ``vocab.top_vocabulary`` for adversarial corpora) and broadcast once
    via ``ray.put``.
    """
    import ray

    src = docs.select_columns([id_col, text_col])

    def count_partial(batch: pa.Table) -> pa.Table:
        df = _explode_tokens(batch, id_col, text_col)
        counts = df.groupby("tok", sort=False).size()
        return pa.table({
            "term": pa.array(counts.index, type=pa.string()),
            "c_partial": pa.array(counts.to_numpy(), type=pa.int64()),
        })

    term_counts = grouped_agg(
        src.map_batches(count_partial, batch_format="pyarrow"),
        ["term"], [("c", "c_partial", "sum")],
    ).materialize()
    n_terms = term_counts.count()
    if n_terms > vocab_max:
        raise ValueError(
            f"unigram_logprob: vocabulary has {n_terms} terms "
            f"(> vocab_max={vocab_max}); pre-prune or raise the cap"
        )
    vocab = term_counts.to_pandas()
    if len(vocab) == 0:  # empty corpus (empty to_pandas loses columns)
        lp = pd.Series(dtype=np.int64)
    else:
        total = float(vocab["c"].sum())
        # scalar math.log per TERM (bounded), bit-identical to DuckDB
        # ln; per-doc sums below are then exact integer arithmetic
        from knowledge_graph_ray.functions.numeric import round_half_away

        lp = pd.Series(
            [round_half_away(math.log(c / total) * _E6)
             for c in vocab["c"]],
            index=vocab["term"].to_numpy(),
            dtype=np.int64,
        )
    lp_ref = ray.put(lp)

    def score(batch: pa.Table) -> pa.Table:
        df = _explode_tokens(batch, id_col, text_col)
        table = ray.get(lp_ref)  # node-local cached
        df["lp"] = df.tok.map(table).astype(np.int64)
        g = df.groupby("rid", sort=False)["lp"]
        s = g.sum()
        n = g.size()
        id_type = batch.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(s.index.to_numpy(), type=id_type),
            "n_tokens": pa.array(n.to_numpy(dtype=np.int64),
                                 type=pa.int64()),
            "sum_logprob_e6": pa.array(s.to_numpy(dtype=np.int64),
                                       type=pa.int64()),
        })

    return src.map_batches(score, batch_format="pyarrow")


def duplicated_spans(docs, window: int = 16, id_col: str = "doc_id",
                     text_col: str = "text", num_buckets: int = 16):
    """-> Dataset[(id_col, n_windows, n_dup_windows, dup_span_frac_e6)]
    — per document, how much of it consists of ``window``-token spans
    that also appear (verbatim) in at least one OTHER document.

    n_windows counts the document's overlapping stride-1 spans;
    n_dup_windows those whose text occurs in > 1 distinct document
    (documents shorter than ``window`` tokens have zero spans and are
    dropped, like the SQL group-by shape).
    """
    from knowledge_graph_ray.functions.agg import distinct_rows
    from knowledge_graph_ray.functions.hashing import hash_rows_u64
    from knowledge_graph_ray.functions.joins import bloom_semi_join, hash_join

    src = docs.select_columns([id_col, text_col])

    def occurrences(batch: pa.Table) -> pa.Table:
        df = _explode_tokens(batch, id_col, text_col)
        # span text via window-1 vectorized shift-concats; rows whose
        # (window-1)-ahead neighbor left the document are invalid
        w = df.tok.copy()
        for j in range(1, window):
            w = w + " " + df.tok.shift(-j)
        valid = (df.rid == df.rid.shift(-(window - 1))).to_numpy()
        span_tab = pa.table({
            id_col: pa.array(df.rid[valid].to_numpy(),
                             type=batch.schema.field(id_col).type),
            "w": pa.array(w[valid].astype(str), type=pa.string()),
        })
        # 128-bit span fingerprint: span text never leaves the batch
        h1 = hash_rows_u64(span_tab, ["w"], seed=11)
        h2 = hash_rows_u64(span_tab, ["w"], seed=23)
        return pa.table({
            id_col: span_tab.column(id_col),
            "h1": pa.array(h1.astype(np.int64)),
            "h2": pa.array(h2.astype(np.int64)),
        })

    occ = src.map_batches(occurrences, batch_format="pyarrow")

    n_win = grouped_agg(occ, [id_col], [("n_windows", None, "count")],
                        num_buckets=num_buckets)
    doc_spans = distinct_rows(occ, [id_col, "h1", "h2"],
                              num_buckets=num_buckets)
    span_docs = grouped_agg(doc_spans, ["h1", "h2"],
                            [("nd", None, "count")],
                            num_buckets=num_buckets)
    dup_keys = span_docs.map_batches(
        lambda t: t.filter(
            pa.compute.greater(t.column("nd"), pa.scalar(1, pa.int64()))
        ).select(["h1", "h2"]),
        batch_format="pyarrow",
    )
    dup_occ = bloom_semi_join(occ, dup_keys, on=["h1", "h2"],
                              num_partitions=num_buckets)
    dup_counts = grouped_agg(dup_occ, [id_col],
                             [("n_dup_windows", None, "count")],
                             num_buckets=num_buckets)
    joined = hash_join(n_win, dup_counts, on=[id_col], how="left_outer",
                       num_partitions=num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nd = pc.coalesce(batch.column("n_dup_windows"),
                         pa.scalar(0, pa.int64()))
        nw = batch.column("n_windows").to_numpy().astype(np.float64)
        frac = nd.to_numpy(zero_copy_only=False).astype(np.float64) / nw * _E6
        return pa.table({
            id_col: batch.column(id_col),
            "n_windows": batch.column("n_windows"),
            "n_dup_windows": nd,
            "dup_span_frac_e6": pa.array(_round_half_away_vec(frac)),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
