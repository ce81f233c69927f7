"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All are stateless-per-row computations expressed as ``map_batches``
with state (compiled regexes, stopword tables) held in a callable class
so Ray runs them as an actor pool with per-actor setup (the reference
rebuilds such state per call, e.g. llm/__init__.py:5-9 — the anti-pattern
these stages avoid)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]")
_CJK_RE = re.compile(r"[一-鿿]")

# small closed stopword tables per language (n-gram heuristic langid)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "du", "est", "que"},
    "es": {"el", "los", "las", "y", "una", "es", "por", "con", "para", "del"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
}


class TextAnalyzer:
    """Adds n_tokens, n_distinct_tokens, stopword_ratio, punct_ratio,
    quality_score, lang_pred, fingerprint columns."""

    def __init__(self, text_column: str = "text", fingerprint_k: int = 8):
        self.text_column = text_column
        self.fingerprint_k = fingerprint_k

    def _langid(self, tokens: list[str], text: str) -> str:
        if _CJK_RE.search(text):
            return "zh"
        lower = [t.lower() for t in tokens[:200]]
        best, best_hits = "en", -1
        for lang, stops in _STOPWORDS.items():
            hits = sum(1 for t in lower if t in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits > 0 else "unknown"

    def _fingerprint(self, tokens: list[str]) -> str:
        """Rolling-hash (Rabin–Karp over token trigrams) winnowing digest:
        the k smallest trigram hashes, order-insensitive, hex-packed."""
        if not tokens:
            return ""
        hs = sorted(
            {
                int.from_bytes(
                    hashlib.blake2b(
                        " ".join(tokens[i : i + 3]).encode(), digest_size=8
                    ).digest(),
                    "big",
                )
                for i in range(max(1, len(tokens) - 2))
            }
        )[: self.fingerprint_k]
        return "".join(f"{h:016x}" for h in hs)

    def reference_rows(self, batch: pa.Table) -> pa.Table:
        """Per-row reference implementation — kept as the equality
        oracle for the vectorized __call__ (property-tested)."""
        texts = batch.column(self.text_column).to_pylist()
        n_tok, n_dist, stop_r, punct_r, quality, lang, fp = [], [], [], [], [], [], []
        for text in texts:
            text = text or ""
            toks = _WORD_RE.findall(text)
            lower = [t.lower() for t in toks]
            n = len(toks)
            n_tok.append(n)
            n_dist.append(len(set(lower)))
            stops = sum(1 for t in lower if t in _STOPWORDS["en"])
            sr = stops / n if n else 0.0
            stop_r.append(sr)
            pr = len(_PUNCT_RE.findall(text)) / max(1, len(text))
            punct_r.append(pr)
            # quality: length score x lexical diversity x (1 - punct excess)
            length_score = min(1.0, n / 100.0)
            diversity = len(set(lower)) / n if n else 0.0
            quality.append(round(length_score * diversity * (1.0 - min(pr, 0.5)), 6))
            lang.append(self._langid(toks, text))
            fp.append(self._fingerprint(lower))
        return (
            batch.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
            .append_column("n_distinct_tokens", pa.array(n_dist, type=pa.int64()))
            .append_column("stopword_ratio", pa.array(stop_r, type=pa.float64()))
            .append_column("punct_ratio", pa.array(punct_r, type=pa.float64()))
            .append_column("quality_score", pa.array(quality, type=pa.float64()))
            .append_column("lang_pred", pa.array(lang, type=pa.string()))
            .append_column("fingerprint", pa.array(fp, type=pa.string()))
        )


    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized across the batch, row-identical to
        reference_rows: polars tokenize once, one explode feeds
        distinct/stopword/langid/fingerprint via groupby kernels;
        blake2b runs once per distinct trigram (factorize).  The only
        per-row Python left is the final round()/hex-join over
        doc-cardinality (not token-cardinality) values."""
        import pandas as pd
        import polars as pl

        n_rows = len(batch)
        texts_pd = batch.column(self.text_column).to_pandas().fillna("")
        toks = (
            pl.from_arrow(batch.column(self.text_column).combine_chunks())
            .fill_null("")
            .str.extract_all(r"[\p{L}\p{N}_]+")  # Python \w in rust regex
        )
        lens = toks.list.len().to_numpy().astype(np.int64)
        doc = np.repeat(np.arange(n_rows), lens)
        low = toks.explode().drop_nulls().str.to_lowercase().to_pandas()
        df = pd.DataFrame({"doc": doc, "tok": low.to_numpy()})

        n_tok = lens
        n_dist = np.zeros(n_rows, dtype=np.int64)
        if len(df):
            d = df.drop_duplicates().groupby("doc").size()
            n_dist[d.index.to_numpy()] = d.to_numpy()

        stop_hits = np.zeros(n_rows, dtype=np.int64)
        if len(df):
            s = df["tok"].isin(_STOPWORDS["en"]).groupby(df["doc"]).sum()
            stop_hits[s.index.to_numpy()] = s.to_numpy()
        with np.errstate(invalid="ignore"):
            stop_r = np.where(n_tok > 0, stop_hits / np.maximum(n_tok, 1),
                              0.0)

        punct = texts_pd.str.count(_PUNCT_RE).to_numpy(dtype=np.float64)
        punct_r = punct / np.maximum(texts_pd.str.len().to_numpy(), 1)

        length_score = np.minimum(1.0, n_tok / 100.0)
        diversity = np.where(n_tok > 0, n_dist / np.maximum(n_tok, 1), 0.0)
        q = length_score * diversity * (1.0 - np.minimum(punct_r, 0.5))
        quality = [round(float(x), 6) for x in q]

        # langid: CJK anywhere -> zh; else stopword hits per lang over
        # the first 200 tokens, first-max in table order, 0 -> unknown
        langs = list(_STOPWORDS)
        hits = np.zeros((n_rows, len(langs)), dtype=np.int64)
        if len(df):
            pos = df.groupby("doc").cumcount()
            head = df[pos < 200]
            for j, lg in enumerate(langs):
                h = head["tok"].isin(_STOPWORDS[lg]) \
                    .groupby(head["doc"]).sum()
                hits[h.index.to_numpy(), j] = h.to_numpy()
        best = np.argmax(hits, axis=1)          # first max = table order
        best_hits = hits[np.arange(n_rows), best]
        cjk = texts_pd.str.contains(_CJK_RE, regex=True).to_numpy()
        lang_arr = np.where(
            cjk, "zh",
            np.where(best_hits > 0, np.asarray(langs, dtype=object)[best],
                     "unknown"),
        )

        # fingerprint: k smallest distinct trigram hashes (lower tokens);
        # docs with 1-2 tokens hash the whole join (reference rule)
        fp = [""] * n_rows
        if len(df):
            parts = [df["tok"].shift(-1), df["tok"].shift(-2)]
            doc_ok = pd.Series(doc).shift(-2).to_numpy() == doc
            tri = df["tok"].str.cat(parts, sep=" ").to_numpy()[doc_ok]
            tri_doc = doc[doc_ok]
            small_mask = (lens >= 1) & (lens <= 2)
            if small_mask.any():
                sm = df[np.isin(df["doc"].to_numpy(),
                                np.nonzero(small_mask)[0])]
                smj = sm.groupby("doc")["tok"].agg(" ".join)
                tri = np.concatenate([tri, smj.to_numpy(dtype=object)])
                tri_doc = np.concatenate([tri_doc,
                                          smj.index.to_numpy()])
            if len(tri):
                codes, uniques = pd.factorize(pd.Series(tri))
                uhash = np.frombuffer(
                    b"".join(
                        hashlib.blake2b(g.encode(), digest_size=8).digest()
                        for g in uniques
                    ),
                    dtype=">u8",
                ).astype(np.uint64)
                pair = pd.DataFrame({"doc": tri_doc,
                                     "h": uhash[codes]}) \
                    .drop_duplicates().sort_values(["doc", "h"])
                rank = pair.groupby("doc").cumcount()
                kept = pair[rank < self.fingerprint_k]
                hexes = kept["h"].map(lambda v: f"{v:016x}")
                for d, s in hexes.groupby(kept["doc"]).agg("".join).items():
                    fp[int(d)] = s

        return (
            batch.append_column("n_tokens", pa.array(n_tok, type=pa.int64()))
            .append_column("n_distinct_tokens",
                           pa.array(n_dist, type=pa.int64()))
            .append_column("stopword_ratio",
                           pa.array(stop_r, type=pa.float64()))
            .append_column("punct_ratio",
                           pa.array(punct_r, type=pa.float64()))
            .append_column("quality_score",
                           pa.array(quality, type=pa.float64()))
            .append_column("lang_pred",
                           pa.array(lang_arr.astype(object),
                                    type=pa.string()))
            .append_column("fingerprint", pa.array(fp, type=pa.string()))
        )


def analyze_text(ds, text_column: str = "text", concurrency=(1, 8),
                 batch_size: int = 2048):
    return ds.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs=dict(text_column=text_column),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def regex_redact(ds, text_col: str, pattern: str,
                 replacement: str = "[REDACTED]",
                 out_col: str = "redacted",
                 count_col: str = "n_redacted",
                 keep_cols: "list[str] | None" = None):
    """Pattern redaction over a text column — the PII-scrub shape of a
    training-data pipeline (emails/phones/IDs at 100TB; any RE2-class
    regex).  Stateless ``map_batches``; the scan is polars' vectorized
    ``str.replace_all`` + ``str.count_matches`` (Rust regex, compiled
    once per call — no per-row Python re).  Emits the redacted text and
    the per-row match count (the audit column a scrub job reports).
    NULL text passes through as NULL with count 0.
    """
    import pyarrow as pa

    keep = keep_cols if keep_cols is not None else []

    def body(b: "pa.Table") -> "pa.Table":
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        s = pl.from_arrow(b.select([text_col]).column(text_col)).rename("t")
        cols = {k: b.column(k) for k in keep}
        cols[out_col] = s.str.replace_all(pattern, replacement).to_arrow()
        cols[count_col] = (
            s.str.count_matches(pattern).fill_null(0)
            .cast(pl.Int64).to_arrow()
        )
        return pa.table(cols)

    return ds.select_columns(
        list(dict.fromkeys(keep + [text_col]))
    ).map_batches(body, batch_format="pyarrow")
