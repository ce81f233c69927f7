"""String normalization + deterministic tokenizer.

``clean_str`` reproduces the reference normalizer exactly
(/root/reference/utils/string.py:11-19): html.unescape(strip()) then strip
control characters.  ``normalize_name`` is the canonical surface-form key
the reference uses for graph nodes: ``clean_str(name.upper())``
(/root/reference/graph/extractors/graph_extractor.py:205-206,244-245 —
note ``.upper()`` runs BEFORE clean_str there; order matters only for
locale-exotic escapes, we match the reference order).

The tokenizer is a deterministic fallback for tiktoken ``cl100k_base``
(unavailable in this environment — SURVEY.md §7.5): a compiled regex that
splits into word / punctuation tokens.  Window math (size/overlap) is
identical to the reference TokenTextSplitter
(/root/reference/verbs/text_units/split_texts/run.py:16-19); only the
token vocabulary differs, which is a documented substitution behind the
same interface.
"""

from __future__ import annotations

import html
import re

_CONTROL_CHARS = re.compile(r"[\x00-\x1f\x7f-\x9f]")
# word runs (incl. unicode letters/digits/underscore) or single non-space symbols.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def clean_str(value: object) -> object:
    """Strip HTML escapes + control chars (reference utils/string.py:11-19)."""
    if not isinstance(value, str):
        return value
    result = html.unescape(value.strip())
    return _CONTROL_CHARS.sub("", result)


def normalize_name(name: str) -> str:
    """Canonical surface-form key: clean_str(name.upper()).

    This is the groupby key for entity canonicalization (SURVEY.md G1) —
    reference graph_extractor.py:205.
    """
    out = clean_str(name.upper())
    return out if isinstance(out, str) else str(out)


def tokenize(text: str) -> list[str]:
    """Deterministic tokenization (tiktoken-free fallback)."""
    return _TOKEN_RE.findall(text)


def token_count(text: str) -> int:
    """Number of tokens (reference utils/__init__.py:18-25 list_of_token)."""
    return len(_TOKEN_RE.findall(text))


def token_spans(text: str) -> list[tuple[int, int]]:
    """(start, end) char offsets of each token — lets the chunker slice the
    original text losslessly instead of re-joining tokens."""
    return [m.span() for m in _TOKEN_RE.finditer(text)]
