"""Tolerant JSON extraction for LLM-produced report output (M9).

Reference behavior (``utils/__init__.py:44-99`` try_parse_json_object,
reimplemented — not a port; the reference leans on the ``json_repair``
package which is absent here, so the repair pass is a small deterministic
fixer for the failure modes LLMs actually produce):

* direct parse first;
* strip surrounding prose and markdown fences, keep the outermost
  ``{...}`` span;
* normalize newlines/escapes;
* repair: trailing commas, single-quoted strings/keys, unquoted keys,
  truncated output (balance open brackets/braces);
* returns ``(cleaned_text, dict)`` — ``{}`` when unrecoverable or when
  the payload parses to a non-dict.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"^```(?:json)?\s*|\s*```$", re.MULTILINE)
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")
_SINGLE_QUOTED_RE = re.compile(r"'([^'\\\n]*)'")
_UNQUOTED_KEY_RE = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)(\s*:)")


def _loads_dict(text: str) -> dict | None:
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        return None
    return obj if isinstance(obj, dict) else None


def _balance(text: str) -> str:
    """Append missing closers for truncated output (string-aware scan)."""
    stack: list[str] = []
    in_str = False
    escape = False
    for ch in text:
        if escape:
            escape = False
            continue
        if ch == "\\":
            escape = True
            continue
        if in_str:
            if ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            stack.append("}" if ch == "{" else "]")
        elif ch in "}]" and stack and stack[-1] == ch:
            stack.pop()
    if in_str:
        text += '"'
    return text + "".join(reversed(stack))


def try_parse_json_object(text: str) -> tuple[str, dict]:
    """-> (cleaned_text, parsed_dict); dict is {} on failure."""
    if text is None:
        return "", {}
    result = _loads_dict(text)
    if result is not None:
        return text, result

    cleaned = _FENCE_RE.sub("", text.strip()).strip()
    # outermost {...} span: first { to last }
    lo, hi = cleaned.find("{"), cleaned.rfind("}")
    if lo != -1 and hi > lo:
        cleaned = cleaned[lo : hi + 1]
    elif lo != -1:
        cleaned = cleaned[lo:]  # truncated tail — _balance closes it
    cleaned = cleaned.replace("\r", "").replace("\n", " ").strip()

    for repair in (
        lambda s: s,
        lambda s: _TRAILING_COMMA_RE.sub(r"\1", s),
        lambda s: _UNQUOTED_KEY_RE.sub(r'\1"\2"\3', s),
        lambda s: _SINGLE_QUOTED_RE.sub(r'"\1"', s),
        _balance,
    ):
        cleaned = repair(cleaned)
        result = _loads_dict(cleaned)
        if result is not None:
            return cleaned, result
    return cleaned, {}


def extract_json_paths(ds, json_col: str, paths: "dict[str, str]",
                       types: "dict[str, 'pa.DataType'] | None" = None,
                       keep_cols: "list[str] | None" = None):
    """Vectorized JSON-path extraction over a string column — the SQL
    ``json_col ->> '$.path'`` projection for JSON-bearing event/props
    columns at scale.

    ``paths``: {out_name: json_path} (e.g. {"k_val": "$.k"}); values
    come back as strings (SQL ``->>`` semantics) unless ``types`` maps
    the output to an Arrow type to cast to.  Malformed JSON, missing
    paths and JSON nulls all yield NULL, matching DuckDB.  Stateless
    ``map_batches``; the parse is polars' vectorized
    ``str.json_path_match`` — no per-row Python json.loads.
    """
    import pyarrow as pa

    keep = keep_cols if keep_cols is not None else []
    types = types or {}

    def body(b: "pa.Table") -> "pa.Table":
        import os

        os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        s = pl.from_arrow(b.select([json_col]).column(json_col)).rename("j")
        cols = {k: b.column(k) for k in keep}
        for out, path in paths.items():
            arr = s.str.json_path_match(path).to_arrow()
            if out in types:
                arr = arr.cast(types[out])
            cols[out] = arr
        return pa.table(cols)

    return ds.select_columns(
        list(dict.fromkeys(keep + [json_col]))
    ).map_batches(body, batch_format="pyarrow")
