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
