"""OpenAI-compatible LLM strategies for the extractor / report seams.

The reference's ``graph_intelligence`` strategy drives a chat model
through the delimited-record protocol with gleaning rounds
(graph_extractor.py:80-176) and composes community reports as raw JSON
(community_reports_extractor.py:25-79).  This module provides the real
network-backed implementations of those seams against ANY
OpenAI-compatible ``/chat/completions`` endpoint, using only the
standard library (no ``openai`` package in this environment).

Configuration is via environment variables, read once per actor in
``__init__`` (state-in-actor-init, A6):

* ``KG_RAY_LLM_BASE_URL`` — e.g. ``https://api.openai.com/v1`` (required)
* ``KG_RAY_LLM_API_KEY``  — bearer token (optional for local servers)
* ``KG_RAY_LLM_MODEL``    — model name (default ``gpt-4o-mini``, the
  reference's default)

No endpoint exists in the build sandbox, so these classes are exercised
by tests/test_llm_seam.py two ways: an offline test with the HTTP layer
mocked (the gleaning protocol, record parsing and JSON repair all run
for real) and a live test that is skipped unless KG_RAY_LLM_BASE_URL is
set.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

from knowledge_graph_ray.config import (
    COMPLETION_DELIMITER,
    RECORD_DELIMITER,
    TUPLE_DELIMITER,
)
from knowledge_graph_ray.stages.extract import PatternExtractor
from knowledge_graph_ray.stages.report import RawJsonReportComposer

_EXTRACT_PROMPT = (
    "Extract all entities and relationships from the text below.\n"
    "Output one record per line item, records separated by {rd}:\n"
    '("entity"{td}NAME{td}TYPE{td}DESCRIPTION)\n'
    '("relationship"{td}SOURCE{td}TARGET{td}DESCRIPTION{td}WEIGHT)\n'
    "Finish with {cd}.\n\nText:\n{text}"
)
_CONTINUE_PROMPT = (
    "Some entities or relationships were missed in the last extraction. "
    "Add ONLY the missing records, same format."
)
_LOOP_PROMPT = (
    "Do more entities or relationships remain unextracted? Answer YES or NO."
)
_REPORT_PROMPT = (
    "Write a community report for community {community} (level {level}) "
    "as a JSON object with keys: title, summary, rating (0-10 float), "
    "rating_explanation, findings (list of {{summary, explanation}}).\n\n"
    "Context:\n{context}"
)


class OpenAIChatClient:
    """Minimal stdlib chat-completions client (temperature 0, retries)."""

    def __init__(self, base_url: str | None = None, api_key: str | None = None,
                 model: str | None = None, timeout: float = 120.0,
                 max_retries: int = 3):
        self.base_url = (base_url or os.environ.get("KG_RAY_LLM_BASE_URL", "")).rstrip("/")
        if not self.base_url:
            raise ValueError(
                "OpenAI-compatible strategies need KG_RAY_LLM_BASE_URL "
                "(e.g. https://api.openai.com/v1)"
            )
        self.api_key = api_key or os.environ.get("KG_RAY_LLM_API_KEY", "")
        self.model = model or os.environ.get("KG_RAY_LLM_MODEL", "gpt-4o-mini")
        self.timeout = timeout
        self.max_retries = max_retries

    def chat(self, messages: list[dict], max_tokens: int = 4000) -> str:
        body = json.dumps({
            "model": self.model,
            "messages": messages,
            "temperature": 0,
            "max_tokens": max_tokens,
        }).encode()
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            f"{self.base_url}/chat/completions", data=body, headers=headers
        )
        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    payload = json.loads(resp.read().decode())
                return payload["choices"][0]["message"]["content"]
            except (urllib.error.URLError, TimeoutError, KeyError) as err:
                last_err = err
                time.sleep(min(2.0 ** attempt, 8.0))
        raise RuntimeError(f"LLM call failed after {self.max_retries} tries") from last_err


class OpenAICompatGraphExtractor(PatternExtractor):
    """The reference's ``graph_intelligence`` strategy, live: chat-model
    delimited-record extraction with the gleaning CONTINUE loop and the
    YES/NO stop probe (graph_extractor.py:139-174).  Inherits the batch
    body / quarantine / parse path from PatternExtractor — only the
    ``_extract_raw`` / ``_glean`` / ``_should_continue`` hooks differ,
    so the wire protocol downstream is byte-compatible."""

    def __init__(self, max_gleanings: int = 1, client: OpenAIChatClient | None = None,
                 **client_kwargs):
        # no gazetteer: skip PatternExtractor.__init__ entirely
        self.client = client or OpenAIChatClient(**client_kwargs)
        self.max_gleanings = max_gleanings

    def _messages(self, text: str) -> list[dict]:
        return [{
            "role": "user",
            "content": _EXTRACT_PROMPT.format(
                rd=RECORD_DELIMITER, td=TUPLE_DELIMITER,
                cd=COMPLETION_DELIMITER, text=text,
            ),
        }]

    def _extract_raw(self, text: str) -> str:
        self._history = self._messages(text)
        raw = self.client.chat(self._history)
        self._history.append({"role": "assistant", "content": raw})
        return raw

    def _glean(self, text: str, round_index: int, previous: str) -> str | None:
        self._history.append({"role": "user", "content": _CONTINUE_PROMPT})
        more = self.client.chat(self._history)
        self._history.append({"role": "assistant", "content": more})
        return more or None

    def _should_continue(self, text: str, round_index: int,
                         accumulated: str) -> bool:
        probe = self._history + [{"role": "user", "content": _LOOP_PROMPT}]
        answer = self.client.chat(probe, max_tokens=4)
        return answer.strip().upper().startswith("Y")


class OpenAICompatReportComposer(RawJsonReportComposer):
    """Live community-report composer: the model returns raw (possibly
    fenced / truncated) JSON; recovery is RawJsonReportComposer's
    ``try_parse_json_object`` path (M9)."""

    def __init__(self, client: OpenAIChatClient | None = None, **client_kwargs):
        self.client = client or OpenAIChatClient(**client_kwargs)

    def _generate_raw(self, community: str, level: int, context: str) -> str:
        return self.client.chat([{
            "role": "user",
            "content": _REPORT_PROMPT.format(
                community=community, level=level, context=context
            ),
        }])
