"""Strategy registry — the reference's user-extension surface (SURVEY §2.10).

The reference exposes per-verb strategy enums + ``load_strategy`` match
statements (entity extraction ``graph_intelligence | graph_intelligence_json
| nltk``, verbs/entities/extraction/entity_extract.py:15-54; summarization
description_summarize.py:15-72; claims extract_covariates.py:139-145;
clustering cluster_graph.py:90-97).  Here the same three hooks are
name-registered classes: extractor strategies (callable classes for the
actor pool), summarizer strategies, claim strategies.
"""

from __future__ import annotations

from knowledge_graph_ray.stages.claims import PatternClaimExtractor
from knowledge_graph_ray.stages.extract import CooccurrenceExtractor, PatternExtractor
from knowledge_graph_ray.stages.summarize import DescriptionSummarizer


class LLMGraphExtractor:
    """Seam for the reference's ``graph_intelligence`` strategy (LLM
    delimited-record extraction with gleaning, graph_extractor.py:80-176).
    No LLM endpoint exists in this environment."""

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "graph_intelligence requires an LLM endpoint (the reference uses "
            "ChatOpenAI gpt-4o-mini); use the 'openai_compat' strategy with "
            "KG_RAY_LLM_BASE_URL set, or subclass PatternExtractor and "
            "override _extract_raw(text) -> wire-format records"
        )


from knowledge_graph_ray.stages.llm import (  # noqa: E402
    OpenAICompatGraphExtractor,
    OpenAICompatReportComposer,
)

EXTRACTORS = {
    "pattern": PatternExtractor,  # gazetteer + relation verbs (nltk-strategy shape)
    "cooccurrence": CooccurrenceExtractor,  # verb-free co-occurrence cliques
    "graph_intelligence": LLMGraphExtractor,  # LLM seam (needs an endpoint)
    "openai_compat": OpenAICompatGraphExtractor,  # live seam (stages/llm.py)
}

SUMMARIZERS = {
    "deterministic": DescriptionSummarizer,
}


def _report_composers():
    from knowledge_graph_ray.stages.report import (
        RawJsonReportComposer,
        ReportComposer,
    )

    return {
        "deterministic": ReportComposer,
        # LLM strategies subclass RawJsonReportComposer (tolerant JSON
        # recovery via functions/jsonx.try_parse_json_object, M9)
        "raw_json": RawJsonReportComposer,
        "openai_compat": OpenAICompatReportComposer,  # live seam (stages/llm.py)
    }


REPORT_COMPOSERS = _report_composers()


def get_report_composer(name: str):
    return REPORT_COMPOSERS[name]

CLAIM_EXTRACTORS = {
    "pattern": PatternClaimExtractor,
}


def register_extractor(name: str, cls) -> None:
    EXTRACTORS[name] = cls


def get_extractor(name: str):
    try:
        return EXTRACTORS[name]
    except KeyError as err:
        raise ValueError(
            f"unknown extractor strategy {name!r}; known: {sorted(EXTRACTORS)}"
        ) from err


def get_summarizer(name: str):
    return SUMMARIZERS[name]


def get_claim_extractor(name: str):
    return CLAIM_EXTRACTORS[name]
